"""Forward k_lanes sweep + full training-step (fwd+bwd+adam) bench."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.render import render_splats
from brush_tpu.splats import from_random

N = 1 << 20
IMG = (1024, 1024)
POOL = 3 * (1 << 20)


def main():
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-3, -3, -3], [3, 3, 3], count=N, sh_degree=1,
                         capacity=N)
    cam = Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, IMG)
    args = jax.device_put((splats.means, splats.log_scales, splats.quats,
                           splats.sh_coeffs, splats.raw_opacity))
    gt = jax.device_put(
        rng.uniform(size=(IMG[1], IMG[0], 3)).astype(np.float32))

    for bs in (int(a) for a in (sys.argv[1] or "256,512").split(",")):
        f = jax.jit(lambda m, ls, q, sh, o, bs=bs: render_splats(
            m, ls, q, sh, o, cp, IMG, block_size=bs, max_isects=POOL)[0])
        img = f(*args); jax.block_until_ready(img)
        t0 = time.perf_counter()
        for _ in range(4):
            img = f(*args)
        _ = np.asarray(img[:1, :1])
        dt = (time.perf_counter() - t0) / 4
        print(f"fwd k={bs}: {dt*1e3:7.1f} ms  {1.048/dt:6.2f} Mpix/s",
              flush=True)

    if len(sys.argv) > 2 and sys.argv[2] == "train":
        def loss_fn(m, ls, q, sh, o):
            img, _ = render_splats(m, ls, q, sh, o, cp, IMG, block_size=512,
                                   max_isects=POOL)
            return jnp.mean(jnp.abs(img[..., :3] - gt))

        g = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
        out = g(*args); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(4):
            out = g(*args)
        _ = np.asarray(jnp.ravel(out[0])[:1])
        dt = (time.perf_counter() - t0) / 4
        print(f"fwd+bwd (L1): {dt*1e3:7.1f} ms  {1.0/dt:5.2f} iters/s",
              flush=True)


if __name__ == "__main__":
    main()
