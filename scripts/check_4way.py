"""4-way render comparison: {pallas, xla} x {TPU, CPU} on one scene.

pipe-TPU vs xla-TPU diverges 0.196 while pipe-CPU vs xla-CPU agrees to
5e-5. This renders all four and diffs across platforms per backend to
find WHICH backend changes between platforms. Run TPU first (default
platform), then rerun with FORCE_CPU=1 and diff the saved arrays.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from brush_tpu.camera import Camera
from brush_tpu.constants import SH_C0
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.render import render_splats

N = 20000
IMG = (512, 512)
MAX_ISECTS = 1 << 19


def main():
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-2.5, 2.5, size=(N, 3)), jnp.float32)
    log_scales = jnp.asarray(
        np.log(rng.uniform(0.01, 0.15, size=(N, 3))), jnp.float32)
    quats = rng.normal(size=(N, 4))
    quats = jnp.asarray(
        quats / np.linalg.norm(quats, axis=-1, keepdims=True), jnp.float32)
    colors = rng.uniform(0, 1, size=(N, 3))
    sh = jnp.asarray((colors[:, None, :] - 0.5) / SH_C0, jnp.float32)
    opac_raw = jnp.asarray(
        np.log(rng.uniform(0.2, 0.9, N) / (1 - rng.uniform(0.2, 0.9, N))),
        jnp.float32)
    cam = Camera(position=[0, 0, -8], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, IMG)

    plat = "cpu" if os.environ.get("FORCE_CPU") else "tpu"
    for backend, block in (("pallas", 512), ("xla", 256)):
        img, aux = jax.jit(lambda b=backend, bl=block: render_splats(
            means, log_scales, quats, sh, opac_raw, cp, IMG,
            block_size=bl, max_isects=MAX_ISECTS, backend=b))()
        img = np.asarray(img)
        np.save(f"/tmp/img_{backend}_{plat}.npy", img)
        print(f"{backend}/{plat}: isects={int(aux.num_isects)} saved",
              flush=True)

    # If both platforms' files exist, print the cross-platform diffs.
    for backend in ("pallas", "xla"):
        try:
            a = np.load(f"/tmp/img_{backend}_tpu.npy")
            b = np.load(f"/tmp/img_{backend}_cpu.npy")
        except FileNotFoundError:
            continue
        d = np.abs(a - b)
        print(f"{backend}: TPU-vs-CPU max {d.max():.3e} mean {d.mean():.3e} "
              f"pix>5.9e-3: {(d.max(axis=-1) > 1.5 / 255).sum()}")
        if d.max() > 1.5 / 255:
            iy, ix = np.unravel_index(d.max(axis=-1).argmax(), d.shape[:2])
            print(f"  worst ({iy},{ix}): tpu {a[iy, ix]} cpu {b[iy, ix]}")


if __name__ == "__main__":
    main()
