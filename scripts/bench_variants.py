"""Full-forward bench variants on the real chip.

Measures the COMPLETE jitted forward (one dispatch per iteration — staged
timing through the axon tunnel pays a per-call cost that inflates absolute
numbers). Variants isolate: new kernels at the r1 config, pool right-sizing,
and expansion block size.

Usage: python scripts/bench_variants.py [variant ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.render import render_splats
from brush_tpu.splats import from_random

VARIANTS = {
    # r1 bench config (pool 3<<20, k 512): isolates kernel improvements
    "r1cfg": dict(max_isects=3 << 20, block_size=512),
    # right-sized pool (true records 2.16M at this scene)
    "pool22": dict(max_isects=2162688, block_size=512),
    # bigger raster batches
    "k1024": dict(max_isects=2162688, block_size=1024),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    n_splats = 1 << 20
    img_size = (1024, 1024)
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-3, -3, -3], [3, 3, 3], count=n_splats,
                         sh_degree=1, capacity=n_splats)
    cam = Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, img_size)
    args = jax.device_put((splats.means, splats.log_scales, splats.quats,
                           splats.sh_coeffs, splats.raw_opacity))

    for name in names:
        cfg = VARIANTS[name]

        @jax.jit
        def forward(means, log_scales, quats, sh_coeffs, raw_opacity):
            img, aux = render_splats(
                means, log_scales, quats, sh_coeffs, raw_opacity,
                cp, img_size, **cfg,
            )
            return img, aux.num_isects

        t0 = time.perf_counter()
        img, ni = forward(*args)
        img.block_until_ready()
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(12):
            t0 = time.perf_counter()
            img, ni = forward(*args)
            _ = np.asarray(img[:1, :1])
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        mpix = img_size[0] * img_size[1] / 1e6
        print(f"{name:10s} {dt*1e3:8.2f} ms  {mpix/dt:7.1f} Mpix/s  "
              f"isects={int(ni)}  (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
