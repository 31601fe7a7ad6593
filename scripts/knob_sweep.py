"""Targeted round-3 knob sweep at the bench config (1M splats, 1024^2).

Measures the two remaining off-by-default perf knobs against their
defaults so the flip decision is evidence-based (docs/PERFORMANCE.md
round-3 table):
  - scan_passes=2   fwd: 1/3 less MXU scan work, log-T truncation <= 2^-16
  - pack_grad_sort  train: 10 -> 7 bwd sorted arrays, bf16 conic/color grads
Each point composes with the cell under test (KNOB_CELL, default 1x1).

Usage: python scripts/knob_sweep.py [fwd|train|all]
"""
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
from brush_tpu.optim import init_adam, adam_step

N = 1 << 20
IMG = (1024, 1024)
MAX_ISECTS = 2162688
CELL = tuple(int(v) for v in os.environ.get("KNOB_CELL", "1x1").split("x"))


def median_time(fn, args, iters=12):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"  compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-3, -3, -3], [3, 3, 3], count=N, sh_degree=1,
                         capacity=N)
    cam = Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, IMG)
    args = jax.device_put((splats.means, splats.log_scales, splats.quats,
                           splats.sh_coeffs, splats.raw_opacity))

    def fwd(scan_passes):
        @jax.jit
        def f(means, ls, q, sh, op):
            img, aux = render_splats(
                means, ls, q, sh, op, cp, IMG, block_size=512,
                max_isects=MAX_ISECTS, cell=CELL, scan_passes=scan_passes)
            return img, aux.num_dropped
        return f

    def train(pack_grad_sort, scan_passes=3):
        gt = jnp.zeros((IMG[1], IMG[0], 3), jnp.float32)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                img, _ = render_splats(
                    p["means"], p["log_scales"], p["quats"], p["sh_coeffs"],
                    p["raw_opacity"], cp, IMG, block_size=512,
                    max_isects=MAX_ISECTS, cell=CELL,
                    pack_grad_sort=pack_grad_sort, scan_passes=scan_passes)
                return jnp.mean(jnp.abs(img[..., :3] - gt))
            loss, grads = jax.value_and_grad(loss_fn)(params)
            lrs = {"means": 1.6e-4, "raw_opacity": 5e-2, "sh_coeffs": 4e-3,
                   "quats": 2e-3, "log_scales": 1e-2}
            params, opt = adam_step(params, grads, opt, lrs)
            return params, opt, loss
        return step

    if mode in ("fwd", "all"):
        for sp in (3, 2):
            dt = median_time(fwd(sp), args)
            print(f"fwd  cell={CELL} scan_passes={sp}: {dt * 1e3:8.2f} ms",
                  flush=True)

    if mode in ("train", "all"):
        params = jax.device_put(splats.params())
        for pgs, sp in ((False, 3), (True, 3), (True, 2)):
            # FIXED params + full outputs: the old feedback stepper both
            # collapsed the model mid-measurement AND let the outer jit
            # DCE the backward (docs/PERFORMANCE.md round 5).
            opt0 = init_adam(params)
            step = train(pgs, sp)

            def once():
                return step(dict(params), opt0)

            dt = median_time(lambda: once(), ())
            print(f"train cell={CELL} pack_grad_sort={pgs} scan_passes={sp}:"
                  f" {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
