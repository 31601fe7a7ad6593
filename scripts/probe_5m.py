"""Bicycle-scale probe: forward+backward+Adam at 5M splats on one chip.

BASELINE.md's 'bicycle full-res ~5M splats, 1 host' config. Reports HBM
math + measured step time, or documents the precise wall if it OOMs.

Memory budget at 5M splats, SH-3 (16 coeffs):
  params:  means 3 + logs 3 + quats 4 + opac 1 + sh 48  = 59 f32/splat
  Adam m+v: 2x59                                        = 118
  grads:    59
  => 236 f32/splat = 944 B/splat  -> 4.7 GB at 5M
  pool (records):  expand in 24 rows + sorted 16 rows + grads 16 rows
  => ~56 f32/slot = 224 B/slot    -> 2.2 GB at a 10M pool
  v5e HBM = 16 GB: fits with ~2x slack; the sort's internal buffers are
  the unknown this probe measures.

Usage: python scripts/probe_5m.py [n_millions] [img_size]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from brush_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.render import render_splats
from brush_tpu.optim import init_adam, adam_step
from brush_tpu.splats import from_random


def main():
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1248
    n = int(n_m * (1 << 20))
    img_size = (size, size)
    # Trained bicycle-scale scenes average ~2 exact hits/splat at full res;
    # random boxes of small splats land lower. Pool = 2n, grown on drop.
    max_isects = -(-2 * n // 1024) * 1024

    rng = np.random.default_rng(0)
    splats = from_random(rng, [-4, -4, -4], [4, 4, 4], count=n, sh_degree=3,
                         capacity=n)
    # Small scales so the record count stays bicycle-like.
    splats = splats.replace(
        log_scales=jnp.full_like(splats.log_scales, np.log(0.01)))
    cam = Camera(position=[0, 0, -10.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, img_size)
    gt = jnp.zeros((img_size[1], img_size[0], 3), jnp.float32)

    print(f"n={n/1e6:.1f}M sh=3 img={size}^2 pool={max_isects/1e6:.1f}M",
          flush=True)
    param_gb = n * 59 * 4 * 4 / 2**30  # params + m + v + grads
    pool_gb = max_isects * 56 * 4 / 2**30
    print(f"budget: params+opt+grads {param_gb:.2f} GB, pool ~{pool_gb:.2f} GB",
          flush=True)

    @jax.jit
    def train_step(params, opt):
        def loss_fn(p):
            img, aux = render_splats(
                p["means"], p["log_scales"], p["quats"], p["sh_coeffs"],
                p["raw_opacity"], cp, img_size, block_size=512,
                max_isects=max_isects,
            )
            return jnp.mean(jnp.abs(img[..., :3] - gt)), aux
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        lrs = {"means": 1.6e-4, "raw_opacity": 5e-2, "sh_coeffs": 4e-3,
               "quats": 2e-3, "log_scales": 1e-2}
        params, opt = adam_step(params, grads, opt, lrs)
        return params, opt, loss, aux.num_isects, aux.num_dropped

    params = jax.device_put(splats.params())
    opt = init_adam(params)
    t0 = time.perf_counter()
    params, opt, loss, ni, nd = train_step(params, opt)
    loss.block_until_ready()
    print(f"compile+first step {time.perf_counter()-t0:.0f}s "
          f"loss={float(loss):.4f} isects={int(ni)} dropped={int(nd)}",
          flush=True)

    # FIXED params every call (bench methodology v3): feeding updates
    # back collapses the model toward the background inside the timing
    # loop and under-reports real work (see docs/PERFORMANCE.md round 5).
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        _p, _o, loss, ni, nd = train_step(params, opt)
        _ = float(loss)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(f"train step median {dt*1e3:.1f} ms ({1/dt:.2f} it/s) at "
          f"{n/1e6:.1f}M splats", flush=True)


if __name__ == "__main__":
    main()
