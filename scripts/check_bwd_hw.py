"""Fused backward raster kernel: compiled (Mosaic) vs interpret on HW inputs.

Validates the round-5 fused-loop rewrite of rasterize_bwd_pallas on real
pipeline inputs (unaligned tile ranges, multi-batch tiles, empty tiles)
before it ships: same scene as check_expand_hw, forward once, then the
backward twice — compiled and interpret — diffing the gradient records.

Usage: python scripts/check_bwd_hw.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
from brush_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp

from brush_tpu.camera import Camera
from brush_tpu.constants import SH_C0
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.render import render_splats
from brush_tpu.ops.pallas import raster_vjp
from brush_tpu.ops.pallas.rasterize_bwd import rasterize_bwd_pallas

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

    # Capture the pipeline's backward-kernel inputs by monkeypatching the
    # bwd entry: run the real vjp once, stash (packed, g_img, log_t, fidx,
    # starts, ends, tile_ids, kwargs), then replay compiled vs interpret.
    captured = {}
    real_bwd = raster_vjp.rasterize_bwd_pallas

    def capture_bwd(packed, g_img, log_t, fidx, starts, ends, tile_ids, **kw):
        captured["args"] = (packed, g_img, log_t, fidx, starts, ends, tile_ids)
        captured["kw"] = dict(kw)
        return real_bwd(packed, g_img, log_t, fidx, starts, ends, tile_ids,
                        **kw)

    raster_vjp.rasterize_bwd_pallas = capture_bwd

    def loss(means_):
        img, _ = render_splats(
            means_, log_scales, quats, sh, opac_raw, cp, IMG,
            block_size=512, max_isects=MAX_ISECTS, backend="pallas")
        return jnp.sum(img ** 2)

    g = jax.grad(loss)(means)  # un-jitted so the capture sees real arrays
    assert bool(jnp.isfinite(g).all())
    print("pipeline grad pass done (captured bwd inputs)", flush=True)
    raster_vjp.rasterize_bwd_pallas = real_bwd

    args = captured["args"]
    kw = dict(captured["kw"])
    kw.pop("interpret", None)
    grads_hw = np.asarray(real_bwd(*args, interpret=False, **kw))
    print("bwd compiled done", flush=True)
    grads_it = np.asarray(real_bwd(*args, interpret=True, **kw))
    print("bwd interpret done", flush=True)

    # Compare only written (in-range) slots: derive live mask from ranges.
    starts = np.asarray(args[4]); ends = np.asarray(args[5])
    live = np.zeros(grads_hw.shape[1], bool)
    for s, e in zip(starts, ends):
        live[s:e] = True
    a = grads_hw[:9, :len(live)][:, live]
    b = grads_it[:9, :len(live)][:, live]
    d = np.abs(a - b)
    scale = np.abs(b).max() + 1e-8
    print(f"live slots {live.sum()}; grad rows max|d| {d.max():.3e} "
          f"(scale {scale:.3e}) rel {d.max()/scale:.3e}")
    nbad = (d > 1e-3 * scale).sum()
    print(f"entries beyond 1e-3*scale: {nbad}")
    assert np.isfinite(a).all() and np.isfinite(b).all()
    if d.max() <= 5e-3 * scale:
        print("BWD MATCHES (within MXU fp divergence)")
    else:
        rows, cols = np.where(d > 5e-3 * scale)
        print(f"MISMATCH rows {np.unique(rows)} at "
              f"{np.unique(np.flatnonzero(live)[cols])[:10]}")


if __name__ == "__main__":
    main()
