"""Round-5 post-fix measurement: headline + isolated fwd/bwd raster.

Runs after the fused-loop fwd kernel and single-DMA expand landed:
  1. bench-config forward + train step (amortized, render_splats path)
  2. isolated fwd raster: base / EMPTY / tiles_per_step sweep (the fused
     loop removed the per-tile VMEM stacks, so tps can now grow)
  3. isolated bwd raster: base / EMPTY — the bwd was never measured in
     isolation; decides whether it gets the same fused-loop treatment
  4. pipeline stage buckets (sort / tilesort) for the efficiency table

Usage: python scripts/measure_r5b.py [headline|raster|bwd|stages|all]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from brush_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp
import numpy as np

from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops.pallas.rasterize_fwd import rasterize_fwd_pallas
from brush_tpu.ops.pallas.rasterize_bwd import rasterize_bwd_pallas
from scripts.profile_r3 import (
    IMG, MAX_ISECTS, N, build_inputs, make_staged, median_time, report,
)
from scripts.profile_r5 import TILES_X, NUM_TILES, build_raster_inputs

K = 512


def run_headline(cp, args):
    from brush_tpu.render import render_splats
    from brush_tpu.optim import init_adam, adam_step

    @jax.jit
    def fwd(means, log_scales, quats, sh_coeffs, raw_op):
        img, aux = render_splats(
            means, log_scales, quats, sh_coeffs, raw_op, cp, IMG,
            block_size=512, max_isects=MAX_ISECTS)
        return img, aux.num_dropped

    dt = median_time(fwd, args)
    report("fwd headline (render_splats)", dt)
    print(f"  -> {IMG[0] * IMG[1] / 1e6 / dt:.1f} Mpix/s", flush=True)

    gt = jnp.zeros((IMG[1], IMG[0], 3), jnp.float32)
    params = {
        "means": args[0], "log_scales": args[1], "quats": args[2],
        "sh_coeffs": args[3], "raw_opacity": args[4],
    }
    opt = init_adam(params)

    def make_train_step(pgs, bwd_tps=None):
        @jax.jit
        def train_step(params, opt):
            def loss_fn(p):
                img, _ = render_splats(
                    p["means"], p["log_scales"], p["quats"], p["sh_coeffs"],
                    p["raw_opacity"], cp, IMG, block_size=512,
                    max_isects=MAX_ISECTS, pack_grad_sort=pgs,
                    bwd_tiles_per_step=bwd_tps)
                return jnp.mean(jnp.abs(img[..., :3] - gt))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            lrs = {"means": 1.6e-4, "raw_opacity": 5e-2, "sh_coeffs": 4e-3,
                   "quats": 2e-3, "log_scales": 1e-2}
            params, opt = adam_step(params, grads, opt, lrs)
            return params, opt, loss
        return train_step

    for pgs, bwd_tps in ((False, None), (True, None), (False, 8),
                         (True, 8)):
        train_step = make_train_step(pgs, bwd_tps)

        # FIXED params (bench methodology v3): feeding updates back
        # collapses the model toward the black gt inside the measurement
        # batches and reports empty-range kernel costs instead of real
        # work. ALSO: median_time wraps its fn in an OUTER jax.jit, so a
        # stepper that returns only the loss lets XLA dead-code-eliminate
        # the whole backward+Adam inside the outer trace (measured: 52 ms
        # "train" vs 116 ms honest — scripts/sync_cone_probe.py). Return
        # the FULL output tuple so nothing is DCE-able.
        def stepper():
            return train_step(params, opt)

        dt = median_time(stepper, ())
        report(f"train step FIXED (pgs={pgs} bwd_tps={bwd_tps})", dt)
        print(f"  -> {1.0 / dt:.2f} it/s", flush=True)


def run_raster(cp, args):
    print("building raster inputs (one pipeline compile)...", flush=True)
    starts, ends, packed = build_raster_inputs(cp, args)
    tile_ids = jnp.arange(NUM_TILES, dtype=jnp.int32)

    def variant(name, s=None, e=None, **kw):
        kl = kw.get("k_lanes", K)
        # packed is padded to MAX_ISECTS + k_lanes; re-pad for non-512 kl.
        pk = packed[:, :MAX_ISECTS + kl] if kl <= K else jnp.pad(
            packed, ((0, 0), (0, kl - K)))

        def fn(starts_, ends_, packed_):
            return rasterize_fwd_pallas(
                packed_, starts_, ends_, tile_ids, tiles_x=TILES_X,
                num_tiles=NUM_TILES, max_isects=MAX_ISECTS, **kw)
        try:
            dt = median_time(
                fn, (s if s is not None else starts,
                     e if e is not None else ends, pk))
        except Exception as exc:  # VMEM OOM at large tps: record, move on
            print(f"{name:46s}    FAILED ({type(exc).__name__}: "
                  f"{str(exc)[:80]})", flush=True)
            return
        report(name, dt)

    variant("fwd raster FUSED base (tps8 nbuf6)")
    variant("fwd raster FUSED empty", e=starts)
    variant("fwd raster FUSED tps16", tiles_per_step=16)
    variant("fwd raster FUSED tps16 empty", e=starts, tiles_per_step=16)
    # tps > 16 at k512 blows the 16 MB scoped-VMEM limit (the fused
    # output stack is tps * 256px * 6 f32 rows); pair tps32 with k256.
    variant("fwd raster FUSED tps32 k256", tiles_per_step=32, k_lanes=256)
    variant("fwd raster FUSED nbuf8 tps16", tiles_per_step=16, n_buf=8)
    variant("fwd raster FUSED k1024", k_lanes=1024)
    return starts, ends, packed, tile_ids


def run_bwd(cp, args, pre=None):
    if pre is None:
        print("building raster inputs (one pipeline compile)...", flush=True)
        starts, ends, packed = build_raster_inputs(cp, args)
        tile_ids = jnp.arange(NUM_TILES, dtype=jnp.int32)
    else:
        starts, ends, packed, tile_ids = pre
    img, log_t, fidx = jax.jit(
        lambda p, s, e: rasterize_fwd_pallas(
            p, s, e, tile_ids, tiles_x=TILES_X, num_tiles=NUM_TILES,
            max_isects=MAX_ISECTS)
    )(packed, starts, ends)
    rng = np.random.default_rng(0)
    v_out = jnp.asarray(
        rng.standard_normal((NUM_TILES, 256, 4)), jnp.float32) * 1e-3
    jax.block_until_ready((log_t, fidx, v_out))

    def variant(name, s=None, e=None, fi=None, **kw):
        def fn(packed_, v_out_, log_t_, fidx_, starts_, ends_):
            return rasterize_bwd_pallas(
                packed_, v_out_, log_t_, fidx_, starts_, ends_, tile_ids,
                tiles_x=TILES_X, num_tiles=NUM_TILES,
                max_isects=MAX_ISECTS, **kw)
        try:
            dt = median_time(fn, (packed, v_out, log_t,
                                  fi if fi is not None else fidx,
                                  s if s is not None else starts,
                                  e if e is not None else ends))
        except Exception as exc:
            print(f"{name:46s}    FAILED ({type(exc).__name__}: "
                  f"{str(exc)[:80]})", flush=True)
            return
        report(name, dt)

    variant("bwd raster base (tps4 nbuf4)")
    # Empty ranges: pure per-tile/grid fixed cost of the bwd kernel.
    variant("bwd raster empty",
            s=starts, e=starts, fi=jnp.full_like(fidx, -1))
    variant("bwd raster tps8", tiles_per_step=8)
    variant("bwd raster tps16", tiles_per_step=16)
    variant("bwd raster tps32 nbuf6", tiles_per_step=32, n_buf=6)


def run_stages(cp, args):
    for stage in ("sortonly", "sort", "expand", "tilesort", "raster"):
        dt = median_time(jax.jit(make_staged(cp, stage)), args)
        report(f"through {stage}", dt)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    cp, args = build_inputs()
    pre = None
    if mode in ("headline", "all"):
        run_headline(cp, args)
    if mode in ("raster", "all"):
        pre = run_raster(cp, args)
    if mode in ("bwd", "all"):
        run_bwd(cp, args, pre)
    if mode in ("stages", "all"):
        run_stages(cp, args)
