"""Round-5 limiter measurement: ISOLATED raster / expand kernels.

VERDICT r4 weak #4: raster (~16.7 ms) and expand (~7.3 ms) sit 10-20x over
their rooflines with the limiter "hypothesized, not measured". This script
times the two Pallas kernels alone (inputs prebuilt once from the real
pipeline, so every variant sees the bench scene's actual record
distribution) and uses ABLATION knobs inside the kernels to separate:

  raster: grid fixed cost (empty ranges) | transcendental chain ("trans")
          | MXU scan ("scan") | final-index bookkeeping ("fidx") | color
          accumulation ("rgb") | batch granularity (k_lanes) | grid-step
          amortization (tiles_per_step) | DMA depth (n_buf)
  expand: rank->tile decode chain ("decode") | one-hot MXU gather
          ("matmul") | DMA depth (n_buf) | block size (k_exp)

Each variant is a fresh executable (~150 s first-execution through the
axon tunnel) — results print incrementally, most-informative first.

Usage: python scripts/profile_r5.py [raster|expand|all]  (default: all)
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
from brush_tpu.ops.pallas.expand import (
    WINDOW_ALIGN, build_comp_rows, expand_pallas,
)
from brush_tpu.ops.pallas.rasterize_fwd import (
    PACK_ROWS, quantize_color, quantize_opac, rasterize_fwd_pallas,
)
from scripts.profile_r3 import (
    IMG, MAX_ISECTS, N, build_inputs, make_staged, median_time, report,
)

TILES_X = -(-IMG[0] // TILE_WIDTH)
NUM_TILES = TILES_X * (-(-IMG[1] // TILE_WIDTH))


def build_raster_inputs(cp, args):
    """One real-pipeline run to the bins stage; keep results on device."""
    fn = jax.jit(make_staged(cp, "bins"))
    starts, ends, packed = fn(*args)
    jax.block_until_ready(packed)
    return starts, ends, packed


def build_expand_inputs(cp, args, window_max: int):
    """Pipeline prefix up to the expand kernel's inputs (mirrors
    profile_r3.make_staged between "sort" and "expand"), padded for the
    LARGEST window any variant uses so all k_exp variants share inputs."""
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops.binning import precompute_tile_masks
    from brush_tpu.ops.sh import sh_to_color
    from brush_tpu.ops.pallas.raster_vjp import _popcount_u32
    from brush_tpu.render import pack_decode_rows

    n_pad = -(-N // WINDOW_ALIGN) * WINDOW_ALIGN + window_max

    def fn(means, log_scales, quats, sh_coeffs, raw_op):
        n = means.shape[0]
        quats_n = quats / jnp.linalg.norm(
            quats, axis=-1, keepdims=True).clip(1e-12)
        proj = project_splats(means, log_scales, quats_n, cp.viewmat,
                              cp.focal, cp.pixel_center, IMG)
        cam_pos = cp.viewmat[:3, 3]
        vd = means - cam_pos
        vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True).clip(1e-12)
        color = sh_to_color(1, vd, sh_coeffs)
        opac = jax.nn.sigmoid(raw_op)
        masks = precompute_tile_masks(proj, opac)
        producing = proj.visible & (masks.counts > 0)
        counts_g = jnp.where(producing, masks.counts, 0)
        depth_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(proj.depth, 1e-20), jnp.uint32)
        depth_key = jnp.where(producing, depth_bits, jnp.uint32(0xFFFFFFFF))
        decode = pack_decode_rows(proj, masks, counts_g)
        colop0 = (quantize_color(color[:, 0])
                  | (quantize_color(color[:, 1]) << 16))
        colop1 = quantize_color(color[:, 2]) | (quantize_opac(opac) << 16)
        ops = jax.lax.sort(
            (depth_key, proj.xy[:, 0], proj.xy[:, 1], proj.conic[:, 0],
             proj.conic[:, 1], proj.conic[:, 2], colop0, colop1,
             decode[0], decode[1], decode[2],
             jnp.arange(n, dtype=jnp.int32)),
            num_keys=1, is_stable=True)
        d0, m_lo, m_hi = ops[8], ops[9], ops[10]
        small_c = (d0 >> 10) & jnp.uint32(1)
        bbox_w_c = d0 >> 22
        counts_c = jnp.where(
            small_c == 1,
            (_popcount_u32(m_lo) + _popcount_u32(m_hi)).astype(jnp.uint32),
            bbox_w_c * m_lo).astype(jnp.int32)
        cum = jnp.cumsum(counts_c)
        offsets = cum - counts_c
        total = jnp.minimum(cum[-1:], MAX_ISECTS).astype(jnp.int32)
        bws = bbox_w_c | (small_c << 10)
        comps = build_comp_rows(
            ops[1], ops[2], ops[3], ops[4], ops[5], ops[6], ops[7],
            d0 & jnp.uint32(0x3FF), (d0 >> 11) & jnp.uint32(0x7FF), bws,
            m_lo, m_hi, offsets, n_pad, cum=cum)
        return comps, cum, total

    comps, cum, total = jax.jit(fn)(*args)
    jax.block_until_ready(comps)
    return comps, cum, total, n_pad


def s_lo_for(cum, k_exp: int, n_pad: int):
    window = k_exp + 2 * WINDOW_ALIGN
    starts_blk = jnp.arange(MAX_ISECTS // k_exp, dtype=jnp.int32) * k_exp
    w0 = jnp.searchsorted(cum, starts_blk, side="right").astype(jnp.int32)
    return jnp.clip((w0 // WINDOW_ALIGN) * WINDOW_ALIGN, 0, n_pad - window)


def run_raster():
    cp, args = build_inputs()
    print("building raster inputs (one pipeline compile)...", flush=True)
    starts, ends, packed = build_raster_inputs(cp, args)
    tile_ids = jnp.arange(NUM_TILES, dtype=jnp.int32)
    total = int(np.asarray(ends[-1]))
    print(f"pool: {total} records over {NUM_TILES} tiles "
          f"(mean {total / NUM_TILES:.0f}/tile)", flush=True)

    def variant(name, s=None, e=None, pk=None, **kw):
        def fn(starts_, ends_, packed_):
            return rasterize_fwd_pallas(
                packed_, starts_, ends_, tile_ids, tiles_x=TILES_X,
                num_tiles=NUM_TILES, max_isects=MAX_ISECTS, **kw)
        dt = median_time(
            fn,
            (s if s is not None else starts,
             e if e is not None else ends,
             pk if pk is not None else packed),
        )
        report(name, dt)
        return dt

    base = variant("raster base (k512 tps8 nbuf6 sp2)")
    # Same executable, empty ranges: pure per-grid-step + output fixed cost.
    variant("raster EMPTY ranges (grid fixed cost)", e=starts)
    variant("raster ablate trans", ablate=("trans",))
    variant("raster ablate scan", ablate=("scan",))
    variant("raster ablate fidx", ablate=("fidx",))
    variant("raster ablate rgb", ablate=("rgb",))
    variant("raster ablate ALL (DMA+sigma floor)",
            ablate=("trans", "scan", "fidx", "rgb"))
    pk1024 = jnp.pad(packed, ((0, 0), (0, 512)))
    jax.block_until_ready(pk1024)
    variant("raster k_lanes=1024", pk=pk1024, k_lanes=1024)
    variant("raster tiles_per_step=32", tiles_per_step=32)
    variant("raster n_buf=2", n_buf=2)
    return base


def run_expand():
    cp, args = build_inputs()
    print("building expand inputs (one pipeline compile)...", flush=True)
    window_max = 1024 + 2 * WINDOW_ALIGN
    comps, cum, total, n_pad = build_expand_inputs(cp, args, window_max)
    print(f"expand inputs: comps {comps.shape}, total "
          f"{int(np.asarray(total)[0])}", flush=True)
    s_lo_512 = s_lo_for(cum, 512, n_pad)
    s_lo_1024 = s_lo_for(cum, 1024, n_pad)
    jax.block_until_ready((s_lo_512, s_lo_1024))

    def variant(name, k_exp=512, **kw):
        s_lo = s_lo_512 if k_exp == 512 else s_lo_1024

        def fn(comps_, s_lo_, total_):
            return expand_pallas(
                comps_, s_lo_, total_, tiles_x=TILES_X,
                num_tiles=NUM_TILES, n=N, max_isects=MAX_ISECTS,
                k_exp=k_exp, **kw)
        dt = median_time(fn, (comps, s_lo, total))
        report(name, dt)
        return dt

    base = variant("expand base (k512 nbuf4)")
    variant("expand ablate decode", ablate=("decode",))
    variant("expand ablate matmul", ablate=("matmul",))
    variant("expand ablate BOTH (DMA floor)", ablate=("decode", "matmul"))
    variant("expand k_exp=1024", k_exp=1024)
    variant("expand n_buf=2", n_buf=2)
    return base


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("expand", "all"):
        run_expand()
    if mode in ("raster", "all"):
        run_raster()
