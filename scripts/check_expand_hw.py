"""Isolate the expand kernel on hardware: Mosaic vs interpret mode.

The r5 tpu_checks run failed the full-pipeline image check (max diff
7.8e-2) while the aligned-kernel fwd check passed — pointing at the
single-DMA expand rewrite (only validated in CPU interpret mode before
landing). This runs expand_pallas twice on the SAME device inputs —
compiled (Mosaic) and interpret — and diffs keys/records slot by slot.

Usage: python scripts/check_expand_hw.py [n]
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
from brush_tpu.constants import SH_C0, TILE_WIDTH
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.ops.binning import precompute_tile_masks
from brush_tpu.ops.sh import sh_to_color
from brush_tpu.render import pack_decode_rows
from brush_tpu.ops.pallas.raster_vjp import _popcount_u32
from brush_tpu.ops.pallas.expand import (
    WINDOW_ALIGN, build_comp_rows, expand_pallas,
)
from brush_tpu.ops.pallas.rasterize_fwd import quantize_color, quantize_opac

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
IMG = (512, 512)
MAX_ISECTS = 1 << 19
K_EXP = 512


def main():
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-2.5, 2.5, size=(N, 3)), jnp.float32)
    log_scales = jnp.asarray(
        np.log(rng.uniform(0.01, float(os.environ.get('SCALE_HI', '0.1')), size=(N, 3))), jnp.float32)
    quats = rng.normal(size=(N, 4))
    quats = jnp.asarray(
        quats / np.linalg.norm(quats, axis=-1, keepdims=True), jnp.float32)
    colors = rng.uniform(0, 1, size=(N, 3))
    sh = jnp.asarray((colors[:, None, :] - 0.5) / SH_C0, jnp.float32)
    if os.environ.get("SIGMOID_OPAC"):
        # exact check_pipe_xla scene: raw-logit draws + sigmoid
        import jax.nn
        opac_raw = jnp.asarray(
            np.log(rng.uniform(0.2, 0.9, N) / (1 - rng.uniform(0.2, 0.9, N))),
            jnp.float32)
        opac = jax.nn.sigmoid(opac_raw)
    else:
        opac = jnp.asarray(rng.uniform(0.2, 0.9, N), jnp.float32)

    cam = Camera(position=[0, 0, -8], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, IMG)
    proj = project_splats(means, log_scales, quats, cp.viewmat, cp.focal,
                          cp.pixel_center, IMG)
    color = sh_to_color(0, (means - cp.viewmat[:3, 3]), sh)
    masks = precompute_tile_masks(proj, opac)
    tiles_x = -(-IMG[0] // TILE_WIDTH)
    num_tiles = tiles_x * (-(-IMG[1] // TILE_WIDTH))

    producing = proj.visible & (masks.counts > 0)
    counts_g = jnp.where(producing, masks.counts, 0)
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(proj.depth, 1e-20), jnp.uint32)
    depth_key = jnp.where(producing, depth_bits, jnp.uint32(0xFFFFFFFF))
    attrs9 = jnp.stack(
        [proj.xy[:, 0], proj.xy[:, 1], proj.conic[:, 0], proj.conic[:, 1],
         proj.conic[:, 2], color[:, 0], color[:, 1], color[:, 2], opac],
        axis=0)
    decode = pack_decode_rows(proj, masks, counts_g)

    window = K_EXP + 2 * WINDOW_ALIGN
    n_pad = -(-N // WINDOW_ALIGN) * WINDOW_ALIGN + window

    @jax.jit
    def prep():
        colop0 = (quantize_color(attrs9[5]) | (quantize_color(attrs9[6]) << 16))
        colop1 = (quantize_color(attrs9[7]) | (quantize_opac(attrs9[8]) << 16))
        payload = (depth_key, attrs9[0], attrs9[1], attrs9[2], attrs9[3],
                   attrs9[4], colop0, colop1,
                   decode[0], decode[1], decode[2],
                   jnp.arange(N, dtype=jnp.int32))
        ops = jax.lax.sort(payload, num_keys=1, is_stable=True)
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
        starts_blk = jnp.arange(MAX_ISECTS // K_EXP, dtype=jnp.int32) * K_EXP
        w0 = jnp.searchsorted(cum, starts_blk, side="right").astype(jnp.int32)
        s_lo = jnp.clip((w0 // WINDOW_ALIGN) * WINDOW_ALIGN, 0, n_pad - window)
        return comps, s_lo, total

    comps, s_lo, total = jax.block_until_ready(prep())
    print(f"total records: {int(total[0])}", flush=True)

    def run(interpret):
        keys, recs = expand_pallas(
            comps, s_lo, total, tiles_x=tiles_x, num_tiles=num_tiles,
            n=N, max_isects=MAX_ISECTS, k_exp=K_EXP, interpret=interpret)
        return np.asarray(keys), np.asarray(recs)

    k_hw, r_hw = run(False)
    print("compiled run done", flush=True)
    k_it, r_it = run(True)
    print("interpret run done", flush=True)

    t = int(total[0])
    dk = (k_hw[:t] != k_it[:t])
    print(f"keys mismatched: {dk.sum()} / {t}")
    if dk.any():
        bad = np.flatnonzero(dk)
        print("first bad slots:", bad[:10])
        print("  hw :", k_hw[bad[:10]])
        print("  it :", k_it[bad[:10]])
        blocks = np.unique(bad // K_EXP)
        print(f"  bad blocks ({len(blocks)}):", blocks[:20])
    for row in range(r_hw.shape[0]):
        dr = (r_hw[row, :t] != r_it[row, :t])
        if dr.any():
            bad = np.flatnonzero(dr)
            print(f"rec row {row}: {dr.sum()} mismatches, "
                  f"first {bad[:6]} hw={r_hw[row, bad[:3]]} "
                  f"it={r_it[row, bad[:3]]}")
    if not dk.any():
        print("EXPAND MATCHES (keys)")

    # ---- continue the pipeline: tile sort + bins + fused fwd raster,
    # compiled vs interpret on identical inputs ----
    from brush_tpu.ops.pallas.rasterize_fwd import rasterize_fwd_pallas

    @jax.jit
    def tile_sort(keys, recs):
        keys_l = jnp.where(keys < num_tiles, keys, jnp.uint32(num_tiles))
        sops = jax.lax.sort(
            (keys_l,) + tuple(recs[i] for i in range(8)),
            num_keys=1, is_stable=True)
        skeys = sops[0]
        packed = jnp.stack(sops[1:9], axis=0)
        packed = jnp.pad(packed, ((0, 0), (0, K_EXP)))
        bounds = jnp.arange(num_tiles + 1, dtype=jnp.uint32)
        tile_bins = jnp.searchsorted(skeys, bounds).astype(jnp.int32)
        return packed, tile_bins[:-1], tile_bins[1:]

    keys, recs = jax.block_until_ready(
        jax.jit(lambda: expand_pallas(
            comps, s_lo, total, tiles_x=tiles_x, num_tiles=num_tiles,
            n=N, max_isects=MAX_ISECTS, k_exp=K_EXP, interpret=False))())
    packed, starts, ends = jax.block_until_ready(tile_sort(keys, recs))
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)

    def raster(interpret):
        img, log_t, fidx = rasterize_fwd_pallas(
            packed, starts, ends, tile_ids,
            tiles_x=tiles_x, num_tiles=num_tiles, max_isects=MAX_ISECTS,
            k_lanes=512, interpret=interpret, tiles_per_step=8, n_buf=6,
            scan_passes=2)
        return np.asarray(img), np.asarray(log_t), np.asarray(fidx)

    img_hw, lt_hw, fx_hw = raster(False)
    print("raster compiled done", flush=True)
    img_it, lt_it, fx_it = raster(True)
    print("raster interpret done", flush=True)
    di = np.abs(img_hw - img_it)
    print(f"fwd raster img hw-vs-interpret: max {di.max():.2e} "
          f"mean {di.mean():.2e}")
    np.savez("/tmp/raster_cmp.npz", img_hw=img_hw, img_it=img_it,
             lt_hw=lt_hw, lt_it=lt_it, fx_hw=fx_hw, fx_it=fx_it,
             starts=np.asarray(starts), ends=np.asarray(ends))
    print("per-channel max diff:",
          [f"{np.abs(img_hw[..., c] - img_it[..., c]).max():.2e}"
           for c in range(4)])
    if di.max() > 1e-6:
        tmax = di.reshape(num_tiles, -1).max(axis=1)
        bad = np.flatnonzero(tmax > 1e-6)
        st, en = np.asarray(starts), np.asarray(ends)
        print(f"bad tiles: {len(bad)}")
        for t in bad[:10]:
            nb = -(-(en[t] - (st[t] // 128) * 128) // 512) if en[t] > st[t] else 0
            print(f"  tile {t}: [{st[t]},{en[t]}) n={en[t]-st[t]} "
                  f"start%128={st[t]%128} batches={nb} "
                  f"imgdiff={tmax[t]:.3e} "
                  f"fidx_eq={np.array_equal(fx_hw[t], fx_it[t])} "
                  f"logt_diff={np.abs(lt_hw[t]-lt_it[t]).max():.2e}")
    else:
        print("FWD RASTER MATCHES")


if __name__ == "__main__":
    main()
