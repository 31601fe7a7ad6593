"""Stage-by-stage NaN localization inside the Pallas pipeline backward.

Replicates raster_vjp._fwd_impl / raster_bwd (same code, intermediates
exposed) on the failing step-3026 state and checks each stage:
  fwd:  img / log_t / fidx sanity, pallas-vs-xla image diff
  bwd:  rasterize_bwd_pallas grad records -> which slots/tiles are NaN
        -> sort+mask -> segsum -> inversion sort

Usage: python scripts/drill_nan.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math
import numpy as np
import jax
import jax.numpy as jnp

from brush_tpu.config import TrainConfig
from brush_tpu.datasets.loading import load_dataset
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.sh import sh_to_color
from brush_tpu.constants import sh_degree_from_coeffs
from brush_tpu.ops.binning import precompute_tile_masks
from brush_tpu.render import pack_decode_rows, assemble_image
from brush_tpu.ssim import Ssim
from brush_tpu.ops.pallas.raster_vjp import (
    _popcount_u32, make_pallas_pipeline,
)
from brush_tpu.ops.pallas.expand import (
    WINDOW_ALIGN, build_comp_rows, expand_pallas,
)
from brush_tpu.ops.pallas.rasterize_fwd import (
    PACK_ROWS, quantize_color, quantize_opac, rasterize_fwd_pallas,
)
from brush_tpu.ops.pallas.rasterize_bwd import GRAD_ROWS, rasterize_bwd_pallas
from brush_tpu.ops.pallas.segsum import SEG_ROWS, segment_sum_pallas
from brush_tpu.constants import TILE_WIDTH

POOL = 1 << 22
K = 512
K_EXP = 512
TPS, N_BUF, SCAN_PASSES = 8, 6, 2


def nanscan(name, x):
    x = np.asarray(x)
    n_nan = np.isnan(x).sum()
    n_inf = np.isinf(x).sum()
    print(f"  {name}: shape {x.shape} nan={n_nan} inf={n_inf} "
          f"min={np.nanmin(x):.4g} max={np.nanmax(x):.4g}", flush=True)
    return n_nan or n_inf


def main():
    d = np.load("/tmp/nan_prestate.npz")
    step = int(d["step"])
    ds = load_dataset("data/castle_800.zip")
    rng = np.random.default_rng(TrainConfig().seed)
    idx = [int(rng.integers(len(ds.train.views))) for _ in range(step + 1)][-1]
    view = ds.train.views[idx]
    gt = jnp.asarray(view.image)[..., :3]
    h, w = gt.shape[:2]
    cam = camera_params(view.camera, (w, h))
    print(f"view {idx}, {w}x{h}", flush=True)

    means = jnp.asarray(d["param/means"])
    log_scales = jnp.asarray(d["param/log_scales"])
    quats = jnp.asarray(d["param/quats"])
    sh_coeffs = jnp.asarray(d["param/sh_coeffs"])
    raw_opacity = jnp.asarray(d["param/raw_opacity"])
    n = means.shape[0]
    active = jnp.arange(n) < int(d["n_live"])

    tiles_x = -(-w // TILE_WIDTH)
    tiles_y = -(-h // TILE_WIDTH)
    num_tiles = tiles_x * tiles_y
    raster_tiles = num_tiles
    n_pad = -(-n // WINDOW_ALIGN) * WINDOW_ALIGN + (K_EXP + 2 * WINDOW_ALIGN)
    window = K_EXP + 2 * WINDOW_ALIGN
    boundaries = np.arange(raster_tiles + 1, dtype=np.uint32)

    # ---- glue identical to render_splats/_render_pallas ----
    @jax.jit
    def build_inputs():
        quats_n = quats / jnp.linalg.norm(
            quats, axis=-1, keepdims=True).clip(1e-12)
        proj = project_splats(means, log_scales, quats_n, cam.viewmat,
                              cam.focal, cam.pixel_center, (w, h),
                              active=active)
        cam_pos = cam.viewmat[:3, 3]
        viewdir = means - cam_pos
        viewdir = viewdir / jnp.linalg.norm(
            viewdir, axis=-1, keepdims=True).clip(1e-12)
        color = sh_to_color(sh_degree_from_coeffs(sh_coeffs.shape[1]),
                            viewdir, sh_coeffs)
        opac = jax.nn.sigmoid(raw_opacity)
        masks = precompute_tile_masks(proj, opac)
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
        return attrs9, decode, depth_key

    attrs9, decode, depth_key = build_inputs()
    print("inputs built", flush=True)
    nanscan("attrs9", attrs9)

    # ---- fwd (copy of raster_vjp._fwd_impl, intermediates exposed) ----
    @jax.jit
    def fwd(attrs9, decode, depth_key):
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
        colop0 = (quantize_color(attrs9[5]) | (quantize_color(attrs9[6]) << 16))
        colop1 = (quantize_color(attrs9[7]) | (quantize_opac(attrs9[8]) << 16))
        payload = (depth_key, attrs9[0], attrs9[1], attrs9[2], attrs9[3],
                   attrs9[4], colop0, colop1,
                   decode[0], decode[1], decode[2],
                   jnp.arange(n, dtype=jnp.int32))
        ops = jax.lax.sort(payload, num_keys=1, is_stable=True)
        order = ops[11]
        d0, m_lo, m_hi = ops[8], ops[9], ops[10]
        small_c = (d0 >> 10) & jnp.uint32(1)
        bbox_w_c = d0 >> 22
        counts_c = jnp.where(
            small_c == 1,
            (_popcount_u32(m_lo) + _popcount_u32(m_hi)).astype(jnp.uint32),
            bbox_w_c * m_lo).astype(jnp.int32)
        cum_f = jnp.cumsum(counts_c.astype(jnp.float32))
        beyond = cum_f - counts_c.astype(jnp.float32) > 4.0 * POOL
        counts_i = jnp.where(beyond, 0, counts_c)
        cum = jnp.cumsum(counts_i)
        offsets = cum - counts_i
        total = jnp.minimum(cum[-1:], POOL).astype(jnp.int32)
        bws = bbox_w_c | (small_c << 10)
        comps = build_comp_rows(
            ops[1], ops[2], ops[3], ops[4], ops[5], ops[6], ops[7],
            d0 & jnp.uint32(0x3FF), (d0 >> 11) & jnp.uint32(0x7FF), bws,
            m_lo, m_hi, offsets, n_pad, cum=cum)
        offs_col = jnp.concatenate([
            offsets.astype(jnp.int32),
            jnp.full((n_pad + WINDOW_ALIGN - n,), 1 << 30, jnp.int32),
        ])[None, :]
        starts_blk = jnp.arange(POOL // K_EXP, dtype=jnp.int32) * K_EXP
        w0 = jnp.searchsorted(cum, starts_blk, side="right").astype(jnp.int32)
        s_lo = jnp.clip((w0 // WINDOW_ALIGN) * WINDOW_ALIGN, 0, n_pad - window)
        keys, recs = expand_pallas(
            comps, s_lo, total, tiles_x=tiles_x, num_tiles=num_tiles,
            n=n, max_isects=POOL, k_exp=K_EXP, interpret=False)
        keys_l = jnp.where(keys < raster_tiles, keys,
                           jnp.uint32(raster_tiles))
        sops = jax.lax.sort(
            (keys_l,) + tuple(recs[i] for i in range(PACK_ROWS)),
            num_keys=1, is_stable=True)
        skeys = sops[0]
        packed = jnp.stack(sops[1:1 + PACK_ROWS], axis=0)
        packed = jnp.pad(packed, ((0, 0), (0, K)))
        tile_bins = jnp.searchsorted(skeys, jnp.asarray(boundaries))
        tile_bins = tile_bins.astype(jnp.int32)
        starts = tile_bins[:-1]
        ends = tile_bins[1:]
        img_tiles, log_t, fidx = rasterize_fwd_pallas(
            packed, starts, ends, tile_ids,
            tiles_x=tiles_x, num_tiles=raster_tiles, max_isects=POOL,
            k_lanes=K, interpret=False, tiles_per_step=TPS, n_buf=N_BUF,
            scan_passes=SCAN_PASSES)
        return (packed, starts, ends, tile_ids, img_tiles, log_t, fidx,
                offs_col, s_lo, total, order)

    (packed, starts, ends, tile_ids, img_tiles, log_t, fidx,
     offs_col, s_lo, total, order) = fwd(attrs9, decode, depth_key)
    print(f"fwd done: total={int(total[0])}", flush=True)
    bad = 0
    bad |= nanscan("img_tiles", img_tiles)
    bad |= nanscan("log_t", log_t)
    print(f"  fidx: min={int(jnp.min(fidx))} max={int(jnp.max(fidx))} "
          f"(total={int(total[0])})", flush=True)

    # ---- exact image cotangent from the real loss ----
    cfg = TrainConfig()
    ssim = Ssim(cfg.ssim_window_size, 3)

    @jax.jit
    def loss_of_tiles(img_tiles):
        img = assemble_image(img_tiles, (w, h), tiles_x, tiles_y)
        pred = img[..., :3]
        l1 = jnp.mean(jnp.abs(pred - gt))
        sv = ssim.ssim(img[None, ..., :3], gt[None, ..., :3])
        return l1 * (1.0 - cfg.ssim_weight) - sv * cfg.ssim_weight

    loss, gvjp = jax.value_and_grad(loss_of_tiles)(img_tiles)
    print(f"loss={float(loss):.6f}", flush=True)
    nanscan("g_img_tiles", gvjp)

    # ---- bwd raster kernel ----
    grads = rasterize_bwd_pallas(
        packed, gvjp, log_t, fidx, starts, ends, tile_ids,
        tiles_x=tiles_x, num_tiles=raster_tiles, max_isects=POOL,
        k_lanes=K, interpret=False,
        tiles_per_step=min(TPS, 4), n_buf=min(N_BUF, 4),
        scan_passes=SCAN_PASSES)
    grads_np = np.asarray(grads)
    print("bwd raster done", flush=True)
    nan_slots = np.unique(np.argwhere(np.isnan(grads_np))[:, 1])
    print(f"  grad records: {np.isnan(grads_np).sum()} NaNs in "
          f"{len(nan_slots)} slots", flush=True)
    if len(nan_slots):
        st, en = np.asarray(starts), np.asarray(ends)
        tiles_of = np.searchsorted(st, nan_slots, side="right") - 1
        ut = np.unique(tiles_of)
        print(f"  NaN slots span tiles {ut[:20]} ({len(ut)} tiles)", flush=True)
        for t in ut[:6]:
            sl = nan_slots[(nan_slots >= st[t]) & (nan_slots < en[t])]
            lt = np.asarray(log_t)[t]
            fx = np.asarray(fidx)[t]
            print(f"    tile {t}: range [{st[t]},{en[t]}) n={en[t]-st[t]} "
                  f"nan_slots={len(sl)} first={sl[:5]} "
                  f"log_t[min={lt.min():.3g},max={lt.max():.3g}] "
                  f"fidx[min={fx.min()},max={fx.max()}]", flush=True)
        np.save("/tmp/nan_slots.npy", nan_slots)
        np.save("/tmp/nan_tiles.npy", ut)
        pk = np.asarray(packed)
        np.savez(
            "/tmp/nan_tile_dump.npz",
            tiles=ut,
            packed_windows=np.stack([
                pk[:, (st[t] // 128) * 128:(st[t] // 128) * 128 + 2 * K]
                for t in ut]),
            starts=st[ut], ends=en[ut],
            bases=(st[ut] // 128) * 128,
            vout=np.asarray(gvjp)[ut],
            log_t=np.asarray(log_t)[ut],
            fidx=np.asarray(fidx)[ut],
            tile_ids=np.asarray(tile_ids)[ut],
            grads_windows=np.stack([
                grads_np[:, (st[t] // 128) * 128:(st[t] // 128) * 128 + 2 * K]
                for t in ut]),
        )
        print("dumped /tmp/nan_tile_dump.npz", flush=True)
    else:
        # NaN must appear later: sort + mask + segsum
        gops = jax.lax.sort(
            (packed[PACK_ROWS - 1, :POOL],)
            + tuple(grads[i, :POOL] for i in range(9)), num_keys=1)
        live = jax.lax.broadcasted_iota(jnp.int32, (1, POOL), 1) < total[0]
        grads_slot = jnp.where(live, jnp.stack(gops[1:10], axis=0), 0.0)
        nanscan("grads_slot (sorted+masked)", grads_slot)
        grads_slot = jnp.concatenate(
            [grads_slot, jnp.zeros((SEG_ROWS - 9, POOL), jnp.float32)], axis=0)
        per_splat = segment_sum_pallas(
            grads_slot, offs_col, s_lo, total,
            n_pad=n_pad, max_isects=POOL, k_seg=K_EXP, interpret=False)
        nanscan("per_splat (segsum)", per_splat)


if __name__ == "__main__":
    main()
