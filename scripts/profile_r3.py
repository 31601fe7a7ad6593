"""Round-3 roofline: full-jit ablations + kernel-variant sweep on the chip.

Methodology (docs/PERFORMANCE.md "measurement methodology"): every number is
the MEDIAN of 12 individually-synced executions of ONE fused jit — staged
pipelines timed stage-by-stage through the axon tunnel each pay a ~15-30 ms
dispatch constant and sum to nonsense. Stage costs therefore come from
*ablations*: jit the pipeline cut off after stage k, subtract successive
medians. The ablation bodies mirror raster_vjp._fwd_impl (keep in sync).

Usage: python scripts/profile_r3.py [stages|variants|bwd] (default: stages)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops.binning import precompute_tile_masks
from brush_tpu.ops.pallas.expand import WINDOW_ALIGN, build_comp_rows, expand_pallas
from brush_tpu.ops.pallas.rasterize_fwd import (
    PACK_ROWS,
    quantize_color,
    quantize_opac,
    rasterize_fwd_pallas,
)
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.ops.sh import sh_to_color
from brush_tpu.render import pack_decode_rows, render_splats
from brush_tpu.splats import from_random

N = 1 << 20
IMG = (1024, 1024)
MAX_ISECTS = 2162688  # bench.py pool
K_EXP = 512


def median_time(fn, args, iters=6, batch=8):
    """Amortized steady-state time per call (bench.py methodology): `batch`
    back-to-back async dispatches, ONE sync, median over `iters` batches.
    Per-call-synced timing through the axon tunnel carries a ~27 ms constant
    with +-5-10 ms run-to-run variance — stage DELTAS at the few-ms level
    drown in it; amortized batches cancel the constant and average the
    noise."""
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(batch):
            out = fn_j(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jnp.ravel(leaf)[:1])
        times.append((time.perf_counter() - t0) / batch)
    return sorted(times)[len(times) // 2]


def report(name, dt, prev=None):
    d = "" if prev is None else f"   (delta {1e3 * (dt - prev):+8.2f} ms)"
    print(f"{name:46s} {dt * 1e3:9.2f} ms{d}", flush=True)


def build_inputs():
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-3, -3, -3], [3, 3, 3], count=N, sh_degree=1,
                         capacity=N)
    cam = Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, IMG)
    args = jax.device_put((splats.means, splats.log_scales, splats.quats,
                           splats.sh_coeffs, splats.raw_opacity))
    return cp, args


def make_staged(cp, stage):
    """Forward pipeline cut off after `stage` (mirrors raster_vjp._fwd_impl).

    stage: projonly | pretest | proj | sortonly | sort | expand | tilesort
    | bins | raster
    ("sortonly" cuts before the count/cumsum/scatter slot map, isolating
    the raw 12-array depth sort from the slot-map bookkeeping — the
    roofline table's open question on the N-index scatter-add cost.
    "projonly" cuts before the pretest; "pretest" before decode packing.)
    """
    w, h = IMG
    tiles_x, tiles_y = -(-w // TILE_WIDTH), -(-h // TILE_WIDTH)
    num_tiles = tiles_x * tiles_y
    window = K_EXP + 2 * WINDOW_ALIGN
    n_pad = -(-N // WINDOW_ALIGN) * WINDOW_ALIGN + window
    k_lanes = 512

    def fn(means, log_scales, quats, sh_coeffs, raw_op):
        n = means.shape[0]  # bench smoke mode passes BENCH_N-sized args
        n_pad_l = -(-n // WINDOW_ALIGN) * WINDOW_ALIGN + window
        quats_n = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True).clip(1e-12)
        proj = project_splats(means, log_scales, quats_n, cp.viewmat,
                              cp.focal, cp.pixel_center, IMG)
        cam_pos = cp.viewmat[:3, 3]
        vd = means - cam_pos
        vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True).clip(1e-12)
        color = sh_to_color(1, vd, sh_coeffs)
        opac = jax.nn.sigmoid(raw_op)
        if stage == "projonly":
            return proj, color, opac
        masks = precompute_tile_masks(proj, opac)
        if stage == "pretest":
            return proj.xy, color, opac, masks
        producing = proj.visible & (masks.counts > 0)
        counts_g = jnp.where(producing, masks.counts, 0)
        depth_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(proj.depth, 1e-20), jnp.uint32)
        depth_key = jnp.where(producing, depth_bits, jnp.uint32(0xFFFFFFFF))
        decode = pack_decode_rows(proj, masks, counts_g)
        if stage == "proj":
            return proj.xy, color, opac, decode, depth_key

        colop0 = quantize_color(color[:, 0]) | (quantize_color(color[:, 1]) << 16)
        colop1 = quantize_color(color[:, 2]) | (quantize_opac(opac) << 16)
        ops = jax.lax.sort(
            (depth_key, proj.xy[:, 0], proj.xy[:, 1], proj.conic[:, 0],
             proj.conic[:, 1], proj.conic[:, 2], colop0, colop1,
             decode[0], decode[1], decode[2],
             jnp.arange(n, dtype=jnp.int32)),
            num_keys=1, is_stable=True)
        # Truncated stages RETURN EVERY SORTED ROW: XLA's sort simplifier
        # deletes unused payload rows from lax.sort, so returning a subset
        # times a CHEAPER sort than the real pipeline runs and the deleted
        # rows' cost silently lands in the next stage's delta (this bug
        # shaped the round-3 stage buckets).
        if stage == "sortonly":
            return ops
        from brush_tpu.ops.pallas.raster_vjp import _popcount_u32
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
        if stage == "sort":
            return ops, total

        bws = bbox_w_c | (small_c << 10)
        comps = build_comp_rows(
            ops[1], ops[2], ops[3], ops[4], ops[5], ops[6], ops[7],
            d0 & jnp.uint32(0x3FF), (d0 >> 11) & jnp.uint32(0x7FF), bws,
            m_lo, m_hi, offsets, n_pad_l, cum=cum)
        starts_blk = jnp.arange(MAX_ISECTS // K_EXP, dtype=jnp.int32) * K_EXP
        w0 = jnp.searchsorted(cum, starts_blk, side="right").astype(jnp.int32)
        s_lo = jnp.clip((w0 // WINDOW_ALIGN) * WINDOW_ALIGN, 0,
                        n_pad_l - window)
        keys, recs = expand_pallas(
            comps, s_lo, total, tiles_x=tiles_x,
            num_tiles=num_tiles, n=n, max_isects=MAX_ISECTS, k_exp=K_EXP)
        if stage == "expand":
            return keys, recs, total

        sops = jax.lax.sort(
            (keys,) + tuple(recs[i] for i in range(PACK_ROWS)),
            num_keys=1, is_stable=True)
        skeys = sops[0]
        packed = jnp.stack(sops[1:1 + PACK_ROWS], axis=0)
        packed = jnp.pad(packed, ((0, 0), (0, k_lanes)))
        if stage == "tilesort":
            return skeys, packed, total

        boundaries = jnp.arange(num_tiles + 1, dtype=jnp.uint32)
        tile_bins = jnp.searchsorted(skeys, boundaries).astype(jnp.int32)
        starts, ends = tile_bins[:-1], tile_bins[1:]
        if stage == "bins":
            return starts, ends, packed

        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
        img, log_t, fidx = rasterize_fwd_pallas(
            packed, starts, ends, tile_ids, tiles_x=tiles_x,
            num_tiles=num_tiles, max_isects=MAX_ISECTS, k_lanes=k_lanes)
        return img, log_t

    return fn


def run_stages():
    cp, args = build_inputs()
    prev = None
    stages = ["projonly", "pretest", "proj", "sortonly", "sort", "expand",
              "tilesort", "bins", "raster"]
    if len(sys.argv) > 2:
        stages = sys.argv[2].split(",")
    for stage in stages:
        dt = median_time(make_staged(cp, stage), args)
        report(f"through {stage}", dt, prev)
        prev = dt


def run_variants():
    """Full fwd via render_splats with kernel-knob overrides."""
    cp, args = build_inputs()
    from brush_tpu.ops.pallas import raster_vjp

    def full(block_size, tiles_per_step, n_buf, k_exp=512, scan_passes=3,
             cell=(1, 1)):
        def fn(means, log_scales, quats, sh_coeffs, raw_op):
            from brush_tpu.render import (
                _render_pallas, pack_rgba_u32)  # noqa: F401
            # Mirror render_splats' pallas branch with pipeline overrides.
            import math as _m
            w, h = IMG
            tiles_x, tiles_y = -(-w // TILE_WIDTH), -(-h // TILE_WIDTH)
            k_lanes = max(128, block_size)
            mi = -(-MAX_ISECTS // _m.lcm(k_lanes, k_exp)) * _m.lcm(k_lanes, k_exp)
            quats_n = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True).clip(1e-12)
            proj = project_splats(means, log_scales, quats_n, cp.viewmat,
                                  cp.focal, cp.pixel_center, IMG)
            cam_pos = cp.viewmat[:3, 3]
            vd = means - cam_pos
            vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True).clip(1e-12)
            color = sh_to_color(1, vd, sh_coeffs)
            opac = jax.nn.sigmoid(raw_op)
            masks = precompute_tile_masks(proj, opac, cell=cell)
            producing = proj.visible & (masks.counts > 0)
            counts_g = jnp.where(producing, masks.counts, 0)
            depth_bits = jax.lax.bitcast_convert_type(
                jnp.maximum(proj.depth, 1e-20), jnp.uint32)
            depth_key = jnp.where(producing, depth_bits, jnp.uint32(0xFFFFFFFF))
            attrs9 = jnp.stack(
                [proj.xy[:, 0], proj.xy[:, 1], proj.conic[:, 0],
                 proj.conic[:, 1], proj.conic[:, 2], color[:, 0],
                 color[:, 1], color[:, 2], opac], axis=0)
            decode = pack_decode_rows(proj, masks, counts_g, cell=cell)
            cells_x = -(-tiles_x // cell[0])
            cells_y = -(-tiles_y // cell[1])
            raster = raster_vjp.make_pallas_pipeline(
                cells_x, cells_x * cells_y, mi, N, k_lanes=k_lanes,
                k_exp=k_exp, tiles_per_step=tiles_per_step, n_buf=n_buf,
                scan_passes=scan_passes, cell=cell)
            tile_ids = jnp.arange(cells_x * cells_y, dtype=jnp.int32)
            img_tiles, order, total, raw_total = raster(
                attrs9, decode, depth_key, tile_ids)
            return img_tiles
        return fn

    # Round-4 sweep: k_lanes is the raster batch width — the mean tile has
    # ~528 records, so k=512 batches waste ~45% of their lanes to the
    # ceil((end - base)/k) quantization (plus the 128-lane base snap-down);
    # smaller k trades that waste for more per-batch fixed cost.
    grid = [
        ("base  k512 tps8 nbuf6 scan2", 512, 8, 6, 512, 2),
        ("k_lanes256", 256, 8, 6, 512, 2),
        ("k_lanes128", 128, 8, 6, 512, 2),
        ("k_lanes256 tps16", 256, 16, 6, 512, 2),
        ("k_lanes256 nbuf8", 256, 8, 8, 512, 2),
        ("r3 base (tps4 nbuf4 scan3)", 512, 4, 4, 512, 3),
    ]
    for row in grid:
        name = row[0]
        dt = median_time(full(*row[1:]), args)
        report(name, dt)


def run_strip():
    """Single-chip evidence for the strip-local pipeline: per-device work
    must scale with the strip's record share (VERDICT r2 item 2). Runs the
    full-frame forward and one strip's forward (1/8 of the tile rows,
    strip-restricted masks, strip-sized pool) and reports the ratio; the
    `through sort` ablation bounds the common (unsharded) depth-sort term.
    """
    import math

    from brush_tpu.ops.binning import restrict_masks_parts
    from brush_tpu.ops.pallas import raster_vjp
    from brush_tpu.render import pack_decode_parts

    cp, args = build_inputs()
    w, h = IMG
    tiles_x, tiles_y = -(-w // TILE_WIDTH), -(-h // TILE_WIDTH)
    n_dev = 8
    strip_rows = tiles_y // n_dev
    tiles_per = strip_rows * tiles_x
    k_align = math.lcm(512, 512)
    pool_strip = -(-int(MAX_ISECTS * 2 / n_dev) // k_align) * k_align

    def strip_fwd(r0_tile_row):
        def fn(means, log_scales, quats, sh_coeffs, raw_op):
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
            bbox_w = jnp.clip(proj.tile_max[:, 0] - proj.tile_min[:, 0],
                              1, 1023)
            bbox_h = jnp.maximum(proj.tile_max[:, 1] - proj.tile_min[:, 1],
                                 1)
            counts_d, m_lo_d, m_hi_d, tmin_y_d, bbox_h_d = restrict_masks_parts(
                proj.tile_min[:, 1], bbox_w, bbox_h, masks.small,
                masks.mask_lo, masks.mask_hi, counts_g,
                jnp.int32(r0_tile_row), jnp.int32(r0_tile_row + strip_rows))
            decode = pack_decode_parts(
                proj.tile_min[:, 0], tmin_y_d, bbox_w, bbox_h_d, counts_d,
                masks.small.astype(jnp.uint32), m_lo_d, m_hi_d)
            depth_bits = jax.lax.bitcast_convert_type(
                jnp.maximum(proj.depth, 1e-20), jnp.uint32)
            depth_key = jnp.where(counts_d > 0, depth_bits,
                                  jnp.uint32(0xFFFFFFFF))
            attrs9 = jnp.stack(
                [proj.xy[:, 0], proj.xy[:, 1], proj.conic[:, 0],
                 proj.conic[:, 1], proj.conic[:, 2], color[:, 0],
                 color[:, 1], color[:, 2], opac], axis=0)
            raster = raster_vjp.make_pallas_pipeline(
                tiles_x, tiles_x * tiles_y, pool_strip, N,
                raster_tiles=tiles_per)
            t0 = r0_tile_row * tiles_x
            my_tiles = t0 + jnp.arange(tiles_per, dtype=jnp.int32)
            img_tiles, order, total, raw = raster(
                attrs9, decode, depth_key, my_tiles)
            return img_tiles, total, raw
        return fn

    dt_full = median_time(make_staged(cp, "raster"), args)
    report("full-frame fwd", dt_full)
    dt_sort = median_time(make_staged(cp, "sort"), args)
    report("through depth sort (common term)", dt_sort)
    for r0 in (0, tiles_y // 2 - strip_rows // 2):
        fn = jax.jit(strip_fwd(r0))
        out = fn(*args)
        total = int(out[1])
        dt = median_time(fn, args)
        share = total / 2162688
        report(f"strip rows {r0}..{r0 + strip_rows} "
               f"({share * 100:.0f}% of records)", dt)
        print(f"    projected {n_dev}-dev speedup vs full "
              f"= {dt_full / dt:.2f}x (per-device critical path = this strip)")


def run_bwd():
    cp, args = build_inputs()

    def make_fwd_bwd(**kw):
        def fwd_bwd(means, log_scales, quats, sh_coeffs, raw_op):
            def loss(m, ls, q, sh, ro):
                img, _ = render_splats(m, ls, q, sh, ro, cp, IMG,
                                       block_size=512, max_isects=MAX_ISECTS,
                                       **kw)
                return jnp.mean(jnp.abs(img[..., :3]))
            return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                means, log_scales, quats, sh_coeffs, raw_op)
        return fwd_bwd

    for name, kw in [
        ("fwd+bwd base", {}),
        ("fwd+bwd pack_grad_sort", {"pack_grad_sort": True}),
        ("fwd+bwd scan_passes2", {"scan_passes": 2}),
        ("fwd+bwd both", {"pack_grad_sort": True, "scan_passes": 2}),
    ]:
        dt = median_time(make_fwd_bwd(**kw), args)
        report(name, dt)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    {"stages": run_stages, "variants": run_variants, "bwd": run_bwd,
     "strip": run_strip}[mode]()
