"""Custom-VJP TPU record pipeline: sort -> expand -> sort -> rasterize.

The forward runs the reference's DepthSort + MapGaussiansToIntersect +
TileSort + Rasterize chain (render.rs:151-307) built TPU-shaped, entirely
inside one custom-VJP boundary (autodiff never sees the sorts — JAX's
sort transpose would otherwise emit one scatter per payload, ~200ms at 1M
splats):

  1. one variadic stable sort on bitcast-u32 depth keys carries every
     per-splat attribute as payload (payloads dominate sort cost at
     ~2.1 ms/pool-scale array; per-attribute gathers cost ~20ns per
     index). Color+opacity are quantized to u16 halves and packed two-to-
     a-row BEFORE this sort (rasterize_fwd.quantize_*), and the per-splat
     record count is recomputed AFTER it (SWAR popcount / bbox area from
     the decode fields, render.pack_decode_rows), so the payload is
     11 rows (5 f32 xy/conic + 2 packed colop + 3 packed decode + order)
     instead of round 2's 15;
  2. expand_pallas: one-hot MXU expansion of the depth-ordered rows into
     per-intersection PACKED u32 records + tile sort keys
     (ops/pallas/expand.py) — the records leave in slot (= depth) order;
  3. a second (stable) variadic sort groups records by tile id. Stability
     preserves depth order within each tile, so no slot payload rides
     along: 8 packed rows instead of round 2's 10;
  4. rasterize_fwd_pallas over *unaligned* tile ranges (tile_bins used
     directly; DMA windows snap down to lane boundaries).

Backward:
  1. rasterize_bwd_pallas emits per-record gradient rows in tile order;
  2. a variadic sort on the carried compact splat ids (packed record row
     7) groups each splat's gradient records contiguously — and because
     compact ids are assigned in depth order, the sorted id sequence IS
     the slot->compact map splat_c, so the windowed segment-sum applies
     directly;
  3. segment_sum_pallas reduces them per splat with one-hot MXU products
     (ops/pallas/segsum.py) — replacing both the reference's global float
     atomics (rasterize_backwards.wgsl:47-135) and an XLA scatter-add
     (~100ns/index at pool scale);
  4. one small key sort inverts the depth permutation and a single row
     gather returns the per-splat cotangents to global order.

Quantization note: color rides the pipeline as u16 fixed-point over
[COLOR_LO, COLOR_HI] (step ~1.2e-4) and opacity over [0, 1] (step
1.5e-5) — far inside the golden-test tolerances vs the f32 oracle. The
backward computes gradients at the quantized values and returns them for
the unquantized inputs (straight-through; the quantizer is the identity
to within one step).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from brush_tpu.ops.pallas.expand import (
    WINDOW_ALIGN,
    build_comp_rows,
    expand_pallas,
)
from brush_tpu.ops.pallas.rasterize_bwd import GRAD_ROWS, rasterize_bwd_pallas
from brush_tpu.ops.pallas.rasterize_fwd import (
    PACK_ROWS,
    pack_isect_splats,
    quantize_color,
    quantize_opac,
    rasterize_fwd_pallas,
)
from brush_tpu.ops.pallas.segsum import SEG_ROWS, segment_sum_pallas

# Test hook (tests/test_noise_fill.py): when set, the backward gradient pool
# starts pre-filled with this sentinel instead of unspecified memory — the
# TPU analog of the reference's test-build uninit-noise defense
# (brush-kernel/src/lib.rs:134-147). A regression in the garbage-slot
# masking then corrupts gradients loudly instead of silently reading zeros.
DEBUG_GRAD_POOL_FILL: float | None = None


from brush_tpu.ops.binning import popcount_u32 as _popcount_u32


def _pack_bf16_pair(a, b):
    """Two f32 rows -> one u32 row of bf16 halves (a in the high 16 bits)."""
    bf = lambda v: jax.lax.bitcast_convert_type(
        v.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return (bf(a) << 16) | bf(b)


def _unpack_bf16_pair(u):
    """Inverse of _pack_bf16_pair: u32 row -> two f32 rows."""
    f = lambda h: jax.lax.bitcast_convert_type(
        h.astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return f(u >> 16), f(u & jnp.uint32(0xFFFF))


@functools.lru_cache(maxsize=32)
def make_pallas_pipeline(
    tiles_x: int, num_tiles: int, max_isects: int, n: int,
    k_lanes: int = 512, k_exp: int = 512, raster_tiles: int | None = None,
    interpret: bool = False, tiles_per_step: int = 8, n_buf: int = 6,
    scan_passes: int = 2, pack_grad_sort: bool = True, cell=(1, 1),
    needs_grad: bool = True, bwd_tiles_per_step: int | None = None,
):
    """Full record pipeline as one custom-VJP function.

    Returns raster(attrs9, decode, depth_key, tile_ids) ->
    (img_tiles, order, total, raw_total) where
      attrs9: (9, n) f32, GLOBAL order — x, y, cxx, cxy, cyy, r, g, b,
        opac (differentiable);
      decode: (3, n) uint32, global order — packed per-splat decode state
        (render.pack_decode_rows layout; stop-gradient);
      depth_key: (n,) uint32 — bitcast depth, 0xFFFFFFFF for non-producing;
      tile_ids: (raster_tiles,) i32 tile id per grid step — an ASCENDING
        CONTIGUOUS strip starting at tile_base = tile_ids[0] (ids >=
        num_tiles render empty tiles). When raster_tiles < num_tiles
        (tile-sharded rendering) the WHOLE pipeline is strip-local: the
        caller must pass strip-restricted decode rows and depth keys
        (ops/binning.restrict_masks_to_strip), the pool holds only this
        strip's records, and the tile sort / bins / raster / backward all
        run in the strip-local tile domain — per-device work is
        proportional to the strip's record share, not the frame's.
    order/total are integer side outputs (depth permutation, live records
    clamped to the pool); raw_total is the unclamped exact-hit count, so
    raw_total - total is the number of records silently dropped by the
    static pool (observability; VERDICT r1 weak #6).

    needs_grad=False builds the inference-only variant: the depth sort
    drops the `order` payload (12 -> 11 arrays) and the tile sort drops
    record row 7, the compact splat id (9 -> 8 arrays) — both exist only
    for the backward. Image bits are identical (same stable sorts on the
    same keys, same kernels); `order` returns as zeros, and taking a
    gradient raises.

    cell=(gw, gh): the pipeline's whole "tile" domain becomes raster CELLS
    of gw x gh image tiles — tiles_x/num_tiles/raster_tiles/tile_ids and
    the decode rows are all in cell units, records are per (splat, cell),
    and the raster kernels sweep 256*gw*gh pixels per cell. Bigger cells
    shrink every pool-scale stage by the multi-tile-coverage factor
    (measured 1.56x at 2x2 on the bench scene) at the cost of evaluating
    each record over the cell's full pixel block.
    """
    raster_tiles = num_tiles if raster_tiles is None else raster_tiles
    # Packed decode rows carry a 10-bit tile x, an 11-bit tile y and a
    # 10-bit bbox width (render.pack_decode_rows); tmin_x/bbox_w <= tiles_x
    # must fit 10 bits and tile_min y must fit its 11-bit field or the
    # packed coordinate would silently wrap and corrupt decode state.
    assert tiles_x <= 1023, "image too wide for packed decode rows"
    assert num_tiles <= tiles_x * 2047, "image too tall for packed decode rows"
    assert max_isects <= 1 << 24, "slot offsets ride the expand matmul as u24"
    # The raster kernels' scoped-VMEM stack scales with p x k_lanes (the
    # per-batch (pixels, lanes) sigma/log-alpha/scan intermediates). The
    # largest footprint proven on hardware is p=256 x k_lanes=1024 (~9 MB
    # of the 16 MB scoped limit; 2x2 cells at k_lanes=512 hit 18.1 MB and
    # failed to compile 2026-08-18). Clamp k_lanes so bigger cells trade
    # batch width for pixel width instead of overflowing VMEM.
    p_cell = 256 * cell[0] * cell[1]
    budget = max(128, (256 * 1024) // p_cell)
    budget = 1 << (budget.bit_length() - 1)  # power of two: pool stays % 0
    k_lanes = min(k_lanes, budget)
    # tiles_per_step unrolls the per-cell body, so its (p, k) intermediates
    # stack additively per unrolled cell; it was fwd-neutral at 1x1
    # (docs/PERFORMANCE.md round-2 table), so shrink it with cell area
    # rather than overflow the stack.
    tiles_per_step = max(1, (tiles_per_step * 256) // p_cell)
    assert max_isects % k_exp == 0 and max_isects % k_lanes == 0

    # numpy, not jnp: this closure is lru-cached across traces, and a jnp
    # constant created under one jit trace would leak into the next.
    # Binning runs in the STRIP-LOCAL tile domain [0, raster_tiles).
    boundaries = np.arange(raster_tiles + 1, dtype=np.uint32)

    window = k_exp + 2 * WINDOW_ALIGN
    n_pad = -(-n // WINDOW_ALIGN) * WINDOW_ALIGN + window

    def _fwd_impl(attrs9, decode, depth_key, tile_ids):
        # Quantize color+opacity into two packed u32 rows BEFORE the depth
        # sort — 2 payload rows instead of 4 (see module docstring).
        colop0 = (quantize_color(attrs9[5])
                  | (quantize_color(attrs9[6]) << 16))
        colop1 = (quantize_color(attrs9[7])
                  | (quantize_opac(attrs9[8]) << 16))

        # --- depth sort, everything as payload (DepthSort) ---
        # decode is 3 packed u32 rows (see render.pack_decode_rows): the
        # sort moves 12 arrays; counts are RECOMPUTED from the sorted
        # fields below (a dozen fused VPU ops per splat is far cheaper
        # than carrying one more pool-scale payload row). Inference mode
        # (needs_grad=False) drops the `order` payload — it exists only so
        # the backward can invert the permutation.
        payload = (
            depth_key,
            attrs9[0], attrs9[1], attrs9[2], attrs9[3], attrs9[4],
            colop0, colop1,
            decode[0], decode[1], decode[2],
        )
        if needs_grad:
            payload = payload + (jnp.arange(n, dtype=jnp.int32),)
        ops = jax.lax.sort(payload, num_keys=1, is_stable=True)
        order = ops[11] if needs_grad else jnp.zeros((n,), jnp.int32)
        d0, m_lo, m_hi = ops[8], ops[9], ops[10]
        small_c = (d0 >> 10) & jnp.uint32(1)
        bbox_w_c = d0 >> 22
        # Small splats: SWAR popcount of the mask halves. Bbox splats: m_lo
        # holds the clipped bbox height (the stash in pack_decode_parts).
        # Both rows are zeroed for non-producing splats, so counts vanish
        # exactly where the depth key is the sentinel.
        counts_c = jnp.where(
            small_c == 1,
            (_popcount_u32(m_lo) + _popcount_u32(m_hi)).astype(jnp.uint32),
            bbox_w_c * m_lo,
        ).astype(jnp.int32)
        # Overflow-safe offsets: the exact i32 cumsum only matters for
        # splats whose records can land in the pool; a pathological frame
        # (millions of splats with huge bboxes) can push the raw record
        # sum past 2^31, wrapping cum negative — total would go negative
        # (empty frame) while num_dropped = max(raw-total, 0) reads 0, the
        # exact silence the counter exists to prevent. An f32 shadow
        # cumsum (error << the 4x-pool margin) marks splats whose offsets
        # are safely past the pool; their counts are zeroed for the exact
        # cumsum, which is then bounded by ~4*max_isects + one bbox
        # (< 2^31 given the u24 pool assert). raw_total is clamped f32 —
        # observability-exact until 2^24 records, approximate-huge beyond.
        cum_f = jnp.cumsum(counts_c.astype(jnp.float32))
        beyond = cum_f - counts_c.astype(jnp.float32) > 4.0 * max_isects
        counts_i = jnp.where(beyond, 0, counts_c)
        cum = jnp.cumsum(counts_i)
        offsets = cum - counts_i
        raw_total = jnp.minimum(cum_f[-1], 2**31 - 1024).astype(jnp.int32)
        total = jnp.minimum(cum[-1:], max_isects).astype(jnp.int32)

        # bf16-component stack for the expand kernel's one-hot matmul:
        # bws packs small (bit 10) above the 10-bit bbox width.
        bws = bbox_w_c | (small_c << 10)
        # cum rides the comps stack as the one-hot upper bounds (rows
        # 43-45): cum[i] = offsets[i+1] for live splats, and the last live
        # splat's bound is its own cum — so the expand kernel needs ONE
        # window DMA per block instead of round 4's comps + offsets pair
        # (the per-block DMA issue cost measured as its largest bucket).
        comps = build_comp_rows(
            ops[1], ops[2], ops[3], ops[4], ops[5], ops[6], ops[7],
            d0 & jnp.uint32(0x3FF), (d0 >> 11) & jnp.uint32(0x7FF), bws,
            m_lo, m_hi, offsets, n_pad, cum=cum,
        )

        # Slot ownership for the segsum kernel: the exclusive offset
        # column (padded past n with a big sentinel so pad rows own
        # nothing) and per-block window starts from ONE small searchsorted
        # (the block's first slot's owning splat). Round 3 built a
        # (1, max_isects) slot->splat array with an N-index scatter-add +
        # pool-scale cumsum instead — measured at ~7 ms of the forward;
        # the kernels derive ownership from offset windows in two vector
        # compares (see expand.py docstring; the expand kernel reads the
        # bounds from its own comps window, segsum still takes this row).
        offs_col = jnp.concatenate([
            offsets.astype(jnp.int32),
            jnp.full((n_pad + WINDOW_ALIGN - n,), 1 << 30, jnp.int32),
        ])[None, :]
        starts_blk = jnp.arange(max_isects // k_exp, dtype=jnp.int32) * k_exp
        w0 = jnp.searchsorted(cum, starts_blk, side="right").astype(jnp.int32)
        s_lo = jnp.clip((w0 // WINDOW_ALIGN) * WINDOW_ALIGN, 0,
                        n_pad - window)

        # --- expansion (MapGaussiansToIntersect) ---
        keys, recs = expand_pallas(
            comps, s_lo, total,
            tiles_x=tiles_x, num_tiles=num_tiles,
            n=n, max_isects=max_isects, k_exp=k_exp, interpret=interpret,
        )

        # --- tile grouping (TileSort + GetTileBinEdges) ---
        # Map global tile keys into the strip-local domain. Keys outside
        # the strip (only possible if the caller's strip restriction and
        # tile_ids disagree) and expand's sentinel both become the local
        # sentinel raster_tiles and sort to the back.
        tile_base = tile_ids[0]
        keys_i = keys.astype(jnp.int32) - tile_base
        keys_l = jnp.where(
            (keys_i >= 0) & (keys_i < raster_tiles),
            keys_i, raster_tiles,
        ).astype(jnp.uint32)
        # Stable tile-only sort: records arrive in slot (= depth) order, so
        # stability gives depth order within each tile for free. Inference
        # drops record row 7 (the compact splat id — the backward's
        # re-sort key) from the sort and re-pads it with zeros for the
        # kernel's static row layout.
        n_rows = PACK_ROWS if needs_grad else PACK_ROWS - 1
        sops = jax.lax.sort(
            (keys_l,) + tuple(recs[i] for i in range(n_rows)),
            num_keys=1, is_stable=True,
        )
        skeys = sops[0]
        packed = jnp.stack(sops[1:1 + n_rows], axis=0)
        if not needs_grad:
            packed = jnp.concatenate(
                [packed, jnp.zeros((1, max_isects), jnp.uint32)], axis=0
            )
        packed = jnp.pad(packed, ((0, 0), (0, k_lanes)))

        tile_bins = jnp.searchsorted(skeys, jnp.asarray(boundaries))
        tile_bins = tile_bins.astype(jnp.int32)
        # Grid tiles past num_tiles (strip padding) get empty ranges.
        tid_l = jnp.clip(tile_ids - tile_base, 0, raster_tiles - 1)
        starts = tile_bins[tid_l]
        ends = jnp.where(tile_ids < num_tiles, tile_bins[tid_l + 1],
                         tile_bins[tid_l])

        # --- rasterize (Rasterize) ---
        img, log_t, fidx = rasterize_fwd_pallas(
            packed, starts, ends, tile_ids,
            tiles_x=tiles_x, num_tiles=raster_tiles, max_isects=max_isects,
            k_lanes=k_lanes, interpret=interpret,
            tiles_per_step=tiles_per_step, n_buf=n_buf,
            scan_passes=scan_passes, cell=cell,
        )
        res = (packed, starts, ends, tile_ids, log_t, fidx,
               offs_col, s_lo, total, order)
        return img, order, total[0], raw_total, res

    @jax.custom_vjp
    def raster(attrs9, decode, depth_key, tile_ids):
        img, order, total, raw_total, _ = _fwd_impl(
            attrs9, decode, depth_key, tile_ids
        )
        return img, order, total, raw_total

    def raster_fwd(attrs9, decode, depth_key, tile_ids):
        img, order, total, raw_total, res = _fwd_impl(
            attrs9, decode, depth_key, tile_ids
        )
        return (img, order, total, raw_total), res

    def raster_bwd(res, g):
        (packed, starts, ends, tile_ids, log_t, fidx,
         offs_col, s_lo, total, order) = res
        g_img = g[0]
        grads_init = None
        if DEBUG_GRAD_POOL_FILL is not None:
            from brush_tpu.ops.pallas.rasterize_bwd import ZERO_MULT

            grads_init = jnp.full(
                (GRAD_ROWS, max_isects + ZERO_MULT * k_lanes),
                DEBUG_GRAD_POOL_FILL, jnp.float32,
            )
        grads = rasterize_bwd_pallas(
            packed, g_img, log_t, fidx, starts, ends, tile_ids,
            tiles_x=tiles_x, num_tiles=raster_tiles, max_isects=max_isects,
            k_lanes=k_lanes, interpret=interpret, grads_init=grads_init,
            # The backward's VMEM stack (gbuf/zbuf/mbuf output ring) scales
            # with both knobs; tps=4/n_buf=4 are its measured-best settings
            # (round-2 table) while the fwd wants 8/6 (round-3 iso sweep).
            # bwd_tiles_per_step overrides the clamp for measurement.
            tiles_per_step=(bwd_tiles_per_step if bwd_tiles_per_step
                            else min(tiles_per_step, 4)),
            n_buf=min(n_buf, 4),
            scan_passes=scan_passes, cell=cell,
        )  # (16, max_isects + k_lanes), tile order
        # The pool is strip-local (every valid record belongs to this
        # strip), so no strip masking is needed: slots past `total` carry
        # sentinel splat ids and are zeroed by the live mask below.

        # --- group by splat: sort on the carried compact splat id (packed
        # row 7). Compact ids are assigned in depth order, so the sorted id
        # sequence equals splat_c and the windowed segment-sum applies
        # directly; invalid records carry id n and sort past `total`. ---
        if pack_grad_sort:
            # Payload-byte lever (sorts cost ~2 ms per pool-scale array):
            # ride the conic and color cotangents as bf16 pairs — 6 payload
            # rows instead of 9. v_xy stays exact f32 (densification
            # thresholds accumulate xy-grad norms) and so does v_opac; the
            # bf16 rounding (2^-9 relative per record) lands only on
            # conic/color grads, which the per-splat sum averages out.
            p2 = _pack_bf16_pair(grads[2, :max_isects], grads[3, :max_isects])
            p3 = _pack_bf16_pair(grads[4, :max_isects], grads[5, :max_isects])
            p4 = _pack_bf16_pair(grads[6, :max_isects], grads[7, :max_isects])
            gops = jax.lax.sort(
                (packed[PACK_ROWS - 1, :max_isects],
                 grads[0, :max_isects], grads[1, :max_isects],
                 p2, p3, p4, grads[8, :max_isects]),
                num_keys=1,
            )
            r2, r3 = _unpack_bf16_pair(gops[3])
            r4, r5 = _unpack_bf16_pair(gops[4])
            r6, r7 = _unpack_bf16_pair(gops[5])
            sorted_rows = (gops[1], gops[2], r2, r3, r4, r5, r6, r7, gops[6])
        else:
            gops = jax.lax.sort(
                (packed[PACK_ROWS - 1, :max_isects],)
                + tuple(grads[i, :max_isects] for i in range(9)),
                num_keys=1,
            )
            sorted_rows = gops[1:10]
        live = jax.lax.broadcasted_iota(
            jnp.int32, (1, max_isects), 1
        ) < total[0]
        grads_slot = jnp.where(
            live, jnp.stack(sorted_rows, axis=0), 0.0
        )
        grads_slot = jnp.concatenate(
            [grads_slot,
             jnp.zeros((SEG_ROWS - 9, max_isects), jnp.float32)], axis=0
        )

        # --- per-splat reduction on the MXU ---
        per_splat = segment_sum_pallas(
            grads_slot, offs_col, s_lo, total,
            n_pad=n_pad, max_isects=max_isects, k_seg=k_exp,
            interpret=interpret,
        )  # (16, n_pad), compact order

        # --- compact -> global: ONE sort keyed on the depth permutation
        # carrying the 9 cotangent rows. Sorting by `order` (a permutation)
        # IS the inverse permutation applied to the payloads — round 2 paid
        # a separate inversion key-sort plus an N-scale row gather
        # (~20 ns/index) for the same result. ---
        gops2 = jax.lax.sort(
            (order,) + tuple(per_splat[i, :n] for i in range(9)),
            num_keys=1,
        )
        acc = jnp.stack(gops2[1:10], axis=0)
        return (acc, None, None, None)

    if not needs_grad:
        # Inference-only pipeline: same kernels and sort keys (bit-identical
        # image), minus the two payload rows that exist solely for the
        # backward. The custom_vjp's bwd raises so an accidental grad fails
        # loudly instead of autodiffing through the sorts and kernels.
        @jax.custom_vjp
        def raster_infer(attrs9, decode, depth_key, tile_ids):
            img, order, total, raw_total, _ = _fwd_impl(
                attrs9, decode, depth_key, tile_ids
            )
            return img, order, total, raw_total

        def infer_fwd(attrs9, decode, depth_key, tile_ids):
            return raster_infer(attrs9, decode, depth_key, tile_ids), None

        def infer_bwd(res, g):
            raise ValueError(
                "make_pallas_pipeline(needs_grad=False) is inference-only; "
                "build the pipeline with needs_grad=True to differentiate"
            )

        raster_infer.defvjp(infer_fwd, infer_bwd)
        return raster_infer

    raster.defvjp(raster_fwd, raster_bwd)
    return raster


@functools.lru_cache(maxsize=32)
def make_pallas_rasterizer(
    tiles_x: int, num_tiles: int, max_isects: int, k_lanes: int,
    interpret: bool = False,
):
    """Aligned-records rasterizer (same call signature as
    ops.rasterize_tiled.make_rasterizer). Exercises the raster kernels on
    externally-binned aligned records — today only tests use it (the
    sharded train step builds make_pallas_pipeline, train_step.py:116)."""

    def _fwd_impl(xy, conic, color, opac, isect_gid, starts, ends, tile_ids):
        packed = pack_isect_splats(xy, conic, color, opac, isect_gid,
                                   max_isects, k_lanes)
        img, log_t, fidx = rasterize_fwd_pallas(
            packed, starts, ends, tile_ids,
            tiles_x=tiles_x, num_tiles=num_tiles, max_isects=max_isects,
            k_lanes=k_lanes, interpret=interpret,
        )
        return packed, img, log_t, fidx

    @jax.custom_vjp
    def raster(xy, conic, color, opac, isect_gid, starts, ends, tile_ids):
        _, img, _, _ = _fwd_impl(
            xy, conic, color, opac, isect_gid, starts, ends, tile_ids
        )
        return img

    def raster_fwd(xy, conic, color, opac, isect_gid, starts, ends, tile_ids):
        packed, img, log_t, fidx = _fwd_impl(
            xy, conic, color, opac, isect_gid, starts, ends, tile_ids
        )
        n = xy.shape[0]
        res = (packed, isect_gid, starts, ends, tile_ids, log_t, fidx, n)
        return img, res

    def raster_bwd(res, g):
        packed, isect_gid, starts, ends, tile_ids, log_t, fidx, n = res
        grads = rasterize_bwd_pallas(
            packed, g, log_t, fidx, starts, ends, tile_ids,
            tiles_x=tiles_x, num_tiles=num_tiles, max_isects=max_isects,
            k_lanes=k_lanes, interpret=interpret,
        )  # (16, max_isects + slack)

        # Alignment-padding and overflow slots carry splat id n (see
        # ops/binning.py) and the slack lanes are padded with n too:
        # unwritten-garbage records land in the scratch row n and are
        # sliced off. ONE fused row scatter-add — scatters cost per index,
        # so four separate ones would cost 4x.
        recs = grads[:9].T  # (max_isects + slack, 9)
        gid = jnp.pad(isect_gid, (0, grads.shape[1] - max_isects),
                      constant_values=n)
        acc = jnp.zeros((n + 1, 9), jnp.float32).at[gid].add(recs)[:n]
        return (
            acc[:, 0:2], acc[:, 2:5], acc[:, 5:8], acc[:, 8],
            None, None, None, None,
        )

    raster.defvjp(raster_fwd, raster_bwd)
    return raster
