"""Pallas TPU backward rasterizer.

Mirrors rasterize_backwards.wgsl: a single back-to-front sweep per tile
reconstructing transmittance by division (rasterize_backwards.wgsl:247-248)
and the reference's v_alpha / v_sigma / v_xy / v_conic chain (:253-270),
with several tiles' sweeps fused into ONE while_loop per grid step (the
round-5 fused-loop redesign shared with rasterize_fwd — see
_make_bwd_kernel). The reference's atomic gradient machinery
(subgroup sums + workgroup queues + CAS loops, :32-135) is replaced by:

- per-splat pixel reductions as two MXU matmuls: all required moments of
  v_sigma over the pixel polynomial basis [1, px, py, px^2, py^2, px*py]
  and of fac over [v_r, v_g, v_b] come from (8, 256) @ (256, K) products;
- per-intersection gradient records DMA'd to an HBM pool, segment-summed to
  per-splat gradients outside the kernel (XLA scatter-add — sorted-order,
  race-free by construction since tile ranges are disjoint).

Output writes are asynchronous with a two-slot ring (waited two batches
later, drained at each tile's end); input copies are n_buf-deep. The
cross-tile hazard — adjacent tiles' ranges share a lane-aligned boundary
window — stays safe because every write of tile t drains before tile t+1
starts, tiles run in ascending order, and the zero-masked lanes a tile
writes beyond its own range are overwritten by the owning (later) tile.
The skipped-suffix zero-fill writes ZERO_MULT batches per copy from a wide
zero scratch; the output pool carries ZERO_MULT*k_lanes slack lanes so the
last window never clamps backward into a previous tile's finished records.

Uses the same tile-local coordinate frame and rank-6 sigma factorization as
the forward kernel (see rasterize_fwd.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from brush_tpu.constants import ALPHA_EPS, ALPHA_MAX, TILE_SIZE, TILE_WIDTH
from brush_tpu.ops.pallas.rasterize_fwd import (
    LANE_ALIGN,
    PACK_ROWS,
    _cumsum_lanes_mxu,
    _pixel_basis_a,
    _splat_basis,
    _tile_center,
    unpack_record_rows,
)

GRAD_ROWS = 16  # v_xy(2), v_conic(3), v_color(3), v_opac(1), 7 pad
ZERO_MULT = 4   # batches zero-filled per DMA from the wide zero scratch


def _make_bwd_kernel(tiles_x: int, k_lanes: int,
                     tiles_per_step: int = 1, n_buf: int = 4,
                     scan_passes: int = 3, cell=(1, 1)):
    """ONE fused while_loop per grid step over the (tile, batch) sequence
    (same redesign as rasterize_fwd, measured rationale in profile_r5 /
    docs/PERFORMANCE.md round 5): per-tile while_loops + a DMA pipe that
    reset at every tile boundary exposed loop setup and HBM latency on
    every ~1-batch tile. The backward's sequence is fully DETERMINISTIC
    (its per-tile batch count nb_eff comes from final_index, not from a
    data-dependent early-out), so unlike the forward there is no discard
    path: an issue cursor walks tiles ascending / batches DESCENDING
    (back-to-front sweep) and consume follows by counter.

    Per-tile output machinery is preserved as loop phases: the suffix
    zero-fill and ring drain run in the tile-TRANSITION iteration, batch
    processing (with the batch-0 leading-boundary merge) in the others.
    Tile t+1's zero-fill can overwrite tile t's zero-masked overhang only
    after tile t's ring writes drained — the transition order guarantees
    it, as the per-tile code did.
    """
    p = TILE_SIZE * cell[0] * cell[1]
    g_tiles = tiles_per_step

    def kernel(starts_ref, ends_ref, tile_ids_ref,
               packed_hbm, vout_ref, logt_ref, fidx_ref,
               grads_hbm,
               buf, gbuf, zbuf, mbuf, in_sem, out_sem, m_sem,
               lt_ref, sb_ref):
        step = pl.program_id(0)
        t0 = step * g_tiles
        a_p = _pixel_basis_a(cell=cell)
        px = a_p[:, 3:4]
        py = a_p[:, 4:5]
        one = a_p[:, 5:6]
        zero = jnp.zeros_like(one)
        # Pixel moment basis W: (P, 8) = [1, px, py, px^2, py^2, px*py, 0, 0].
        w_mom = jnp.concatenate(
            [one, px, py, a_p[:, 0:1], a_p[:, 1:2], a_p[:, 2:3], zero, zero],
            axis=1,
        )
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, k_lanes), 1)
        zbuf[:, :] = jnp.zeros((GRAD_ROWS, ZERO_MULT * k_lanes), jnp.float32)

        def rng(g):
            """start/end/base/num_batches/first of in-step tile g.

            `first` (the highest batch the compute sweep touches, from the
            tile's max final_index) is -1 for empty tiles.
            """
            start = starts_ref[t0 + g]
            end = ends_ref[t0 + g]
            base = pl.multiple_of(
                (start // LANE_ALIGN) * LANE_ALIGN, LANE_ALIGN
            )
            nb = jnp.where(end > start, pl.cdiv(end - base, k_lanes), 0)
            max_f = jnp.max(fidx_ref[pl.ds(g, 1)])
            nb_eff = jnp.minimum(
                nb, pl.cdiv(jnp.maximum(max_f + 1 - base, 0), k_lanes)
            )
            # Batch 0 always takes the compute path (boundary merge).
            first = jnp.where(nb > 0, jnp.maximum(nb_eff, 1) - 1, -1)
            return start, end, base, nb, first

        def dma_in(slot, g, b):
            _, _, base, _, _ = rng(g)
            off = base + b * k_lanes
            return pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(off, k_lanes)],
                buf.at[slot],
                in_sem.at[slot],
            )

        def refill(ci, ni, gp, bp):
            """Top the input pipe to n_buf-1 outstanding copies; the
            cursor walks tiles ascending, batches first..0 descending.
            bp == -1 means 'enter the next tile'."""
            def r_cond(c):
                ci, ni, gp, bp = c
                return (ni - ci < n_buf - 1) & (gp < g_tiles)

            def r_body(c):
                ci, ni, gp, bp = c
                issue = bp >= 0

                @pl.when(issue)
                def _():
                    dma_in(ni % n_buf, gp, bp).start()
                ni = jnp.where(issue, ni + 1, ni)
                gp_n = jnp.where(issue, gp, gp + 1)
                first_n = jnp.where(
                    gp_n < g_tiles,
                    rng(jnp.minimum(gp_n, g_tiles - 1))[4], -1,
                )
                bp = jnp.where(issue, bp - 1, first_n)
                return (ci, ni, gp_n, bp)

            return jax.lax.while_loop(r_cond, r_body, (ci, ni, gp, bp))[1:]

        def zero_fill(g):
            """Write the skipped suffix's zeros, ZERO_MULT batches per
            ping-ponged copy (self-draining; uses the same out_sem ring
            AFTER the previous tile's ring writes drained)."""
            start, end, base, nb, first = rng(g)
            zstart = first + 1

            @pl.when(nb > 0)
            def _():
                nz = pl.cdiv(nb - zstart, ZERO_MULT)

                def zdma(i):
                    off = base + (zstart + i * ZERO_MULT) * k_lanes
                    return pltpu.make_async_copy(
                        zbuf,
                        grads_hbm.at[:, pl.ds(off, ZERO_MULT * k_lanes)],
                        out_sem.at[i % 2],
                    )

                def zero_body(i, _):
                    @pl.when(i >= 2)
                    def _():
                        zdma(i - 2).wait()
                    zdma(i).start()
                    return 0

                jax.lax.fori_loop(0, nz, zero_body, 0)
                for j in range(2):
                    @pl.when(nz > j)
                    def _(j=j):
                        zdma(jnp.maximum(nz - 1 - j, 0)).wait()

        def drain(g):
            """Retire tile g's outstanding ring writes (batches 0 and 1)."""
            _, _, base, nb, first = rng(g)
            for j in range(2):
                @pl.when((nb > 0) & (j <= first))
                def _(j=j):
                    woff = base + j * k_lanes
                    pltpu.make_async_copy(
                        gbuf.at[(first - j) % 2],
                        grads_hbm.at[:, pl.ds(woff, k_lanes)],
                        out_sem.at[(first - j) % 2],
                    ).wait()

        def process(g, b, ci):
            start, end, base, nb, first = rng(g)
            log_t_end = lt_ref[...]
            s_behind = sb_ref[...]
            cx_t, cy_t = _tile_center(tile_ids_ref, t0 + g, tiles_x,
                                      cell=cell)
            v_out = vout_ref[pl.ds(g, 1)][0]     # (P, 4)
            v_rgb = v_out[:, 0:3]
            v_a = v_out[:, 3:4]
            t_final = jnp.exp(logt_ref[pl.ds(g, 1)][0])
            fidx = fidx_ref[pl.ds(g, 1)][0]      # (P, 1) int32

            dma_in(ci % n_buf, g, b).wait()
            blk = buf[ci % n_buf]  # (8, K) u32
            dec = unpack_record_rows(blk)

            off = base + b * k_lanes
            isect_idx = off + lane_idx
            lane_ok = (isect_idx >= start) & (isect_idx < end)

            b_s = _splat_basis(dec, cx_t, cy_t)
            sigma = jnp.dot(a_p, b_s, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            # Clamped exp (see rasterize_fwd): det<0 conics push sigma to
            # large negatives at masked pixels; raw exp overflows to inf and
            # v_sigma = -opac * inf * (v_alpha = 0) = NaN — the exact
            # poisoning that killed the 2026-08-20 castle run at step ~3026
            # (one hyperbolic splat NaN'd 3 tiles, then Adam spread it to
            # every live row within 20 steps).
            vis = jnp.exp(-jnp.maximum(sigma, 0.0))
            opac = dec[8]
            alpha = jnp.minimum(ALPHA_MAX, opac * vis)
            ok = (sigma >= 0.0) & (alpha >= ALPHA_EPS) & lane_ok
            alpha = jnp.where(ok, alpha, 0.0)

            # Same contributing set as forward (isect <= final_index).
            act = (isect_idx <= fidx) & (alpha > 0.0)
            actf = jnp.where(act, 1.0, 0.0)
            m = jnp.log1p(-alpha) * actf
            m_inc = _cumsum_lanes_mxu(m, k_lanes, passes=scan_passes)
            m_tot = m_inc[:, k_lanes - 1 : k_lanes]
            log_t_after = log_t_end - (m_tot - m_inc)
            t_before = jnp.exp(log_t_after - m)
            fac = alpha * t_before * actf

            # cw = color . v_rgb per (pixel, splat).
            cw = (
                v_rgb[:, 0:1] * dec[5]
                + v_rgb[:, 1:2] * dec[6]
                + v_rgb[:, 2:3] * dec[7]
            )
            contrib = cw * fac
            c_inc = _cumsum_lanes_mxu(contrib, k_lanes, passes=scan_passes)
            c_tot = c_inc[:, k_lanes - 1 : k_lanes]
            buffer_excl = s_behind + (c_tot - c_inc)

            ra = 1.0 / (1.0 - alpha)
            v_alpha = actf * (
                cw * t_before - buffer_excl * ra + t_final * ra * v_a
            )
            v_sigma = -opac * vis * v_alpha     # (P, K)

            # Moments of v_sigma over [1, px, py, px^2, py^2, px*py] — one
            # MXU product gives every pixel reduction the grads need.
            mom = jnp.dot(
                w_mom.T, v_sigma, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            )  # (8, K): [S0, Sx, Sy, Sxx, Syy, Sxy, 0, 0]
            s0 = mom[0:1]
            sx = mom[1:2]
            sy = mom[2:3]
            sxx = mom[3:4]
            syy = mom[4:5]
            sxy = mom[5:6]

            x = dec[0] - cx_t
            y = dec[1] - cy_t
            cxx = dec[2]
            cyy = dec[3]
            czz = dec[4]

            # delta = xy - pixel: sum_p v_sigma * dx = x*S0 - Sx, etc.
            sdx = x * s0 - sx
            sdy = y * s0 - sy
            sdxdx = x * x * s0 - 2.0 * x * sx + sxx
            sdydy = y * y * s0 - 2.0 * y * sy + syy
            sdxdy = x * y * s0 - x * sy - y * sx + sxy

            g_xy_x = cxx * sdx + cyy * sdy
            g_xy_y = cyy * sdx + czz * sdy
            g_con_a = 0.5 * sdxdx
            g_con_b = sdxdy
            g_con_c = 0.5 * sdydy

            # Moments of fac over [v_r, v_g, v_b] and the opacity-path term.
            w_col = jnp.concatenate(
                [v_rgb,
                 jnp.zeros((TILE_SIZE * cell[0] * cell[1], 8 - 3),
                           jnp.float32)], axis=1
            )
            colm = jnp.dot(w_col.T, fac, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            g_col_r = colm[0:1]
            g_col_g = colm[1:2]
            g_col_b = colm[2:3]
            g_opac = jnp.sum(vis * v_alpha * actf, axis=0, keepdims=True)

            pad = jnp.zeros((GRAD_ROWS - 9, k_lanes), jnp.float32)
            vals = jnp.concatenate(
                [g_xy_x, g_xy_y, g_con_a, g_con_b, g_con_c,
                 g_col_r, g_col_g, g_col_b, g_opac, pad],
                axis=0,
            )

            # Leading-boundary merge: the batch containing `start` (b == 0,
            # processed last in this back-to-front sweep) shares its window
            # with the previous tile's tail records, already written and
            # DRAINED before this tile began — read them back and preserve
            # lanes < start. (Trailing lanes >= end write zeros into the
            # NEXT tile's head; that tile runs later and overwrites them.)
            @pl.when(b == 0)
            def _():
                rd = pltpu.make_async_copy(
                    grads_hbm.at[:, pl.ds(off, k_lanes)], mbuf, m_sem
                )
                rd.start()
                rd.wait()

            def wdma(batch):
                woff = base + batch * k_lanes
                return pltpu.make_async_copy(
                    gbuf.at[(first - batch) % 2],
                    grads_hbm.at[:, pl.ds(woff, k_lanes)],
                    out_sem.at[(first - batch) % 2],
                )

            # Two-slot ring: before reusing this batch's slot, retire the
            # write issued two batches ago on it.
            @pl.when(first - b >= 2)
            def _():
                wdma(b + 2).wait()

            keep_prev = isect_idx < start  # only possible in batch 0
            gbuf[(first - b) % 2] = jnp.where(keep_prev, mbuf[:, :], vals)
            wdma(b).start()

            lt_ref[...] = log_t_end - m_tot
            sb_ref[...] = s_behind + c_tot

        def body(carry):
            # Per-pixel sweep state (log_t_end, s_behind) lives in VMEM
            # scratch, not the carry: a lax.cond over carried vectors made
            # Mosaic compute BOTH the transition and the full process
            # chain every iteration (see rasterize_fwd — same fix).
            (g, b, ci, ni, gp, bp) = carry
            # b < 0: tile g's sweep is complete (or g == -1 at entry) —
            # transition: retire g's ring writes, then enter tile g+1
            # (suffix zero-fill + fresh state). Ordering: the drain must
            # precede the next tile's zero-fill (shared out_sem ring) AND
            # its batch-0 boundary read-back — both guaranteed here by the
            # transition running them sequentially, exactly as the per-tile
            # code did across _run_tile calls.
            trans = b < 0

            @pl.when(trans)
            def _():
                @pl.when(g >= 0)
                def _():
                    drain(g)
                gn = g + 1

                @pl.when(gn < g_tiles)
                def _():
                    zero_fill(gn)
                gs = jnp.minimum(gn, g_tiles - 1)
                # Empty tiles enter with first = -1 and transition again
                # next iteration; past the last tile the clamped values are
                # garbage but the loop cond (g < g_tiles) exits first.
                lt_ref[...] = logt_ref[pl.ds(gs, 1)][0]      # (P, 1)
                sb_ref[...] = jnp.zeros((p, 1), jnp.float32)

            @pl.when(jnp.logical_not(trans))
            def _():
                process(g, b, ci)

            gn = g + 1
            gs = jnp.minimum(gn, g_tiles - 1)
            g = jnp.where(trans, gn, g)
            b = jnp.where(trans, rng(gs)[4], b - 1)
            ci = jnp.where(trans, ci, ci + 1)
            ni, gp, bp = refill(ci, ni, gp, bp)
            return (g, b, ci, ni, gp, bp)

        def cond(carry):
            return carry[0] < g_tiles

        i0 = jnp.zeros((), jnp.int32)
        # Prime the pipe from tile 0's deepest compute batch; refill walks
        # forward through empty tiles on its own (bp == -1 advances).
        init_cursors = refill(i0, i0, i0, rng(0)[4])
        init = (
            jnp.full((), -1, jnp.int32), jnp.full((), -1, jnp.int32), i0,
            *init_cursors,
        )
        jax.lax.while_loop(cond, body, init)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "num_tiles", "max_isects", "k_lanes",
                     "interpret", "tiles_per_step", "n_buf", "scan_passes",
                     "cell"),
)
def rasterize_bwd_pallas(
    packed, v_out_tiles, log_t, fidx, starts, ends, tile_ids,
    tiles_x: int, num_tiles: int, max_isects: int, k_lanes: int = 512,
    interpret: bool = False, grads_init=None, tiles_per_step: int = 4,
    n_buf: int = 4, scan_passes: int = 3, cell=(1, 1),
):
    """Per-intersection gradients (GRAD_ROWS, MAX_ISECTS + ZERO_MULT*K).

    Rows: v_xy(2), v_conic(3), v_color(3), v_opac(1). Slots outside all tile
    ranges are unwritten garbage — mask by slot < num_isects before use.
    The trailing ZERO_MULT*k_lanes lanes are slack for the wide zero-fill
    windows (see module docstring); callers slice [:max_isects].

    grads_init: optional initial contents of the output pool (full slacked
    shape). Tests pass sentinel noise here (the analog of the reference's
    test-build uninit-noise fill, brush-kernel/src/lib.rs:134-147) so a
    downstream masking regression reads loud garbage instead of silent
    zeros.
    """
    assert max_isects % k_lanes == 0
    assert packed.shape[1] == max_isects + k_lanes
    out_lanes = max_isects + ZERO_MULT * k_lanes
    g = max(1, min(tiles_per_step, num_tiles))
    steps = -(-num_tiles // g)
    tiles_pad = steps * g
    if tiles_pad != num_tiles:
        pad = tiles_pad - num_tiles
        starts = jnp.pad(starts, (0, pad))
        ends = jnp.pad(ends, (0, pad))
        tile_ids = jnp.pad(tile_ids, (0, pad))
        v_out_tiles = jnp.pad(v_out_tiles, ((0, pad), (0, 0), (0, 0)))
        log_t = jnp.pad(log_t, ((0, pad), (0, 0)))
        fidx = jnp.pad(fidx, ((0, pad), (0, 0)), constant_values=-1)
    kernel = _make_bwd_kernel(tiles_x, k_lanes, tiles_per_step=g,
                              n_buf=n_buf, scan_passes=scan_passes, cell=cell)
    p = TILE_SIZE * cell[0] * cell[1]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((g, p, 4), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, p, 1), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, p, 1), lambda t, *_: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [starts, ends, tile_ids,
            packed, v_out_tiles, log_t[..., None], fidx[..., None]]
    aliases = {}
    if grads_init is not None:
        # Pre-filled output pool, donated in place. The production path
        # skips this (the pool starts as whatever memory held before — the
        # design masks garbage slots downstream); tests pass sentinel noise
        # to prove that masking.
        assert grads_init.shape == (GRAD_ROWS, out_lanes)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(grads_init)
        aliases = {7: 0}  # after the 3 scalar-prefetch args

        def kernel_wrap(s, e, t, p, v, lt, fi, _gi, g, *scratch):
            return kernel(s, e, t, p, v, lt, fi, g, *scratch)
    else:
        kernel_wrap = kernel
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((n_buf, PACK_ROWS, k_lanes), jnp.uint32),
            pltpu.VMEM((2, GRAD_ROWS, k_lanes), jnp.float32),
            pltpu.VMEM((GRAD_ROWS, ZERO_MULT * k_lanes), jnp.float32),
            pltpu.VMEM((GRAD_ROWS, k_lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            # Per-pixel sweep state (log_t_end, s_behind) as refs so the
            # transition/process choice is a real branch (see kernel body).
            pltpu.VMEM((TILE_SIZE * cell[0] * cell[1], 1), jnp.float32),
            pltpu.VMEM((TILE_SIZE * cell[0] * cell[1], 1), jnp.float32),
        ],
    )
    (grads,) = pl.pallas_call(
        kernel_wrap,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((GRAD_ROWS, out_lanes), jnp.float32)
        ],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*args)
    return grads
