"""Pallas TPU forward rasterizer.

One grid step per image tile (the reference launches one workgroup per tile,
rasterize.wgsl:20-26). Differences born from the hardware:

- The per-pixel scalar loop over splats becomes dense (P=256 pixels x
  K splats) vector blocks; transmittance is a log-space prefix scan along
  the splat (lane) axis (see ops/compositing.py for the derivation).
- The gaussian quadratic form is evaluated on the MXU via a rank-6
  factorization: sigma[p,s] = A(p) @ B(s) with
    A(p) = [px^2, py^2, px*py, px, py, 1]
    B(s) = [cx/2, cz/2, cy, -(cx*x + cy*y), -(cy*x + cz*y),
            (cx*x^2 + cz*y^2)/2 + cy*x*y]
  instead of ~10 VPU ops per (pixel, splat) pair.
- Splat data arrives pre-gathered into intersection order as a PACKED
  (8, MAX_ISECTS) uint32 array — half the DMA bytes of a naive 9-row f32
  layout and 2 fewer rows through every pool-scale sort:
    rows 0-4: x, y, cxx, cxy, cyy as bitcast float32 (full precision)
    row  5:   color r | g as two u16 fixed-point halves
    row  6:   color b | opacity as two u16 fixed-point halves
    row  7:   compact splat id (the backward's re-sort key)
  Color quantizes over [COLOR_LO, COLOR_HI] (step ~1.2e-4, ~8x finer than
  a display step); opacity over [0, 1] (step 1.5e-5). Both are far inside
  the golden-test tolerances; xy/conic stay exact f32 because position
  quantization (even 1/32 px) measurably flips alpha thresholds.
  The shared-memory staging of rasterize.wgsl:57-71 becomes double-buffered
  HBM->VMEM copies.
- The transmittance early-out (rasterize.wgsl:88) becomes a per-tile batch
  loop that stops when every pixel's T is below threshold.

Outputs per tile: RGBA (packed as rows), log T, and the final contributing
intersection index per pixel (rasterize.wgsl:112 final_index) for the
backward kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from brush_tpu.constants import ALPHA_EPS, ALPHA_MAX, TILE_SIZE, TILE_WIDTH, TRANSMITTANCE_EPS

LOG_T_EPS = math.log(TRANSMITTANCE_EPS)
PACK_ROWS = 8   # see module docstring: 5 bitcast-f32 + 2 packed u16 pairs + id
LANE_ALIGN = 128  # HBM DMA windows snap down to this lane boundary

COLOR_LO = -4.0
COLOR_HI = 4.0
COLOR_SCALE = 65535.0 / (COLOR_HI - COLOR_LO)
OPAC_SCALE = 65535.0


def quantize_color(c):
    """f32 color -> u16-valued u32 (XLA side)."""
    q = jnp.round((jnp.clip(c, COLOR_LO, COLOR_HI) - COLOR_LO) * COLOR_SCALE)
    return q.astype(jnp.uint32)


def quantize_opac(o):
    q = jnp.round(jnp.clip(o, 0.0, 1.0) * OPAC_SCALE)
    return q.astype(jnp.uint32)


def _u16f(q):
    """u16-valued uint32 -> exact f32 (works in XLA and in-kernel).

    Routes through i32: Mosaic has no uitofp, and the value fits i32
    exactly (<= 65535), so the hop changes nothing numerically.
    """
    return q.astype(jnp.int32).astype(jnp.float32)


def decode_color(q):
    return _u16f(q) * (1.0 / COLOR_SCALE) + COLOR_LO


def decode_opac(q):
    return _u16f(q) * (1.0 / OPAC_SCALE)


def pack_record_rows(xy0, xy1, cxx, cxy, cyy, qr, qg, qb, qo, splat_id):
    """Assemble the 8 packed u32 rows from components (same-shape arrays).

    xy/conic are f32 (bitcast); q* are u16-valued u32 from quantize_*;
    splat_id is u32.
    """
    bc = lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32)
    return [
        bc(xy0), bc(xy1), bc(cxx), bc(cxy), bc(cyy),
        qr | (qg << 16), qb | (qo << 16), splat_id,
    ]


def unpack_record_rows(blk):
    """(8, K) u32 block -> 9 decoded (1, K) f32 rows (x, y, conic, rgb, o)."""
    f = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)
    m16 = jnp.uint32(0xFFFF)
    return (
        f(blk[0:1]), f(blk[1:2]), f(blk[2:3]), f(blk[3:4]), f(blk[4:5]),
        decode_color(blk[5:6] & m16), decode_color(blk[5:6] >> 16),
        decode_color(blk[6:7] & m16), decode_opac(blk[6:7] >> 16),
    )


def pack_isect_splats(xy, conic, color, opac, isect_gid, max_isects: int,
                      k_lanes: int = 512):
    """Gather per-splat data into intersection order, packed
    (8, MAX_ISECTS + K) uint32.

    One XLA gather outside the kernel so in-kernel loads are contiguous. The
    extra K lanes let a batch window that starts near the pool end read (and
    in backward, write) a full K without bounds clamping — clamping would
    make adjacent tiles' write windows overlap.
    """
    n = xy.shape[0]
    rows = jnp.stack(
        pack_record_rows(
            xy[:, 0], xy[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
            quantize_color(color[:, 0]), quantize_color(color[:, 1]),
            quantize_color(color[:, 2]), quantize_opac(opac),
            jnp.arange(n, dtype=jnp.uint32),
        ),
        axis=1,
    )  # (N, 8) — row-major so the pool gather moves whole contiguous rows
    packed = rows[isect_gid].T  # (8, MAX_ISECTS)
    return jnp.pad(packed, ((0, PACK_ROWS - 8), (0, k_lanes)))



def _cumsum_lanes(x, k_lanes: int):
    """Inclusive prefix sum along the lane axis.

    Pallas TPU has no cumsum lowering; this is the standard log-step scan:
    log2(K) shifted adds, shifting along lanes with zero fill via roll+mask.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    shift = 1
    while shift < k_lanes:
        rolled = pltpu.roll(x, shift, axis=x.ndim - 1)
        x = x + jnp.where(lane >= shift, rolled, 0.0)
        shift *= 2
    return x


SCAN_BLOCK = 128  # matches the MXU tile width


def _cumsum_lanes_mxu(x, k_lanes: int, passes: int = 3):
    """Inclusive prefix sum along lanes via block-triangular MXU matmuls.

    The log-step roll scan costs ~3*log2(K) VPU ops per element — it
    dominates the rasterizer's per-batch time at K=512 (27 vreg-ops/elem).
    Prefix sums are matmuls: y_block = x_block @ U with U upper-triangular
    ones, plus a scalar carry chain across the K/128 blocks. That is
    128 MACs/element on the MXU — ~2 orders of magnitude more raw ops but
    on a unit with ~50x the throughput and, critically, off the VPU's
    critical path.

    Exactness: U's entries are 0/1 (exact in bf16); x is split into
    `passes` bf16 components summing back to the f32 value (8 mantissa bits
    each; 3 passes reconstruct all 24, 2 passes 16), so each product is
    exact and only the f32 accumulation order (plus, at passes=2, a
    <= 2^-16 relative input truncation — all log1p terms share a sign, so
    no cancellation amplifies it) differs from a VPU scan.
    """
    if k_lanes % SCAN_BLOCK:
        return _cumsum_lanes(x, k_lanes)
    nb = k_lanes // SCAN_BLOCK
    row = jax.lax.broadcasted_iota(jnp.int32, (SCAN_BLOCK, SCAN_BLOCK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SCAN_BLOCK, SCAN_BLOCK), 1)
    u = (row <= col).astype(jnp.bfloat16)

    def block_scan(xb):
        rem = xb
        comps = []
        for _ in range(passes):
            c = rem.astype(jnp.bfloat16)
            rem = rem - c.astype(jnp.float32)
            comps.append(c)
        y = jnp.dot(comps[0], u, preferred_element_type=jnp.float32)
        for c in comps[1:]:
            y = y + jnp.dot(c, u, preferred_element_type=jnp.float32)
        return y

    parts = []
    carry = None
    for b in range(nb):
        yb = block_scan(x[:, b * SCAN_BLOCK:(b + 1) * SCAN_BLOCK])
        if carry is not None:
            yb = yb + carry
        carry = yb[:, SCAN_BLOCK - 1:SCAN_BLOCK]
        parts.append(yb)
    return jnp.concatenate(parts, axis=-1)


def _pixel_basis_a(cell=(1, 1)):
    """A(p): (P, 8) pixel polynomial basis, in cell-local coords.

    Coordinates are relative to the cell center: |px|,|py| <= 8*g. Keeping
    the basis small bounds the cancellation error of the expanded quadratic
    form (absolute pixel coords would put px^2 ~ 1e6 against sigma ~ 1 in
    f32). The splat basis is shifted into the same frame per batch.

    TILE-INDEPENDENT (cell-local coords): compute ONCE per grid step, not
    per tile — the per-tile part is only the cell center (_tile_center).

    cell=(gw, gh): the grid step covers a raster cell of gw x gh tiles
    (P = 256*gw*gh pixels).
    """
    gw, gh = cell
    cw_px = TILE_WIDTH * gw
    p = TILE_SIZE * gw * gh
    half_x = cw_px / 2.0
    half_y = (TILE_WIDTH * gh) / 2.0
    k = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (k % cw_px).astype(jnp.float32) + 0.5 - half_x
    py = (k // cw_px).astype(jnp.float32) + 0.5 - half_y
    one = jnp.ones_like(px)
    # (P, 8): [px^2, py^2, px*py, px, py, 1, 0, 0]
    return jnp.concatenate(
        [px * px, py * py, px * py, px, py, one, 0.0 * one, 0.0 * one], axis=1
    )


def _tile_center(tile_ids_ref, t, tiles_x: int, cell=(1, 1)):
    """Cell-center pixel coordinates of tile/cell `t` (scalar pair)."""
    gw, gh = cell
    cw_px = TILE_WIDTH * gw
    ch_px = TILE_WIDTH * gh
    tid = tile_ids_ref[t]
    tx = (tid % tiles_x).astype(jnp.float32)
    ty = (tid // tiles_x).astype(jnp.float32)
    cx_t = tx * cw_px + cw_px / 2.0
    cy_t = ty * ch_px + ch_px / 2.0
    return cx_t, cy_t


def _splat_basis(dec, center_x, center_y):
    """B(s): (8, K) splat quadratic coefficients from decoded record rows.

    dec: the 9-tuple from unpack_record_rows. Splat centers are shifted into
    the tile-local frame (see _pixel_basis_a / _tile_center).
    """
    x = dec[0] - center_x
    y = dec[1] - center_y
    cx = dec[2]
    cy = dec[3]
    cz = dec[4]
    b0 = 0.5 * cx
    b1 = 0.5 * cz
    b2 = cy
    b3 = -(cx * x + cy * y)
    b4 = -(cy * x + cz * y)
    b5 = 0.5 * (cx * x * x + cz * y * y) + cy * x * y
    zero = jnp.zeros_like(b0)
    return jnp.concatenate([b0, b1, b2, b3, b4, b5, zero, zero], axis=0)


def _make_kernel(tiles_x: int, k_lanes: int,
                 tiles_per_step: int = 1, n_buf: int = 2,
                 scan_passes: int = 3, cell=(1, 1), ablate=()):
    """ablate: PROFILING-ONLY feature cuts, each naming a suspected cost
    (scripts/profile_r5.py); outputs are wrong under any of them.
      "fidx"  skip the final-index bookkeeping
      "scan"  no transmittance prefix scan (csum := lom)
      "trans" exp/log1p replaced by 2-op polynomials
      "rgb"   skip the color accumulation (mults + row sums)

    ONE fused while_loop per grid step over the flattened (tile, batch)
    sequence, replacing round 1-4's per-tile loops. Measured rationale
    (scripts/profile_r5.py, 2026-08-20): at the bench point tiles average
    ~1 batch, so per-TILE while_loop setup + a DMA pipeline that never gets
    deeper than the tile's own 1-2 batches left 8.06 ms of pure grid fixed
    cost (empty-frame) and ~1.6 us/batch of exposed DMA latency. The fused
    loop keeps ONE DMA pipe n_buf-1 deep ACROSS tile boundaries:

    - an issue cursor (gp, bp) walks the no-early-out batch sequence,
      skipping empty tiles; a refill inner loop (the only issue site) tops
      the pipe to n_buf-1 outstanding copies;
    - the consume path processes batch (g, b) against slot ci % n_buf —
      issue order equals consume order, so slots line up by counter;
    - a tile finishes when its range is exhausted OR every pixel's T died
      (the sticky early-out). Finishing discards the <= n_buf-1 in-flight
      copies that belong to the finished tile (bounded: the issue cursor
      jumps past the tile's unissued remainder, so zombie DMAs never
      exceed the pipe depth) and writes the tile's outputs at a dynamic
      index into the step's output block.
    """
    p = TILE_SIZE * cell[0] * cell[1]
    g_tiles = tiles_per_step

    def kernel(starts_ref, ends_ref, tile_ids_ref, packed_hbm,
               img_ref, logt_ref, fidx_ref,
               buf, sem, lt_ref, alv_ref, acc_ref, fx_ref):
        step = pl.program_id(0)
        t0 = step * g_tiles
        a_p = _pixel_basis_a(cell=cell)  # tile-independent: once per step
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, k_lanes), 1)

        def reset_state():
            lt_ref[...] = jnp.zeros((p, 1), jnp.float32)
            alv_ref[...] = jnp.ones((p, 1), jnp.float32)
            acc_ref[...] = jnp.zeros((p, 4), jnp.float32)
            fx_ref[...] = jnp.full((p, 1), -1, jnp.int32)

        reset_state()  # per-pixel state never crosses grid steps

        def rng(g):
            """start/end/base/num_batches of in-step tile g (scalars)."""
            start = starts_ref[t0 + g]
            end = ends_ref[t0 + g]
            base = pl.multiple_of(
                (start // LANE_ALIGN) * LANE_ALIGN, LANE_ALIGN
            )
            nb = jnp.where(end > start, pl.cdiv(end - base, k_lanes), 0)
            return start, end, base, nb

        def dma(slot, g, b):
            _, _, base, _ = rng(g)
            off = base + b * k_lanes
            return pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(off, k_lanes)],
                buf.at[slot],
                sem.at[slot],
            )

        def refill(ci, ni, gp, bp):
            """Top the pipe up to n_buf-1 outstanding copies (the only
            issue site; also does the initial priming on entry)."""
            def r_cond(c):
                ci, ni, gp, bp = c
                return (ni - ci < n_buf - 1) & (gp < g_tiles)

            def r_body(c):
                ci, ni, gp, bp = c
                _, _, _, nb = rng(gp)
                issue = bp < nb

                @pl.when(issue)
                def _():
                    dma(ni % n_buf, gp, bp).start()
                ni = jnp.where(issue, ni + 1, ni)
                bp = jnp.where(issue, bp + 1, 0)
                gp = jnp.where(issue, gp, gp + 1)
                return (ci, ni, gp, bp)

            return jax.lax.while_loop(r_cond, r_body, (ci, ni, gp, bp))[1:]

        def body(carry):
            # Per-pixel state (log_t / alive / rgb / fidx) lives in VMEM
            # scratch, NOT the loop carry: carried vector state forced the
            # finish-vs-process choice through lax.cond over 6 vector
            # operands, which Mosaic lowers by computing BOTH branches and
            # selecting — every tile-finish iteration paid the full
            # process-path vector chain (measured ~2.3 us/tile on empty
            # frames, flat from tps8 to tps16). With state in refs the two
            # paths are pl.when regions (real branches).
            (g, b, ci, ni, gp, bp) = carry
            start, end, base, nb = rng(g)
            fin = (b >= nb) | (jnp.max(alv_ref[...]) <= 0.5)

            @pl.when(fin)
            def _():
                # Tile g done: outputs at a dynamic in-block index.
                log_t = lt_ref[...]
                alpha_out = 1.0 - jnp.exp(log_t)
                img_ref[pl.ds(g, 1)] = jnp.concatenate(
                    [acc_ref[:, 0:1], acc_ref[:, 1:2], acc_ref[:, 2:3],
                     alpha_out], axis=1)[None]
                logt_ref[pl.ds(g, 1)] = log_t[None]
                fidx_ref[pl.ds(g, 1)] = fx_ref[...][None]
                reset_state()

            # Discard tile g's in-flight copies on early-out (issue order =
            # consume order, and the cursor walks tile-by-tile, so they are
            # a prefix of the pipe; <= n_buf-1 of them by construction).
            n_disc = jnp.where(
                fin, jnp.where(gp == g, bp, nb) - b, 0
            )

            def d_body(j):
                dma((ci + j) % n_buf, g, b + j).wait()
                return j + 1

            jax.lax.while_loop(lambda j: j < n_disc, d_body,
                               jnp.zeros((), jnp.int32))
            ci = ci + n_disc
            # Jump the issue cursor past the finished tile's remainder.
            fin_jump = fin & (gp == g)
            bp = jnp.where(fin_jump, 0, bp)
            gp = jnp.where(fin_jump, g + 1, gp)

            @pl.when(jnp.logical_not(fin))
            def _():
                dma(ci % n_buf, g, b).wait()
                blk = buf[ci % n_buf]  # (8, K) u32
                dec = unpack_record_rows(blk)

                off = base + b * k_lanes
                isect_idx = off + lane_idx                   # (1, K)
                lane_ok = (isect_idx >= start) & (isect_idx < end)
                cx_t, cy_t = _tile_center(
                    tile_ids_ref, t0 + g, tiles_x, cell=cell
                )

                b_s = _splat_basis(dec, cx_t, cy_t)          # (8, K)
                sigma = jnp.dot(
                    a_p, b_s, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST
                )                                            # (P, K) on MXU
                if "trans" in ablate:
                    vis = jnp.maximum(0.0, 1.0 - 0.5 * sigma)
                else:
                    # Clamp BEFORE exp: f32 cancellation in the projection
                    # can emit conics with det < 0 (hyperbolas), whose sigma
                    # reaches large NEGATIVE values at some pixels; raw
                    # exp(-sigma) then overflows to inf and inf * (masked 0)
                    # = NaN. `ok` requires sigma >= 0, so every contributing
                    # lane is bit-identical. The reference's scalar loop
                    # skips sigma < 0 before ever calling exp
                    # (rasterize.wgsl:80-85); this is that skip, vectorized.
                    vis = jnp.exp(-jnp.maximum(sigma, 0.0))
                opac = dec[8]                                # (1, K)
                alpha = jnp.minimum(ALPHA_MAX, opac * vis)
                ok = (sigma >= 0.0) & (alpha >= ALPHA_EPS) & lane_ok
                alpha = jnp.where(ok, alpha, 0.0)

                lom = -alpha if "trans" in ablate else jnp.log1p(-alpha)
                if "scan" in ablate:
                    csum = lom
                else:
                    csum = _cumsum_lanes_mxu(lom, k_lanes,
                                             passes=scan_passes)
                log_t = lt_ref[...]
                alive = alv_ref[...]
                log_t_after = log_t + csum
                # The early-out is STICKY (reference: rasterize.wgsl:87-90
                # sets `done` and breaks without compositing the crossing
                # splat). A bare T-threshold would let a pixel whose
                # crossing lane was excluded "revive" in a later batch —
                # and the backward's T-reconstruction (which replays
                # everything below final_index) then diverges explosively.
                # alive rides VMEM as f32 (Mosaic cannot store i1 vectors).
                act = (alive > 0.5) & (log_t_after > LOG_T_EPS)
                if "trans" in ablate:
                    t_before = 1.0 + (log_t_after - lom)
                else:
                    t_before = jnp.exp(log_t_after - lom)
                fac = alpha * t_before * jnp.where(act, 1.0, 0.0)

                if "rgb" not in ablate:
                    acc_ref[:, 0:1] += jnp.sum(fac * dec[5], axis=1,
                                               keepdims=True)
                    acc_ref[:, 1:2] += jnp.sum(fac * dec[6], axis=1,
                                               keepdims=True)
                    acc_ref[:, 2:3] += jnp.sum(fac * dec[7], axis=1,
                                               keepdims=True)
                lt_ref[...] = log_t + jnp.sum(
                    jnp.where(act, lom, 0.0), axis=1, keepdims=True
                )
                alv_ref[...] = jnp.where(
                    log_t_after[:, k_lanes - 1:k_lanes] > LOG_T_EPS,
                    alive, 0.0,
                )
                if "fidx" not in ablate:
                    contributed = act & (alpha > 0.0)
                    fx_ref[...] = jnp.maximum(
                        fx_ref[...],
                        jnp.max(jnp.where(contributed, isect_idx, -1),
                                axis=1, keepdims=True),
                    )

            ci = jnp.where(fin, ci, ci + 1)
            b = jnp.where(fin, 0, b + 1)
            g = jnp.where(fin, g + 1, g)
            ni, gp, bp = refill(ci, ni, gp, bp)
            return (g, b, ci, ni, gp, bp)

        def cond(carry):
            return carry[0] < g_tiles

        i0 = jnp.zeros((), jnp.int32)
        init_cursors = refill(i0, i0, i0, i0)
        jax.lax.while_loop(cond, body, (i0, i0, i0, *init_cursors))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "num_tiles", "max_isects", "k_lanes",
                     "interpret", "tiles_per_step", "n_buf", "scan_passes",
                     "cell", "ablate"),
)
def rasterize_fwd_pallas(
    packed, starts, ends, tile_ids,
    tiles_x: int, num_tiles: int, max_isects: int, k_lanes: int = 512,
    interpret: bool = False, tiles_per_step: int = 8, n_buf: int = 6,
    scan_passes: int = 2, cell=(1, 1), ablate=(),
):
    """Forward rasterize. Returns (img (T,P,4), log_t (T,P), final_idx (T,P)).

    packed: (8, MAX_ISECTS + K) uint32 from pack_isect_splats (or the expand
    kernel). MAX_ISECTS must be a multiple of k_lanes (pad the pool).
    tiles_per_step groups several tiles into one grid step to amortize
    per-step fixed costs.
    cell=(gw, gh): each "tile" of the grid is a raster cell of gw x gh
    image tiles (P = 256*gw*gh pixels); tiles_x/num_tiles/starts/ends/
    tile_ids are then all in the CELL domain.
    """
    assert max_isects % k_lanes == 0, "intersection pool must pad to k_lanes"
    assert packed.shape == (PACK_ROWS, max_isects + k_lanes), (
        "packed pool must be the 8-row u32 layout with one extra K window"
    )
    assert packed.dtype == jnp.uint32
    g = max(1, min(tiles_per_step, num_tiles))
    steps = -(-num_tiles // g)
    tiles_pad = steps * g
    if tiles_pad != num_tiles:
        # Padding tiles carry empty ranges; their outputs are sliced off.
        pad = tiles_pad - num_tiles
        starts = jnp.pad(starts, (0, pad))
        ends = jnp.pad(ends, (0, pad))
        tile_ids = jnp.pad(tile_ids, (0, pad))
    p = TILE_SIZE * cell[0] * cell[1]
    kernel = _make_kernel(tiles_x, k_lanes, tiles_per_step=g,
                          n_buf=n_buf, scan_passes=scan_passes, cell=cell,
                          ablate=tuple(ablate))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((g, p, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, p, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, p, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_buf, PACK_ROWS, k_lanes), jnp.uint32),
            pltpu.SemaphoreType.DMA((n_buf,)),
            # Per-pixel tile state (log_t, alive, rgb accum, final idx):
            # VMEM refs so finish/process are real pl.when branches instead
            # of a both-branches lax.cond over carried vectors.
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, 4), jnp.float32),
            pltpu.VMEM((p, 1), jnp.int32),
        ],
    )
    img, log_t, fidx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles_pad, p, 4), jnp.float32),
            jax.ShapeDtypeStruct((tiles_pad, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((tiles_pad, p, 1), jnp.int32),
        ],
        interpret=interpret,
    )(starts, ends, tile_ids, packed)
    return (img[:num_tiles], log_t[:num_tiles, :, 0],
            fidx[:num_tiles, :, 0])
