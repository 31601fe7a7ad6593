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
                 scan_passes: int = 3, cell=(1, 1)):

    def kernel(starts_ref, ends_ref, tile_ids_ref, packed_hbm,
               img_ref, logt_ref, fidx_ref,
               buf, sem):
        # tiles_per_step > 1 amortizes the per-grid-step fixed cost (output
        # block switching, setup) over several tiles; each tile's work is
        # unchanged and runs sequentially within the step.
        b = pl.program_id(0)
        a_p = _pixel_basis_a(cell=cell)  # tile-independent: once per step
        for g in range(tiles_per_step):
            _run_tile(b * tiles_per_step + g, g, a_p,
                      starts_ref, ends_ref, tile_ids_ref, packed_hbm,
                      img_ref, logt_ref, fidx_ref, buf, sem)

    def _run_tile(t, g, a_p, starts_ref, ends_ref, tile_ids_ref, packed_hbm,
                  img_ref, logt_ref, fidx_ref, buf, sem):
        # Tile ranges are arbitrary (unaligned tile_bins); DMA windows snap
        # down to the lane-tiling boundary and masks cut the leading lanes.
        start = starts_ref[t]
        end = ends_ref[t]
        base = pl.multiple_of((start // LANE_ALIGN) * LANE_ALIGN, LANE_ALIGN)
        cx_t, cy_t = _tile_center(tile_ids_ref, t, tiles_x, cell=cell)

        num_batches = jnp.where(
            end > start, pl.cdiv(end - base, k_lanes), 0
        )
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, k_lanes), 1)

        def dma(slot, b):
            off = base + b * k_lanes
            return pltpu.make_async_copy(
                packed_hbm.at[:, pl.ds(off, k_lanes)],
                buf.at[slot],
                sem.at[slot],
            )

        # Kick off the first n_buf-1 copies; the loop body tops the pipe up
        # to n_buf-1 batches ahead. Per-batch compute (~0.3us of MXU work)
        # is shorter than a single HBM copy's issue+latency, so with only
        # double buffering the loop serializes on DMA latency — deeper
        # buffering amortizes it across n_buf-1 outstanding copies.
        for j in range(n_buf - 1):
            @pl.when(j < num_batches)
            def _(j=j):
                dma(j, j).start()

        def body(carry):
            b, log_t, alive, rgb_r, rgb_g, rgb_b, fidx = carry

            @pl.when(b + n_buf - 1 < num_batches)
            def _():
                dma((b + n_buf - 1) % n_buf, b + n_buf - 1).start()

            dma(b % n_buf, b).wait()
            blk = buf[b % n_buf]  # (8, K) u32
            dec = unpack_record_rows(blk)

            off = base + b * k_lanes
            isect_idx = off + lane_idx                       # (1, K)
            lane_ok = (isect_idx >= start) & (isect_idx < end)

            b_s = _splat_basis(dec, cx_t, cy_t)              # (8, K)
            sigma = jnp.dot(
                a_p, b_s, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
            )                                                # (P, K) via MXU
            vis = jnp.exp(-sigma)
            opac = dec[8]                                    # (1, K)
            alpha = jnp.minimum(ALPHA_MAX, opac * vis)
            ok = (sigma >= 0.0) & (alpha >= ALPHA_EPS) & lane_ok
            alpha = jnp.where(ok, alpha, 0.0)

            lom = jnp.log1p(-alpha)
            csum = _cumsum_lanes_mxu(lom, k_lanes, passes=scan_passes)
            log_t_after = log_t + csum
            # The early-out is STICKY (reference: rasterize.wgsl:87-90 sets
            # `done` and breaks without compositing the crossing splat). A
            # bare T-threshold would let a pixel whose crossing lane was
            # excluded "revive" in a later batch — and the backward's
            # T-reconstruction (which replays everything below final_index)
            # then diverges explosively.
            # alive rides the carry as f32 (Mosaic cannot yield i1 vectors).
            act = (alive > 0.5) & (log_t_after > LOG_T_EPS)
            t_before = jnp.exp(log_t_after - lom)
            fac = alpha * t_before * jnp.where(act, 1.0, 0.0)

            rgb_r = rgb_r + jnp.sum(fac * dec[5], axis=1, keepdims=True)
            rgb_g = rgb_g + jnp.sum(fac * dec[6], axis=1, keepdims=True)
            rgb_b = rgb_b + jnp.sum(fac * dec[7], axis=1, keepdims=True)
            log_t = log_t + jnp.sum(
                jnp.where(act, lom, 0.0), axis=1, keepdims=True
            )
            alive = jnp.where(
                log_t_after[:, k_lanes - 1 : k_lanes] > LOG_T_EPS, alive, 0.0
            )

            contributed = act & (alpha > 0.0)
            fidx = jnp.maximum(
                fidx,
                jnp.max(jnp.where(contributed, isect_idx, -1), axis=1, keepdims=True),
            )
            return (b + 1, log_t, alive, rgb_r, rgb_g, rgb_b, fidx)

        def cond(carry):
            b, alive = carry[0], carry[2]
            return (b < num_batches) & (jnp.max(alive) > 0.5)

        p = TILE_SIZE * cell[0] * cell[1]
        init = (
            jnp.zeros((), jnp.int32),
            jnp.zeros((p, 1), jnp.float32),
            jnp.ones((p, 1), jnp.float32),
            jnp.zeros((p, 1), jnp.float32),
            jnp.zeros((p, 1), jnp.float32),
            jnp.zeros((p, 1), jnp.float32),
            jnp.full((p, 1), -1, jnp.int32),
        )
        b_final, log_t, _alive, rgb_r, rgb_g, rgb_b, fidx = jax.lax.while_loop(
            cond, body, init
        )

        # If the early-out fired, up to n_buf-1 prefetched copies (batches
        # b_final .. started-1, started = min(b_final + n_buf - 1,
        # num_batches)) are still in flight; consume them so the next grid
        # step's semaphore accounting stays correct.
        started = jnp.minimum(b_final + n_buf - 1, num_batches)
        for j in range(n_buf - 1):
            @pl.when((b_final >= 1) & (b_final + j < started))
            def _(j=j):
                dma((b_final + j) % n_buf, b_final + j).wait()

        alpha_out = 1.0 - jnp.exp(log_t)
        img_ref[g] = jnp.concatenate([rgb_r, rgb_g, rgb_b, alpha_out], axis=1)
        logt_ref[g] = log_t
        fidx_ref[g] = fidx

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "num_tiles", "max_isects", "k_lanes",
                     "interpret", "tiles_per_step", "n_buf", "scan_passes",
                     "cell"),
)
def rasterize_fwd_pallas(
    packed, starts, ends, tile_ids,
    tiles_x: int, num_tiles: int, max_isects: int, k_lanes: int = 512,
    interpret: bool = False, tiles_per_step: int = 8, n_buf: int = 6,
    scan_passes: int = 2, cell=(1, 1),
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
                          n_buf=n_buf, scan_passes=scan_passes, cell=cell)
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
