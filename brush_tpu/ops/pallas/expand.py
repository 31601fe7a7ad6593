"""Pallas TPU expansion kernel: splat rows -> per-intersection records.

Replaces the reference's MapGaussiansToIntersect kernel
(map_gaussian_to_intersects.wgsl) — and, on the TPU side, the XLA
gather-based slot machinery of ops/binning.py — with a design built around
what the hardware is good at:

- slot -> splat "gather" runs on the **MXU as a one-hot matmul**. Expansion
  slots are segment-ordered (each splat owns a contiguous slot range in
  depth order), so a block of K consecutive slots only touches a contiguous
  window of <= K+1 splats: the kernel DMAs that window and selects each
  slot's splat row with a (W, K) one-hot product. XLA's gather costs ~20ns
  *per index* on TPU; the matmul moves the same data at MXU throughput.
- exactness via ONE bf16 matmul over pre-split component rows: every
  per-splat quantity is decomposed host-side (in XLA, once per frame) into
  bf16-exact components — three 8-bit-mantissa pieces per f32, two byte
  pieces per u16 field, three bytes for the 24-bit slot offset — and the
  components are STACKED AS ROWS of a single (48, W) bf16 operand. One
  (48, W) @ (W, K) product replaces round 2's three full-precision passes
  over 24 f32 rows: half the MXU tile-work, one matmul issue, and the
  hi/mid/lo splitting moves out of the kernel's critical path (windows
  overlap ~1.5x, so in-kernel splitting also duplicated work).
- the one-hot comes from TWO compares against the splat OFFSET column:
  oh[w, k] = offsets[w] <= slot_k < offsets[w+1] (the same exclusive-scan
  segment trick the reference reads in map_gaussian_to_intersects.wgsl:33-47).
  Round 3 instead built a (1, max_isects) slot->splat array in XLA with one
  N-index scatter-add + a pool-scale cumsum — measured at several ms of the
  forward (~20 ns/index scatters); deriving ownership in-kernel from the
  (W, 1) offset windows costs two vector compares per block and kills that
  whole XLA stage. The slot's compact splat id (record row 7, the
  backward's re-sort key) comes out of the SAME one-hot matmul via three
  static iota-split component rows (rows 40-42).
- the rank -> tile decode (select the rank-th set bit of the splat's exact
  coverage bitmask, ops/binning.py pretest) runs on (1, K) lane vectors —
  a few hundred VPU ops per block. Byte popcounts are computed in-kernel
  from the mask halves (round 2 carried them through the depth sort as a
  packed payload row; deriving them here shaves a pool-scale sort row).
- output is the tile-id sort key plus the splat's raster attributes PACKED
  into the 8-row u32 record layout (see rasterize_fwd.py), ready to ride
  one stable XLA variadic sort — 7 attribute rows instead of round 2's 9,
  and no slot payload: records leave this kernel in slot (= depth) order,
  so a stable tile-only sort preserves depth order within each tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from brush_tpu.ops.pallas.rasterize_fwd import PACK_ROWS

COMP_ROWS = 48     # 46 used component rows, padded to the bf16 sublane tile
WINDOW_ALIGN = 128  # lane alignment for the splat-window DMAs
# Offsets past the live splats decode to this sentinel (> any slot id; the
# pipeline asserts max_isects < 2^24, so every live slot compares below it).
OFFSET_SENTINEL = 0xFFFFFF


def window_for(k_exp: int) -> int:
    """Splat-window width for a k_exp-slot block: aligned start (<= 127
    slack) + at most k_exp owning splats (counts >= 1 in the compact
    prefix). The upper offset bounds ride the comps stack as PRE-SHIFTED
    components (rows 43-45), so no +1 lane headroom is needed."""
    return k_exp + WINDOW_ALIGN


def _split_f32(v):
    """f32 -> three bf16 components summing exactly back to v."""
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return [hi, mid, lo]


def _split_u16(v):
    """u16-valued uint32 -> two byte components (exact in bf16)."""
    b = lambda x: x.astype(jnp.float32).astype(jnp.bfloat16)
    return [b(v >> 8), b(v & jnp.uint32(0xFF))]


def _split_u24(v):
    """u24-valued int -> three byte components (exact in bf16)."""
    v = v.astype(jnp.uint32)
    b = lambda x: x.astype(jnp.float32).astype(jnp.bfloat16)
    return [b(v >> 16), b((v >> 8) & jnp.uint32(0xFF)), b(v & jnp.uint32(0xFF))]


def build_comp_rows(x, y, cxx, cxy, cyy, colop0, colop1,
                    tmin_x, tmin_y, bws, m_lo, m_hi, offsets, n_pad: int,
                    cum=None):
    """(COMP_ROWS, n_pad) bf16 component stack for the expand matmul.

    Inputs are (n,) arrays in depth-compact order: f32 x/y/conic, packed u32
    color pairs (quantize_color/quantize_opac halves), u32 tile-decode
    fields (bws = bbox_w | small << 10), u32 mask halves, i32 slot offsets.
    Rows 40-42 carry the compact splat INDEX (a static iota, u24-split), so
    the one-hot matmul also delivers each slot's splat id — record row 7.
    Rows 43-45 carry `cum` (the INCLUSIVE count cumsum = each splat's upper
    slot bound, i.e. the next splat's offset): the kernel reconstructs both
    one-hot compare bounds from the comps window itself, which drops the
    separate per-block offsets DMA — the DMA ISSUE cost, two copies per
    block, measured as the kernel's largest bucket (profile_r5, 2026-08-20).
    Offsets/cum past the live splats pad with OFFSET_SENTINEL (own nothing);
    all other rows pad with zeros. `cum` defaults to offsets shifted by one
    position when omitted (callers that predate the fused-bounds layout).
    """
    m16 = jnp.uint32(0xFFFF)
    n = x.shape[0]
    if cum is None:
        cum = jnp.concatenate([
            offsets[1:], jnp.full((1,), OFFSET_SENTINEL, offsets.dtype)
        ])
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    sent = jnp.full((n_pad - n,), OFFSET_SENTINEL, jnp.int32)
    offsets_p = jnp.concatenate([offsets.astype(jnp.int32), sent])
    cum_p = jnp.concatenate([cum.astype(jnp.int32), sent])
    rows = (
        _split_f32(x) + _split_f32(y)
        + _split_f32(cxx) + _split_f32(cxy) + _split_f32(cyy)
        + _split_u16(colop0 & m16) + _split_u16(colop0 >> 16)
        + _split_u16(colop1 & m16) + _split_u16(colop1 >> 16)
        + _split_u16(tmin_x) + _split_u16(tmin_y) + _split_u16(bws)
        + _split_u16(m_lo & m16) + _split_u16(m_lo >> 16)
        + _split_u16(m_hi & m16) + _split_u16(m_hi >> 16)
    )
    assert len(rows) == 37
    comps = jnp.stack(rows, axis=0)
    comps = jnp.pad(comps, ((0, 0), (0, n_pad - n)))
    comps = jnp.concatenate([
        comps,
        jnp.stack(_split_u24(offsets_p), axis=0),
        jnp.stack(_split_u24(idx), axis=0),
        jnp.stack(_split_u24(cum_p), axis=0),
    ], axis=0)
    comps = jnp.pad(comps, ((0, COMP_ROWS - 46), (0, 0)))
    return comps


def _c3(o, i):
    """f32 value from 3 split components."""
    return o[i:i + 1] + o[i + 1:i + 2] + o[i + 2:i + 3]


def _c2(o, i):
    """Integer-valued f32 from 2 byte components."""
    return o[i:i + 1] * 256.0 + o[i + 1:i + 2]


def _c2i(o, i):
    return _c2(o, i).astype(jnp.int32)


def _popcount8(b):
    c = jnp.zeros_like(b)
    for k in range(8):
        c = c + ((b >> k) & 1)
    return c


def _select_bit_lanes(m0, m1, m2, m3, rank):
    """Rank-th set bit of the 64-bit mask given as four 16-bit halves.

    All operands are (1, K) int32 lane vectors; mirrors
    ops/binning._select_bit. Byte popcounts are derived here (SWAR on
    lanes) instead of riding the depth sort as a packed payload row.
    """
    halves = [m0, m1, m2, m3]
    acc = jnp.zeros_like(rank)
    sel_byte = jnp.zeros_like(rank)
    r_in = rank
    byts = []
    for j in range(8):
        bj = (halves[j // 2] >> (8 * (j % 2))) & 255
        byts.append(bj)
        cj = _popcount8(bj)
        take = (rank >= acc) & (rank < acc + cj)
        sel_byte = jnp.where(take, j, sel_byte)
        r_in = jnp.where(take, rank - acc, r_in)
        acc = acc + cj
    byte = byts[0]
    for j in range(1, 8):
        byte = jnp.where(sel_byte == j, byts[j], byte)

    cum = jnp.zeros_like(rank)
    pos_in = jnp.zeros_like(rank)
    for b in range(8):
        bit = (byte >> b) & 1
        take = (bit == 1) & (cum == r_in)
        pos_in = jnp.where(take, b, pos_in)
        cum = cum + bit
    return sel_byte * 8 + pos_in


def _floor_div_lanes(a_int, b_int):
    """Exact floor(a/b) for small non-negative ints on the float VPU."""
    y = jnp.floor(a_int.astype(jnp.float32) / b_int.astype(jnp.float32))
    y = y.astype(jnp.int32)
    r = a_int - y * b_int
    y = jnp.where(r < 0, y - 1, y)
    r = a_int - y * b_int
    y = jnp.where(r >= b_int, y + 1, y)
    return y


def _make_expand_kernel(tiles_x: int, num_tiles: int,
                        n: int, k_exp: int, window: int, num_blocks: int,
                        n_buf: int = 4, ablate=()):
    """ablate: PROFILING-ONLY feature cuts (scripts/profile_r5.py);
    outputs are wrong under any of them.
      "decode"  skip the rank->tile bit-select/floor-div chain (tile := rank)
      "matmul"  skip the one-hot MXU gather (fields read from the raw
                window at a bogus alignment)
    """
    def kernel(s_lo_ref, total_ref, comps_hbm,
               key_ref, out_ref,
               abuf, sem,
               ):
        b = pl.program_id(0)
        total = total_ref[0]
        slot0 = b * k_exp
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, k_exp), 1)
        slots = slot0 + lane                                   # (1, K) i32

        def dma(slot_idx, blk):
            s = pl.multiple_of(s_lo_ref[blk], WINDOW_ALIGN)
            # ONE copy per block: the one-hot compare bounds ride the comps
            # stack as pre-split u24 components (rows 37-39 lower / 43-45
            # upper), so the round-3/4 second per-block offsets DMA — and
            # its issue cost, the kernel's largest measured bucket — is
            # gone.
            return pltpu.make_async_copy(
                comps_hbm.at[:, pl.ds(s, window)],
                abuf.at[slot_idx], sem.at[slot_idx],
            )

        # Prime the first n_buf-1 live blocks' windows on the first step;
        # each live step then tops the pipe up n_buf-1 ahead — the window
        # DMA is longer than the block's compute, so double buffering
        # alone left the loop latency-bound.
        @pl.when(b == 0)
        def _():
            # Static prime indices are clamped into the grid: the slice
            # bounds are validated at trace time even under pl.when, and
            # the guard (j*k_exp < total <= num_blocks*k_exp) ensures a
            # clamped copy is never consumed.
            for j in range(n_buf - 1):
                @pl.when(j * k_exp < total)
                def _(j=j):
                    dma(j, min(j, num_blocks - 1)).start()

        live = slot0 < total

        @pl.when(live)
        def _():
            # Prefetch the (b + n_buf - 1)-th block's windows if live (a
            # live target block always exists in the grid: total <=
            # max_isects = num_blocks * k_exp).
            @pl.when(slot0 + (n_buf - 1) * k_exp < total)
            def _():
                dma((b + n_buf - 1) % n_buf, b + n_buf - 1).start()

            dma(b % n_buf, b).wait()
            comps_w = abuf[b % n_buf]                          # (48, W) bf16

            # One-hot slot->splat selector from TWO compares against the
            # offset bounds: window splat w owns slot k iff
            # offs[w] <= k < cum[w]. Producing splats are the dense
            # depth-order prefix, so ranges partition [0, total) — exactly
            # one 1 per live slot; exact in bf16, so ONE matmul over the
            # pre-split component rows reconstructs every field exactly
            # (including the splat id from the iota rows 40-42). Built
            # TRANSPOSED — slots on sublanes, window splats on lanes — so
            # the matmul contracts on the lane dim (A @ B^T), which the
            # MXU takes directly. Both bounds are reconstructed from the
            # window's own u24 component rows in f32 (exact: the pipeline
            # asserts max_isects < 2^24, and pad lanes carry
            # OFFSET_SENTINEL so they own nothing).
            f32 = lambda r: comps_w[r:r + 1].astype(jnp.float32)
            off_lo = (f32(37) * 65536.0 + f32(38) * 256.0
                      + f32(39)).astype(jnp.int32)             # (1, W)
            off_hi = (f32(43) * 65536.0 + f32(44) * 256.0
                      + f32(45)).astype(jnp.int32)             # (1, W)
            slots_col = slot0 + jax.lax.broadcasted_iota(
                jnp.int32, (k_exp, 1), 0
            )                                         # (K, 1)
            oht = ((off_lo <= slots_col)
                   & (slots_col < off_hi)).astype(jnp.bfloat16)   # (K, W)
            if "matmul" in ablate:
                out = comps_w[:, :k_exp].astype(jnp.float32)
            else:
                dn = (((1,), (1,)), ((), ()))
                out = jax.lax.dot_general(
                    comps_w, oht, dn, preferred_element_type=jnp.float32
                )                                              # (48, K) f32

            # Per-slot decode on (1, K) lane vectors.
            valid = slots < total
            offs = (out[37:38] * 65536.0 + out[38:39] * 256.0
                    + out[39:40]).astype(jnp.int32)
            rank = slots - offs
            m0 = _c2i(out, 29)
            m1 = _c2i(out, 31)
            m2 = _c2i(out, 33)
            m3 = _c2i(out, 35)
            bws = _c2i(out, 27)
            small = bws >= 1024
            # max(1): dead slots (possible only past `total`) own no
            # window splat — the last live splat's upper bound is its own
            # cum — so their one-hot column is all zero and every decoded
            # field reads 0; max(1) keeps the float floor-div off 0/0, and
            # the `valid` (slot < total) mask zeroes the emitted key/splat
            # id regardless.
            w_i = jnp.maximum(bws & 1023, 1)
            # Small splats: mask bits live on the fixed 8x8 layout (static
            # shift/mask decode). Bbox splats: rank is row-major over the
            # bbox width (dynamic floor-div).
            if "decode" in ablate:
                tile = rank
            else:
                pos = _select_bit_lanes(m0, m1, m2, m3, rank)
                dy_b = _floor_div_lanes(rank, w_i)
                dy = jnp.where(small, pos >> 3, dy_b)
                dx = jnp.where(small, pos & 7, rank - dy_b * w_i)
                tile = (
                    (_c2i(out, 25) + dy) * tiles_x + _c2i(out, 23) + dx
                )
            key_ref[0:1] = jnp.where(valid, tile, num_tiles).astype(jnp.uint32)

            # Packed record rows (see rasterize_fwd.PACK_ROWS layout).
            bc = lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32)
            # f32 -> u32 must route through i32: Mosaic has no fptoui, and
            # the values are u16-range so the i32 hop is exact.
            u = lambda v: v.astype(jnp.int32).astype(jnp.uint32)
            colop0 = u(_c2(out, 15)) | (u(_c2(out, 17)) << 16)
            colop1 = u(_c2(out, 19)) | (u(_c2(out, 21)) << 16)
            sid = (out[40:41] * 65536.0 + out[41:42] * 256.0
                   + out[42:43]).astype(jnp.int32)
            splat = jnp.where(valid, sid, n).astype(jnp.uint32)
            out_ref[:, :] = jnp.concatenate(
                [bc(_c3(out, 0)), bc(_c3(out, 3)), bc(_c3(out, 6)),
                 bc(_c3(out, 9)), bc(_c3(out, 12)),
                 colop0, colop1, splat],
                axis=0,
            )

        @pl.when(jnp.logical_not(live))
        def _():
            # Entire block past the end: sentinel keys sort to the back,
            # records carry the dropped splat id n.
            key_ref[0:1] = jnp.full((1, k_exp), num_tiles, jnp.uint32)
            out_ref[:, :] = jnp.concatenate(
                [
                    jnp.zeros((PACK_ROWS - 1, k_exp), jnp.uint32),
                    jnp.full((1, k_exp), n, jnp.uint32),
                ],
                axis=0,
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "tiles_x", "num_tiles", "n", "max_isects", "k_exp", "interpret",
        "n_buf", "ablate",
    ),
)
def expand_pallas(
    comps, s_lo, total,
    tiles_x: int, num_tiles: int, n: int, max_isects: int,
    k_exp: int = 512, interpret: bool = False, n_buf: int = 4, ablate=(),
):
    """Expand depth-ordered splat rows into per-slot (key, record) arrays.

    comps: (COMP_ROWS, n_pad) bf16 — see build_comp_rows. Slot ownership is
      derived in-kernel from the offset-bound component rows (37-39 lower,
      43-45 upper) of the window itself; round 3's (1, max_isects)
      slot->splat array and round 4's separate per-block offsets DMA are
      both gone.
    s_lo: (num_blocks,) i32 — WINDOW_ALIGN-aligned splat-window start per
      slot block (the block's first slot's owning splat, rounded down;
      searchsorted(cum, block_starts) in raster_vjp).
    total: (1,) i32 — number of live slots.

    Returns (keys (max_isects,) uint32 tile ids,
             records (PACK_ROWS, max_isects) uint32 in slot order).
    """
    assert max_isects % k_exp == 0
    assert max_isects < (1 << 24), "offset sentinel must exceed any slot id"
    window = window_for(k_exp)
    assert comps.shape[0] == COMP_ROWS and comps.dtype == jnp.bfloat16
    assert comps.shape[1] >= window and comps.shape[1] % WINDOW_ALIGN == 0
    num_blocks = max_isects // k_exp
    assert s_lo.shape == (num_blocks,)

    kernel = _make_expand_kernel(tiles_x, num_tiles, n, k_exp, window,
                                 num_blocks, n_buf=n_buf,
                                 ablate=tuple(ablate))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, k_exp), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PACK_ROWS, k_exp), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_buf, COMP_ROWS, window), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    keys, recs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, max_isects), jnp.uint32),
            jax.ShapeDtypeStruct((PACK_ROWS, max_isects), jnp.uint32),
        ],
        interpret=interpret,
    )(s_lo, total, comps)
    return keys[0], recs
