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
  *per index* on TPU; the matmul moves the same data at MXU throughput,
  and HIGHEST (bf16x6) precision reproduces f32 rows bit-exactly (one-hot
  rows have a single 1, so no cross-term accumulates).
- the one-hot comes from ONE compare: sublane iota vs the slot's compact
  splat id (a monotone (1, max_isects) i32 array built in XLA with one
  scatter-add + cumsum, the same segment trick the reference gets from its
  exclusive-scan offsets in map_gaussian_to_intersects.wgsl:33-47).
- the rank -> tile decode (select the rank-th set bit of the splat's exact
  coverage bitmask, ops/binning.py pretest) runs on (1, K) lane vectors —
  a few hundred VPU ops per block.
- output is the sort key (tile_id << slot_bits | slot) plus the splat's
  raster attributes as rows, ready to ride through one XLA variadic
  sort_key_val — carrying payloads through the sort costs ~3x a key-only
  sort while a post-sort row gather costs ~30x.

Input rows (EXP_IN_ROWS, n_pad) f32, in depth-compact order (integers stored
as exact f32 values — everything is < 2^24):

  0-8   x, y, cxx, cxy, cyy, r, g, b, opac   (raster attributes)
  9-11  tmin_x, tmin_y, bbox_w
  12-15 mask bits 0-15, 16-31, 32-47, 48-63  (16-bit halves)
  16-17 byte-popcount nibbles 0-3, 4-7
  18    small flag (1 = bitmask authoritative, 0 = conservative bbox)
  19    slot offset (exclusive cumsum of counts)
  20    compact splat id (gid)
  21-23 padding
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EXP_IN_ROWS = 24
EXP_OUT_ROWS = 16  # 0-8 attrs, 9 gid, 10-15 zero padding
WINDOW_ALIGN = 128  # lane alignment for the splat-window DMAs


def _select_bit_lanes(m0, m1, m2, m3, pc_lo, pc_hi, rank):
    """Rank-th set bit of the 64-bit mask given as four 16-bit halves.

    All operands are (1, K) int32 lane vectors; mirrors
    ops/binning._select_bit but on 16-bit mask pieces (they arrive through
    the one-hot matmul, which keeps values < 2^16 exact).
    """
    acc = jnp.zeros_like(rank)
    sel_byte = jnp.zeros_like(rank)
    r_in = rank
    for j in range(8):
        src = pc_lo if j < 4 else pc_hi
        cj = (src >> (4 * (j % 4))) & 15
        take = (rank >= acc) & (rank < acc + cj)
        sel_byte = jnp.where(take, j, sel_byte)
        r_in = jnp.where(take, rank - acc, r_in)
        acc = acc + cj
    half = jnp.where(
        sel_byte < 2, m0, jnp.where(sel_byte < 4, m1, jnp.where(sel_byte < 6, m2, m3))
    )
    byte = (half >> (8 * (sel_byte & 1))) & 255

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


def _make_expand_kernel(tiles_x: int, num_tiles: int, slot_bits: int,
                        n: int, k_exp: int, window: int):
    n_buf = 2

    def kernel(s_lo_ref, total_ref, attrs_hbm, splat_hbm,
               key_ref, out_ref,
               abuf, sbuf, sem,
               ):
        b = pl.program_id(0)
        total = total_ref[0]
        slot0 = b * k_exp
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, k_exp), 1)
        slots = slot0 + lane                                   # (1, K) i32

        def dma(slot_idx, blk):
            s = pl.multiple_of(s_lo_ref[blk], WINDOW_ALIGN)
            return (
                pltpu.make_async_copy(
                    attrs_hbm.at[:, pl.ds(s, window)],
                    abuf.at[slot_idx], sem.at[slot_idx, 0],
                ),
                pltpu.make_async_copy(
                    splat_hbm.at[:, pl.ds(blk * k_exp, k_exp)],
                    sbuf.at[slot_idx], sem.at[slot_idx, 1],
                ),
            )

        @pl.when((b == 0) & (total > 0))
        def _():
            for c in dma(0, 0):
                c.start()

        live = slot0 < total

        @pl.when(live)
        def _():
            # Prefetch the next live block's windows.
            @pl.when(slot0 + k_exp < total)
            def _():
                for c in dma((b + 1) % n_buf, b + 1):
                    c.start()

            for c in dma(b % n_buf, b):
                c.wait()
            attrs_w = abuf[b % n_buf]                          # (24, W)
            s_al = pl.multiple_of(s_lo_ref[b], WINDOW_ALIGN)
            local = sbuf[b % n_buf] - s_al                     # (1, K) i32

            # One-hot slot->splat selector from ONE compare: window sublane
            # iota vs the slot's window-local compact splat id.
            sub = jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0)
            oh = (sub == local).astype(jnp.bfloat16)           # (W, K), exact

            # Exact f32 gather in 3 bf16 passes (instead of HIGHEST's 6):
            # the one-hot is exact in bf16, and the attr rows split into
            # three bf16 components that sum exactly to the f32 value. Each
            # product selects a single component, so no cross-term ever
            # accumulates and the sum reconstructs the f32 row bit-exactly.
            a_hi = attrs_w.astype(jnp.bfloat16)
            r1 = attrs_w - a_hi.astype(jnp.float32)
            a_mid = r1.astype(jnp.bfloat16)
            a_lo = (r1 - a_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            out = (
                jax.lax.dot_general(a_hi, oh, dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(a_mid, oh, dn,
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(a_lo, oh, dn,
                                      preferred_element_type=jnp.float32)
            )                                                  # (24, K)

            # Per-slot decode on (1, K) lane vectors.
            valid = slots < total
            rank = slots - out[19:20].astype(jnp.int32)
            m0 = out[12:13].astype(jnp.int32)
            m1 = out[13:14].astype(jnp.int32)
            m2 = out[14:15].astype(jnp.int32)
            m3 = out[15:16].astype(jnp.int32)
            pc_lo = out[16:17].astype(jnp.int32)
            pc_hi = out[17:18].astype(jnp.int32)
            small = out[18:19] > 0.5
            pos = jnp.where(
                small, _select_bit_lanes(m0, m1, m2, m3, pc_lo, pc_hi, rank),
                rank,
            )
            w_i = out[11:12].astype(jnp.int32)
            dy = _floor_div_lanes(pos, w_i)
            dx = pos - dy * w_i
            tile = (
                (out[10:11].astype(jnp.int32) + dy) * tiles_x
                + out[9:10].astype(jnp.int32) + dx
            )
            key = jnp.where(valid, tile, num_tiles).astype(jnp.uint32)
            if slot_bits > 0:
                key = (key << slot_bits) | slots.astype(jnp.uint32)
            key_ref[0:1] = key

            gid = jnp.where(valid, out[20:21], float(n))
            zeros = jnp.zeros((EXP_OUT_ROWS - 10, k_exp), jnp.float32)
            out_ref[:, :] = jnp.concatenate([out[0:9], gid, zeros], axis=0)

        @pl.when(jnp.logical_not(live))
        def _():
            # Entire block past the end: sentinel keys sort to the back,
            # records scatter to the dropped splat id n.
            if slot_bits > 0:
                sentinel = (
                    (jnp.uint32(num_tiles) << slot_bits)
                    | slots.astype(jnp.uint32)
                )
            else:
                sentinel = jnp.full((1, k_exp), num_tiles, jnp.uint32)
            key_ref[0:1] = sentinel
            out_ref[:, :] = jnp.concatenate(
                [
                    jnp.zeros((9, k_exp), jnp.float32),
                    jnp.full((1, k_exp), float(n), jnp.float32),
                    jnp.zeros((EXP_OUT_ROWS - 10, k_exp), jnp.float32),
                ],
                axis=0,
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "tiles_x", "num_tiles", "slot_bits", "n", "max_isects", "k_exp",
        "interpret",
    ),
)
def expand_pallas(
    attrs_t, splat_c, s_lo, total,
    tiles_x: int, num_tiles: int, slot_bits: int, n: int, max_isects: int,
    k_exp: int = 512, interpret: bool = False,
):
    """Expand depth-ordered splat rows into per-slot (key, record) arrays.

    attrs_t: (EXP_IN_ROWS, n_pad) f32 — see module docstring.
    splat_c: (1, max_isects) i32 — compact splat id per slot (monotone).
    s_lo: (num_blocks,) i32 — WINDOW_ALIGN-aligned splat-window start per
      slot block (= splat_c at the block's first slot, rounded down).
    total: (1,) i32 — number of live slots.

    Returns (keys (max_isects,) uint32, records (EXP_OUT_ROWS, max_isects)).
    """
    assert max_isects % k_exp == 0
    window = k_exp + 2 * WINDOW_ALIGN
    assert attrs_t.shape[0] == EXP_IN_ROWS
    assert attrs_t.shape[1] >= window and attrs_t.shape[1] % WINDOW_ALIGN == 0
    assert splat_c.shape == (1, max_isects)
    num_blocks = max_isects // k_exp
    assert s_lo.shape == (num_blocks,)

    kernel = _make_expand_kernel(
        tiles_x, num_tiles, slot_bits, n, k_exp, window
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, k_exp), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EXP_OUT_ROWS, k_exp), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, EXP_IN_ROWS, window), jnp.float32),
            pltpu.VMEM((2, 1, k_exp), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    keys, recs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, max_isects), jnp.uint32),
            jax.ShapeDtypeStruct((EXP_OUT_ROWS, max_isects), jnp.float32),
        ],
        interpret=interpret,
    )(s_lo, total, attrs_t, splat_c)
    return keys[0], recs
