"""Pallas TPU segment-sum kernel: per-record gradient rows -> per-splat sums.

The reference reduces per-intersection gradients with global float atomics
(rasterize_backwards.wgsl:47-135: subgroup sums + workgroup queues + CAS
loops). TPU has no atomics, and an XLA scatter-add costs ~100ns per index
at pool scale — so the reduction is restructured around the same insight as
the expansion kernel (ops/pallas/expand.py), run in reverse:

once gradient records are ordered by expansion slot, records of one splat
are contiguous (slots are segment-ordered by construction), so a block of K
records touches a contiguous window of <= K+1 splats, and the per-splat sums
are ONE one-hot matmul on the MXU: partial[w] = sum_k grads[:, k] *
(offs[w] <= slot_k < offs[w+1]) — ownership derived in-kernel from the
splat-offset column exactly as in the expand kernel (round 3 carried a
scatter+cumsum-built slot->splat array instead; see expand.py docstring).
Blocks accumulate into an aliased output buffer; the grid is sequential and
writes are synchronous, so boundary splats shared between adjacent blocks
read-modify-write without races.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from brush_tpu.ops.pallas.expand import WINDOW_ALIGN

SEG_ROWS = 16  # grad rows carried (9 used; padded for lane tiling)


def _make_segsum_kernel(k_seg: int, window: int, num_blocks: int,
                        n_buf: int = 4):
    def kernel(s_lo_ref, total_ref, grads_hbm, offs_hbm, out_in_hbm,
               out_hbm,
               gbuf, cbuf, obuf, sem, osem):
        b = pl.program_id(0)
        total = total_ref[0]
        slot0 = b * k_seg

        # Input loads ride an n_buf-deep pipe; only the output
        # read-modify-write chain stays synchronous (adjacent blocks'
        # windows overlap, so each block's accumulate must see the
        # previous block's write).
        def in_dma(slot, blk):
            s = pl.multiple_of(s_lo_ref[blk], WINDOW_ALIGN)
            return (
                pltpu.make_async_copy(
                    grads_hbm.at[:, pl.ds(blk * k_seg, k_seg)],
                    gbuf.at[slot], sem.at[slot, 0],
                ),
                # Lane-major offsets row, window + one lane tile (the upper
                # bounds come from a static 1-lane shift in-kernel; HBM
                # lane slices must sit on 128-lane boundaries).
                pltpu.make_async_copy(
                    offs_hbm.at[:, pl.ds(s, window + WINDOW_ALIGN)],
                    cbuf.at[slot], sem.at[slot, 1],
                ),
            )

        @pl.when(b == 0)
        def _():
            # Static prime indices clamped into the grid (trace-time slice
            # validation); the guard ensures clamped copies are unused.
            for j in range(n_buf - 1):
                @pl.when(j * k_seg < total)
                def _(j=j):
                    for c in in_dma(j, min(j, num_blocks - 1)):
                        c.start()

        @pl.when(slot0 < total)
        def _():
            @pl.when(slot0 + (n_buf - 1) * k_seg < total)
            def _():
                for c in in_dma((b + n_buf - 1) % n_buf, b + n_buf - 1):
                    c.start()

            s_al = pl.multiple_of(s_lo_ref[b], WINDOW_ALIGN)
            oin = pltpu.make_async_copy(
                out_hbm.at[:, pl.ds(s_al, window)], obuf, sem.at[0, 2]
            )
            oin.start()
            for c in in_dma(b % n_buf, b):
                c.wait()

            # Transposed one-hot (slots on sublanes, window splats on
            # lanes) from the offsets row — see expand.py. The contraction
            # becomes a standard A @ B matmul on the lane/sublane pair.
            ext = cbuf[b % n_buf]                             # (1, W + 128)
            off_lo = ext[:, :window]                          # (1, W)
            off_hi = jax.lax.slice(ext, (0, 1), (1, window + 1))
            slots_col = slot0 + jax.lax.broadcasted_iota(
                jnp.int32, (k_seg, 1), 0
            )                                                 # (K, 1)
            live = slots_col < total                          # (K, 1)
            oh = ((off_lo <= slots_col) & (slots_col < off_hi)
                  & live).astype(jnp.bfloat16)                # (K, W), exact

            # 3 bf16 passes instead of HIGHEST's 6: the one-hot is exact in
            # bf16; the gradient rows split into three bf16 components whose
            # per-component f32-accumulated sums add to the same result as a
            # direct f32 reduction (up to reassociation).
            g = gbuf[b % n_buf]
            g_hi = g.astype(jnp.bfloat16)
            r1 = g - g_hi.astype(jnp.float32)
            g_mid = r1.astype(jnp.bfloat16)
            g_lo = (r1 - g_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            partial = (
                jax.lax.dot_general(g_hi, oh, dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(g_mid, oh, dn,
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(g_lo, oh, dn,
                                      preferred_element_type=jnp.float32)
            )                                                 # (16, W)

            oin.wait()
            obuf[:, :] = obuf[:, :] + partial
            out = pltpu.make_async_copy(
                obuf, out_hbm.at[:, pl.ds(s_al, window)], osem
            )
            out.start()
            out.wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_pad", "max_isects", "k_seg", "interpret", "n_buf"),
)
def segment_sum_pallas(
    grads, offs_col, s_lo, total,
    n_pad: int, max_isects: int, k_seg: int = 512, interpret: bool = False,
    n_buf: int = 4,
):
    """Sum slot-ordered gradient rows per splat.

    grads: (SEG_ROWS, max_isects) f32, slot order (zeroed beyond `total`).
    offs_col: (1, n_pad + 128) i32 — lane-major exclusive slot-offset per
      compact splat (see expand_pallas; the same array serves both kernels).
    s_lo: (num_blocks,) i32 aligned window starts (k_seg blocks).
    Returns (SEG_ROWS, n_pad) per-compact-splat sums.
    """
    assert max_isects % k_seg == 0
    window = k_seg + 2 * WINDOW_ALIGN
    assert n_pad % WINDOW_ALIGN == 0 and n_pad >= window
    num_blocks = max_isects // k_seg
    assert s_lo.shape == (num_blocks,)
    assert grads.shape == (SEG_ROWS, max_isects)
    assert offs_col.shape == (1, n_pad + WINDOW_ALIGN)
    assert offs_col.dtype == jnp.int32

    kernel = _make_segsum_kernel(k_seg, window, num_blocks, n_buf=n_buf)
    zeros = jnp.zeros((SEG_ROWS, n_pad), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((n_buf, SEG_ROWS, k_seg), jnp.float32),
            pltpu.VMEM((n_buf, 1, window + WINDOW_ALIGN), jnp.int32),
            pltpu.VMEM((SEG_ROWS, window), jnp.float32),
            pltpu.SemaphoreType.DMA((n_buf, 3)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((SEG_ROWS, n_pad), jnp.float32)],
        input_output_aliases={4: 0},  # indices include the scalar-prefetch args
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(s_lo, total, grads, offs_col, zeros)
    return out
