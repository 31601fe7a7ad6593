"""Decompose the expand-stage bucket (round-4): what do the slot-map
scatter-add, the M-cumsum, the comps build, and the expand kernel each cost?

The round-4 corrected stage ablation puts [comps build + slot map + expand
kernel] at ~12 ms — this isolates the parts with amortized timing (see
profile_r3.median_time) so the fix targets the right one. Also measures the
searchsorted(cum, block_starts) that would REPLACE the scatter+cumsum slot
map (docs/PERFORMANCE.md "slot-map scatter" lever).

Usage: python scripts/profile_expand.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_r3 import MAX_ISECTS, N, median_time, report

K_EXP = 512
NUM_BLOCKS = MAX_ISECTS // K_EXP


def main():
    rng = np.random.default_rng(0)
    # Realistic skew: ~2.1 records per producing splat, zeros interleaved.
    counts = rng.poisson(2.1, size=N).astype(np.int32)
    cum = np.cumsum(counts)
    counts = jax.device_put(jnp.asarray(counts))
    x = jax.device_put(jnp.asarray(rng.normal(size=N).astype(np.float32)))

    def slotmap(counts, x):
        cum = jnp.cumsum(counts)
        offsets = cum - counts
        scatter_idx = jnp.where(counts > 0, offsets, MAX_ISECTS)
        marks = jnp.zeros((MAX_ISECTS,), jnp.int32).at[scatter_idx].add(
            1, mode="drop")
        splat_c = jnp.clip(jnp.cumsum(marks) - 1, 0, N - 1)
        return splat_c, x

    def scatter_only(counts, x):
        offsets = jnp.cumsum(counts) - counts
        scatter_idx = jnp.where(counts > 0, offsets, MAX_ISECTS)
        marks = jnp.zeros((MAX_ISECTS,), jnp.int32).at[scatter_idx].add(
            1, mode="drop")
        return marks, x

    def cumsum_n(counts, x):
        return jnp.cumsum(counts), x

    def cumsum_m(counts, x):
        big = jnp.zeros((MAX_ISECTS,), jnp.int32).at[0].set(counts[0])
        return jnp.cumsum(big), x

    def searchsorted_blocks(counts, x):
        cum = jnp.cumsum(counts)
        starts = jnp.arange(NUM_BLOCKS, dtype=jnp.int32) * K_EXP
        w = jnp.searchsorted(cum, starts, side="right")
        return w, x

    def comps_build(counts, x):
        from brush_tpu.ops.pallas.expand import WINDOW_ALIGN, build_comp_rows
        window = K_EXP + 2 * WINDOW_ALIGN
        n_pad = -(-N // WINDOW_ALIGN) * WINDOW_ALIGN + window
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        offsets = jnp.cumsum(counts) - counts
        return build_comp_rows(
            x, x + 1, x + 2, x + 3, x + 4, u & jnp.uint32(0xFFFF0001),
            u & jnp.uint32(0x0FFF0001), u & jnp.uint32(0x3FF),
            (u >> 11) & jnp.uint32(0x7FF), u & jnp.uint32(0x7FF),
            u, u >> 1, offsets, n_pad), x

    base = median_time(lambda c, x: (c, x), (counts, x))
    report("identity (dispatch floor)", base)
    for name, fn in [
        ("cumsum over N (1M)", cumsum_n),
        ("cumsum over M (2.16M)", cumsum_m),
        ("scatter-add 1M idx -> M", scatter_only),
        ("full slot map (scatter+cumsum+clip)", slotmap),
        ("searchsorted cum at 4224 block starts", searchsorted_blocks),
        ("comps build (40 bf16 rows)", comps_build),
    ]:
        dt = median_time(fn, (counts, x))
        report(name, dt, base)


if __name__ == "__main__":
    main()
