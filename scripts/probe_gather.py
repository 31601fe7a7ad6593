"""Round-5 primitive probes for the sharded-sort redesign (VERDICT r4 #3b).

Grounds the "key-only producer-compaction sort + packed-row gather" design:
  a) gather of (n, 12)-u32 ROWS at 256k indices — is it ~20 ns/index
     regardless of row width, and does the (n, 12) layout pay a tile-
     padding penalty in HBM?
  b) scatter of sorted-unique rows back to (n, 12) — the backward's
     dense placement candidate.
  c) lax.sort at 1M: 2 rows (key+idx) vs 12 rows — the compaction sort's
     saving over carrying every payload.
  d) the same gather expressed per-row (12 separate (n,) gathers) — the
     naive form the cost model forbids.

Usage: python scripts/probe_gather.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
P = 1 << 18  # 256k "strip producer" indices


def med(fn, args, iters=6, batch=8, name=""):
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
    dt = sorted(times)[len(times) // 2]
    print(f"{name:50s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    rows12 = jnp.asarray(rng.integers(0, 2**32, size=(N, 12), dtype=np.uint32))
    rows12_t = rows12.T  # (12, N)
    idx = jnp.asarray(np.sort(rng.choice(N, size=P, replace=False)))
    keys = jnp.asarray(rng.integers(0, 2**32, size=(N,), dtype=np.uint32))
    payload = [jnp.asarray(rng.integers(0, 2**32, size=(N,), dtype=np.uint32))
               for _ in range(11)]
    vals = jnp.asarray(rng.standard_normal((P, 12)), jnp.float32)

    med(lambda r, i: r[i], (rows12, idx), name="a) row gather (1M,12)[256k]")
    med(lambda r, i: r[:, i], (rows12_t, idx),
        name="a2) lane gather (12,1M)[:,256k]")
    med(lambda v, i: jnp.zeros((N, 12), jnp.float32).at[i].set(
        v, indices_are_sorted=True, unique_indices=True),
        (vals, idx), name="b) sorted-unique row scatter to (1M,12)")
    med(lambda k: jax.lax.sort((k, jnp.arange(N, dtype=jnp.int32)),
                               num_keys=1, is_stable=True),
        (keys,), name="c) 2-row sort key+idx @1M")
    med(lambda k, *p: jax.lax.sort((k,) + p + (jnp.arange(N, dtype=jnp.int32),),
                                   num_keys=1, is_stable=True),
        (keys, *payload), name="c2) 12-row sort @1M")
    med(lambda k: jax.lax.sort(
        (k[:P // 2], jnp.arange(P // 2, dtype=jnp.int32)), num_keys=1,
        is_stable=True), (keys,), name="c3) 2-row sort @128k")

    def per_row(rt, i):
        return tuple(rt[j][i] for j in range(12))
    med(lambda r, i: per_row([r[j] for j in range(12)], i),
        (rows12_t, idx), name="d) 12 separate (n,) gathers @256k")

    # Packing cost: 12 separate rows -> (n, 12). The sharded step would
    # build this once per step (or all_gather it pre-packed).
    med(lambda *rs: jnp.stack(rs, axis=1), tuple(payload) + (keys,),
        name="e) stack 12 rows -> (1M, 12)")


if __name__ == "__main__":
    main()
