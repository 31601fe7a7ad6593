"""Microbench XLA primitives used by binning, on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s} {dt*1e3:9.2f} ms")
    return dt


def main():
    pool = 1 << 23
    n = 1 << 20
    rng = np.random.default_rng(0)
    keys = jax.device_put(rng.integers(0, 1 << 31, size=pool).astype(np.uint32))
    keys_n = jax.device_put(rng.integers(0, 1 << 31, size=n).astype(np.uint32))
    f32n = jax.device_put(rng.uniform(size=n).astype(np.float32))
    vals = jax.device_put(np.arange(pool, dtype=np.int32))
    idx_pool = jax.device_put(rng.integers(0, n, size=pool).astype(np.int32))
    idx_n = jax.device_put(rng.integers(0, pool, size=n).astype(np.int32))
    perm = jax.device_put(rng.permutation(pool).astype(np.int32))
    rows9 = jax.device_put(rng.uniform(size=(9, n)).astype(np.float32))
    data_pool = jax.device_put(rng.uniform(size=pool).astype(np.float32))

    timeit("lax.sort u32 8.4M", lambda k: jax.lax.sort(k), keys)
    timeit("lax.sort u32 2.1M", lambda k: jax.lax.sort(k[: pool // 4]), keys)
    timeit("lax.sort_key_val u32+i32 8.4M",
           lambda k, v: jax.lax.sort_key_val(k, v), keys, vals)
    timeit("argsort f32 1M", lambda k: jnp.argsort(k), f32n)
    timeit("cummax i32 8.4M", lambda v: jax.lax.cummax(v), vals)
    timeit("cumsum i32 1M", lambda v: jnp.cumsum(v[:n]), vals)
    timeit("scatter-max 1M into 8.4M",
           lambda i: jnp.zeros((pool,), jnp.int32).at[i].max(
               jnp.arange(n, dtype=jnp.int32), mode="drop"), idx_n)
    timeit("scatter-set perm 8.4M (permute)",
           lambda p, d: jnp.zeros((pool,), jnp.float32).at[p].set(d), perm,
           data_pool)
    timeit("scatter-add 8.4M into 4096 bins",
           lambda i: jnp.zeros((4096,), jnp.float32).at[i % 4096].add(1.0),
           idx_pool)
    timeit("gather 8.4M from 1M (i32)",
           lambda i, d: d[i], idx_pool, f32n)
    timeit("gather rows9 [:, idx] 8.4M",
           lambda i, d: d[:, i], idx_pool, rows9)
    timeit("gather rows9.T [idx] 8.4M",
           lambda i, d: d.T[i], idx_pool, rows9)
    timeit("searchsorted 4097 in 8.4M",
           lambda k: jnp.searchsorted(k, jnp.arange(4097, dtype=jnp.uint32)),
           keys)
    timeit("searchsorted 8.4M in 1M",
           lambda c, q: jnp.searchsorted(c, q), keys_n, keys)


if __name__ == "__main__":
    main()
