"""Microbench: jax.lax.sort cost at the pipeline's exact shapes.

Establishes how much of the frame time is XLA sort, and how single-operand
packed-key sorts compare to multi-operand sorts at each site:
  seg sort      131072 x 5 ops (gpf_segment)
  cluster sort  131072 x 5 ops (ops/stixel._sort_points)
  pair pack     221184 x 3 ops (ops/stixel pair assembly)
  tier sort      98304 x 6 ops (ops/stixel._tiered_exact SNP)
  edge pack      86016 x 3 ops (ops/stixel edge list)
  label_runs    131072 x 4 ops (ops/hull.label_runs)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, name, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt*1000:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())

    for n, k, label in [(131072, 5, "seg/cluster sort"),
                        (131072, 4, "label_runs"),
                        (221184, 3, "pair pack"),
                        (98304, 6, "tier sort"),
                        (86016, 3, "edge pack"),
                        (131072, 1, "1-op i32"),
                        (221184, 1, "1-op i32"),
                        (98304, 1, "1-op i32"),
                        (131072, 2, "2-op i32"),
                        (98304, 2, "2-op (i32 key + i32)")]:
        key = jnp.asarray(rng.integers(0, 2**30, n, dtype=np.int32))
        ops = [key] + [jnp.asarray(rng.standard_normal(n), jnp.float32)
                       for _ in range(k - 1)]
        f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=1))
        timed(f, ops, f"sort n={n} ops={k} ({label})")

    # row gather: 21k rows from a (98304, 8) i32 table (tier field fetch)
    tbl = jnp.asarray(rng.integers(0, 2**30, (98304, 8), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, 98304, 20736, dtype=np.int32))
    timed(jax.jit(lambda t, i: t[i]), (tbl, idx), "row gather 20736x(8,) i32")
    idx2 = jnp.asarray(rng.integers(0, 98304, 98304, dtype=np.int32))
    timed(jax.jit(lambda t, i: t[i]), (tbl, idx2), "row gather 98304x(8,) i32")

    # scatter: compact_mask-style cumsum+scatter at 221k
    m = jnp.asarray(rng.integers(0, 2, 221184, dtype=np.int32))
    def compact(mask):
        pos = jnp.cumsum(mask) - 1
        tgt = jnp.where(mask > 0, pos, 221184)
        return jnp.zeros((65536,), jnp.int32).at[
            jnp.clip(tgt, 0, 65535)].set(jnp.arange(221184, dtype=jnp.int32),
                                         mode="drop")
    timed(jax.jit(compact), (m,), "cumsum+scatter compact 221k->65k")


if __name__ == "__main__":
    main()
