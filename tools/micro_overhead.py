"""Measure per-kernel fixed overhead on this TPU.

Times jitted chains of K DEPENDENT ops (each consumes the previous result,
so nothing fuses across the chain boundary for gather/scatter) at two chain
lengths; the slope is the marginal per-kernel cost. Controls: an elementwise
chain (fuses to ~one kernel) and array-size sweeps to split fixed vs
per-element cost.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, args, name, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1e6:9.1f} us", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}", flush=True)

    for n in (2048, 12288, 131072):
        idx = jnp.asarray(rng.integers(0, n, n), jnp.int32)

        def chain_gather(l, k):
            for _ in range(k):
                l = l[idx] + 1      # gather + (fused) add
            return l

        l0 = jnp.arange(n, dtype=jnp.int32)
        t4 = timed(jax.jit(lambda l: chain_gather(l, 4)), (l0,),
                   f"gather chain n={n} k=4")
        t24 = timed(jax.jit(lambda l: chain_gather(l, 24)), (l0,),
                    f"gather chain n={n} k=24")
        print(f"   -> per-gather marginal: {(t24 - t4) / 20 * 1e6:.1f} us "
              f"({(t24 - t4) / 20 / n * 1e9:.2f} ns/elem)", flush=True)

    n = 12288
    idx = jnp.asarray(rng.integers(0, n, n), jnp.int32)

    def chain_scatter(l, k):
        for _ in range(k):
            l = jnp.zeros((n,), jnp.int32).at[idx].min(l)
        return l
    l0 = jnp.arange(n, dtype=jnp.int32)
    t4 = timed(jax.jit(lambda l: chain_scatter(l, 4)), (l0,),
               f"scatter-min chain n={n} k=4")
    t24 = timed(jax.jit(lambda l: chain_scatter(l, 24)), (l0,),
                f"scatter-min chain n={n} k=24")
    print(f"   -> per-scatter marginal: {(t24 - t4) / 20 * 1e6:.1f} us",
          flush=True)

    def chain_ew(x, k):
        for _ in range(k):
            x = x * 1.000001 + 0.5
        return x
    x0 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    t4 = timed(jax.jit(lambda x: chain_ew(x, 4)), (x0,), "elementwise k=4")
    t64 = timed(jax.jit(lambda x: chain_ew(x, 64)), (x0,), "elementwise k=64")
    print(f"   -> per-ew marginal: {(t64 - t4) / 60 * 1e6:.2f} us", flush=True)

    # cumsum (compact_mask's core) at the pair-list sizes
    for n2 in (24576, 114688):
        m = jnp.asarray(rng.random(n2) < 0.1)

        def chain_cumsum(x, k):
            s = jnp.int32(0)
            for i in range(k):
                s = s + jnp.cumsum(x.astype(jnp.int32) + s)[-1]
            return s
        t2 = timed(jax.jit(lambda x: chain_cumsum(x, 2)), (m,),
                   f"cumsum chain n={n2} k=2")
        t10 = timed(jax.jit(lambda x: chain_cumsum(x, 10)), (m,),
                    f"cumsum chain n={n2} k=10")
        print(f"   -> per-cumsum marginal: {(t10 - t2) / 8 * 1e6:.1f} us",
              flush=True)

    # multi-operand sort at pair-list size (the tier-sort candidate)
    n3 = 114688
    keys = jnp.asarray(rng.integers(0, 8, n3), jnp.int32)
    pay = [jnp.asarray(rng.integers(0, 1 << 20, n3), jnp.int32)
           for _ in range(5)]

    def tier_sort(k, *p):
        return jax.lax.sort((k,) + p, num_keys=1)[0][-1]
    timed(jax.jit(tier_sort), (keys, *pay), "6-operand sort n=114688")

    print("done", flush=True)


if __name__ == "__main__":
    main()
