"""Probe: serial union-find as a Pallas TPU kernel (SMEM-resident).

Labels (S,) and the compacted edge list (E,2) live in SMEM; the kernel runs
path-halving union-by-min serially with scalar loads/stores. Verified
against scipy connected_components; timed at the pipeline's real sizes
(S=10240, E<=32768).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

S = 10240
E = 32768


def kernel(eu_ref, ev_ref, ne_ref, out_ref):
    # out_ref doubles as the parent array (SMEM, initialized in-kernel)
    def init(i, _):
        out_ref[i] = i
        return 0
    jax.lax.fori_loop(0, S, init, 0)

    def find(x):
        def cond(st):
            x, _ = st
            return out_ref[x] != x

        def body(st):
            x, _ = st
            p = out_ref[x]
            out_ref[x] = out_ref[p]          # path halving
            return out_ref[x], 0
        x, _ = jax.lax.while_loop(cond, body, (x, 0))
        return x

    def edge(i, _):
        ru = find(eu_ref[i])
        rv = find(ev_ref[i])

        @pl.when(ru < rv)
        def _():
            out_ref[rv] = ru

        @pl.when(rv < ru)
        def _():
            out_ref[ru] = rv
        return 0

    jax.lax.fori_loop(0, ne_ref[0], edge, 0)

    # final flatten: every node points at its root (min id in component)
    def flatten(i, _):
        out_ref[i] = find(i)
        return 0
    jax.lax.fori_loop(0, S, flatten, 0)


def main():
    rng = np.random.default_rng(0)
    ne = 24000
    eu = rng.integers(0, S, E).astype(np.int32)
    ev = rng.integers(0, S, E).astype(np.int32)
    # make it local-ish like the supernode graph
    ev[:ne] = np.minimum(S - 1, eu[:ne] + rng.integers(1, 40, ne))

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    f = jax.jit(call)
    try:
        got = np.asarray(f(jnp.asarray(eu), jnp.asarray(ev),
                           jnp.asarray(np.array([ne], np.int32))))
    except Exception as e:
        s = str(e)
        i = s.find("Mosaic")
        print("FAILED:", s[i:i + 500] if i >= 0 else s[-500:], flush=True)
        return

    import scipy.sparse as sp
    import scipy.sparse.csgraph as cs
    g = sp.coo_matrix((np.ones(ne, np.int8), (eu[:ne], ev[:ne])),
                      shape=(S, S))
    _, comp = cs.connected_components(g, directed=False)
    mins = np.full(comp.max() + 1, 2**31 - 1, np.int64)
    np.minimum.at(mins, comp, np.arange(S))
    want = mins[comp]
    ok = (got == want).all()
    print("correct:", ok, flush=True)

    args = (jnp.asarray(eu), jnp.asarray(ev),
            jnp.asarray(np.array([ne], np.int32)))
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(30):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 30
    print(f"UF kernel S={S} E={ne}: {dt * 1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
