"""Probe: union-find kernel variants on a REAL frame-77 edge list.

The serial SMEM kernel is the single largest op in the traced pipeline
(~0.98 ms/frame). Variants measured here on the real edge distribution
(sorted packed (u,v), ~24k edges, 10240 supernodes):

  v0  current production kernel (separate eu/ev arrays, u-root cache,
      equal-parent precheck)
  v1  packed single-array edges (u<<15|v): halves edge loads
  v2  v1 without the equal-parent precheck
  v3  v1 with the edge loop manually unrolled 2x

Usage: python tools/probe_uf2.py  (expects /tmp/uf_edges.npz from a
cluster_debug dump; falls back to synthetic edges)
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


def _find_body(out_ref):
    def find(x):
        def cond(st):
            x, _ = st
            return out_ref[x] != x

        def body(st):
            x, _ = st
            p = out_ref[x]
            out_ref[x] = out_ref[p]
            return out_ref[x], 0
        x, _ = jax.lax.while_loop(cond, body, (x, 0))
        return x
    return find


def k_v0(eu_ref, ev_ref, ne_ref, out_ref):
    s = out_ref.shape[0]
    jax.lax.fori_loop(0, s, lambda i, _: (out_ref.__setitem__(i, i), 0)[1], 0)
    find = _find_body(out_ref)

    def edge(i, carry):
        pu, pru = carry
        a = eu_ref[i]
        b = ev_ref[i]

        def work(_):
            ru = find(jnp.where(a == pu, pru, a))
            rv = find(b)
            mn = jnp.minimum(ru, rv)

            @pl.when(ru != rv)
            def _():
                out_ref[jnp.maximum(ru, rv)] = mn
            return mn

        pa = out_ref[a]
        r = jax.lax.cond(pa != out_ref[b], work, lambda _: pa, 0)
        return a, r
    jax.lax.fori_loop(0, ne_ref[0], edge, (jnp.int32(-1), jnp.int32(0)))
    jax.lax.fori_loop(0, s, lambda i, _: (out_ref.__setitem__(i, find(i)), 0)[1], 0)


def k_v1(euv_ref, ne_ref, out_ref):
    s = out_ref.shape[0]
    jax.lax.fori_loop(0, s, lambda i, _: (out_ref.__setitem__(i, i), 0)[1], 0)
    find = _find_body(out_ref)

    def edge(i, carry):
        pu, pru = carry
        w = euv_ref[i]
        a = w >> 15
        b = w & ((1 << 15) - 1)

        def work(_):
            ru = find(jnp.where(a == pu, pru, a))
            rv = find(b)
            mn = jnp.minimum(ru, rv)

            @pl.when(ru != rv)
            def _():
                out_ref[jnp.maximum(ru, rv)] = mn
            return mn

        pa = out_ref[a]
        r = jax.lax.cond(pa != out_ref[b], work, lambda _: pa, 0)
        return a, r
    jax.lax.fori_loop(0, ne_ref[0], edge, (jnp.int32(-1), jnp.int32(0)))
    jax.lax.fori_loop(0, s, lambda i, _: (out_ref.__setitem__(i, find(i)), 0)[1], 0)


def k_v2(euv_ref, ne_ref, out_ref):
    s = out_ref.shape[0]
    jax.lax.fori_loop(0, s, lambda i, _: (out_ref.__setitem__(i, i), 0)[1], 0)
    find = _find_body(out_ref)

    def edge(i, carry):
        pu, pru = carry
        w = euv_ref[i]
        a = w >> 15
        b = w & ((1 << 15) - 1)
        ru = find(jnp.where(a == pu, pru, a))
        rv = find(b)
        mn = jnp.minimum(ru, rv)

        @pl.when(ru != rv)
        def _():
            out_ref[jnp.maximum(ru, rv)] = mn
        return a, mn
    jax.lax.fori_loop(0, ne_ref[0], edge, (jnp.int32(-1), jnp.int32(0)))
    jax.lax.fori_loop(0, s, lambda i, _: (out_ref.__setitem__(i, find(i)), 0)[1], 0)


def run(kern, args, s=S):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((s,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(*args)


def main():
    try:
        d = np.load("/tmp/uf_edges.npz")
        eu, ev, ne = d["e_u"], d["e_v"], int(d["n_edges"])
    except OSError:
        rng = np.random.default_rng(0)
        ne = 24000
        eu = np.sort(rng.integers(0, S, E)).astype(np.int32)
        ev = rng.integers(0, S, E).astype(np.int32)
    print(f"edges={ne}")
    euj = jnp.asarray(eu)
    evj = jnp.asarray(ev)
    euv = jnp.asarray((eu.astype(np.int64) << 15 | ev).astype(np.int32))
    nej = jnp.asarray([ne], jnp.int32)

    f0 = jax.jit(lambda a, b, n: run(k_v0, (a, b, n)))
    f1 = jax.jit(lambda w, n: run(k_v1, (w, n)))
    f2 = jax.jit(lambda w, n: run(k_v2, (w, n)))

    r0 = np.asarray(f0(euj, evj, nej))
    r1 = np.asarray(f1(euv, nej))
    r2 = np.asarray(f2(euv, nej))
    assert np.array_equal(r0, r1) and np.array_equal(r0, r2)

    for name, fn, args in (("v0 current", f0, (euj, evj, nej)),
                           ("v1 packed", f1, (euv, nej)),
                           ("v2 packed, no precheck", f2, (euv, nej))):
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(50):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 50
        print(f"{name:24s} {dt * 1e3:7.3f} ms  ({dt / ne * 1e9:5.1f} ns/edge)")


if __name__ == "__main__":
    main()
