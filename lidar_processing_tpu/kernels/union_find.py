"""Pallas TPU kernel: serial union-find over a compacted edge list.

The supernode-graph connected components (ops/stixel.py step 6) were a
min-label hooking fixpoint in XLA: each iteration is a dependency chain of
~9 gather/scatter kernels at ~7 ns/index, so the while_loop cost ~7.5 ms per
frame (tools/micro_perf.py, tools/profile_stages.py). On TPU the whole
problem fits in SMEM (labels 40 KB + edges 256 KB), where scalar loads and
stores cost ~3.4 ns (tools/probe_mosaic2.py), so a classic SERIAL union-find
with path halving — unionable in one pass over the edges plus one flatten
pass — beats the parallel formulation by ~3x while being exactly the
textbook algorithm (the same structure as the reference's host union-find
oracle, native/lidar_native.cpp union_find_cc).

Contract: labels[i] = min node id reachable from i over the first
n_edges[0] edges — identical to the XLA fallback `cc_labels_xla`, which
remains the lowering for CPU (tests) via lax.platform_dependent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IMAX = jnp.int32(jnp.iinfo(jnp.int32).max)


def _uf_kernel(eu_ref, ev_ref, ne_ref, out_ref):
    s = out_ref.shape[0]

    def init(i, _):
        out_ref[i] = i
        return 0
    jax.lax.fori_loop(0, s, init, 0)

    def find(x):
        def cond(st):
            x, _ = st
            return out_ref[x] != x

        def body(st):
            x, _ = st
            p = out_ref[x]
            out_ref[x] = out_ref[p]            # path halving
            return out_ref[x], 0
        x, _ = jax.lax.while_loop(cond, body, (x, 0))
        return x

    def edge(i, carry):
        # the edge list arrives sorted by u, so consecutive edges usually
        # share u: cache (u, root-on-u's-path) in the loop carry and skip
        # u's find chain when it repeats. The cached node is always ON a's
        # path (a root at cache time), so find() from it stays correct
        # even after later unions re-parent it.
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

        # equal parents => already same set: skip both finds
        pa = out_ref[a]
        r = jax.lax.cond(pa != out_ref[b], work, lambda _: pa, 0)
        return a, r
    jax.lax.fori_loop(0, ne_ref[0], edge, (jnp.int32(-1), jnp.int32(0)))

    # flatten: every node points at its component's min id
    def flatten(i, _):
        out_ref[i] = find(i)
        return 0
    jax.lax.fori_loop(0, s, flatten, 0)


def cc_labels_pallas(eu, ev, n_edges, s_cap: int):
    """labels (s_cap,) i32: min node id per component (TPU kernel)."""
    return _pallas_seq(s_cap)(eu, ev, n_edges)


@functools.lru_cache(maxsize=None)
def _pallas_seq(s_cap: int):
    """sequential_vmap wrapper: the SMEM kernel is inherently serial and
    whole-array, so a vmapped (batched-frames) caller lowers to lax.map
    over per-frame kernel launches instead of pallas auto-batching (which
    rejects SMEM block shapes)."""

    @jax.custom_batching.sequential_vmap
    def run(eu, ev, n_edges):
        return pl.pallas_call(
            _uf_kernel,
            out_shape=jax.ShapeDtypeStruct((s_cap,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(eu, ev, n_edges.reshape(1))

    return run


def cc_labels_xla(eu, ev, n_edges, s_cap: int):
    """XLA twin: min-label hooking + pointer jumping to a fixpoint.

    Same result as cc_labels_pallas (min node id per component); used on
    CPU (tests/virtual meshes) where Pallas TPU kernels cannot lower.
    """
    ok = jnp.arange(eu.shape[0], dtype=jnp.int32) < n_edges
    uv = jnp.concatenate([eu, ev])
    ok2 = jnp.concatenate([ok, ok])
    labels = jnp.arange(s_cap, dtype=jnp.int32)

    def hook(l):
        luv = l[uv]
        e = eu.shape[0]
        mn = jnp.minimum(luv[:e], luv[e:])
        mn2 = jnp.where(ok2, jnp.concatenate([mn, mn]), _IMAX)
        l = l.at[jnp.where(ok2, luv, s_cap)].min(mn2, mode="drop")
        for _ in range(4):
            l = l[l]
        return l

    def cond(state):
        l, changed, it = state
        return changed & (it < 32)

    def body(state):
        l, _, it = state
        l2 = hook(hook(l))
        return l2, jnp.any(l2 != l), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (hook(labels), jnp.bool_(True), jnp.int32(0)))
    return labels[labels]


def cc_labels_hybrid(eu, ev, n_edges, s_cap: int, serial=None):
    """Vectorized min-label hook rounds, then serial UF on the LIVE edges.

    Two hook+jump rounds on the VPU resolve the bulk of the edges (chains
    and local cliques collapse immediately); only edges still straddling
    two labels reach the serial SMEM kernel, cutting its data-dependent
    loop by ~4-5x on the bundled frames. Exact same contract as
    cc_labels_pallas (min node id per component).
    """
    ec = eu.shape[0]
    ok = jnp.arange(ec, dtype=jnp.int32) < n_edges
    l = jnp.arange(s_cap, dtype=jnp.int32)
    for _ in range(2):
        lu = l[eu]
        lv = l[ev]
        mn = jnp.where(ok, jnp.minimum(lu, lv), _IMAX)
        l = l.at[jnp.where(ok, lu, s_cap)].min(mn, mode="drop")
        l = l.at[jnp.where(ok, lv, s_cap)].min(mn, mode="drop")
        l = l[l]
        l = l[l]
    lu = l[eu]
    lv = l[ev]
    live = ok & (lu != lv)
    n_live = jnp.sum(live.astype(jnp.int32))
    # pack the live label pairs to the front with one single-operand sort
    # (labels < s_cap <= 2^15 on the standard configs; fall back to the
    # 3-operand pack otherwise)
    if s_cap <= (1 << 15):
        key = jnp.where(live, jnp.minimum(lu, lv) * (1 << 15)
                        + jnp.maximum(lu, lv), jnp.int32(1) << 30)
        sk = jax.lax.sort(key)
        # contraction maps many original edges onto the same label pair —
        # dedup with one more single-operand sort before the serial kernel
        prev = jnp.concatenate([jnp.array([-1], jnp.int32), sk[:-1]])
        uniq = (sk != prev) & (sk < (jnp.int32(1) << 30))
        n_live = jnp.sum(uniq.astype(jnp.int32))
        sk = jax.lax.sort(jnp.where(uniq, sk, jnp.int32(1) << 30))
        fresh = jnp.arange(ec, dtype=jnp.int32) < n_live
        le_u = jnp.where(fresh, sk >> 15, 0)
        le_v = jnp.where(fresh, sk & ((1 << 15) - 1), 0)
    else:
        _, le_u, le_v = jax.lax.sort(
            ((~live).astype(jnp.int32), jnp.where(live, lu, 0),
             jnp.where(live, lv, 0)), num_keys=1)
    sub = (serial or cc_labels_pallas)(le_u, le_v, n_live, s_cap)
    return sub[l]


def cc_labels(eu, ev, n_edges, s_cap: int):
    """Platform-dispatched connected-component labels (min id per comp).

    The TPU path is the serial SMEM kernel directly: the hook-first hybrid
    was measured NET-negative in-pipeline (its two vectorized hook rounds
    cost ~2.5 ms in 32k-edge gathers/scatter-mins to save ~1.4 ms of
    serial work — see round-4 trace notes in PERF.md)."""
    return jax.lax.platform_dependent(
        eu, ev, n_edges,
        tpu=functools.partial(cc_labels_pallas, s_cap=s_cap),
        default=functools.partial(cc_labels_xla, s_cap=s_cap))
