"""Probe 2: cost of Mosaic scalar loads, dynamic sublane slices, and
block-accumulated stores — the mega-kernel building blocks.

  A. scalar-load throughput: fori over N scalar loads from a VMEM i32 array
  B. dynamic 2-row slice from a (R, 384) f32 VMEM ref at arbitrary row
  C. verdict accumulation: build (8, 128) result tiles via iota-select and
     store at 8-aligned offsets
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, args, name, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e6:9.1f} us", flush=True)
    return dt


def probe_scalar_loads(n_loads: int):
    def kernel(idx_ref, val_ref, out_ref):
        def body(i, acc):
            return acc + val_ref[idx_ref[i]]
        acc = jax.lax.fori_loop(0, n_loads, body, jnp.int32(0))
        out_ref[0, 0] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 8192, n_loads), jnp.int32)
    val = jnp.asarray(rng.integers(0, 100, 8192), jnp.int32)
    dt = timed(jax.jit(call), (idx, val), f"A scalar loads x{n_loads}")
    print(f"   -> {dt / n_loads * 1e9:.1f} ns/load", flush=True)


def probe_dyn_slice(n_iters: int):
    R = 640

    def kernel(off_ref, pl_ref, out_ref):
        def body(i, acc):
            r = off_ref[i]
            w = pl_ref[pl.ds(r, 2), :]            # (2, 384) dynamic rows
            return acc + jnp.sum(w)
        acc = jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))
        out_ref[0, 0] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    rng = np.random.default_rng(0)
    off = jnp.asarray(rng.integers(0, R - 2, n_iters), jnp.int32)
    planes = jnp.asarray(rng.standard_normal((R, 384)), jnp.float32)
    dt = timed(jax.jit(call), (off, planes), f"B dyn 2x384 slices x{n_iters}")
    print(f"   -> {dt / n_iters * 1e9:.1f} ns/slice", flush=True)


def probe_accum_store(n_pairs: int):
    def kernel(x_ref, out_ref):
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def tile(t, _):
            def body(j, acc):
                best = x_ref[t * 1024 + j] * 2.0   # stand-in scalar result
                return jnp.where((sub == j // 128) & (lane == j % 128),
                                 best, acc)
            acc = jax.lax.fori_loop(0, 1024, body,
                                    jnp.zeros((8, 128), jnp.float32))
            out_ref[pl.ds(t * 8, 8), :] = acc
            return 0

        jax.lax.fori_loop(0, n_pairs // 1024, tile, 0)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pairs // 128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n_pairs), jnp.float32)
    out = jax.jit(call)(x)
    ok = np.allclose(np.asarray(out).reshape(-1), np.asarray(x) * 2.0)
    dt = timed(jax.jit(call), (x,), f"C accum+store x{n_pairs} (ok={ok})")
    print(f"   -> {dt / n_pairs * 1e9:.1f} ns/result", flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    for fn, arg in ((probe_scalar_loads, 16384),
                    (probe_dyn_slice, 16384),
                    (probe_accum_store, 16384)):
        try:
            fn(arg)
        except Exception as e:
            print(f"FAILED {fn.__name__}: {str(e)[:300]}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
