"""Probe 3: the aligned-load + dynamic-roll realignment pattern.

  A. aligned (16, 384) load at pl.multiple_of(base, 8) + pltpu.roll with a
     TRACED shift (sublane axis), then lane roll — the window realignment.
  B. SMEM blocked in_specs (per-grid-step scalar slices) + SMEM blocked out
     with dynamic scalar stores.
  C. end-to-end mini pair kernel using A+B; verdicts checked vs numpy.
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

LANES = 128
BLK = 1024         # pairs per grid step (1-D i32 XLA tile = 1024)


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


def _window(planes_ref, start, count, fill):
    """Extract run [start, start+count) (count <= 96) as three (1, 128)
    lane-aligned vectors via aligned load + double roll + select."""
    r = start // LANES
    base = pl.multiple_of((r // 8) * 8, 8)
    blk = planes_ref[pl.ds(base, 16), :]             # (16, 384) aligned
    blk = pltpu.roll(blk, base - r, 0)               # run rows -> 0,1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    s = start - r * LANES                            # 0..127
    out = []
    for a in range(3):
        w = pltpu.roll(blk[0:2, a * LANES:(a + 1) * LANES], -s, 1)
        v = jnp.where(lane < LANES - s, w[0:1], w[1:2])   # (1, 128)
        k = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        out.append(jnp.where(k < count, v, fill))
    return out


def kernel(us_ref, uc_ref, vs_ref, vc_ref, planes_ref, out_ref):
    def body(j, _):
        ux, uy, uz = _window(planes_ref, us_ref[j], uc_ref[j], 1e9)
        vx, vy, vz = _window(planes_ref, vs_ref[j], vc_ref[j], -1e9)
        # u lanes -> sublanes via one-hot matmul: (8,128) @ (128,1)-ish
        eye = (jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
               ).astype(jnp.float32)
        ucol_x = jax.lax.dot_general(
            eye, ux, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # (8, 1)
        ucol_y = jax.lax.dot_general(
            eye, uy, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ucol_z = jax.lax.dot_general(
            eye, uz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        d = ucol_x - vx                               # (8, 128)
        d2 = d * d
        d = ucol_y - vy
        d2 = d2 + d * d
        d = ucol_z - vz
        d2 = d2 + d * d
        out_ref[j] = jnp.min(d2)
        return 0

    jax.lax.fori_loop(0, BLK, body, 0)


def main():
    rng = np.random.default_rng(0)
    n = 131072 // 2
    xyz = rng.standard_normal((n, 3)).astype(np.float32) * 10
    planes = np.concatenate(
        [xyz[:, a].reshape(-1, LANES) for a in range(3)], axis=1)
    planes = np.concatenate(
        [planes, np.zeros((16, 384), np.float32)], axis=0)   # align8 pad

    n_pairs = 8192
    us = rng.integers(0, n - 256, n_pairs).astype(np.int32)
    uc = rng.integers(1, 9, n_pairs).astype(np.int32)
    vs = rng.integers(0, n - 256, n_pairs).astype(np.int32)
    vc = rng.integers(1, 97, n_pairs).astype(np.int32)

    grid = (n_pairs // BLK,)
    sspec = lambda: pl.BlockSpec((BLK,), lambda i: (i,),
                                 memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n_pairs,), jnp.float32),
        in_specs=[sspec(), sspec(), sspec(), sspec(),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
    )
    f = jax.jit(call)
    try:
        got = np.asarray(f(jnp.asarray(us), jnp.asarray(uc), jnp.asarray(vs),
                           jnp.asarray(vc), jnp.asarray(planes)))
    except Exception as e:
        print("FAILED compile/run:", str(e)[:2500], flush=True)
        return

    want = np.empty(n_pairs, np.float32)
    for i in range(n_pairs):
        u = xyz[us[i]:us[i] + uc[i]]
        v = xyz[vs[i]:vs[i] + vc[i]]
        d = u[:, None, :] - v[None, :, :]
        want[i] = (d * d).sum(-1).min()
    ok = np.allclose(got, want, rtol=1e-5, atol=1e-5)
    print("correct:", ok, flush=True)
    if not ok:
        bad = np.nonzero(~np.isclose(got, want, rtol=1e-5, atol=1e-5))[0]
        print(len(bad), "bad; first:", bad[:5], got[bad[:5]], want[bad[:5]],
              flush=True)

    args = (jnp.asarray(us), jnp.asarray(uc), jnp.asarray(vs),
            jnp.asarray(vc), jnp.asarray(planes))
    dt = timed(f, args, f"C mini pair kernel x{n_pairs}")
    print(f"   -> {dt / n_pairs * 1e9:.0f} ns/pair", flush=True)


if __name__ == "__main__":
    main()
