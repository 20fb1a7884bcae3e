"""Probe Mosaic (Pallas TPU) support for the mega-kernel building blocks:

  1. scalar dynamic loads from VMEM refs (tbl[i, j] with traced i)
  2. dynamic-slice row loads (ref[pl.ds(i, k), :]) inside a fori_loop
  3. data-dependent fori_loop trip counts
  4. scalar stores to VMEM output refs
  5. per-pair (8, 128)-block compute inside the loop

Runs a miniature pair-verdict kernel and checks against numpy.
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


def kernel(planes_ref, us_ref, uc_ref, vs_ref, vc_ref, out_ref):
    n_pairs = us_ref.shape[0]

    def body(i, _):
        us = us_ref[i]                      # scalar dynamic load
        uc = uc_ref[i]
        vs = vs_ref[i]
        vc = vc_ref[i]
        sr_u = us // 8
        off_u = us - sr_u * 8
        # u window: 2 rows of the (N//8, 24) stacked view -> (2, 24)
        uw = planes_ref[pl.ds(sr_u, 2), :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (2, 8), 0) * 8 + \
            jax.lax.broadcasted_iota(jnp.int32, (2, 8), 1)
        uok = (lane >= off_u) & (lane < off_u + uc)
        ux = jnp.where(uok, uw[:, 0:8], 1e9)
        uy = jnp.where(uok, uw[:, 8:16], 1e9)
        uz = jnp.where(uok, uw[:, 16:24], 1e9)

        # v window: data-dependent chunk loop over 2-row chunks
        n_chunks = (vc + 15) // 16

        def vchunk(c, best):
            sr_v = (vs + c * 16) // 8
            off_v = vs + c * 16 - sr_v * 8
            vw = planes_ref[pl.ds(sr_v, 3), :]           # (3, 24)
            vlane = jax.lax.broadcasted_iota(jnp.int32, (3, 8), 0) * 8 + \
                jax.lax.broadcasted_iota(jnp.int32, (3, 8), 1)
            rem = jnp.minimum(vc - c * 16, 16)
            vok = (vlane >= off_v) & (vlane < off_v + rem)
            vx = jnp.where(vok, vw[:, 0:8], -1e9)
            vy = jnp.where(vok, vw[:, 8:16], -1e9)
            vz = jnp.where(vok, vw[:, 16:24], -1e9)
            # (2*8, 3*8) distance block via reshape to vectors
            uxf = ux.reshape(16, 1)
            vxf = vx.reshape(1, 24)
            d = uxf - vxf
            d2 = d * d
            d = uy.reshape(16, 1) - vy.reshape(1, 24)
            d2 = d2 + d * d
            d = uz.reshape(16, 1) - vz.reshape(1, 24)
            d2 = d2 + d * d
            return jnp.minimum(best, jnp.min(d2))

        best = jax.lax.fori_loop(0, n_chunks, vchunk, jnp.float32(3.4e38))
        out_ref[pl.ds(i, 1)] = best.reshape(1)   # 1-elem vector store
        return 0

    jax.lax.fori_loop(0, n_pairs, body, 0)


def main():
    rng = np.random.default_rng(0)
    n = 4096
    xyz = rng.standard_normal((n, 3)).astype(np.float32)
    stacked = np.concatenate([xyz[:, a].reshape(-1, 8) for a in range(3)],
                             axis=1)                      # (n//8, 24)
    n_pairs = 512
    us = rng.integers(0, n - 64, n_pairs).astype(np.int32)
    uc = rng.integers(1, 9, n_pairs).astype(np.int32)
    vs = rng.integers(0, n - 128, n_pairs).astype(np.int32)
    vc = rng.integers(1, 49, n_pairs).astype(np.int32)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pairs,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    got = np.asarray(jax.jit(call)(
        jnp.asarray(stacked), jnp.asarray(us), jnp.asarray(uc),
        jnp.asarray(vs), jnp.asarray(vc)))

    want = np.empty(n_pairs, np.float32)
    for i in range(n_pairs):
        u = xyz[us[i]:us[i] + uc[i]]
        v = xyz[vs[i]:vs[i] + vc[i]]
        d = u[:, None, :] - v[None, :, :]
        want[i] = (d * d).sum(-1).min()
    ok = np.allclose(got, want, rtol=1e-5)
    print("correct:", ok, flush=True)
    if not ok:
        bad = np.nonzero(~np.isclose(got, want, rtol=1e-5))[0][:5]
        print("mismatch at", bad, got[bad], want[bad])

    f = jax.jit(call)
    args = (jnp.asarray(stacked), jnp.asarray(us), jnp.asarray(uc),
            jnp.asarray(vs), jnp.asarray(vc))
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(50):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 50
    print(f"{n_pairs} pairs: {dt*1e6:.1f} us -> {dt/n_pairs*1e9:.0f} ns/pair",
          flush=True)


if __name__ == "__main__":
    main()
