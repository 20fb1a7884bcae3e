"""Microbenchmarks isolating the stixel pipeline's cost centers on TPU.

Each benchmark targets one suspect from tools/profile_stages.py's breakdown
(SNP exact stage 15.6 ms, CC loop 7.7 ms, build_cells 3.2 ms at r02):

  gatherA   the 6-plane superrow window gather feeding min_d2 (tier 1 shape)
  kernelC   the Pallas min_d2 kernel alone on pre-materialized windows
  rowsD     the (SNP, 16) classification row gather from the supernode table
  ccE       the live-edge min-label while_loop in isolation
  scanF     seg_scan_min (81920, 8) vs scatter-min run aggregation
  onehotG   window gather reformulated as a one-hot f32 MXU matmul

Synthetic data sized to measured KITTI maxima. Prints ms per op.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NO = 81920          # obstacle buffer
SR = 32


def timed(fn, args, name, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1000:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}", flush=True)

    planes = tuple(
        jnp.asarray(rng.standard_normal((NO // SR, SR)), jnp.float32)
        for _ in range(3))

    # ---- A: superrow window gather, tier-1 shape (16384 pairs, W=64) ----
    P1, W1 = 16384, 64
    starts = jnp.asarray(rng.integers(0, NO - 256, P1), jnp.int32)
    counts = jnp.asarray(rng.integers(1, 33, P1), jnp.int32)

    def widegather(sts, cts):
        nrow = W1 // SR + 1
        sr0 = sts // SR
        j = jnp.arange(nrow, dtype=jnp.int32)
        ridx = jnp.clip(sr0[:, None] + j[None, :], 0, NO // SR - 1)
        off = (sts - sr0 * SR)[:, None]
        aw = jnp.arange(nrow * SR, dtype=jnp.int32)[None, :]
        ok = (aw >= off) & (aw < off + jnp.minimum(cts, W1)[:, None])
        outs = [jnp.where(ok, pln[ridx].reshape(P1, nrow * SR), 1e9)
                for pln in planes]
        return sum(jnp.sum(o) for o in outs)   # keep gathers, tiny output

    timed(jax.jit(widegather), (starts, counts), "A gather 3plane x16384 W64")

    def widegather6(s1, c1, s2, c2):
        return widegather(s1, c1) + widegather(s2, c2)
    timed(jax.jit(widegather6), (starts, counts, starts, counts),
          "A2 gather 6plane (both sides)")

    # ---- C: Pallas kernel on materialized windows, per tier --------------
    from lidar_processing_tpu.kernels.min_d2 import min_d2_planar
    for (p, w) in ((16384, 64), (4096, 160), (3072, 288)):
        u = tuple(jnp.asarray(rng.standard_normal((p, w)), jnp.float32)
                  for _ in range(3))
        v = tuple(jnp.asarray(rng.standard_normal((p, min(w, 160))),
                              jnp.float32) for _ in range(3))
        timed(jax.jit(lambda *a: min_d2_planar(*a)), u + v,
              f"C pallas min_d2 {p}x{w}x{v[0].shape[1]}")

    # ---- D: classification row gather ------------------------------------
    S, SNP = 12288, 65536
    for width in (11, 16):
        tbl = jnp.asarray(rng.standard_normal((S, width)), jnp.float32)
        pu = jnp.asarray(rng.integers(0, S, SNP), jnp.int32)
        pv = jnp.asarray(rng.integers(0, S, SNP), jnp.int32)

        def rowgather(t, a, b):
            return jnp.sum(t[a]) + jnp.sum(t[b])
        timed(jax.jit(rowgather), (tbl, pu, pv),
              f"D rows (65536x2) from ({S},{width})")

    # ---- E: CC while_loop on live edges ----------------------------------
    LE = 12288
    lu = jnp.asarray(rng.integers(0, S, LE), jnp.int32)
    lv = jnp.asarray(rng.integers(0, S, LE), jnp.int32)
    lmask = jnp.asarray(rng.random(LE) < 0.5)
    IMAX = jnp.int32(2**31 - 1)

    def cc(labels0, u, v, ok):
        def compress(l):
            for _ in range(4):
                l = l[l]
            return l

        def hook(l):
            lu_, lv_ = l[u], l[v]
            mn = jnp.where(ok, jnp.minimum(lu_, lv_), IMAX)
            l = l.at[jnp.where(ok, lu_, S)].min(mn, mode="drop")
            l = l.at[jnp.where(ok, lv_, S)].min(mn, mode="drop")
            return compress(l)

        def cond(st):
            l, changed, it = st
            return changed & (it < 32)

        def body(st):
            l, _, it = st
            l2 = hook(l)
            return l2, jnp.any(l2 != l), it + 1

        l, _, it = jax.lax.while_loop(
            cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
        return l, it
    labels0 = jnp.arange(S, dtype=jnp.int32)
    out = jax.jit(cc)(labels0, lu, lv, lmask)
    print(f"   (cc converged in {int(out[1])} rounds)", flush=True)
    timed(jax.jit(cc), (labels0, lu, lv, lmask), "E cc while_loop (12288 edges)")

    # fixed-round unrolled variant
    def cc_fixed(labels0, u, v, ok, rounds=6):
        def hook(l):
            lu_, lv_ = l[u], l[v]
            mn = jnp.where(ok, jnp.minimum(lu_, lv_), IMAX)
            l = l.at[jnp.where(ok, lu_, S)].min(mn, mode="drop")
            l = l.at[jnp.where(ok, lv_, S)].min(mn, mode="drop")
            for _ in range(4):
                l = l[l]
            return l
        for _ in range(rounds):
            labels0 = hook(labels0)
        return labels0
    timed(jax.jit(cc_fixed), (labels0, lu, lv, lmask), "E2 cc fixed 6 rounds")

    # ---- F: run aggregation: seg scan vs scatter-min ----------------------
    M = 24576
    vals = jnp.asarray(rng.standard_normal((NO, 8)), jnp.float32)
    ids = jnp.sort(jnp.asarray(rng.integers(0, M, NO), jnp.int32))

    from lidar_processing_tpu.ops.scan_utils import seg_scan_min

    def scanmin(v, i):
        return jnp.sum(seg_scan_min(v, i, reverse=True))
    timed(jax.jit(scanmin), (vals, ids), "F seg_scan_min (81920,8)")

    def scatmin(v, i):
        out = jnp.full((M, 8), 1e9, jnp.float32).at[i].min(v)
        return jnp.sum(out)
    timed(jax.jit(scatmin), (vals, ids), "F2 scatter-min (81920,8)->24576")

    # ---- G: one-hot MXU gather --------------------------------------------
    # windows (2*P1, 2 rows) as one-hot (2*P1, NO//SR) @ planes (NO//SR, 32)
    pl6 = jnp.concatenate(planes, axis=1)          # (2560, 96)

    def onehot_gather(sts):
        sr0 = sts // SR                             # (P1,)
        rows = jnp.stack([sr0, sr0 + 1], 1).reshape(-1)   # (2*P1,)
        oh = (rows[:, None] == jnp.arange(NO // SR, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)                 # (32768, 2560)
        w = oh @ pl6                                # MXU f32
        return jnp.sum(w)
    timed(jax.jit(onehot_gather), (starts,), "G onehot MXU gather 32768 rows")

    print("done", flush=True)


if __name__ == "__main__":
    main()
