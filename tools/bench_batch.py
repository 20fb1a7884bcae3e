"""Throughput of the vmap-batched pipeline (B frames per device step).

The per-frame program is dominated by small latency-bound kernels (see
tools/micro_perf.py: ~84 us/kernel on 12k-element arrays); batching B frames
per dispatch amortizes that fixed cost. This measures ms/frame at several
batch sizes on the real chip.

Usage: python tools/bench_batch.py [--batches 4 8] [--frames 152]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8])
    ap.add_argument("--frames", type=int, default=152)
    args = ap.parse_args()

    from lidar_processing_tpu.config import DEFAULT_CONFIG
    from lidar_processing_tpu.io.dataset import list_frames, load_frame
    from lidar_processing_tpu.runtime.pipeline import device_frame_step
    from lidar_processing_tpu.types import pad_cloud

    cfg = DEFAULT_CONFIG
    cap = cfg.pipeline.max_points
    frames = list_frames()[: args.frames]
    xs, ms = [], []
    for p in frames:
        xyz, inten = load_frame(p)
        pc = pad_cloud(xyz, inten, cap)
        xs.append(pc.xyz)
        ms.append(pc.mask)
    import numpy as np
    X = jnp.asarray(np.stack(xs))
    M = jnp.asarray(np.stack(ms))
    print(f"backend={jax.default_backend()} frames={len(frames)}", flush=True)

    for b in args.batches:
        n = (len(frames) // b) * b
        step = jax.jit(jax.vmap(lambda x, m: device_frame_step(x, m, cfg)))
        out = step(X[:b], M[:b])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(0, n, b):
            out = step(X[i:i + b], M[i:i + b])
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"B={b:3d}: {dt / n * 1000:8.3f} ms/frame "
              f"({n / dt:6.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
