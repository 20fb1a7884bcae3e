"""Per-stage device timing for the frame pipeline.

Mirrors the reference's per-stage chrono logging
(ref: src/processor.cpp:167-168,204-205,218-219) at device granularity:
each stage is jitted separately and timed with block_until_ready over the
full 154-frame sequence. Substage timing for the clustering path breaks the
stixel algorithm into sort / cells / intra / supernodes / pairs / exact /
cc / writeback.

Usage: python tools/profile_stages.py [--frames N] [--substages]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args_list, name, n_warm=2):
    outs = fn(*args_list[0])
    jax.block_until_ready(outs)
    for _ in range(n_warm - 1):
        jax.block_until_ready(fn(*args_list[0]))
    t0 = time.perf_counter()
    for a in args_list:
        outs = fn(*a)
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(args_list)
    print(f"{name:32s} {dt * 1000:8.3f} ms/frame")
    return outs, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--substages", action="store_true")
    args = ap.parse_args()

    from lidar_processing_tpu.config import DEFAULT_CONFIG
    from lidar_processing_tpu.io.dataset import list_frames, load_frame
    from lidar_processing_tpu.ops import stixel as sx
    from lidar_processing_tpu.ops.segmentation import gpf_segment
    from lidar_processing_tpu.runtime.pipeline import device_frame_step
    from lidar_processing_tpu.types import SEG_OBSTACLE, pad_cloud

    cfg = DEFAULT_CONFIG
    cap = cfg.pipeline.max_points
    frames = list_frames()[: args.frames]
    clouds = []
    for p in frames:
        xyz, inten = load_frame(p)
        pc = pad_cloud(xyz, inten, cap)
        clouds.append((jnp.asarray(pc.xyz), jnp.asarray(pc.mask)))
    print(f"backend={jax.default_backend()}  frames={len(clouds)}")

    # full pipeline
    step = jax.jit(lambda x, m: device_frame_step(x, m, cfg))
    timed(step, clouds, "full device_frame_step")

    # stage 1: segmentation
    seg_fn = jax.jit(lambda x, m: gpf_segment(x, m, cfg.segmentation))
    timed(seg_fn, clouds, "1. gpf_segment")

    # stage 2: clustering (on the real obstacle masks)
    obst_fn = jax.jit(
        lambda x, m: m & (gpf_segment(x, m, cfg.segmentation).labels
                          == SEG_OBSTACLE))
    obst = [(x, obst_fn(x, m)) for x, m in clouds]
    jax.block_until_ready(obst)
    cl_fn = jax.jit(
        lambda x, o: sx.cluster(x, o, cfg.clustering, cfg.pipeline))
    timed(cl_fn, obst, "2. stixel cluster")

    # stage 3: gather + hulls (isolated = full - others, but also direct)
    from lidar_processing_tpu.runtime import pipeline as pl

    def tail(x, m):
        fr = device_frame_step(x, m, cfg)
        return fr.small_hulls, fr.runs, fr.large_ids
    timed(jax.jit(tail), clouds, "full (gather+hull output)")

    if args.substages:
        pcfg = cfg.pipeline
        ccfg = cfg.clustering
        import math
        h = math.sqrt(ccfg.distance_squared / 3.0)

        sort_fn = jax.jit(lambda x, o: sx._sort_points(x, o, pcfg, h))
        sps = [sort_fn(x, o) for x, o in obst]
        jax.block_until_ready(sps)
        timed(sort_fn, obst, "2a. sort_points")

        cells_fn = jax.jit(lambda sp: sx._build_cells(sp, pcfg))
        cells = [cells_fn(sp) for sp in sps]
        jax.block_until_ready(cells)
        timed(cells_fn, [(sp,) for sp in sps], "2b. build_cells")

        # DCE-based prefix bisection: jit a function returning only one
        # debug intermediate — XLA dead-code-eliminates everything after
        # it, so each timing covers the prefix up to that value.
        def prefix(key):
            def f(x, o):
                _, dbg = sx._cluster_impl(x, o, ccfg, pcfg)
                return dbg[key]
            return jax.jit(f)

        for key in ("link1", "sn", "n_cpairs", "n_snp", "snp_edge",
                    "labels"):
            timed(prefix(key), obst, f"2-prefix..{key}")

        # gather/hull stage in isolation
        from lidar_processing_tpu.ops.hull import (convex_hulls_batched,
                                                   gather_runs, label_runs)
        cl_outs = [(x, cl_fn(x, o).labels) for x, o in obst]
        jax.block_until_ready(cl_outs)
        runs_fn = jax.jit(lambda x, l: label_runs(x, l, pl.NUM_SLOTS))
        timed(runs_fn, cl_outs, "3a. label_runs (sort)")
        rn = [runs_fn(x, l) for x, l in cl_outs]
        jax.block_until_ready(rn)
        g_small = jax.jit(lambda r: gather_runs(
            r.sorted_xyz, r.starts[:pl.SMALL_C], r.counts[:pl.SMALL_C],
            pl.SMALL_P))
        timed(g_small, [(r,) for r in rn], "3b. gather_runs small")
        sm = [(g_small(r)[..., :2], r.counts[:pl.SMALL_C]) for r in rn]
        jax.block_until_ready(sm)
        hull_fn = jax.jit(lambda xy, c: convex_hulls_batched(
            xy, c, min(pl.SMALL_P, cfg.polygonization.small_cluster_size + 1)))
        timed(hull_fn, sm, "3c. small hulls")
    print("done")


if __name__ == "__main__":
    main()
