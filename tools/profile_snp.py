"""Split the supernode-pair stage cost: classify / compact / gather / kernel.

Four jits, each returning only the intermediates up to one point of
_cluster_impl's SNP stage (XLA DCEs everything after), timed over real
frames. Requires the debug dict entries in ops/stixel.py.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, args_list, name):
    outs = fn(*args_list[0])
    jax.block_until_ready(outs)
    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.perf_counter()
    for a in args_list:
        outs = fn(*a)
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(args_list)
    print(f"{name:32s} {dt * 1000:8.3f} ms/frame", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    args = ap.parse_args()

    from lidar_processing_tpu.config import DEFAULT_CONFIG
    from lidar_processing_tpu.io.dataset import list_frames, load_frame
    from lidar_processing_tpu.ops import stixel as sx
    from lidar_processing_tpu.ops.segmentation import gpf_segment
    from lidar_processing_tpu.types import SEG_OBSTACLE, pad_cloud

    cfg = DEFAULT_CONFIG
    cap = cfg.pipeline.max_points
    frames = list_frames()[: args.frames]
    clouds = []
    for p in frames:
        xyz, inten = load_frame(p)
        pc = pad_cloud(xyz, inten, cap)
        clouds.append((jnp.asarray(pc.xyz), jnp.asarray(pc.mask)))
    print(f"backend={jax.default_backend()}  frames={len(clouds)}",
          flush=True)

    obst_fn = jax.jit(
        lambda x, m: (x, m & (gpf_segment(x, m, cfg.segmentation).labels
                              == SEG_OBSTACLE)))
    obst = [jax.block_until_ready(obst_fn(x, m)) for x, m in clouds]

    def prefix(key):
        def f(x, o):
            _, dbg = sx._cluster_impl(x, o, cfg.clustering, cfg.pipeline)
            v = dbg[key]
            return jax.tree.map(lambda a: a if a.ndim == 0 else a.sum(), v)
        return jax.jit(f)

    for key in ("n_snp", "snp_classify", "snp_tier_idx", "snp_windows",
                "snp_edge"):
        try:
            timed(prefix(key), obst, f"prefix..{key}")
        except KeyError:
            print(f"prefix..{key}: KEY MISSING", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
