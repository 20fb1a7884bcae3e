"""Measure stixel-clustering cap occupancies over the whole dataset.

Prints the max over all 154 frames of every capacity-bound quantity, so
PipelineConfig caps and tier tables can be right-sized: static slot counts
are linear cost on TPU whether occupied or not.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from lidar_processing_tpu.config import DEFAULT_CONFIG
    from lidar_processing_tpu.io.dataset import list_frames, load_frame
    from lidar_processing_tpu.ops import stixel as sx
    from lidar_processing_tpu.ops.segmentation import gpf_segment
    from lidar_processing_tpu.types import SEG_OBSTACLE, pad_cloud

    cfg = DEFAULT_CONFIG
    cap = cfg.pipeline.max_points

    @jax.jit
    def stats(xyz, mask):
        seg = gpf_segment(xyz, mask, cfg.segmentation)
        obst = mask & (seg.labels == SEG_OBSTACLE)
        res, dbg = sx._cluster_impl(xyz, obst, cfg.clustering, cfg.pipeline)
        # replicate CC round 1 to count live edges entering the fixpoint loop
        s_cap = cfg.pipeline.max_supernodes
        e_u, e_v, e_ok = dbg["e_u"], dbg["e_v"], dbg["e_ok"]
        imax = jnp.int32(np.iinfo(np.int32).max)
        l = jnp.arange(s_cap, dtype=jnp.int32)
        mn = jnp.where(e_ok, jnp.minimum(l[e_u], l[e_v]), imax)
        l = l.at[jnp.where(e_ok, l[e_u], s_cap)].min(mn, mode="drop")
        l = l.at[jnp.where(e_ok, l[e_v], s_cap)].min(mn, mode="drop")
        for _ in range(4):
            l = l[l]
        live = e_ok & (l[e_u] != l[e_v])
        return dict(
            n_obst=dbg["sp"].n_obst,
            n_cells=dbg["cells"].n_cells,
            n_sn=dbg["sn"].n_sn,
            n_cols=jnp.sum((dbg["col_sn_count"] > 0).astype(jnp.int32)),
            n_cpairs=dbg["n_cpairs"],
            n_snp=dbg["n_snp"],
            n_edges=jnp.sum(dbg["e_ok"].astype(jnp.int32)),
            n_live=jnp.sum(live.astype(jnp.int32)),
            tiers1=dbg["tiers1"],
            tiers2=dbg["tiers2"],
            n_cls=dbg["n_cls"],
            overflow=res.overflow,
            num=res.num_clusters,
        )

    maxima: dict = {}
    frames = list_frames()
    for i, p in enumerate(frames):
        xyz, _ = load_frame(p)
        pc = pad_cloud(xyz, None, cap)
        out = {k: np.asarray(v) for k, v in
               stats(jnp.asarray(pc.xyz), jnp.asarray(pc.mask)).items()}
        for k, v in out.items():
            maxima[k] = np.maximum(maxima.get(k, v), v)
        if i % 50 == 0:
            print(f"frame {i}: " + " ".join(
                f"{k}={v}" for k, v in out.items() if v.ndim == 0))
    print("\n=== maxima over", len(frames), "frames ===")
    for k, v in maxima.items():
        print(f"{k:12s} {v}")


if __name__ == "__main__":
    sys.exit(main())
