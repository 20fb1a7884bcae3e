"""End-to-end frame pipeline: segment -> cluster -> polygonize.

The TPU-side program (one jitted function per frame shape) performs ground
segmentation, clustering, cluster gathering, and small-cluster convex hulls
entirely on device — the equivalent of Processor::process's stages 1-2 and
the small-cluster branch of stage 3 (ref: src/processor.cpp:135-219,
src/polygon_simplification.cpp:96-115). Large-cluster chi-shape outlines
(Delaunay-based, inherently irregular) run on the host over the gathered
cluster batch, using the native C++ module when built, else the scipy oracle
path (ref: src/polygon_simplification.cpp:117-138).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..ops import clustering as _cellgraph
from ..ops import stixel as _stixel
from ..ops.hull import ClusterBatch, convex_hulls_batched, gather_clusters
from ..ops.segmentation import gpf_segment
from ..types import (ClusteringResult, PolygonBatch, SegmentationResult,
                     SEG_OBSTACLE)

# two-tier cluster gathering: small clusters take the device convex-hull
# path, large ones the host concave path (ref: src/polygon_simplification.cpp:98)
SMALL_P = 32          # padded points per small-cluster slot
SMALL_C = 1024        # small-cluster slots
LARGE_P = 8192        # padded points per large-cluster slot
LARGE_C = 512         # large-cluster slots


class FrameResult(NamedTuple):
    seg: SegmentationResult
    clustering: ClusteringResult
    small: ClusterBatch           # clusters with < small_cluster_size points
    large: ClusterBatch           # the rest
    small_hulls: PolygonBatch     # device convex hulls of small clusters


class FrameOutputs(NamedTuple):
    """Host-side per-frame outputs, mirroring the reference's four topics
    (ref: src/processor.cpp:221-267)."""

    seg_labels: np.ndarray        # (n,) int32
    cluster_labels: np.ndarray    # (n,) int32 (over the full frame; UNDEFINED
                                  #  for non-obstacle points)
    num_clusters: int
    outlines: List[np.ndarray]    # ordered 2-D polygons, one per cluster
    overflow: int


@functools.partial(jax.jit, static_argnames=("config",))
def device_frame_step(
    xyz: jnp.ndarray, mask: jnp.ndarray, config: EngineConfig
) -> FrameResult:
    """Full on-device pipeline for one padded frame."""
    seg = gpf_segment(xyz, mask, config.segmentation)
    obstacle = mask & (seg.labels == SEG_OBSTACLE)
    cluster_op = (_stixel.cluster
                  if config.pipeline.clustering_backend == "stixel"
                  else _cellgraph.cluster)
    cl = cluster_op(xyz, obstacle, config.clustering, config.pipeline)

    small_cut = config.polygonization.small_cluster_size
    # split labels into small/large by per-cluster point count
    counts_all = jax.ops.segment_sum(
        jnp.where(cl.labels >= 0, 1, 0),
        jnp.clip(cl.labels, 0, SMALL_C + LARGE_C - 1),
        num_segments=SMALL_C + LARGE_C)
    is_small_cluster = counts_all < small_cut            # (C_tot,)
    lbl_small = jnp.where(
        (cl.labels >= 0) & is_small_cluster[jnp.clip(cl.labels, 0, SMALL_C + LARGE_C - 1)],
        cl.labels, -1)
    lbl_large = jnp.where(
        (cl.labels >= 0) & ~is_small_cluster[jnp.clip(cl.labels, 0, SMALL_C + LARGE_C - 1)],
        cl.labels, -1)

    # compact each tier's labels to its own 0..k-1 id space
    def compact(lbl, cap):
        present = jax.ops.segment_max(
            jnp.where(lbl >= 0, 1, 0), jnp.clip(lbl, 0, cap - 1),
            num_segments=cap)
        # segment_max fills label-free slots with INT32_MIN, not 0
        present = jnp.maximum(present, 0)
        new_id = jnp.cumsum(present) - 1
        return jnp.where(lbl >= 0, new_id[jnp.clip(lbl, 0, cap - 1)], -1), present

    lbl_small_c, _ = compact(lbl_small, SMALL_C + LARGE_C)
    lbl_large_c, _ = compact(lbl_large, SMALL_C + LARGE_C)

    small = gather_clusters(xyz, lbl_small_c, SMALL_C, SMALL_P)
    large = gather_clusters(xyz, lbl_large_c, LARGE_C, LARGE_P)
    small_hulls = convex_hulls_batched(small.xy, small.counts,
                                       min(SMALL_P, small_cut + 1))
    return FrameResult(seg, cl, small, large, small_hulls)


def _host_concave_outlines(
    large: ClusterBatch, config: EngineConfig
) -> List[np.ndarray]:
    """Chi-shape outlines for the large-cluster batch (host).

    Uses the native C++ hull module when available, else the scipy-based
    oracle implementation.
    """
    from ..ops import hull_native
    xy = np.asarray(large.xy)
    counts = np.asarray(large.counts)
    num = int(large.num)
    chi = config.polygonization.chi
    outlines: List[np.ndarray] = []
    for c in range(num):
        k = min(int(counts[c]), xy.shape[1])
        if k == 0:
            continue
        pts = xy[c, :k]
        outlines.append(hull_native.chi_concave_hull(pts, chi))
    return outlines


def run_frame(
    xyz_padded: jnp.ndarray, mask: jnp.ndarray, config: EngineConfig,
    n_points: Optional[int] = None,
) -> FrameOutputs:
    """Device step + host polygonization for one frame."""
    fr = device_frame_step(xyz_padded, mask, config)
    n = int(n_points) if n_points is not None else int(mask.sum())
    return host_outputs(fr, config, n)


def host_outputs(fr: FrameResult, config: EngineConfig,
                 n: int) -> FrameOutputs:
    """Host-side readout + polygonization of a device FrameResult."""
    seg_labels = np.asarray(fr.seg.labels)[:n]
    cl_labels = np.asarray(fr.clustering.labels)[:n]

    # small-cluster convex outlines from device
    sh_v = np.asarray(fr.small_hulls.vertices)
    sh_n = np.asarray(fr.small_hulls.counts)
    outlines: List[np.ndarray] = []
    for c in range(int(fr.small.num)):
        k = int(sh_n[c])
        if k > 0:
            outlines.append(sh_v[c, :k].astype(np.float32))
    outlines.extend(_host_concave_outlines(fr.large, config))

    return FrameOutputs(
        seg_labels=seg_labels,
        cluster_labels=cl_labels,
        num_clusters=int(fr.clustering.num_clusters),
        outlines=outlines,
        overflow=int(fr.clustering.overflow) + int(fr.small.overflow)
        + int(fr.large.overflow),
    )
