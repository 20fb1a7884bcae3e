"""End-to-end frame pipeline: segment -> cluster -> polygonize.

The TPU-side program (one jitted function per frame shape) performs ground
segmentation, clustering, label-run sorting, and small-cluster convex hulls
entirely on device — the equivalent of Processor::process's stages 1-2 and
the small-cluster branch of stage 3 (ref: src/processor.cpp:135-219,
src/polygon_simplification.cpp:96-115). Large-cluster chi-shape outlines
(Delaunay-based, inherently irregular) run on the host over label-sorted
run slices, using the native C++ module when built, else the scipy oracle
path (ref: src/polygon_simplification.cpp:117-138).

Cluster gathering is ONE label sort (ops/hull.py label_runs): each cluster
becomes a contiguous run, sliced for free on host and window-gathered on
device — replacing the reference's per-point scatter loop
(ref: src/processor.cpp:180-200) without the (C, P) random gather it would
naively map to.
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
from ..ops.hull import (LabelRuns, convex_hulls_batched, gather_runs,
                        label_runs, label_runs_presorted)
from ..ops.scan_utils import compact_mask
from ..ops.segmentation import gpf_segment, gpf_segment_sorted
from ..types import (ClusteringResult, PolygonBatch, SegmentationResult,
                     SEG_OBSTACLE)

# two-tier outline extraction: small clusters take the device convex-hull
# path, large ones the host concave path (ref: src/polygon_simplification.cpp:98)
SMALL_P = 32          # padded points per small-cluster slot (device hulls)
SMALL_C = 1024        # small-cluster slots
LARGE_C = 512         # large-cluster (host concave) slots
NUM_SLOTS = SMALL_C + LARGE_C   # cluster-id table size


class FrameResult(NamedTuple):
    seg: SegmentationResult
    clustering: ClusteringResult
    runs: LabelRuns               # label-sorted cloud + per-cluster runs
    small_ids: jnp.ndarray        # (SMALL_C,) cluster id per small slot
    small_counts: jnp.ndarray     # (SMALL_C,)
    n_small: jnp.ndarray          # ()
    small_hulls: PolygonBatch     # device convex hulls of small clusters
    large_ids: jnp.ndarray        # (LARGE_C,) cluster id per large slot
    n_large: jnp.ndarray          # ()
    hull_overflow: jnp.ndarray    # () slot-capacity violations


class FrameOutputs(NamedTuple):
    """Host-side per-frame outputs, mirroring the reference's four topics
    (ref: src/processor.cpp:221-267).

    outline_z_extents realizes the reference's planned 2.5-D polygon record
    (PointXYdZ{x, y, z_min, z_max}, ref: src/polygonization.hpp:35-49 — the
    dead-code polygonizer's documented output shape): each 2-D outline
    carries the z range of its cluster's points.
    """

    seg_labels: np.ndarray        # (n,) int32
    cluster_labels: np.ndarray    # (n,) int32 (over the full frame; UNDEFINED
                                  #  for non-obstacle points)
    num_clusters: int
    outlines: List[np.ndarray]    # ordered 2-D polygons, one per cluster
    outline_cluster_ids: List[int]  # cluster id of each outline
    outline_z_extents: List[tuple]  # (z_min, z_max) per outline
    overflow: int


@functools.partial(jax.jit, static_argnames=("config",))
def device_frame_step(
    xyz: jnp.ndarray, mask: jnp.ndarray, config: EngineConfig
) -> FrameResult:
    """Full on-device pipeline for one padded frame.

    On the stixel backend the stages are FUSED in sorted space: gpf leaves
    its results in (partition, z) order, clustering consumes them directly
    and writes BOTH label arrays back to original order with one packed
    scatter, and the hull stage sorts the compacted obstacle buffer instead
    of the full padded cloud — three full-cloud scatter/sorts fewer than
    the stage-by-stage path (kept below for the cellgraph backend).
    """
    if config.pipeline.clustering_backend == "stixel":
        ss = gpf_segment_sorted(xyz, mask, config.segmentation)
        obstacle_s = ss.valid & (ss.labels == SEG_OBSTACLE)
        fused = _stixel.cluster_fused(
            ss.xyz, obstacle_s, ss.valid, ss.orig, ss.labels,
            config.clustering, config.pipeline)
        seg = SegmentationResult(fused.seg_labels, ss.planes, ss.plane_valid)
        cl = fused.result
        runs = label_runs_presorted(
            fused.sorted_xyz, fused.sorted_label, fused.sorted_orig,
            NUM_SLOTS)
        return _hull_stage(seg, cl, runs, config)
    seg = gpf_segment(xyz, mask, config.segmentation)
    obstacle = mask & (seg.labels == SEG_OBSTACLE)
    cl = _cellgraph.cluster(xyz, obstacle, config.clustering, config.pipeline)
    runs = label_runs(xyz, cl.labels, NUM_SLOTS)
    return _hull_stage(seg, cl, runs, config)


def _hull_stage(seg: SegmentationResult, cl: ClusteringResult,
                runs: LabelRuns, config: EngineConfig) -> FrameResult:
    # device convex-hull path only handles up to SMALL_P points per cluster
    small_cut = min(config.polygonization.small_cluster_size, SMALL_P + 1)
    present = runs.counts > 0
    is_small = present & (runs.counts < small_cut)
    small_idx, n_small, ovf_s = compact_mask(is_small, SMALL_C)
    small_act = jnp.arange(SMALL_C, dtype=jnp.int32) < n_small
    s_starts = jnp.where(small_act, runs.starts[small_idx], 0)
    s_counts = jnp.where(small_act, runs.counts[small_idx], 0)
    small_pts = gather_runs(runs.sorted_xyz, s_starts, s_counts, SMALL_P)
    small_hulls = convex_hulls_batched(
        small_pts[..., :2], s_counts, min(SMALL_P, small_cut + 1))

    large_idx, n_large, ovf_l = compact_mask(present & ~is_small, LARGE_C)
    hull_overflow = runs.overflow + ovf_s + ovf_l
    return FrameResult(seg, cl, runs, small_idx, s_counts, n_small,
                       small_hulls, large_idx, n_large, hull_overflow)


def _host_large_outlines(
    sorted_xyz: np.ndarray, starts: np.ndarray, counts: np.ndarray,
    large_ids: np.ndarray, n_large: int, config: EngineConfig,
) -> List[np.ndarray]:
    """Outlines for the large clusters (host, run slices).

    polygonizer_concave=True (default): chi-shape concave hulls, the
    reference's live path (ref: src/polygon_simplification.cpp:117-138).
    polygonizer_concave=False: all-convex outlines, with Chan's algorithm
    above chan_threshold points — the reference's alternate
    findOrderedConvexOutlines path (ref: src/polygon_simplification.cpp:
    32-63, selection :53-55). Native C++ when built, oracle fallback.
    """
    from ..ops import hull_native
    pcfg = config.polygonization
    outlines: List[np.ndarray] = []
    for k in range(n_large):
        c = int(large_ids[k])
        s, cnt = int(starts[c]), int(counts[c])
        xy = sorted_xyz[s:s + cnt, :2]
        if pcfg.polygonizer_concave:
            outlines.append(hull_native.chi_concave_hull(xy, pcfg.chi))
        else:
            algo = "chan" if cnt > pcfg.chan_threshold else "monotone"
            idx = hull_native.convex_hull_indices(xy, algorithm=algo)
            outlines.append(xy[idx].astype(np.float32))
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
    small_ids = np.asarray(fr.small_ids)
    outlines: List[np.ndarray] = []
    outline_ids: List[int] = []
    for c in range(int(fr.n_small)):
        k = int(sh_n[c])
        if k > 0:
            outlines.append(sh_v[c, :k].astype(np.float32))
            outline_ids.append(int(small_ids[c]))

    sorted_xyz = np.asarray(fr.runs.sorted_xyz)
    starts = np.asarray(fr.runs.starts)
    counts = np.asarray(fr.runs.counts)
    large_ids = np.asarray(fr.large_ids)
    n_large = int(fr.n_large)
    outlines.extend(_host_large_outlines(
        sorted_xyz, starts, counts, large_ids, n_large, config))
    outline_ids.extend(int(large_ids[k]) for k in range(n_large))

    # 2.5-D record: z extent per outlined cluster from its label run
    # (ref: src/polygonization.hpp:35-49 PointXYdZ{x,y,z_min,z_max})
    z_extents = []
    for c in outline_ids:
        s, cnt = int(starts[c]), int(counts[c])
        zs = sorted_xyz[s:s + cnt, 2]
        z_extents.append((float(zs.min()), float(zs.max()))
                         if cnt > 0 else (0.0, 0.0))

    return FrameOutputs(
        seg_labels=seg_labels,
        cluster_labels=cl_labels,
        num_clusters=int(fr.clustering.num_clusters),
        outlines=outlines,
        outline_cluster_ids=outline_ids,
        outline_z_extents=z_extents,
        overflow=int(fr.clustering.overflow) + int(fr.hull_overflow),
    )
