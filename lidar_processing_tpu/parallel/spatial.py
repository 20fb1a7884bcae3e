"""Spatial grid-block sharding: one cloud clustered across chips.

The reference scales within a frame by partitioning space into x-bands
processed serially (ref: src/segmentation.cpp:104-149). The TPU-native
design shards those bands across devices along a 'space' mesh axis and
keeps the result EXACT — bit-identical labels to the single-device
ops/stixel.py run:

  1. distribute  — one global stable sort assigns every point to an x-band
     of width >= the clustering radius R (so only ADJACENT bands can hold
     points of the same cluster) and scatters it to its owner block's
     padded buffer. Under jit with the output sharded over 'space', XLA
     lowers this to an all-to-all over ICI — the TPU equivalent of the
     reference's DDS frame hand-off (ref: src/processor.cpp:93-100).
  2. local clustering — every block runs the full exact stixel clustering
     (ops/stixel.py) on its own points inside shard_map, with the size
     filter DISABLED (a locally-small fragment may be a piece of a large
     cross-block cluster).
  3. halo exchange — each block sends its right margin (points within R of
     its right boundary, with their local component ids) to its right
     neighbor via lax.ppermute over ICI; the receiver runs the exact
     d² <= R² test between the received margin and its own left margin.
     Every cross-block edge of the radius graph has both endpoints inside
     these margins (band width >= R), so the edge set is complete.
  4. label merge — cross-block merge pairs are all_gather'ed and every
     device runs the same min-label union-find fixpoint over the global
     component table (hook to min + pointer-jumping compression;
     ceil(log2(S)) + 2 rounds bound the longest block-spanning chain).
  5. stats + canonicalization — true component sizes and min original
     point indices combine across blocks, the size filter
     (ref: src/clustering.cpp:113-119) applies to MERGED sizes, and final
     cluster ids rank by min original point index — the same canonical
     numbering as the single-device path, hence bit-identical labels.

All caps live in SpatialConfig; violations raise the overflow counter
(never silent truncation of a verdict).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ClusteringConfig, PipelineConfig, SpatialConfig
from ..ops import stixel as sx
from ..ops.scan_utils import compact_mask
from ..types import CLUSTER_INVALID, CLUSTER_UNDEFINED, ClusteringResult

_IMAX = jnp.int32(jnp.iinfo(jnp.int32).max)

# min-label rounds over one boundary's bipartite component graph; chains of
# more than this many distinct components zig-zagging across a single block
# boundary raise the overflow counter instead of merging silently wrong
_BND_ROUNDS = 16


def _block_pipeline_config(scfg: SpatialConfig,
                           pcfg: PipelineConfig) -> PipelineConfig:
    """Per-block PipelineConfig for the local stixel run."""
    return dataclasses.replace(
        pcfg,
        max_points=scfg.block_points,
        max_obstacle_points=scfg.block_points,
        max_cells=scfg.block_cells,
        max_columns=scfg.block_columns,
        max_supernodes=scfg.block_supernodes,
        max_column_pairs=scfg.block_column_pairs,
        max_sn_pairs=scfg.block_sn_pairs,
        max_edges=scfg.block_edges,
        max_live_edges=scfg.block_live_edges,
    )


def _distribute(xyz, valid, s: int, cap: int, r: float):
    """Assign points to x-bands and scatter to (S*cap,) block buffers.

    Returns (bxyz (S,cap,3), borig (S,cap), bvalid (S,cap), x0, w, overflow).
    Band width w >= r by construction; band S-1 absorbs the right tail, so
    two points within r are always in the same or adjacent bands.
    """
    n = xyz.shape[0]
    big = jnp.float32(3.4e38)
    x = xyz[:, 0]
    x_lo = jnp.min(jnp.where(valid, x, big))
    x_hi = jnp.max(jnp.where(valid, x, -big))
    any_valid = jnp.any(valid)
    x_lo = jnp.where(any_valid, x_lo, 0.0)
    x_hi = jnp.where(any_valid, x_hi, 0.0)
    w = jnp.maximum((x_hi - x_lo) / s, jnp.float32(r)) * jnp.float32(1 + 1e-6)

    band = jnp.clip(jnp.floor((x - x_lo) / w).astype(jnp.int32), 0, s - 1)
    band = jnp.where(valid, band, s)
    orig = jnp.arange(n, dtype=jnp.int32)
    sband, sorig = jax.lax.sort((band, orig), num_keys=1)  # stable in ties
    starts = jnp.searchsorted(sband, jnp.arange(s, dtype=jnp.int32),
                              ).astype(jnp.int32)
    rank = orig - starts[jnp.clip(sband, 0, s - 1)]
    in_cap = (sband < s) & (rank < cap)
    slot = jnp.where(in_cap, sband * cap + rank, s * cap)
    overflow = jnp.sum(((sband < s) & (rank >= cap)).astype(jnp.int32))

    bxyz = jnp.zeros((s * cap, 3), jnp.float32).at[slot].set(
        xyz[sorig], mode="drop")
    borig = jnp.full((s * cap,), -1, jnp.int32).at[slot].set(
        sorig, mode="drop")
    bvalid = jnp.zeros((s * cap,), bool).at[slot].set(in_cap, mode="drop")
    return (bxyz.reshape(s, cap, 3), borig.reshape(s, cap),
            bvalid.reshape(s, cap), x_lo, w, overflow)


def _margin_pack(xyz, gid, sel_mask, cap: int):
    """Compact margin points into (cap,) buffers: xyz rows, global ids."""
    idx, cnt, ovf = compact_mask(sel_mask, cap)
    act = jnp.arange(cap, dtype=jnp.int32) < cnt
    mx = jnp.where(act[:, None], xyz[idx], 1.0e9)
    mg = jnp.where(act, gid[idx], -1)
    return mx, mg, ovf


def _merge_rounds(s: int) -> int:
    return max(2, int(math.ceil(math.log2(max(s, 2)))) + 2)


def cluster_spatial(mesh: Mesh, xyz, valid, ccfg: ClusteringConfig,
                    pcfg: PipelineConfig, scfg: SpatialConfig,
                    axis: str = "space") -> ClusteringResult:
    """Exact Euclidean clustering of ONE padded cloud sharded over `axis`.

    xyz: (N,3) f32; valid: (N,) bool. Returns a ClusteringResult identical
    to ops.stixel.cluster(xyz, valid, ccfg, <single-device pcfg>) — same
    labels, same canonical numbering, same size-filter semantics.
    """
    s = mesh.shape[axis]
    fn = _make_spatial_fn(mesh, axis, s, ccfg, pcfg, scfg)
    labels, num, overflow = fn(xyz, valid)
    return ClusteringResult(labels, num, overflow)


def cluster_spatial_2d(mesh: Mesh, xyzs, valids, ccfg: ClusteringConfig,
                       pcfg: PipelineConfig, scfg: SpatialConfig,
                       data_axis: str = "data",
                       space_axis: str = "space") -> ClusteringResult:
    """Exact clustering of a FRAME BATCH on a 2-D hosts x chips mesh.

    xyzs: (B, N, 3); valids: (B, N); B must EQUAL the `data_axis` mesh
    size (chunk larger batches into data-axis-sized calls). Frames shard over `data_axis` (the DP/frame-
    pipelining analogue, ref: src/processor.cpp:93-100) while each frame's
    x-bands shard over `space_axis` with the same halo-exchange label-merge
    machinery as cluster_spatial — per-frame results are bit-identical to
    the single-device path (tests/test_spatial.py).
    """
    s = mesh.shape[space_axis]
    fn = _make_spatial_fn(mesh, space_axis, s, ccfg, pcfg, scfg,
                          data_axis=data_axis)
    labels, nums, overflows = fn(xyzs, valids)
    return ClusteringResult(labels, nums, overflows)


@functools.lru_cache(maxsize=None)
def _make_spatial_fn(mesh: Mesh, axis: str, s: int, ccfg: ClusteringConfig,
                     pcfg: PipelineConfig, scfg: SpatialConfig,
                     data_axis: str | None = None):
    cap = scfg.block_points
    l_cap = scfg.block_clusters
    h_cap = scfg.halo_points
    r2 = ccfg.distance_squared
    r = math.sqrt(r2)
    t_total = s * l_cap
    rounds = _merge_rounds(s)
    block_pcfg = _block_pipeline_config(scfg, pcfg)
    # local runs must not size-filter: fragments merge across blocks first
    local_ccfg = dataclasses.replace(
        ccfg, min_cluster_size=1, max_cluster_size=2**32 - 1)

    def block_core(bx, bo, bv, x_lo, w):
        # bx (cap,3), bo/bv (cap,); x_lo/w per-frame scalars
        i = jax.lax.axis_index(axis)

        res = sx.cluster(bx, bv, local_ccfg, block_pcfg)
        lab = res.labels                              # (cap,) local ids
        labeled = lab >= 0
        lab_c = jnp.clip(lab, 0, l_cap - 1)
        lab_overflow = jnp.sum((labeled & (lab >= l_cap)).astype(jnp.int32))
        tgt = jnp.where(labeled & (lab < l_cap), lab, l_cap)

        size_loc = jnp.zeros((l_cap,), jnp.int32).at[tgt].add(1, mode="drop")
        min_loc = jnp.full((l_cap,), _IMAX, jnp.int32).at[tgt].min(
            jnp.where(bo >= 0, bo, _IMAX), mode="drop")

        gid = jnp.where(labeled, i * l_cap + lab_c, -1)

        # --- halo exchange: right margin -> right neighbor over ICI -------
        xr = x_lo + (i + 1).astype(jnp.float32) * w    # my right boundary
        right_sel = labeled & (bx[:, 0] > xr - r)
        mx, mg, ovf_r = _margin_pack(bx, gid, right_sel, h_cap)
        perm = [(j, j + 1) for j in range(s - 1)]
        rx = jax.lax.ppermute(mx, axis, perm)          # from left neighbor
        rg = jax.lax.ppermute(mg, axis, perm)
        rx = jnp.where((i > 0) & (rg >= 0)[:, None], rx, 1.0e9)
        rg = jnp.where(i > 0, rg, -1)

        xl = x_lo + i.astype(jnp.float32) * w          # my left boundary
        left_sel = labeled & (bx[:, 0] < xl + r)
        lx, lg, ovf_l = _margin_pack(bx, gid, left_sel, h_cap)

        # --- exact cross-block edges (same d² <= r² criterion) ------------
        d = rx[:, None, :] - lx[None, :, :]
        d2 = jnp.sum(d * d, axis=2)                    # (h_cap, h_cap)
        edge = (d2 <= r2) & (rg >= 0)[:, None] & (lg >= 0)[None, :]

        # Min-label propagation over the boundary bipartite graph BEFORE
        # emitting merge pairs: point-level edges are massively redundant
        # (every point pair across a dense boundary is an edge), so instead
        # of compacting them we converge each margin point to its boundary-
        # component minimum gid and emit ONE pair per margin point — at most
        # 2*h_cap pairs, transitively complete. Non-convergence (component
        # chains longer than the round budget) raises overflow.
        lab_r, lab_l = rg, lg
        fill = _IMAX
        for _ in range(_BND_ROUNDS):
            lab_r = jnp.minimum(
                lab_r, jnp.min(jnp.where(edge, lab_l[None, :], fill), axis=1))
            lab_l = jnp.minimum(
                lab_l, jnp.min(jnp.where(edge, lab_r[:, None], fill), axis=0))
        res_r = jnp.min(jnp.where(edge, lab_l[None, :], fill), axis=1)
        converged = jnp.all(jnp.minimum(lab_r, res_r) == lab_r)
        ovf_c = jnp.where(converged, 0, 1).astype(jnp.int32)

        pu = jnp.concatenate([jnp.maximum(rg, 0), jnp.maximum(lg, 0)])
        pv = jnp.concatenate([jnp.maximum(lab_r, 0), jnp.maximum(lab_l, 0)])
        eact = jnp.concatenate([rg >= 0, lg >= 0])     # (2*h_cap,)

        # --- global union-find over all_gather'ed pairs (replicated) ------
        gu = jax.lax.all_gather(pu, axis).reshape(-1)  # (s*p_cap,)
        gv = jax.lax.all_gather(pv, axis).reshape(-1)
        gok = jax.lax.all_gather(eact, axis).reshape(-1)
        glab = jnp.arange(t_total, dtype=jnp.int32)

        def hook(l):
            lu = l[jnp.where(gok, gu, 0)]
            lv = l[jnp.where(gok, gv, 0)]
            mn = jnp.where(gok, jnp.minimum(lu, lv), _IMAX)
            l = l.at[jnp.where(gok, lu, t_total)].min(mn, mode="drop")
            l = l.at[jnp.where(gok, lv, t_total)].min(mn, mode="drop")
            return l[l][l]                              # pointer jumping

        for _ in range(rounds):
            glab = hook(glab)

        # --- merged stats + size filter + canonical numbering -------------
        g_size = jax.lax.all_gather(size_loc, axis).reshape(-1)  # (T,)
        g_min = jax.lax.all_gather(min_loc, axis).reshape(-1)
        has_pts = g_size > 0
        root_tgt = jnp.where(has_pts, glab, t_total)
        comp_size = jnp.zeros((t_total,), jnp.int32).at[root_tgt].add(
            g_size, mode="drop")
        comp_min = jnp.full((t_total,), _IMAX, jnp.int32).at[root_tgt].min(
            g_min, mode="drop")
        ids = jnp.arange(t_total, dtype=jnp.int32)
        max_sz = min(ccfg.max_cluster_size, 2**31 - 1)
        is_root = has_pts & (glab == ids)
        comp_valid = (is_root & (comp_size >= ccfg.min_cluster_size)
                      & (comp_size <= max_sz))
        rank_key = jnp.where(comp_valid, comp_min, _IMAX)
        rorder = jnp.argsort(rank_key)
        ranks = jnp.zeros((t_total,), jnp.int32).at[rorder].set(
            jnp.arange(t_total, dtype=jnp.int32))
        num_clusters = jnp.sum(comp_valid.astype(jnp.int32))
        root_label = jnp.where(comp_valid, ranks, CLUSTER_INVALID)

        # --- per-point final labels ---------------------------------------
        pt_root = glab[jnp.clip(gid, 0, t_total - 1)]
        final = jnp.where(labeled, root_label[pt_root], CLUSTER_UNDEFINED)

        my_overflow = (res.overflow + lab_overflow + ovf_r + ovf_l + ovf_c)
        return (final, bo, num_clusters, my_overflow)

    def block_body(bx, bo, bv, x_lo, w):
        # per-shard shapes: bx (1,cap,3), bo/bv (1,cap); scalars replicated
        final, bo_, num, ovf = block_core(bx[0], bo[0], bv[0], x_lo, w)
        return (final[None], bo_[None],
                jnp.full((1,), num, jnp.int32),
                jnp.full((1,), ovf, jnp.int32))

    sharded = shard_map(
        block_body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False)

    @jax.jit
    def run(xyz, valid):
        n = xyz.shape[0]
        bx, bo, bv, x_lo, w, ovf_d = _distribute(xyz, valid, s, cap, r)
        sharding = NamedSharding(mesh, P(axis))
        bx = jax.lax.with_sharding_constraint(bx, sharding)
        bo = jax.lax.with_sharding_constraint(bo, sharding)
        bv = jax.lax.with_sharding_constraint(bv, sharding)
        flab, forig, nums, ovfs = sharded(bx, bo, bv, x_lo, w)
        flab = flab.reshape(-1)
        forig = forig.reshape(-1)
        out = jnp.full((n,), CLUSTER_UNDEFINED, jnp.int32).at[
            jnp.where(forig >= 0, forig, n)].set(flab, mode="drop")
        return out, nums[0], ovf_d + jnp.sum(ovfs)

    if data_axis is None:
        return run

    # ---- 2-D hosts x chips variant: frames over `data_axis`, each -------
    # frame's x-bands over `axis`. The space-axis collectives inside
    # block_core are untouched — the data axis is a pure batch axis
    # (frames are independent, exactly the reference's two-process frame
    # pipelining, ref: src/processor.cpp:93-100 / launch.sh:12-16).
    def block_body_2d(bx, bo, bv, x_lo, w):
        # per-shard: bx (1,1,cap,3), bo/bv (1,1,cap), x_lo/w (1,)
        final, bo_, num, ovf = block_core(
            bx[0, 0], bo[0, 0], bv[0, 0], x_lo[0], w[0])
        return (final[None, None], bo_[None, None],
                jnp.full((1, 1), num, jnp.int32),
                jnp.full((1, 1), ovf, jnp.int32))

    sharded_2d = shard_map(
        block_body_2d, mesh=mesh,
        in_specs=(P(data_axis, axis), P(data_axis, axis),
                  P(data_axis, axis), P(data_axis), P(data_axis)),
        out_specs=(P(data_axis, axis), P(data_axis, axis),
                   P(data_axis, axis), P(data_axis, axis)),
        check_vma=False)

    @jax.jit
    def run_2d(xyzs, valids):
        b, n = xyzs.shape[0], xyzs.shape[1]
        assert b == mesh.shape[data_axis], (
            f"batch {b} != data axis {mesh.shape[data_axis]}")
        bx, bo, bv, x_lo, w, ovf_d = jax.vmap(
            lambda x, v: _distribute(x, v, s, cap, r))(xyzs, valids)
        sh = NamedSharding(mesh, P(data_axis, axis))
        bx = jax.lax.with_sharding_constraint(bx, sh)
        bo = jax.lax.with_sharding_constraint(bo, sh)
        bv = jax.lax.with_sharding_constraint(bv, sh)
        flab, forig, nums, ovfs = sharded_2d(bx, bo, bv, x_lo, w)
        flab = flab.reshape(b, -1)
        forig = forig.reshape(b, -1)

        def reassemble(fl, fo):
            return jnp.full((n,), CLUSTER_UNDEFINED, jnp.int32).at[
                jnp.where(fo >= 0, fo, n)].set(fl, mode="drop")

        out = jax.vmap(reassemble)(flab, forig)
        return out, nums[:, 0], ovf_d + jnp.sum(ovfs, axis=1)

    return run_2d
