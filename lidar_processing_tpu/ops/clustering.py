"""Device Euclidean clustering — exact radius-graph connected components.

TPU-first redesign of the reference's serial KD-tree + BFS FEC
(ref: src/clustering.cpp:47-125, src/kdtree.hpp:292-341). The KD-tree, BFS
queue, and removed-flags dissolve into a **cell-graph connected-components**
formulation (see ACCURACY.md for why radius-CC is the contract):

  1. Points are bucketed into fine voxel cells of size h = R/sqrt(3); every
     pair inside one cell is within R (cell diagonal == R), so each cell is a
     clique and clustering reduces to connected components over OCCUPIED CELLS.
  2. A cell-pair (within the 5x5x5 neighborhood) is an edge iff the minimum
     pairwise point distance is <= R. Each pair is classified cheaply first:
       impossible — AABB-to-AABB min distance > R  (no point check needed)
       certain    — the two representative points are within R
       ambiguous  — everything else: resolved by an exact all-pairs check
                    over up to cell_capacity points per cell (a batched
                    (K,3)x(3,K) MXU contraction); overflow is counted.
     Measured on KITTI frames: ~300k pairs/frame, ~50k ambiguous — the
     expensive point-level work shrinks ~50x vs naive 5x5x5 enumeration.
  3. Connected components by min-cell-id label propagation over the (M,125)
     neighbor table with pointer jumping (converges in O(log diameter)
     rounds), then size filtering and canonical relabeling by minimum
     original point index (the reference's BFS-seed numbering order).

Everything is fixed-shape and jit/vmap-compatible; `overflow` reports any
capacity violation (cells, ambiguous pairs, coordinate range, capped cells in
an ambiguous pair) so callers/tests can assert exactness.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import ClusteringConfig, PipelineConfig
from ..types import CLUSTER_INVALID, CLUSTER_UNDEFINED, ClusteringResult

_INT_MAX = jnp.int32(jnp.iinfo(jnp.int32).max)

# cell-coordinate bit budget: 11 + 11 + 8 = 30 bits (see _pack_key)
_XB, _YB, _ZB = 11, 11, 8
_OFFSETS = [(dx, dy, dz)
            for dx in (-2, -1, 0, 1, 2)
            for dy in (-2, -1, 0, 1, 2)
            for dz in (-2, -1, 0, 1, 2)
            if (dx, dy, dz) != (0, 0, 0)]  # 124 neighbor offsets


def _pack_key(cx, cy, cz):
    return ((cx << (_YB + _ZB)) | (cy << _ZB) | cz).astype(jnp.int32)


class _CellTable(NamedTuple):
    keys: jnp.ndarray       # (M,) sorted packed keys; INT_MAX padding
    starts: jnp.ndarray     # (M,) start index into the sorted point array
    counts: jnp.ndarray     # (M,) occupancy
    aabb_min: jnp.ndarray   # (M,3)
    aabb_max: jnp.ndarray   # (M,3)
    rep: jnp.ndarray        # (M,3) representative point (first in cell)
    min_orig: jnp.ndarray   # (M,) min original point index
    num_cells: jnp.ndarray  # ()
    overflow: jnp.ndarray   # () int32


def _build_cells(
    sp: jnp.ndarray, sk: jnp.ndarray, sorig: jnp.ndarray,
    svalid: jnp.ndarray, max_cells: int
) -> Tuple[_CellTable, jnp.ndarray]:
    """Build the per-cell table from key-sorted points.

    Returns the table and per-point cell ids (M-clipped).
    """
    n = sp.shape[0]
    prev = jnp.concatenate([jnp.array([_INT_MAX], jnp.int32), sk[:-1]])
    new_cell = (sk != prev) & svalid
    cell_id = jnp.cumsum(new_cell.astype(jnp.int32)) - 1
    num_cells = cell_id[-1] + 1
    overflow = (num_cells > max_cells).astype(jnp.int32)
    cid = jnp.clip(cell_id, 0, max_cells - 1)
    seg_kw = dict(num_segments=max_cells, indices_are_sorted=True)

    arange_n = jnp.arange(n, dtype=jnp.int32)
    starts = jax.ops.segment_min(jnp.where(svalid, arange_n, n), cid, **seg_kw)
    counts = jax.ops.segment_sum(svalid.astype(jnp.int32), cid, **seg_kw)
    inf3 = jnp.float32(3.4e38)
    p_for_min = jnp.where(svalid[:, None], sp, inf3)
    p_for_max = jnp.where(svalid[:, None], sp, -inf3)
    aabb_min = jax.ops.segment_min(p_for_min, cid, **seg_kw)
    aabb_max = jax.ops.segment_max(p_for_max, cid, **seg_kw)
    keys = jax.ops.segment_min(jnp.where(svalid, sk, _INT_MAX), cid, **seg_kw)
    min_orig = jax.ops.segment_min(jnp.where(svalid, sorig, _INT_MAX), cid, **seg_kw)
    rep = sp[jnp.clip(starts, 0, n - 1)]
    return _CellTable(keys, starts, counts, aabb_min, aabb_max, rep,
                      min_orig, num_cells, overflow), cid


def _classify_pairs(
    tbl: _CellTable, coords: jnp.ndarray, r2: float, max_cells: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """For every (cell, offset) pair: neighbor slot, certain-edge, ambiguous.

    coords: (M,3) int32 cell coordinates. Returns (nbr (M,124), exists,
    certain, ambiguous) boolean tables.
    """
    m = max_cells
    cx, cy, cz = coords[:, 0], coords[:, 1], coords[:, 2]
    offs = jnp.asarray(_OFFSETS, jnp.int32)                   # (124,3)
    nx = cx[:, None] + offs[None, :, 0]
    ny = cy[:, None] + offs[None, :, 1]
    nz = cz[:, None] + offs[None, :, 2]
    in_range = ((nx >= 0) & (nx < (1 << _XB)) & (ny >= 0) & (ny < (1 << _YB))
                & (nz >= 0) & (nz < (1 << _ZB)))
    nkey = _pack_key(jnp.clip(nx, 0, (1 << _XB) - 1),
                     jnp.clip(ny, 0, (1 << _YB) - 1),
                     jnp.clip(nz, 0, (1 << _ZB) - 1))
    slot_valid = jnp.arange(m, dtype=jnp.int32) < tbl.num_cells

    pos = jnp.searchsorted(tbl.keys, nkey, method="sort").astype(jnp.int32)
    pos = jnp.clip(pos, 0, m - 1)
    exists = (tbl.keys[pos] == nkey) & in_range & slot_valid[:, None]

    # AABB-to-AABB minimum distance (lower bound on min pair distance)
    gap = jnp.maximum(
        0.0,
        jnp.maximum(tbl.aabb_min[:, None, :] - tbl.aabb_max[pos],
                    tbl.aabb_min[pos] - tbl.aabb_max[:, None, :]))
    mind2 = jnp.sum(gap * gap, axis=-1)
    impossible = mind2 > r2

    # representative-pair distance (upper bound on min pair distance)
    dr = tbl.rep[:, None, :] - tbl.rep[pos]
    repd2 = jnp.sum(dr * dr, axis=-1)
    certain = exists & (~impossible) & (repd2 <= r2)
    ambiguous = exists & (~impossible) & (~certain)
    return pos, exists, certain, ambiguous


def _resolve_ambiguous(
    sp: jnp.ndarray, tbl: _CellTable, pos: jnp.ndarray,
    ambiguous: jnp.ndarray, r2: float, cap: int, max_amb: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact min-pair-distance test for ambiguous cell pairs.

    Returns (edge bits scattered back into the (M,124) table, overflow count).
    """
    m, no = ambiguous.shape
    n = sp.shape[0]
    flat_amb = ambiguous.reshape(-1)
    (amb_idx,) = jnp.nonzero(flat_amb, size=max_amb, fill_value=0)
    amb_real = flat_amb[amb_idx]
    n_amb = jnp.sum(flat_amb.astype(jnp.int32))
    overflow = (n_amb > max_amb).astype(jnp.int32)

    a_cell = (amb_idx // no).astype(jnp.int32)
    b_cell = pos.reshape(-1)[amb_idx]

    ar = jnp.arange(cap, dtype=jnp.int32)

    def gather_block(cells):
        idx = jnp.clip(tbl.starts[cells][:, None] + ar[None, :], 0, n - 1)
        pts = sp[idx]                                        # (A, cap, 3)
        valid = ar[None, :] < jnp.minimum(tbl.counts[cells], cap)[:, None]
        return pts, valid

    pa, va = gather_block(a_cell)
    pb, vb = gather_block(b_cell)

    # min over all pairs, row-scanned to avoid an (A, cap, cap) buffer
    def row(carry, k):
        diff = pa[:, k, None, :] - pb                         # (A, cap, 3)
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(va[:, k, None] & vb, d2, jnp.float32(3.4e38))
        return jnp.minimum(carry, jnp.min(d2, axis=-1)), None

    init = jnp.full((pa.shape[0],), 3.4e38, jnp.float32)
    mind2, _ = jax.lax.scan(row, init, jnp.arange(cap))
    amb_edge = amb_real & (mind2 <= r2)

    # capped-cell accounting: only a NEGATIVE verdict on a pair where a cell
    # exceeded `cap` could have missed the qualifying point pair
    maybe_missed = (amb_real & (~amb_edge)
                    & ((tbl.counts[a_cell] > cap) | (tbl.counts[b_cell] > cap)))
    overflow = overflow + jnp.sum(maybe_missed.astype(jnp.int32))

    edge_amb = jnp.zeros((m * no,), bool).at[amb_idx].set(amb_edge)
    return edge_amb.reshape(m, no), overflow


def _connected_components(
    nbr: jnp.ndarray, edge: jnp.ndarray, num_cells: jnp.ndarray
) -> jnp.ndarray:
    """Min-label propagation + pointer jumping over the cell graph.

    nbr: (M,124) neighbor slots; edge: (M,124) adjacency. Returns (M,) root
    cell ids (each component labeled by its minimum cell id).
    """
    m = nbr.shape[0]
    iota = jnp.arange(m, dtype=jnp.int32)
    labels0 = iota

    def body(state):
        labels, _, it = state
        nl = jnp.where(edge, labels[nbr], _INT_MAX)
        new = jnp.minimum(labels, jnp.min(nl, axis=1))
        # pointer jumping (path halving) — labels are cell indices
        new = new[new]
        new = new[new]
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < 64)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
    # final full path compression
    labels = labels[labels]
    return labels


@functools.partial(jax.jit, static_argnames=("cfg", "pcfg"))
def cluster(
    xyz: jnp.ndarray, valid: jnp.ndarray,
    cfg: ClusteringConfig, pcfg: PipelineConfig
) -> ClusteringResult:
    """Cluster valid points of a padded cloud into compact labels.

    xyz: (N,3) float32; valid: (N,) bool (e.g. the OBSTACLE mask).
    Returns per-point labels in the ORIGINAL point order: ids 0..L-1 ordered
    by each cluster's minimum point index, CLUSTER_INVALID for size-filtered
    clusters, CLUSTER_UNDEFINED for invalid/padded entries.
    """
    n = xyz.shape[0]
    max_cells = pcfg.max_cells
    r2 = cfg.distance_squared
    h = math.sqrt(r2 / 3.0)  # cell diagonal == search radius

    # --- cell coordinates relative to the masked minimum corner ------------
    inf3 = jnp.float32(3.4e38)
    pmin = jnp.min(jnp.where(valid[:, None], xyz, inf3), axis=0)
    pmin = jnp.where(jnp.isfinite(pmin), pmin, 0.0)
    rel = jnp.floor((xyz - pmin) / jnp.float32(h)).astype(jnp.int32)
    lim = jnp.asarray([1 << _XB, 1 << _YB, 1 << _ZB], jnp.int32)
    coord_overflow = jnp.sum(
        (valid & jnp.any((rel < 0) | (rel >= lim), axis=1)).astype(jnp.int32))
    rel = jnp.clip(rel, 0, lim - 1)
    key = jnp.where(valid, _pack_key(rel[:, 0], rel[:, 1], rel[:, 2]), _INT_MAX)

    # --- sort by key; valid points first ------------------------------------
    order = jnp.argsort(key)
    sk = key[order]
    sp = xyz[order]
    sorig = jnp.arange(n, dtype=jnp.int32)[order]
    svalid = sk != _INT_MAX

    tbl, cid = _build_cells(sp, sk, sorig, svalid, max_cells)
    coords = jnp.stack([
        (tbl.keys >> (_YB + _ZB)) & ((1 << _XB) - 1),
        (tbl.keys >> _ZB) & ((1 << _YB) - 1),
        tbl.keys & ((1 << _ZB) - 1)], axis=1)

    pos, exists, certain, ambiguous = _classify_pairs(tbl, coords, r2, max_cells)
    edge_amb, amb_overflow = _resolve_ambiguous(
        sp, tbl, pos, ambiguous, r2, pcfg.cell_capacity, pcfg.max_ambiguous_pairs)
    edge = certain | edge_amb

    roots = _connected_components(pos, edge, tbl.num_cells)

    # --- component stats, size filter, canonical numbering ------------------
    slot_valid = jnp.arange(max_cells, dtype=jnp.int32) < tbl.num_cells
    seg_kw = dict(num_segments=max_cells)
    comp_size = jax.ops.segment_sum(
        jnp.where(slot_valid, tbl.counts, 0), roots, **seg_kw)
    comp_min = jax.ops.segment_min(
        jnp.where(slot_valid, tbl.min_orig, _INT_MAX), roots, **seg_kw)
    is_root = slot_valid & (roots == jnp.arange(max_cells, dtype=jnp.int32))
    max_sz = min(cfg.max_cluster_size, 2**31 - 1)  # int32-safe static clamp
    comp_valid = (is_root & (comp_size >= cfg.min_cluster_size)
                  & (comp_size <= max_sz))

    # rank valid roots by min original point index
    rank_key = jnp.where(comp_valid, comp_min, _INT_MAX)
    rorder = jnp.argsort(rank_key)
    ranks = jnp.zeros((max_cells,), jnp.int32).at[rorder].set(
        jnp.arange(max_cells, dtype=jnp.int32))
    num_clusters = jnp.sum(comp_valid.astype(jnp.int32))
    root_label = jnp.where(comp_valid, ranks, CLUSTER_INVALID)

    # --- per-point labels back in original order ----------------------------
    pt_root = roots[cid]
    pt_label = jnp.where(svalid, root_label[pt_root], CLUSTER_UNDEFINED)
    labels = jnp.full((n,), CLUSTER_UNDEFINED, jnp.int32).at[sorig].set(pt_label)

    overflow = tbl.overflow + amb_overflow + coord_overflow
    return ClusteringResult(labels, num_clusters, overflow)
