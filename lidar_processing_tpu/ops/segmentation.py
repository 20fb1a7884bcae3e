"""Device GPF ground segmentation — masked, fixed-shape, jit/vmap friendly.

TPU-first redesign of the reference's serial Zermas-style Ground Plane
Fitting (ref: src/segmentation.cpp:62-345):

  * the parallel x-sort + contiguous split (ref: :104-149) becomes one
    device argsort with rank-derived partition masks (the integer-division
    tail-drop quirk is preserved: ranks >= P*(n//P) stay UNKNOWN);
  * z-sort + prefix scans for seed selection (ref: :151-217) become a
    lax.top_k of the lowest-z points plus masked threshold tests, including
    both empty-cutoff quirks;
  * the per-iteration covariance (ref: :76-85) is computed as masked moment
    matmuls X^T diag(w) X on the MXU with a pre-centering pass to avoid
    catastrophic cancellation in float32;
  * Eigen::JacobiSVD (ref: :87-99) is replaced by the closed-form 3x3
    eigensolver (ops/eig3.py), normal canonicalized upward;
  * the re-threshold is the SIGNED test  (X @ n - d) < odt * ||n||  over all
    partition points, exactly as the reference (ref: :285-307).

All partitions are processed as a batch (vmap) — the reference's serial
partition loop disappears.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SegmentationConfig
from ..types import (Plane, SegmentationResult, SEG_GROUND, SEG_OBSTACLE,
                     SEG_UNKNOWN)
from .eig3 import smallest_eigenvector_3x3

_BIG = jnp.float32(jnp.finfo(jnp.float32).max)


def _masked_seed_selection(
    z: jnp.ndarray, seg_mask: jnp.ndarray, cfg: SegmentationConfig
) -> jnp.ndarray:
    """Initial seed mask for one partition (ref: src/segmentation.cpp:151-217).

    z: (N,) float32 sorted-cloud z values; seg_mask: (N,) bool partition mask.
    """
    z_min_cut = jnp.float32(-cfg.z_min_outlier_scale * cfg.sensor_height_m)
    above_min = seg_mask & (z > z_min_cut)
    has_above_min = jnp.any(above_min)
    # quirk: if no point clears the cutoff, nothing is dropped
    kept = jnp.where(has_above_min, above_min, seg_mask)

    n_kept = jnp.sum(kept.astype(jnp.int32))
    k_cfg = min(cfg.number_of_lower_point_representatives, z.shape[0])
    # lowest-k z values among kept (top_k of -z; padded with -BIG)
    neg_z = jnp.where(kept, -z, -_BIG)
    lowest_neg, _ = jax.lax.top_k(neg_z, k_cfg)
    k_eff = jnp.minimum(n_kept, k_cfg)
    take = jnp.arange(k_cfg, dtype=jnp.int32) < k_eff
    z_sum = jnp.sum(jnp.where(take, -lowest_neg, 0.0))
    z_mean = z_sum / jnp.maximum(k_eff, 1).astype(jnp.float32)

    z_max_cut = z_mean + jnp.float32(cfg.initial_seed_threshold)
    any_above = jnp.any(kept & (z > z_max_cut))
    # quirk: if no point exceeds the threshold the seed set is EMPTY
    seeds = kept & (z <= z_max_cut) & any_above
    return jnp.where(n_kept > 0, seeds, jnp.zeros_like(seeds))


def _fit_partition(
    pts: jnp.ndarray, seg_mask: jnp.ndarray, cfg: SegmentationConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GPF iterations for one partition over the sorted cloud.

    pts: (N,3) sorted cloud; seg_mask: (N,) partition membership.
    Returns (labels (N,) int32 valid only under seg_mask, normal (3,), d (),
    plane_valid ()).
    """
    seg_n = jnp.sum(seg_mask.astype(jnp.int32))
    ground = _masked_seed_selection(pts[:, 2], seg_mask, cfg)

    odt = jnp.float32(cfg.orthogonal_distance_threshold)

    def iteration(carry, _):
        ground, failed, normal, d = carry
        cnt = jnp.sum(ground.astype(jnp.int32))
        failed_now = failed | (cnt < 3)
        cnt_f = jnp.maximum(cnt, 3).astype(jnp.float32)

        w = ground.astype(jnp.float32)
        # two-pass masked moments: center on the masked mean first so the
        # covariance matmul does not cancel catastrophically in f32
        s1 = w @ pts                                   # (3,)
        centroid = s1 / cnt_f
        xc = pts - centroid
        s1c = w @ xc
        s2c = jnp.einsum("ni,nj->ij", xc * w[:, None], xc,
                         preferred_element_type=jnp.float32)
        cov = (s2c - jnp.outer(s1c, s1c) / cnt_f) / jnp.maximum(cnt_f - 1.0, 1.0)

        n_vec = smallest_eigenvector_3x3(cov)
        bad = ~jnp.all(jnp.isfinite(n_vec))
        failed_now = failed_now | bad
        d_new = n_vec @ centroid
        dist = pts @ n_vec - d_new
        # SIGNED comparison (ref: src/segmentation.cpp:299); ||n|| == 1
        new_ground = seg_mask & (dist < odt)

        ground_out = jnp.where(failed_now, ground, new_ground)
        normal_out = jnp.where(failed_now, normal, n_vec)
        d_out = jnp.where(failed_now, d, d_new)
        return (ground_out, failed_now, normal_out, d_out), None

    init = (ground, jnp.bool_(False), jnp.array([0.0, 0.0, 1.0], jnp.float32),
            jnp.float32(0.0))
    (ground, failed, normal, d), _ = jax.lax.scan(
        iteration, init, None, length=cfg.number_of_iterations)

    labels = jnp.where(ground, SEG_GROUND, SEG_OBSTACLE).astype(jnp.int32)
    labels = jnp.where(failed, SEG_OBSTACLE, labels)
    # <3-point partitions stay UNKNOWN (ref: src/segmentation.cpp:224-229)
    too_small = seg_n < 3
    labels = jnp.where(too_small, SEG_UNKNOWN, labels)
    plane_valid = (~failed) & (~too_small)
    return labels, normal, d, plane_valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def gpf_segment(
    xyz: jnp.ndarray, mask: jnp.ndarray, cfg: SegmentationConfig
) -> SegmentationResult:
    """Segment a padded cloud into GROUND/OBSTACLE/UNKNOWN.

    xyz: (N,3) float32 padded cloud; mask: (N,) bool validity.
    Returns per-point labels in the ORIGINAL point order plus the fitted
    planes per partition.
    """
    num_p = cfg.number_of_planar_partitions
    n_pts = xyz.shape[0]

    # one multi-operand sort carries the coordinates along with the key, so
    # no (N,3) random gather is needed to build the sorted cloud (argsort +
    # xyz[order] costs a full-cloud gather; lax.sort streams). Stable sort on
    # the key keeps tie order identical to the stable argsort it replaces.
    sort_key = jnp.where(mask, xyz[:, 0], _BIG)
    _, sx_, sy_, sz_, order = jax.lax.sort(
        (sort_key, xyz[:, 0], xyz[:, 1], xyz[:, 2],
         jnp.arange(n_pts, dtype=jnp.int32)), num_keys=1)
    sp = jnp.stack([sx_, sy_, sz_], axis=1)  # valid points occupy ranks [0, n)

    n_valid = jnp.sum(mask.astype(jnp.int32))
    per_seg = n_valid // num_p
    ranks = jnp.arange(n_pts, dtype=jnp.int32)
    seg_ids = jnp.where(
        (ranks < per_seg * num_p), ranks // jnp.maximum(per_seg, 1), -1)
    # per_seg == 0: everything dropped (matches n < partitions in reference)
    seg_ids = jnp.where(per_seg > 0, seg_ids, -1)

    seg_masks = seg_ids[None, :] == jnp.arange(num_p, dtype=jnp.int32)[:, None]

    fit = jax.vmap(_fit_partition, in_axes=(None, 0, None))
    labels_p, normals, ds, valids = fit(sp, seg_masks, cfg)

    # combine partitions: each sorted position belongs to at most one segment
    labels_sorted = jnp.full((n_pts,), SEG_UNKNOWN, jnp.int32)
    for s in range(num_p):
        labels_sorted = jnp.where(seg_masks[s], labels_p[s], labels_sorted)

    labels = jnp.zeros((n_pts,), jnp.int32).at[order].set(labels_sorted)
    labels = jnp.where(mask, labels, SEG_UNKNOWN)
    return SegmentationResult(labels, Plane(normals, ds), valids)
