"""154-frame golden parity run: device pipeline vs host oracles.

For EVERY bundled KITTI frame (SURVEY §4's golden-output requirement):

  1. ground-mask IoU (device GPF vs oracle GPF)            >= 0.99
  2. clustering EXACTNESS: device labels vs the native radius-CC oracle
     on the device's own obstacle mask                     == bit-identical
  3. end-to-end cluster F1 vs the full oracle pipeline
     (oracle seg -> oracle CC)                             >= 0.99
  4. overflow counters                                     == 0
  5. outlines: one per valid cluster
  6. FEC parity: device labels vs the faithful serial FEC oracle at the
     reference's default cluster_quality=0.5 (order-SENSITIVE, see
     ACCURACY.md), which must sit inside FEC's own order-sensitivity band.
     The band is measured per frame by running the native FEC under K=4
     additional equally-valid point orders (reversed + 3 seeded shuffles —
     the reference's order is an artifact of KITTI file order + KD-tree
     layout, ref: src/clustering.cpp:70,90) and diffing FEC against
     itself. The PASS criterion is statistical, because the device F1 is
     one more exchangeable sample: per-frame it must clear the band
     minimum minus 0.05 (catastrophe guard), and across the sequence the
     mean device-vs-FEC F1 must be >= the mean per-frame band minimum
     (i.e. the device agrees with FEC at least as well as reordered FEC
     agrees with itself, in expectation).

Writes a summary to GOLDEN.json at the repo root and exits nonzero on any
violation. Runtime: ~20 min (TPU device path + native C++ oracle).

Usage: python tools/golden_run.py [--frames N] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

import numpy as np


def oracle_cc(xyz: np.ndarray, ccfg) -> np.ndarray:
    """radius_cc_cluster semantics via the fast native path."""
    from lidar_processing_tpu.ops import hull_native
    from lidar_processing_tpu.types import CLUSTER_INVALID
    n = xyz.shape[0]
    if n == 0:
        return np.full(0, CLUSTER_INVALID, np.int32)
    if not hull_native.native_available():
        from lidar_processing_tpu.oracle.reference import radius_cc_cluster
        return radius_cc_cluster(xyz, ccfg)
    roots = hull_native.radius_cc(
        np.ascontiguousarray(xyz, np.float32),
        math.sqrt(ccfg.distance_squared))
    uniq, counts = np.unique(roots, return_counts=True)
    valid = ((counts >= ccfg.min_cluster_size)
             & (counts <= ccfg.max_cluster_size))
    remap = np.full(n, CLUSTER_INVALID, np.int32)
    remap[uniq[valid]] = np.arange(int(valid.sum()), dtype=np.int32)
    return remap[roots]


def fec_with_order(xyz: np.ndarray, ccfg, perm: np.ndarray) -> np.ndarray:
    """Native FEC run under a permuted point order, labels mapped back.

    The permutation changes BFS seed order and neighbor enumeration order
    simultaneously — both are implementation artifacts of the reference
    (ref: src/clustering.cpp:70,90), so FEC(perm(x)) is an equally valid
    "reference" output. Labels are remapped to original point order
    (cluster ids stay seed-order relative to the permuted run; cluster_f1
    is id-bijection invariant).
    """
    from lidar_processing_tpu.oracle.reference import fec_cluster
    lp = fec_cluster(np.ascontiguousarray(xyz[perm]), ccfg)
    out = np.empty_like(lp)
    out[perm] = lp
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--out", default="GOLDEN.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lidar_processing_tpu.config import DEFAULT_CONFIG
    from lidar_processing_tpu.io.dataset import list_frames, load_frame
    from lidar_processing_tpu.oracle import diff as odiff
    from lidar_processing_tpu.oracle import reference as orc
    from lidar_processing_tpu.runtime.pipeline import (device_frame_step,
                                                       host_outputs)
    from lidar_processing_tpu.types import SEG_OBSTACLE, pad_cloud

    cfg = DEFAULT_CONFIG
    cap = cfg.pipeline.max_points
    frames = list_frames()[: args.frames]

    step = jax.jit(lambda x, m: device_frame_step(x, m, cfg))

    ious, f1s = [], []
    fec_f1s, fec_band_mins = [], []
    n_exact = 0
    n_overflow = 0
    n_fec_in_band = 0
    bad: list = []
    rng = np.random.default_rng(0)
    t0 = time.time()
    for i, path in enumerate(frames):
        xyz, _ = load_frame(path)
        n = xyz.shape[0]
        pc = pad_cloud(xyz, None, cap)
        fr = step(jnp.asarray(pc.xyz), jnp.asarray(pc.mask))
        out = host_outputs(fr, cfg, n)

        # 1. segmentation IoU
        oseg = orc.gpf_segment(xyz, cfg.segmentation)
        iou = odiff.ground_mask_iou(out.seg_labels, oseg.labels)
        ious.append(float(iou))

        # 2. exact clustering on the device's own obstacle mask
        dev_obst = out.seg_labels == SEG_OBSTACLE
        dev_cl = out.cluster_labels[dev_obst]
        ref_cl = oracle_cc(xyz[dev_obst], cfg.clustering)
        exact = bool(np.array_equal(dev_cl, ref_cl))
        n_exact += exact

        # 3. end-to-end F1 vs the full oracle
        o_obst = oseg.labels == SEG_OBSTACLE
        o_cl = oracle_cc(xyz[o_obst], cfg.clustering)
        f1, _ = odiff.cluster_f1(out.cluster_labels[o_obst], o_cl)
        f1s.append(float(f1))

        # 4./5. overflow + outline count (one per valid cluster)
        n_overflow += out.overflow != 0
        n_valid = out.num_clusters
        outline_ok = len(out.outlines) == n_valid

        # 6. FEC parity vs its own order-sensitivity band (ACCURACY.md):
        # the device must agree with serial FEC at least as well as FEC
        # agrees with itself under equally-valid point orders.
        obst_xyz = np.ascontiguousarray(xyz[dev_obst])
        m = obst_xyz.shape[0]
        fec_id = orc.fec_cluster(obst_xyz, cfg.clustering)
        perms = [np.arange(m)[::-1].copy()] + [rng.permutation(m)
                                               for _ in range(3)]
        band = min(
            odiff.cluster_f1(
                fec_with_order(obst_xyz, cfg.clustering, p), fec_id)[0]
            for p in perms)
        fec_f1, _ = odiff.cluster_f1(dev_cl, fec_id)
        fec_f1s.append(float(fec_f1))
        fec_band_mins.append(float(band))
        fec_ok = fec_f1 >= band - 0.05   # per-frame catastrophe guard
        n_fec_in_band += fec_f1 >= band

        if (iou < 0.99 or not exact or f1 < 0.99 or out.overflow
                or not outline_ok or not fec_ok):
            bad.append(dict(frame=i, iou=float(iou), exact=exact,
                            f1=float(f1), overflow=int(out.overflow),
                            outlines=len(out.outlines),
                            clusters=int(n_valid),
                            fec_f1=float(fec_f1),
                            fec_band_min=float(band)))
        if i % 25 == 0:
            print(f"[{i}/{len(frames)}] iou={iou:.5f} exact={exact} "
                  f"f1={f1:.5f} fec={fec_f1:.4f} band={band:.4f} "
                  f"ovf={out.overflow} ({time.time() - t0:.0f}s)")

    summary = dict(
        n_frames=len(frames),
        iou_min=min(ious), iou_mean=float(np.mean(ious)),
        f1_min=min(f1s), f1_mean=float(np.mean(f1s)),
        cluster_exact_frames=n_exact,
        overflow_frames=n_overflow,
        fec_f1_min=min(fec_f1s), fec_f1_mean=float(np.mean(fec_f1s)),
        fec_band_min=min(fec_band_mins),
        fec_band_mean=float(np.mean(fec_band_mins)),
        fec_frames_in_band=n_fec_in_band,
        fec_f1_per_frame=[round(v, 5) for v in fec_f1s],
        fec_band_per_frame=[round(v, 5) for v in fec_band_mins],
        violations=bad,
        elapsed_s=round(time.time() - t0, 1),
    )
    # population-level FEC criterion (see module docstring item 6)
    if summary["fec_f1_mean"] < summary["fec_band_mean"]:
        bad.append(dict(
            frame=-1, reason="fec_f1_mean below mean FEC self-agreement "
            "band minimum", fec_f1_mean=summary["fec_f1_mean"],
            fec_band_mean=summary["fec_band_mean"]))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k not in ("violations", "fec_f1_per_frame",
                                   "fec_band_per_frame")}))
    if bad:
        print(f"FAIL: {len(bad)} frames violate the golden contract")
        for b in bad[:10]:
            print(" ", b)
        return 1
    print("PASS: all frames meet the golden contract")
    return 0


if __name__ == "__main__":
    sys.exit(main())
