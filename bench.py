"""Headline benchmark: frames/sec/chip on the bundled 154-frame KITTI sequence.

Runs the full device pipeline (GPF segmentation -> Euclidean clustering ->
cluster gather -> small-cluster hulls) on every frame, reports steady-state
frames/sec on one chip, and checks accuracy vs the host oracle on a frame
sample. Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N}
vs_baseline is relative to the reference's 10 Hz real-time budget
(ref: /root/reference/README.md:4, src/dataloader.cpp:30).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lidar_processing_tpu.config import DEFAULT_CONFIG
    from lidar_processing_tpu.io.dataset import list_frames, load_frame
    from lidar_processing_tpu.oracle import diff as odiff
    from lidar_processing_tpu.oracle.reference import run_pipeline
    from lidar_processing_tpu.runtime.pipeline import device_frame_step
    from lidar_processing_tpu.types import pad_cloud

    cfg = DEFAULT_CONFIG
    cap = cfg.pipeline.max_points
    frames = list_frames()
    n_bench = len(frames)

    # preload + pad on host (the dataloader's preload, ref: dataloader.cpp:128)
    clouds = []
    for p in frames[:n_bench]:
        xyz, inten = load_frame(p)
        pc = pad_cloud(xyz, inten, cap)
        clouds.append((jnp.asarray(pc.xyz), jnp.asarray(pc.mask)))

    step = jax.jit(lambda x, m: device_frame_step(x, m, cfg))
    # warm up / compile
    out = step(*clouds[0])
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for xyz, mask in clouds:
        out = step(xyz, mask)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = len(clouds) / dt

    # accuracy spot-check vs the host oracles on 3 frames: primary contract
    # is exact Euclidean clustering (= reference FEC at cluster_quality -> 1,
    # order-independent); the order-dependent quality=0.5 shortcut is
    # reported as a secondary metric (see ACCURACY.md).
    ious, f1s, fec_f1s = [], [], []
    for i in (0, len(frames) // 2, len(frames) - 1):
        xyz, inten = load_frame(frames[i])
        pc = pad_cloud(xyz, inten, cap)
        fr = step(jnp.asarray(pc.xyz), jnp.asarray(pc.mask))
        n = xyz.shape[0]
        ref = run_pipeline(xyz, cfg, clustering_mode="cc")
        fec = run_pipeline(xyz, cfg, clustering_mode="fec")
        seg_dev = np.asarray(fr.seg.labels)[:n]
        cl_dev = np.asarray(fr.clustering.labels)[:n]
        ious.append(odiff.ground_mask_iou(seg_dev, ref.seg_labels))
        f1, _ = odiff.cluster_f1(
            cl_dev[ref.obstacle_indices], ref.cluster_labels)
        f1s.append(f1)
        fec_f1, _ = odiff.cluster_f1(
            cl_dev[fec.obstacle_indices], fec.cluster_labels)
        fec_f1s.append(fec_f1)

    result = {
        "metric": "frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),  # reference real-time budget 10 Hz
        "ms_per_frame": round(1000.0 / fps, 3),
        "n_frames": len(clouds),
        "ground_iou_min": round(float(min(ious)), 5),
        "cluster_f1_min": round(float(min(f1s)), 5),
        "fec_quality05_f1_min": round(float(min(fec_f1s)), 5),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
