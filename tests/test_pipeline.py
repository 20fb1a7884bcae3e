"""End-to-end pipeline tests: device step + host outputs vs the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_processing_tpu.config import DEFAULT_CONFIG
from lidar_processing_tpu.oracle import diff as odiff
from lidar_processing_tpu.oracle import reference as orc
from lidar_processing_tpu.types import pad_cloud


@pytest.fixture(scope="module")
def frame0_outputs(request):
    frame0 = request.getfixturevalue("frame0")
    from lidar_processing_tpu.runtime.pipeline import (device_frame_step,
                                                       host_outputs)
    cfg = DEFAULT_CONFIG
    pc = pad_cloud(frame0, None, cfg.pipeline.max_points)
    fr = device_frame_step(jnp.asarray(pc.xyz), jnp.asarray(pc.mask), cfg)
    return host_outputs(fr, cfg, frame0.shape[0])


class TestFramePipeline:
    def test_one_outline_per_cluster(self, frame0_outputs):
        out = frame0_outputs
        assert out.num_clusters > 300
        assert len(out.outlines) == out.num_clusters

    def test_matches_oracle(self, frame0, frame0_outputs):
        cfg = DEFAULT_CONFIG
        out = frame0_outputs
        ref = orc.run_pipeline(frame0, cfg, clustering_mode="cc")
        assert odiff.ground_mask_iou(out.seg_labels, ref.seg_labels) > 0.99
        f1, det = odiff.cluster_f1(
            out.cluster_labels[ref.obstacle_indices], ref.cluster_labels)
        assert f1 > 0.999, det
        assert len(out.outlines) == len(ref.outlines)
        # outlines match the oracle's (same clusters => same hulls), compared
        # as chamfer distance between matched polygons
        chamfer_mean, unmatched = odiff.match_outlines(
            out.outlines, ref.outlines)
        assert unmatched == 0
        assert chamfer_mean < 0.02, chamfer_mean
