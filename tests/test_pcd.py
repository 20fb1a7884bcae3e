"""PCD reader/writer tests against the bundled dataset headers."""

import numpy as np
import pytest

from lidar_processing_tpu.io.dataset import list_frames, load_frame, preload_padded
from lidar_processing_tpu.io.pcd import read_pcd, read_pcd_xyzi, write_pcd_xyzi


def test_dataset_enumeration():
    paths = list_frames()
    assert len(paths) == 154
    assert paths == sorted(paths)


def test_frame0_matches_header():
    paths = list_frames()
    fields = read_pcd(paths[0])
    assert set(fields) == {"x", "y", "z", "intensity"}
    # data/0000000000.pcd header declares POINTS 123398
    assert fields["x"].shape == (123398,)
    assert fields["x"].dtype == np.float32


def test_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    inten = rng.uniform(size=(100,)).astype(np.float32)
    p = tmp_path / "t.pcd"
    write_pcd_xyzi(p, xyz, inten)
    rx, ri = read_pcd_xyzi(p)
    np.testing.assert_array_equal(rx, xyz)
    np.testing.assert_array_equal(ri, inten)


def test_preload_padded():
    paths = list_frames()[:2]
    xyz, inten, counts = preload_padded(paths, capacity=131072)
    assert xyz.shape == (2, 131072, 3)
    assert counts[0] == 123398
    # padding is zero beyond count
    assert np.all(xyz[0, counts[0]:] == 0)
