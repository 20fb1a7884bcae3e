"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding/collective logic is exercised without a TPU pod via
``--xla_force_host_platform_device_count`` (see SURVEY.md §4). Must be set
before JAX initializes, hence the env mutation at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def frame0():
    """First bundled KITTI frame (xyz float32 (n,3))."""
    from lidar_processing_tpu.io.dataset import list_frames, load_frame
    xyz, inten = load_frame(list_frames()[0])
    return xyz


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(seed=1234)
