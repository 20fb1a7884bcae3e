"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding/collective logic is exercised without a TPU pod via
``--xla_force_host_platform_device_count`` (see SURVEY.md §4). The
environment may pre-register an accelerator platform at interpreter start
(sitecustomize), so we both set the env vars AND force the platform through
jax.config before any backend initializes (backend init is lazy).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert len(jax.devices()) == 8, (
    "tests require the 8-device virtual CPU mesh; got "
    f"{jax.devices()} — was JAX initialized before conftest?")


@pytest.fixture(scope="session")
def frame0():
    """First bundled KITTI frame (xyz float32 (n,3))."""
    from lidar_processing_tpu.io.dataset import list_frames, load_frame
    xyz, inten = load_frame(list_frames()[0])
    return xyz


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(seed=1234)
