"""Test configuration.

Tests run on CPU with 8 virtual devices (the TPU-native analogue of a fake
backend, per SURVEY.md §4): sharding/pjit tests get a real multi-device mesh
without hardware. This must happen before any jax computation; the axon TPU
plugin otherwise wins platform selection regardless of JAX_PLATFORMS.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
