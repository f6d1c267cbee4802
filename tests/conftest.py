"""Test configuration.

Default lane: tests run on CPU with 8 virtual devices (the TPU-native
analogue of a fake backend, per SURVEY.md §4) — sharding/pjit tests get a
real multi-device mesh without hardware. This must happen before any jax
computation; the axon TPU plugin otherwise wins platform selection
regardless of JAX_PLATFORMS.

TPU lane: `SOPRO_TEST_TPU=1 pytest tests/` keeps the real device backend and
runs ONLY the tests marked `@pytest.mark.tpu` (tests/test_tpu.py — real
Mosaic Pallas lowering, on-chip end-to-end synthesize). Each lane skips the
other's tests.
"""

import os

TPU_LANE = os.environ.get("SOPRO_TEST_TPU", "") not in ("", "0")

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # XLA CPU aborts the whole process if a cross-device collective's
    # participants don't all arrive within 40 s; with the 8 virtual devices
    # time-sharing this box's single core, flagship-size sharded steps
    # legitimately exceed that. Raise both rendezvous timeouts.
    if "collective" not in flags:
        flags += (
            " --xla_cpu_collective_timeout_seconds=1800"
            " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
        )
    os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs the real TPU device (SOPRO_TEST_TPU=1)"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        is_tpu = bool(item.get_closest_marker("tpu"))
        if TPU_LANE and not is_tpu:
            item.add_marker(pytest.mark.skip(
                reason="CPU-lane test (unset SOPRO_TEST_TPU)"))
        elif not TPU_LANE and is_tpu:
            item.add_marker(pytest.mark.skip(
                reason="real-TPU test: run with SOPRO_TEST_TPU=1"))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
