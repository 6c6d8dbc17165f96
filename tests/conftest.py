"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without a pod via
``--xla_force_host_platform_device_count`` — the standard JAX trick
(the TPU-world analogue of testing multi-node without a cluster).

This image force-registers a remote TPU backend ("axon") from
sitecustomize at interpreter start and pins JAX_PLATFORMS=axon in the
environment, so plain env vars here are not enough: the platform must be
overridden through jax.config after import.
"""

import os
import sys

# RPF_TEST_PLATFORM=tpu opts into running the suite on the real device
# (multi-device tests will be skipped there); default is the virtual CPU
# mesh.
_want_tpu = os.environ.get("RPF_TEST_PLATFORM") == "tpu"

if not _want_tpu:
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _want_tpu:
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_collection_modifyitems(config, items):
    """In TPU mode (single chip) skip tests that need the 8-device mesh."""
    if len(jax.devices()) >= 8:
        return
    import pytest
    skip = pytest.mark.skip(reason="needs an 8-device mesh (CPU harness)")
    for item in items:
        if ("test_sharding" in item.nodeid
                or "test_bigfft" in item.nodeid
                or "shard_transform" in item.nodeid
                or "multistream" in item.nodeid.lower()):
            item.add_marker(skip)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
