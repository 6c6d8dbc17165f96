"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without a pod via
``--xla_force_host_platform_device_count`` — the standard JAX trick
(the TPU-world analogue of testing multi-node without a cluster).
Must set the env vars before jax initializes, hence this conftest.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
