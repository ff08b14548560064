"""Test harness config.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path is
exercised without TPU hardware, and with x64 enabled so float64 oracle
comparisons are possible (the engine still takes an explicit dtype).
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
