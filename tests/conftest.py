"""Test configuration: force an 8-device virtual CPU mesh.

Tests must be reproducible and runnable without TPU hardware; multi-chip
sharding tests (tests/test_parallel.py) need several devices.  Both are served
by forcing the CPU backend with 8 virtual devices — the TPU analogue of
"distributed tests without a cluster" (SURVEY.md §4).  These env vars must be
set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
