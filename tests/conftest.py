"""Test configuration: force a real 8-device virtual CPU mesh.

Tests must be reproducible and runnable without TPU hardware; multi-chip
sharding tests need several devices.  Both are served by forcing the CPU
backend with 8 virtual devices — the TPU analogue of "distributed tests
without a cluster" (SURVEY.md §4).

Note the sandbox's axon sitecustomize imports jax at interpreter start and
calls ``jax.config.update("jax_platforms", "axon,cpu")``, which overrides the
JAX_PLATFORMS env var — so we must override the *config* again here, before
any backend initializes, in addition to setting the env vars.
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
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
