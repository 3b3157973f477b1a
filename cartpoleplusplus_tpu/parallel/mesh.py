"""Device-mesh helpers for multi-chip scaling.

The reference is single-process/single-device with no communication backend
(SURVEY.md §2.3).  The TPU rebuild scales by sharding the env batch over a
1-D mesh: each chip owns its env shard + replay shard; parameters are
replicated; the only cross-chip traffic is the per-update gradient ``pmean``
riding ICI (XLA collectives inserted under ``shard_map``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (call FIRST, before any JAX API).

    Multi-host scaling of the same 1-D env mesh: each host contributes its
    local chips, ``make_mesh()`` then spans every chip in the job, and the
    training-step program is unchanged — the per-update gradient ``pmean``
    rides ICI within a slice and DCN across hosts, both inserted by XLA
    from the same ``shard_map`` annotations (SURVEY.md §2.3).  On TPU pods
    the arguments are auto-detected from the environment; pass them
    explicitly elsewhere.  No-op when the job is single-process.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(num_devices: Optional[int] = None, axis: str = ENV_AXIS) -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (all by default).

    ``jax.devices()`` is job-global: under a multi-host runtime
    (:func:`init_multihost`) the mesh spans every host's chips and the env
    shards place round-robin across them.
    """
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_leading(mesh: Mesh, tree, axis: str = ENV_AXIS):
    """Place a pytree with every array sharded along its leading dim."""

    def put(x):
        spec = P(axis) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
