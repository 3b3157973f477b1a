"""Parallelism layer: device mesh + env-sharded distributed training.

The reference has no distributed subsystem (SURVEY.md §2.3); this is the
TPU-native design — shard_map over a 1-D env mesh with ICI gradient pmean.
"""

from cartpoleplusplus_tpu.parallel.distributed import (
    global_ddpg_state,
    make_distributed,
    make_distributed_segment,
    state_specs,
)
from cartpoleplusplus_tpu.parallel.mesh import (
    ENV_AXIS,
    init_multihost,
    make_mesh,
    replicate,
    shard_leading,
)

__all__ = [
    "global_ddpg_state",
    "make_distributed",
    "make_distributed_segment",
    "state_specs",
    "ENV_AXIS",
    "init_multihost",
    "make_mesh",
    "replicate",
    "shard_leading",
]
