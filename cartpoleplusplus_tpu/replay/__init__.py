"""Replay layer: on-device circular transition buffer.

Rebuild of the reference's replay_memory.py (SURVEY.md §2.1).
"""

from cartpoleplusplus_tpu.replay.buffer import (
    ReplayState,
    add,
    add_batch,
    create,
    sample,
    sample_prioritized,
    update_priorities,
)

__all__ = [
    "ReplayState", "add", "add_batch", "create", "sample",
    "sample_prioritized", "update_priorities",
]
