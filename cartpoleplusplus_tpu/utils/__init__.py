"""Utilities: checkpointing, metrics, exploration noise, event logs.

Rebuild of the reference's util.py + event_log.py (SURVEY.md §2.1, §5).
"""

from cartpoleplusplus_tpu.utils.checkpoint import restore_latest, save
from cartpoleplusplus_tpu.utils.metrics import MetricsLogger, dts
from cartpoleplusplus_tpu.utils.noise import ou_init, ou_step

__all__ = ["restore_latest", "save", "MetricsLogger", "dts", "ou_init", "ou_step"]
