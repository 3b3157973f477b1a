"""Metrics / logging — rebuild of the reference's stderr episode stats.

The reference logs formatted per-episode lines to stderr and parses them
later with R scripts (SURVEY.md §5).  The rebuild keeps human-readable stderr
lines and adds structured JSONL (one object per event) so learning curves are
machine-parseable without regexes.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Optional


def dts() -> str:
    """Datetime stamp (reference util.DTS)."""
    return time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())


class MetricsLogger:
    """stderr pretty lines + optional JSONL file sink."""

    def __init__(self, jsonl_path: Optional[str] = None, quiet: bool = False):
        self._file = open(jsonl_path, "a") if jsonl_path else None
        self._quiet = quiet
        self._t0 = time.monotonic()

    def log(self, event: str, **fields):
        record = {"ts": time.time(), "elapsed_s": round(time.monotonic() - self._t0, 3),
                  "event": event, **fields}
        if self._file:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if not self._quiet:
            kv = " ".join(f"{k}={_fmt(v)}" for k, v in fields.items())
            print(f"[{dts()}] {event} {kv}", file=sys.stderr)

    def close(self):
        if self._file:
            self._file.close()
            self._file = None


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.4g}"
    return v
