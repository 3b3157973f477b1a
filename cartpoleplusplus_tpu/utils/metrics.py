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
    """stderr pretty lines + optional JSONL file sink + optional TensorBoard.

    ``tb_dir`` (SURVEY.md §5 "structured JSONL metrics + optional
    TensorBoard"): when given, numeric fields are ALSO written as TensorBoard
    scalars via ``torch.utils.tensorboard`` (baked into the image; absence is
    tolerated with a one-line warning so the JSONL path never depends on it).
    The scalar step is the ``step`` field if the caller logs one, else an
    event counter.
    """

    def __init__(self, jsonl_path: Optional[str] = None, quiet: bool = False,
                 tb_dir: Optional[str] = None):
        self._file = open(jsonl_path, "a") if jsonl_path else None
        self._quiet = quiet
        self._t0 = time.monotonic()
        self._tb = None
        self._n = 0
        if tb_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tb_dir)
            except Exception as exc:  # pragma: no cover - env without torch
                print(f"[metrics] tensorboard unavailable ({exc}); "
                      "continuing with JSONL/stderr only", file=sys.stderr)

    def log(self, event: str, **fields):
        record = {"ts": time.time(), "elapsed_s": round(time.monotonic() - self._t0, 3),
                  "event": event, **fields}
        if self._file:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._tb is not None:
            self._n += 1
            step = fields.get("step", fields.get("segment", self._n))
            if not isinstance(step, (int, float)) or isinstance(step, bool):
                step = self._n  # non-numeric step label: fall back, don't die
            for k, v in fields.items():
                # bool is an int subclass — a True/False field is a label,
                # not a scalar curve.
                if (isinstance(v, (int, float)) and not isinstance(v, bool)
                        and k != "segment"):
                    self._tb.add_scalar(f"{event}/{k}", v, int(step))
        if not self._quiet:
            kv = " ".join(f"{k}={_fmt(v)}" for k, v in fields.items())
            print(f"[{dts()}] {event} {kv}", file=sys.stderr)

    def close(self):
        if self._file:
            self._file.close()
            self._file = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.4g}"
    return v
