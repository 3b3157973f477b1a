"""Learning-curve plot CLI (utils/plots.py — the reference's R-script row).

The plots CLI is the transcription path for every recorded run (README
curves, runs/pixel_td3_curves.png); pin that a metrics JSONL round-trips
into a PNG and that the x-column auto-selection prefers env_steps.
"""

import json
import os

from cartpoleplusplus_tpu.utils import plots


def _write_run(path, n=5, extra=None):
    with open(path, "w") as f:
        for i in range(n):
            rec = {"event": "train", "segment": i, "env_steps": i * 100,
                   "eval_ep_len": 10.0 + i, **(extra or {})}
            f.write(json.dumps(rec) + "\n")
        f.write('{"event": "restore", "step": 3}\n')  # non-train: ignored
        f.write("not json\n")  # corrupt tail: ignored


def test_load_run_filters_train_events(tmp_path):
    p = os.path.join(str(tmp_path), "run.jsonl")
    _write_run(p)
    cols = plots.load_run(p)
    assert cols["eval_ep_len"] == [10.0, 11.0, 12.0, 13.0, 14.0]
    assert cols["env_steps"] == [0, 100, 200, 300, 400]
    assert "step" not in cols  # the restore event was filtered


def test_cli_writes_png(tmp_path):
    runs = []
    for s in (0, 1):
        p = os.path.join(str(tmp_path), f"run_s{s}.jsonl")
        _write_run(p)
        runs.append(p)
    out = os.path.join(str(tmp_path), "curves.png")
    plots.main([*runs, "-o", out])
    assert os.path.getsize(out) > 1000
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_cli_survives_missing_column(tmp_path):
    """A run without the requested y column warns and is skipped; the PNG is
    still produced from the remaining runs."""
    good = os.path.join(str(tmp_path), "good.jsonl")
    _write_run(good)
    bad = os.path.join(str(tmp_path), "bad.jsonl")
    with open(bad, "w") as f:
        f.write(json.dumps({"event": "train", "segment": 0}) + "\n")
    out = os.path.join(str(tmp_path), "c.png")
    plots.main([bad, good, "-o", out])
    assert os.path.exists(out)
