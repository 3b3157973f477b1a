#!/usr/bin/env python
"""Summarize the round-3 chip-queue results for BASELINE/README transcription.

The outage queue (scripts/chip_queue.sh) writes one log per step under
/tmp/chipq/.  This parses every bench JSON line and every TD3 jsonl final
into one table so the transcription pass (BASELINE.md round-3.5 tables,
README perf rows, default-flip decisions) reads a single screen instead of
twenty logs.  Host-side only; safe to run while the queue is live.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

LOG_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chipq"


def bench_lines(path):
    out = []
    for line in open(path, errors="replace"):
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def main():
    if not os.path.isdir(LOG_DIR):
        print(f"no {LOG_DIR}; queue has not started")
        return

    qlog = os.path.join(LOG_DIR, "queue.log")
    status = {}
    if os.path.exists(qlog):
        for line in open(qlog):
            m = re.search(r"(START|END) ([^\s:]+):?(?:.* exit=(\d+))?", line)
            if m:
                status[m.group(2)] = (
                    "running" if m.group(1) == "START" else f"exit={m.group(3)}"
                )

    print(f"== bench rows ({LOG_DIR}) ==")
    for path in sorted(glob.glob(os.path.join(LOG_DIR, "*.log"))):
        step = os.path.basename(path)[:-4]
        if step == "queue":
            continue
        rows = bench_lines(path)
        tag = status.get(step, "?")
        if not rows:
            print(f"{step:18s} [{tag}] (no bench line)")
        for r in rows:
            extra = ""
            if r.get("vs_ceiling") is not None:
                extra = f"  vs_ceiling={r['vs_ceiling']}"
            if r.get("error"):
                extra += f"  ERROR: {r['error']}"
            print(
                f"{step:18s} [{tag}] {r.get('metric', '?'):34s} "
                f"{r.get('value', 0):>12,.0f} {r.get('unit', '')}"
                f"  vs_baseline={r.get('vs_baseline', '')}{extra}"
            )

    print("\n== TD3 pixel finals (runs/ddpg_pixels_td3*.jsonl) ==")
    for path in sorted(glob.glob("runs/ddpg_pixels_td3*.jsonl")):
        last = best = None
        for line in open(path):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("event") == "train":
                last = rec
                if best is None or rec["eval_ep_rew"] > best["eval_ep_rew"]:
                    best = rec
        if last:
            print(
                f"{os.path.basename(path):34s} final(seg {last['segment']:>6}) "
                f"{last['eval_ep_rew']:6.1f}   peak {best['eval_ep_rew']:6.1f}"
            )


if __name__ == "__main__":
    main()
