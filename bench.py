#!/usr/bin/env python
"""Headline benchmark: batched env steps/sec/chip with pixel render.

Thin wrapper over cartpoleplusplus_tpu.utils.benchmark (the framework's
first-class perf CLI).  Measures the flagship fused loop — vectorized SoA
sim + per-repeat pixel render + actor forward + replay write + DDPG train
step, all one jitted program — on the default backend (the real TPU chip
under the driver), and prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); the binding
target is BASELINE.json's north star of 10,000,000 batched env steps/sec/chip
with pixel rendering, so vs_baseline = value / 1e7.
"""

from cartpoleplusplus_tpu.utils.benchmark import main

if __name__ == "__main__":
    main()
