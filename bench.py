#!/usr/bin/env python
"""Headline benchmark: batched env steps/sec/chip with pixel render.

Thin wrapper over cartpoleplusplus_tpu.utils.benchmark (the framework's
first-class perf CLI).  Measures the flagship fused loop — vectorized SoA
sim + per-repeat pixel render + actor forward + replay write + DDPG train
step, all one jitted program — on the default backend (the real TPU chip
under the driver).  Streams one JSON line per completed row, then the
summary line LAST: {"metric", "value", "unit", "vs_baseline", "vs_ceiling",
"north_star", "rows"}.  If the backend is unreachable it fail-fast emits a
structured {"error": ...} line instead of hanging (the round-3 outage
lesson — see utils/benchmark.py).

Baseline: the reference publishes no numbers (BASELINE.md); the binding
target is BASELINE.json's north star of 10,000,000 batched env steps/sec/chip
with pixel rendering, so vs_baseline = value / 1e7.  The measured roofline
(BASELINE.md round 3) proves 1e7 is infeasible at exact 1-cam 50×50 in this
algorithm class, so each row also carries its measured-census ``ceiling``
and ``vs_ceiling`` — the honest ray-count-scaled formulation.
"""

from cartpoleplusplus_tpu.utils.benchmark import main

if __name__ == "__main__":
    main()
