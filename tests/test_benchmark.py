"""Benchmark harness behavior (utils/benchmark.py).

The perf CLI is driver-facing (repo-root bench.py → BENCH_r{N}.json), so its
fallback logic is load-bearing: the raster render kernel's Mosaic BACKEND
compile only happens on real hardware, and a rejection must degrade to the
validated slab kernel — once — rather than brick the bench or pay a failed
remote compile per row.
"""

from types import SimpleNamespace

from cartpoleplusplus_tpu.utils import benchmark as B


def _opts(**kw):
    base = dict(
        render_raster=True, lowdim=False, sim_only=False, trace_dir=None,
        segments=1, steps_per_segment=1, num_envs=1,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def _fake_build(calls):
    """build() stub: the segment fn raises iff the raster kernel is on."""

    def build(opts):
        raster = bool(getattr(opts, "render_raster", False))
        calls.append(raster)

        def segment(st):
            if raster:
                raise RuntimeError("backend rejected the raster kernel")
            return st, {"reward": 1.0}

        return 0, segment

    return build


def test_raster_rejection_falls_back_to_slab(monkeypatch):
    calls = []
    monkeypatch.setattr(B, "_RASTER_REJECTED", False)
    monkeypatch.setattr(B, "build", _fake_build(calls))
    result = B.run(_opts())
    # Raster attempt, ONE raster retry (so a transient tunnel hiccup isn't
    # misattributed as a backend rejection), then the slab rebuild.
    assert calls == [True, True, False]
    assert result["_render_raster"] is False
    assert result["value"] > 0


def test_raster_rejection_is_sticky_across_rows(monkeypatch):
    calls = []
    monkeypatch.setattr(B, "_RASTER_REJECTED", False)
    monkeypatch.setattr(B, "build", _fake_build(calls))
    B.run(_opts())
    B.run(_opts())  # second bench row: must NOT retry the rejected kernel
    assert calls == [True, True, False, False]


def test_raster_transient_failure_recovers(monkeypatch):
    """A single transient warmup failure with raster on must NOT downgrade
    the process to the slab kernel — the retry succeeds and raster stays."""
    calls = []
    fail_once = [True]

    def build(opts):
        raster = bool(getattr(opts, "render_raster", False))
        calls.append(raster)
        if fail_once and raster:
            fail_once.pop()

            def flaky(st):
                raise RuntimeError("transient tunnel hiccup")

            return 0, flaky

        def ok(st):
            return st, {"reward": 1.0}

        return 0, ok

    monkeypatch.setattr(B, "_RASTER_REJECTED", False)
    monkeypatch.setattr(B, "build", build)
    result = B.run(_opts())
    assert calls == [True, True]  # raster, failed; raster retry, succeeded
    assert result["_render_raster"] is True
    assert B._RASTER_REJECTED is False


def test_lowdim_failure_propagates(monkeypatch):
    """The fallback is scoped to the pixel raster path — a low-dim loop
    failure is a real bug and must raise."""
    calls = []
    monkeypatch.setattr(B, "_RASTER_REJECTED", False)

    def build(opts):
        def segment(st):
            raise RuntimeError("real failure")

        return 0, segment

    monkeypatch.setattr(B, "build", build)
    import pytest

    with pytest.raises(RuntimeError):
        B.run(_opts(lowdim=True, render_raster=False))
