"""Agent-side raster backend probe (agents/common.probe_raster_or_downgrade).

The raster kernel's Mosaic backend compile only happens on real hardware;
agents must downgrade to the validated slab kernel instead of dying minutes
into their first segment compile (ADVICE r3).  The probe's decision logic is
pinned here with a stubbed kernel; the real-compile path is exercised by the
chip queue's TD3 cells.
"""

from types import SimpleNamespace

from cartpoleplusplus_tpu.agents import common
from cartpoleplusplus_tpu.env.config import CartpoleConfig


def _opts(**kw):
    base = dict(pallas_render=True, render_raster=True, render_tile_e=8)
    base.update(kw)
    return SimpleNamespace(**base)


def _cfg(pixels=True):
    return CartpoleConfig(use_raw_pixels=pixels, num_cameras=1,
                          render_width=50, render_height=50)


def test_backend_rejection_downgrades(monkeypatch):
    import cartpoleplusplus_tpu.render.pallas_kernel as pk

    def reject(*a, **kw):
        raise RuntimeError("Mosaic backend rejected the kernel")

    monkeypatch.setattr(pk, "make_render_batched", reject)
    opts = _opts()
    common.probe_raster_or_downgrade(_cfg(), opts)
    assert opts.render_raster is False


def test_probe_success_keeps_raster(monkeypatch):
    import cartpoleplusplus_tpu.render.pallas_kernel as pk

    calls = []

    def ok(config, tile_e, raster):
        calls.append((tile_e, raster))
        import jax.numpy as jnp

        return lambda scene, rigid: jnp.zeros((tile_e, 4), jnp.uint8)

    monkeypatch.setattr(pk, "make_render_batched", ok)
    opts = _opts()
    common.probe_raster_or_downgrade(_cfg(), opts)
    assert opts.render_raster is True
    assert calls == [(8, True)]  # probed the requested tile, raster on


def test_probe_skips_when_not_applicable():
    """No pallas render / no raster / low-dim: the probe must not touch
    jax at all (it may run before a backend is reachable)."""
    for opts in (_opts(pallas_render=False), _opts(render_raster=False)):
        before = opts.render_raster
        common.probe_raster_or_downgrade(_cfg(), opts)
        assert opts.render_raster is before
    opts = _opts()
    common.probe_raster_or_downgrade(_cfg(pixels=False), opts)
    assert opts.render_raster is True
