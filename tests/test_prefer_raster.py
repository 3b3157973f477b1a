"""Per-config render-algorithm auto-pick (render.prefer_raster).

Round-4b throughput races had the projective raster winning every measured
config, and round 4 promoted it everywhere.  Round 5 DEMOTED it for
SAMPLED configs after the same-seed 2-cam samples=2 learning A/B
(chip_queue6 ab_2cam_*): the slab backend learns normally (final 109/200)
while the raster backend flatlines at the nop baseline for all 15000
segments — so the rule is raster for exact configs (obs_samples == 0,
learning-validated by the TD3 4-seed bar and the 35000-segment 2-cam-exact
push run), slab for sampled ones (the round-2/3 learning-validated
production kernel).  The rule and its plumbing (agent tristate flag, probe
resolution, bench child argv) are pinned here so a flag-default edit can't
silently flip a learning-validated assignment.
"""

from types import SimpleNamespace

from cartpoleplusplus_tpu.agents import common
from cartpoleplusplus_tpu.env.config import CartpoleConfig
from cartpoleplusplus_tpu.render import prefer_raster


def test_rule_matches_learning_ab():
    # Exact configs: raster (throughput-raced AND learning-validated).
    assert prefer_raster(1, 2, 0) is True       # 1-cam exact: raster +10.7%
    assert prefer_raster(2, 2, 0) is True       # 2-cam exact: push run 123.7
    assert prefer_raster(1, 1, 0) is True
    # Sampled configs: slab (round-5 A/B — raster flatlines at the nop
    # baseline on 2-cam samples=2; demoted for every sampled config until
    # the mechanism is isolated).
    assert prefer_raster(2, 2, 2) is False      # config-5 A/B: slab 109 vs 4.7
    assert prefer_raster(2, 2, 1) is False
    assert prefer_raster(2, 2, 4) is False
    assert prefer_raster(1, 2, 2) is False
    assert prefer_raster(1, 2, 1) is False


def _opts(**kw):
    base = dict(pallas_render=False, render_raster=None, render_tile_e=8)
    base.update(kw)
    return SimpleNamespace(**base)


def test_probe_resolves_tristate_to_config_winner():
    opts = _opts()
    common.probe_raster_or_downgrade(
        CartpoleConfig(use_raw_pixels=True, num_cameras=1,
                       render_width=50, render_height=50, obs_pool=2), opts)
    assert opts.render_raster is True

    opts = _opts()
    common.probe_raster_or_downgrade(
        CartpoleConfig(use_raw_pixels=True, num_cameras=2,
                       render_width=50, render_height=50,
                       obs_pool=2, obs_samples=2), opts)
    assert opts.render_raster is False  # round-5 A/B: slab for sampled

    # Low-dim: no renderer, auto resolves to slab-off so downstream
    # raster consumers (record/eval) never see a truthy leftover.
    opts = _opts()
    common.probe_raster_or_downgrade(CartpoleConfig(), opts)
    assert opts.render_raster is False


def test_probe_keeps_explicit_choice():
    for forced in (True, False):
        opts = _opts(render_raster=forced)
        common.probe_raster_or_downgrade(
            CartpoleConfig(use_raw_pixels=True, num_cameras=2,
                           render_width=50, render_height=50,
                           obs_pool=2, obs_samples=2), opts)
        assert opts.render_raster is forced


def test_make_venv_resolves_tristate():
    cfg = CartpoleConfig(use_raw_pixels=True, num_cameras=2,
                         render_width=50, render_height=50,
                         obs_pool=2, obs_samples=2)
    venv = common.make_venv(cfg, 4, render_raster=None)
    assert venv is not None  # resolved without error (slab pick)


def test_bench_child_argv_passes_auto_through():
    """A tristate parent must NOT pin the child: each row resolves auto
    against its own camera/sampling overrides."""
    from cartpoleplusplus_tpu.utils import benchmark as B

    opts = SimpleNamespace(
        num_envs=64, num_cameras=2, action_repeats=3, steps_per_repeat=5,
        steps_per_segment=2, batch_size=8, replay_capacity=128, segments=1,
        obs_pool=2, obs_samples=2, render_tile_e=32, pixel_pool=1,
        solver_iters=5, min_wall_s=0.5, lowdim=False, sim_only=False,
        pallas_render=True, pallas_physics=True, fused_step=True,
        render_recip=True, render_raster=None, render_mxu=False,
        trace_dir=None,
    )
    argv = B._child_argv(opts, {})
    assert "--render-raster" not in argv
    assert "--no-render-raster" not in argv
    # Explicit choices still propagate.
    opts.render_raster = False
    assert "--no-render-raster" in B._child_argv(opts, {})
    opts.render_raster = True
    assert "--render-raster" in B._child_argv(opts, {})
