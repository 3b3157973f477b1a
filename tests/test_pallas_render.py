"""Pallas render kernel: equivalence with the XLA ray caster.

Runs the Mosaic kernel in interpret mode on CPU (the TPU analogue of a fake
backend) and pins it to raycast.make_observe_pixels output — both paths emit
replay-ready uint8 frames (plane-major per camera, config.obs_pool applied).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpoleplusplus_tpu.env import CartpoleConfig
from cartpoleplusplus_tpu.env import cartpole as cartpole_mod
from cartpoleplusplus_tpu.physics import math3d
from cartpoleplusplus_tpu.physics.bodies import POLE, rest_state
from cartpoleplusplus_tpu.render import make_observe_pixels
from cartpoleplusplus_tpu.render.pallas_kernel import make_render_batched


def _pose_batch(scene):
    """A batch of distinct poses: rest, tilted pole, shifted cart."""
    base = rest_state(scene)
    tilted = base.replace(
        quat=base.quat.at[POLE].set(
            math3d.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.3)
        )
    )
    shifted = base.replace(pos=base.pos + jnp.array([0.4, -0.2, 0.0]))
    return jax.tree.map(
        lambda *xs: jnp.stack(list(xs) * 2), base, tilted, shifted, base
    )  # (8, ...)


@pytest.mark.parametrize("num_cameras,obs_pool", [(1, 1), (2, 1), (1, 2)])
def test_pallas_matches_xla_renderer(num_cameras, obs_pool):
    cfg = CartpoleConfig(
        use_raw_pixels=True, num_cameras=num_cameras,
        render_width=50, render_height=50, obs_pool=obs_pool,
    )
    scene = cartpole_mod.scene_for(cfg)
    rigid = _pose_batch(scene)

    pallas_render = make_render_batched(cfg, tile_e=8, interpret=True)
    pallas_frames = pallas_render(scene, rigid)

    # Tight pin: an f32 XLA render quantized exactly like the kernel
    # (clip ×255 + 0.5, truncate).  Same precision → only reassociation
    # noise at silhouettes may differ.
    xla_f32 = make_observe_pixels(cfg, dtype=jnp.float32)
    ref = jax.vmap(lambda r: xla_f32(scene, r))(rigid)
    ref_u8 = np.clip(
        np.asarray(ref, np.float32) * 255.0 + 0.5, 0.0, 255.0
    ).astype(np.int32)

    assert pallas_frames.dtype == jnp.uint8
    assert pallas_frames.shape == ref_u8.shape
    diff = np.abs(np.asarray(pallas_frames, np.int32) - ref_u8)
    assert (diff <= 2).mean() > 0.999, f"{(diff > 2).mean():.4%} pixels off"
    assert diff.mean() < 0.5

    # Interchangeability with the production uint8 path (which shades in
    # bf16 — ~0.2% silhouette classification flips vs f32 are expected).
    xla_observe = make_observe_pixels(cfg, dtype=jnp.uint8)
    xla_frames = jax.vmap(lambda r: xla_observe(scene, r))(rigid)
    diff = np.abs(
        np.asarray(pallas_frames, np.int32) - np.asarray(xla_frames, np.int32)
    )
    assert (diff <= 4).mean() > 0.995, f"{(diff > 4).mean():.4%} pixels off"
    assert diff.mean() < 2.0


def test_pallas_renderer_in_env_step():
    cfg = CartpoleConfig(
        use_raw_pixels=True, num_cameras=1, render_width=50, render_height=50,
        action_repeats=2, steps_per_repeat=2, initial_force_steps=2,
    )
    scene = cartpole_mod.scene_for(cfg)
    render_b = make_render_batched(cfg, tile_e=8, interpret=True)
    states, obs = cartpole_mod.reset_batched(
        cfg, scene, jax.random.PRNGKey(0), 8, observe_batched_fn=render_b
    )
    assert obs.shape == (8, 2, 7500)
    assert obs.dtype == jnp.uint8
    states, obs, r, d = cartpole_mod.step_batched(
        cfg, scene, states, jnp.zeros(8, jnp.int32), observe_batched_fn=render_b
    )
    assert obs.shape == (8, 2, 7500)
    assert int(jnp.max(obs)) <= 255 and int(jnp.max(obs)) > 100


def test_render_repeats_matches_per_frame():
    """make_render_repeats ≡ stack of per-frame make_render_batched calls."""
    from cartpoleplusplus_tpu.render.pallas_kernel import make_render_repeats

    cfg = CartpoleConfig(
        use_raw_pixels=True, num_cameras=1,
        render_width=50, render_height=50, obs_pool=2,
    )
    scene = cartpole_mod.scene_for(cfg)
    rigid = _pose_batch(scene)  # (8, ...)

    # Three distinct "repeat" pose sets from rolled env batches.
    def pose_mat(r):
        return jnp.concatenate(
            [r.pos[:, 0], r.quat[:, 0], r.pos[:, 1], r.quat[:, 1],
             jnp.zeros((r.pos.shape[0], 2))],
            axis=-1,
        )

    rigids = [
        jax.tree.map(lambda x: jnp.roll(x, k, axis=0), rigid) for k in range(3)
    ]
    poses = jnp.stack([pose_mat(r) for r in rigids])  # (3, 8, 16)

    per_frame = make_render_batched(cfg, tile_e=8, interpret=True)
    expect = jnp.stack([per_frame(scene, r) for r in rigids], axis=1)

    fused = make_render_repeats(cfg, tile_e=8, interpret=True)
    got = fused(scene, poses)

    assert got.shape == expect.shape == (8, 3, 1875)
    assert got.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_fused_sim_fn_step_matches_unfused():
    """The sim_fn fast path (one physics + one render launch) must produce
    the same step outputs as the per-repeat pallas composition."""
    from cartpoleplusplus_tpu.physics.pallas_step import (
        step_repeats_pallas, step_substeps_pallas,
    )
    from cartpoleplusplus_tpu.render.pallas_kernel import make_render_repeats

    cfg = CartpoleConfig(
        discrete_actions=False, use_raw_pixels=True, num_cameras=1,
        render_width=50, render_height=50, obs_pool=2,
    )
    scene = cartpole_mod.scene_for(cfg)
    e = 1024  # physics kernel tile

    render_b = make_render_batched(cfg, interpret=True)
    phys = lambda sc, r, f, n: step_substeps_pallas(sc, r, f, n, interpret=True)
    states, obs = cartpole_mod.reset_batched(
        cfg, scene, jax.random.PRNGKey(0), e,
        observe_batched_fn=render_b, physics_fn=phys,
    )
    action = jnp.tile(jnp.array([[0.3, -0.2]], jnp.float32), (e, 1))

    ref_states, ref_obs, ref_r, ref_d = cartpole_mod.step_batched(
        cfg, scene, states, action,
        observe_batched_fn=render_b, physics_fn=phys,
    )

    render_rep = make_render_repeats(cfg, interpret=True)

    def sim_fn(sc, rigid, force):
        rigid, poses = step_repeats_pallas(
            sc, rigid, force, cfg.steps_per_repeat, cfg.action_repeats,
            interpret=True,
        )
        return rigid, render_rep(sc, poses)

    f_states, f_obs, f_r, f_d = cartpole_mod.step_batched(
        cfg, scene, states, action, sim_fn=sim_fn,
    )

    np.testing.assert_allclose(
        np.asarray(f_states.rigid.pos), np.asarray(ref_states.rigid.pos),
        atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(f_d), np.asarray(ref_d))
    np.testing.assert_allclose(np.asarray(f_r), np.asarray(ref_r), atol=1e-6)
    diff = np.abs(
        np.asarray(f_obs, np.int32) - np.asarray(ref_obs, np.int32)
    )
    # Identical math modulo kernel-boundary reassociation; allow ±1 count
    # on a vanishing fraction of silhouette pixels.
    assert (diff <= 1).mean() > 0.9999, f"{(diff > 1).mean():.5%} off"


def test_obs_samples_sparse_sampling():
    """obs_samples < pool²: pallas and XLA paths agree with each other, the
    output shape matches the exact-average path, and samples=pool² is the
    exact average (bit-identical to the default)."""
    base = dict(
        use_raw_pixels=True, num_cameras=1,
        render_width=50, render_height=50, obs_pool=2,
    )
    scene = cartpole_mod.scene_for(CartpoleConfig(**base))
    rigid = _pose_batch(scene)

    exact = make_render_batched(
        CartpoleConfig(**base), tile_e=8, interpret=True
    )(scene, rigid)

    for samples in (4, 2, 1):
        cfg = CartpoleConfig(**base, obs_samples=samples)
        got = make_render_batched(cfg, tile_e=8, interpret=True)(scene, rigid)
        assert got.shape == exact.shape
        xla = jax.vmap(
            lambda r: make_observe_pixels(cfg, dtype=jnp.float32)(scene, r)
        )(rigid)
        xla_u8 = np.clip(
            np.asarray(xla, np.float32) * 255.0 + 0.5, 0.0, 255.0
        ).astype(np.int32)
        diff = np.abs(np.asarray(got, np.int32) - xla_u8)
        assert (diff <= 2).mean() > 0.999, f"samples={samples}"
        if samples == 4:
            np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))
        else:
            # Sparse sampling is close to the exact average on this scene.
            d = np.abs(np.asarray(got, np.int32) - np.asarray(exact, np.int32))
            assert d.mean() < 12.0, f"samples={samples} mean diff {d.mean()}"


def test_pallas_float_dtype_matches_xla_scale():
    """Float-dtype Pallas output uses the XLA [0,1] color convention (it was
    once left on the kernel's internal [0,255] grid — 255x off).  Values
    agree with the float XLA path up to the kernel's 1/255 quantization."""
    cfg = CartpoleConfig(
        use_raw_pixels=True, num_cameras=1,
        render_width=20, render_height=20,
    )
    scene = cartpole_mod.scene_for(cfg)
    rigid = _pose_batch(scene)

    pallas_f32 = make_render_batched(cfg, dtype=jnp.float32, tile_e=8,
                                     interpret=True)
    out = np.asarray(pallas_f32(scene, rigid), np.float32)
    xla_f32 = make_observe_pixels(cfg, dtype=jnp.float32)
    ref = np.asarray(jax.vmap(lambda r: xla_f32(scene, r))(rigid), np.float32)

    assert out.max() <= 1.0 + 1e-6
    diff = np.abs(out - ref)
    # Quantization grid is 1/255; allow a few silhouette-tie pixels wider.
    assert (diff <= 1.5 / 255.0).mean() > 0.999
