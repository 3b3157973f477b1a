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
