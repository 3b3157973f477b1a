"""Pallas render kernel: equivalence with the XLA ray caster.

Runs the Mosaic kernel in interpret mode on CPU (the TPU analogue of a fake
backend) and pins it to raycast.make_observe_pixels output.
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


@pytest.mark.parametrize("num_cameras", [1, 2])
def test_pallas_matches_xla_renderer(num_cameras):
    cfg = CartpoleConfig(
        use_raw_pixels=True, num_cameras=num_cameras,
        render_width=50, render_height=50,
    )
    scene = cartpole_mod.scene_for(cfg)

    # A batch of distinct poses: rest, tilted pole, shifted cart.
    base = rest_state(scene)
    tilted = base.replace(
        quat=base.quat.at[POLE].set(
            math3d.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.3)
        )
    )
    shifted = base.replace(pos=base.pos + jnp.array([0.4, -0.2, 0.0]))
    rigid = jax.tree.map(
        lambda *xs: jnp.stack(list(xs) * 2), base, tilted, shifted, base
    )  # (8, ...)

    # Compare against the f32 XLA renderer (the kernel computes f32 too —
    # only the output narrows to bf16).
    xla_observe = make_observe_pixels(cfg, dtype=jnp.float32)
    xla_frames = jax.vmap(lambda r: xla_observe(scene, r))(rigid)

    pallas_render = make_render_batched(cfg, tile_e=8, interpret=True)
    pallas_frames = pallas_render(scene, rigid)

    assert pallas_frames.shape == xla_frames.shape
    diff = np.abs(
        np.asarray(pallas_frames, np.float32) - np.asarray(xla_frames, np.float32)
    )
    # Silhouette pixels may classify differently under reassociated float
    # math; require near-exactness almost everywhere.
    assert (diff <= 0.02).mean() > 0.999, f"{(diff > 0.02).mean():.4%} pixels off"
    assert diff.mean() < 5e-3


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
    states, obs, r, d = cartpole_mod.step_batched(
        cfg, scene, states, jnp.zeros(8, jnp.int32), observe_batched_fn=render_b
    )
    assert obs.shape == (8, 2, 7500)
    assert float(jnp.max(obs)) <= 1.01
