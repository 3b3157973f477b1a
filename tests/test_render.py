"""Renderer tests: analytic geometry checks standing in for golden images.

The reference has no render tests (pixels were eyeballed via event-log PNG
dumps, SURVEY.md §4); with no pybullet available, correctness is asserted
geometrically: known rays must hit known bodies at known depths, and the
camera must see the pole centered above the cart in the rest scene.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.env import CartpoleConfig
from cartpoleplusplus_tpu.env import cartpole as cartpole_mod
from cartpoleplusplus_tpu.physics.bodies import make_scene, rest_state
from cartpoleplusplus_tpu.render import (
    Camera,
    make_observe_pixels,
    ray_grid,
    render_rays,
)
from cartpoleplusplus_tpu.render.raycast import (
    CART_COLOR,
    POLE_COLOR,
    SKY_COLOR,
    _ray_box,
)


def _ray(ox, oy, oz, dx, dy, dz):
    """Single-ray component tuples for the SoA _ray_box API."""
    one = jnp.ones((1,))
    return (ox * one, oy * one, oz * one), (dx * one, dy * one, dz * one)


def test_ray_box_hit_and_normal():
    he = (1.0, 1.0, 1.0)
    origin, direction = _ray(-5.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    t, n, hit = _ray_box(origin, direction, he)
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 4.0, rtol=1e-5)
    np.testing.assert_allclose(
        [float(n[0][0]), float(n[1][0]), float(n[2][0])], [-1.0, 0.0, 0.0], atol=1e-6
    )


def test_ray_box_miss():
    he = (1.0, 1.0, 1.0)
    origin, direction = _ray(-5.0, 3.0, 0.0, 1.0, 0.0, 0.0)
    t, _, hit = _ray_box(origin, direction, he)
    assert not bool(hit[0])
    assert float(t[0]) > 1e8


def test_ray_from_inside_box():
    he = (1.0, 1.0, 1.0)
    origin, direction = _ray(0.0, 0.0, 0.0, 0.0, 0.0, 1.0)
    t, _, hit = _ray_box(origin, direction, he)
    assert bool(hit[0])
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-5)


def test_scene_center_ray_sees_pole():
    scene = make_scene()
    rigid = rest_state(scene)
    # Ray aimed at the pole's midsection from the front.
    origin = jnp.array([0.0, -3.0, 0.7])
    dirs = jnp.array([[0.0, 1.0, 0.0]])
    rgb = render_rays(scene, rigid, origin, dirs)
    np.testing.assert_allclose(
        np.asarray(rgb[0]) / np.asarray(rgb[0]).max(),
        np.asarray(POLE_COLOR) / np.asarray(POLE_COLOR).max(),
        atol=0.02,
    )


def test_scene_ray_sees_cart_and_sky():
    scene = make_scene()
    rigid = rest_state(scene)
    origin = jnp.array([0.0, -3.0, 0.1])
    dirs = jnp.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])  # at cart; straight up
    rgb = np.asarray(render_rays(scene, rigid, origin, dirs))
    np.testing.assert_allclose(rgb[0] / rgb[0].max(), np.asarray(CART_COLOR) / np.asarray(CART_COLOR).max(), atol=0.02)
    np.testing.assert_allclose(rgb[1], np.asarray(SKY_COLOR), atol=1e-5)


def test_observe_pixels_shape_and_content():
    cfg = CartpoleConfig(
        use_raw_pixels=True, num_cameras=2, render_width=50, render_height=50,
        action_repeats=2, steps_per_repeat=2, initial_force_steps=4,
    )
    scene = cartpole_mod.scene_for(cfg)
    observe = make_observe_pixels(cfg)
    frame = jax.jit(lambda r: observe(scene, r))(rest_state(scene))
    assert frame.shape == (2 * 50 * 50 * 3,)
    from cartpoleplusplus_tpu.render.raycast import frame_to_images

    imgs = frame_to_images(cfg, frame)
    assert imgs.shape == (2, 50, 50, 3)
    img = imgs[0]
    assert img.min() >= 0.0 and img.max() <= 1.0
    # Pole (red-dominant) visible near image center columns.
    center = img[:, 20:30, :]
    red_dom = (center[..., 0] > center[..., 2] + 0.2).sum()
    assert red_dom > 20, "pole should be visible near the center"
    # Sky at the top corners, ground in the bottom rows.
    np.testing.assert_allclose(img[0, 0], np.asarray(SKY_COLOR), atol=0.02)
    bottom = img[-1, :, :]
    assert (np.abs(bottom[:, 0] - bottom[:, 1]) < 0.05).all(), "bottom row is gray ground"


def test_pixel_env_step_end_to_end():
    cfg = CartpoleConfig(
        use_raw_pixels=True, num_cameras=1, render_width=24, render_height=24,
        action_repeats=2, steps_per_repeat=2, initial_force_steps=4,
    )
    scene = cartpole_mod.scene_for(cfg)
    observe = make_observe_pixels(cfg)
    state, obs = jax.jit(lambda k: cartpole_mod.reset(cfg, scene, k, observe))(
        jax.random.PRNGKey(0)
    )
    assert obs.shape == (2, 24 * 24 * 3)
    step = jax.jit(lambda s, a: cartpole_mod.step(cfg, scene, s, a, observe))
    first = None
    for _ in range(3):
        state, obs, reward, done = step(state, jnp.int32(1))
        if first is None:
            first = np.asarray(obs[0])
    assert obs.shape == (2, 24 * 24 * 3)
    # Frames change over time (cart moved under the push): compare frames
    # several env steps apart — adjacent repeats are only 2 substeps (8 ms)
    # apart and may quantize identically at 24×24 bf16.
    assert not np.allclose(first, np.asarray(obs[1]))


def test_render_vmap_batch():
    scene = make_scene()
    rigid = rest_state(scene)
    batch = jax.tree.map(lambda x: jnp.stack([x] * 3), rigid)
    cam = Camera(eye=(0.0, -2.4, 1.1), target=(0.0, 0.0, 0.4))
    dirs, eye = ray_grid(cam, 16, 16)
    out = jax.jit(
        jax.vmap(lambda r: render_rays(scene, r, eye, dirs))
    )(batch)
    assert out.shape == (3, 256, 3)
    np.testing.assert_allclose(out[0], out[2], atol=1e-6)


def test_obs_pool_epilogue_matches_manual_pooling():
    """config.obs_pool: the pooled frame equals a block-mean of the full-res
    frame (modulo uint8 rounding of each path), and shapes shrink k^2x."""
    import dataclasses

    cfg1 = CartpoleConfig(
        use_raw_pixels=True, num_cameras=1, render_width=50, render_height=50,
    )
    cfg2 = dataclasses.replace(cfg1, obs_pool=2)
    scene = cartpole_mod.scene_for(cfg1)
    rigid = rest_state(scene)

    full = jax.jit(lambda r: make_observe_pixels(cfg1, dtype=jnp.uint8)(scene, r))(rigid)
    pooled = jax.jit(lambda r: make_observe_pixels(cfg2, dtype=jnp.uint8)(scene, r))(rigid)
    assert full.shape == (3 * 50 * 50,)
    assert pooled.shape == (3 * 25 * 25,)
    assert cfg2.pixel_obs_shape == (cfg2.action_repeats, 3 * 25 * 25)

    manual = (
        np.asarray(full, np.float32).reshape(3, 25, 2, 25, 2).mean(axis=(2, 4))
    )
    # full was quantized before manual pooling, pooled after — allow 2 counts.
    np.testing.assert_allclose(
        np.asarray(pooled, np.float32).reshape(3, 25, 25), manual, atol=2.0
    )
    # Host-side viewing follows the carried dims.
    from cartpoleplusplus_tpu.render.raycast import frame_to_images

    assert frame_to_images(cfg2, pooled).shape == (1, 25, 25, 3)


def test_obs_pool_validation():
    import pytest

    with pytest.raises(ValueError):
        CartpoleConfig(use_raw_pixels=True, obs_pool=3)  # 3 doesn't divide 50
