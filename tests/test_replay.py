"""Replay buffer tests: cursor wraparound, batch add, uniform sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.replay import add, add_batch, create, sample
from cartpoleplusplus_tpu.utils.noise import ou_init, ou_step

OBS = (2, 2, 7)


def test_add_and_cursor_wrap():
    replay = create(capacity=4, obs_shape=OBS, action_shape=(2,))
    for i in range(6):
        replay = add(
            replay,
            jnp.full(OBS, float(i)),
            jnp.zeros(2),
            float(i),
            jnp.full(OBS, float(i + 1)),
            False,
        )
    assert int(replay.size) == 4
    assert int(replay.cursor) == 2
    # Slots 0,1 were overwritten by transitions 4,5.
    np.testing.assert_allclose(replay.reward, [4.0, 5.0, 2.0, 3.0])


def test_add_batch_wraps():
    replay = create(capacity=5, obs_shape=(3,), action_shape=())
    replay = add_batch(
        replay,
        jnp.arange(12.0).reshape(4, 3),
        jnp.zeros(4),
        jnp.arange(4.0),
        jnp.zeros((4, 3)),
        jnp.zeros(4, bool),
    )
    replay = add_batch(
        replay,
        jnp.ones((3, 3)),
        jnp.zeros(3),
        jnp.array([10.0, 11.0, 12.0]),
        jnp.zeros((3, 3)),
        jnp.zeros(3, bool),
    )
    assert int(replay.cursor) == 2
    np.testing.assert_allclose(replay.reward, [11.0, 12.0, 2.0, 3.0, 10.0])


def test_sample_shapes_and_range():
    replay = create(capacity=16, obs_shape=OBS, action_shape=(2,))
    replay = add_batch(
        replay,
        jnp.arange(8, dtype=jnp.float32)[:, None, None, None] * jnp.ones((8,) + OBS),
        jnp.zeros((8, 2)),
        jnp.arange(8.0),
        jnp.zeros((8,) + OBS),
        jnp.zeros(8, bool),
    )
    s1, a, r, s2, t = jax.jit(lambda rp, k: sample(rp, k, 32))(
        replay, jax.random.PRNGKey(0)
    )
    assert s1.shape == (32,) + OBS and a.shape == (32, 2)
    assert r.shape == (32,) and t.shape == (32,)
    # Only the 8 valid entries are ever drawn.
    assert float(jnp.max(r)) <= 7.0


def test_ou_noise_mean_reverts():
    # Long OU chain stays bounded and centered near mu.
    x = ou_init((2,))
    key = jax.random.PRNGKey(0)
    xs = []
    for i in range(500):
        key, k = jax.random.split(key)
        x = ou_step(x, k)
        xs.append(np.asarray(x))
    xs = np.stack(xs)
    assert abs(xs.mean()) < 0.2
    assert xs.std() < 1.0
