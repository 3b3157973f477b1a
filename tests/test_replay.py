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


def test_pixel_obs_uint8_codec():
    from cartpoleplusplus_tpu.replay.buffer import decode_obs, encode_obs

    obs = jnp.array([0.0, 0.25, 0.5, 1.0])
    enc = encode_obs(obs, jnp.uint8)
    assert enc.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(enc), [0, 64, 128, 255])
    dec = decode_obs(enc)
    assert dec.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(dec), np.asarray(obs), atol=1 / 255)
    # float storage is a passthrough
    np.testing.assert_allclose(decode_obs(encode_obs(obs, jnp.float32)), obs)


def test_add_batch_respects_storage_dtype():
    replay = create(capacity=8, obs_shape=(4,), action_shape=(), obs_dtype=jnp.uint8)
    from cartpoleplusplus_tpu.replay.buffer import encode_obs

    obs = jnp.full((4, 4), 0.5)
    replay = add_batch(
        replay,
        encode_obs(obs, jnp.uint8),
        jnp.zeros(4),
        jnp.ones(4),
        encode_obs(obs, jnp.uint8),
        jnp.zeros(4, bool),
    )
    assert replay.s1.dtype == jnp.uint8
    assert int(replay.s1[0, 0]) == 128


def test_s2_free_mode_links_consecutive_blocks():
    """block > 0: s2(i) = s1 row (i + block) % capacity — the next step's
    observation for the same env slot (replay/buffer.py module docstring)."""
    B, CAP = 4, 16
    replay = create(capacity=CAP, obs_shape=(2,), action_shape=(), block=B)
    assert replay.s2.size == 0  # no s2 storage at all
    # Write 4 steps: s1 of step t for env e = [t, e].
    for t in range(4):
        s1 = jnp.stack([jnp.full((B,), t, jnp.float32),
                        jnp.arange(B, dtype=jnp.float32)], axis=1)
        replay = add_batch(replay, s1, jnp.zeros(B), jnp.full((B,), t),
                           None, jnp.zeros(B, bool))
    # Sample many times: every s2 must be its s1's next step, same env.
    for seed in range(5):
        s1, a, r, s2, term = sample(replay, jax.random.PRNGKey(seed), 32)
        np.testing.assert_array_equal(np.asarray(s2[:, 0]), np.asarray(s1[:, 0]) + 1)
        np.testing.assert_array_equal(np.asarray(s2[:, 1]), np.asarray(s1[:, 1]))
        # Newest block (t=3) excluded: its next row doesn't exist yet.
        assert np.asarray(s1[:, 0]).max() <= 2.0


def test_s2_free_mode_wraparound():
    """With a full ring the oldest entries sit at the cursor; s2 links stay
    chronological across the wrap."""
    B, CAP = 2, 8
    replay = create(capacity=CAP, obs_shape=(1,), action_shape=(), block=B)
    for t in range(10):  # 10 steps > capacity/B = 4: ring wraps twice
        s1 = jnp.full((B, 1), t, jnp.float32)
        replay = add_batch(replay, s1, jnp.zeros(B), jnp.zeros(B),
                           None, jnp.zeros(B, bool))
    s1, _, _, s2, _ = sample(replay, jax.random.PRNGKey(0), 64)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s1) + 1)
    # Ring holds steps 6..9; newest (9) excluded from s1 draws.
    assert set(np.asarray(s1).ravel().tolist()) <= {6.0, 7.0, 8.0}


def test_s2_free_block_mismatch_raises():
    replay = create(capacity=8, obs_shape=(1,), action_shape=(), block=4)
    import pytest

    with pytest.raises(ValueError):
        add_batch(replay, jnp.zeros((2, 1)), jnp.zeros(2), jnp.zeros(2),
                  None, jnp.zeros(2, bool))


def test_create_trims_capacity_to_block_multiple():
    """create() trims capacity down to a block multiple so the aligned
    in-place write path engages (default agent capacities like 100000 are
    not multiples of num_envs); one-block edge keeps the requested size."""
    r = create(capacity=100, obs_shape=(3,), action_shape=(), block=8)
    assert r.capacity == 96
    # Still works end to end across the trimmed ring.
    for t in range(14):  # 14 * 8 = 112 > 96: wraps
        r = add_batch(
            r,
            jnp.full((8, 3), float(t)),
            jnp.zeros(8), jnp.full((8,), float(t)), None,
            jnp.zeros(8, bool),
        )
    assert int(r.size) == 96 and int(r.cursor) == 112 % 96

    # Fewer than two blocks after trimming: capacity is kept as requested
    # (scatter path, still correct).
    r2 = create(capacity=12, obs_shape=(3,), action_shape=(), block=8)
    assert r2.capacity == 12
