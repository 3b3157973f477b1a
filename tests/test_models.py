"""Model-layer tests: shapes, NAF advantage math, target updates, conv trunk."""

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.models import (
    Actor,
    Critic,
    DiscretePolicy,
    NAFNetwork,
    QNetwork,
    flatten_obs,
    pixels_to_nhwc,
    soft_target_update,
)

LOWDIM = (3, 2, 7)  # (repeats, bodies, pose)
PIXELS = (2, 2 * 50 * 50 * 3)  # (repeats, flat cams·H·W·3)


def _batch(shape, b=4, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), (b,) + shape)


def test_flatten_obs():
    obs = _batch(LOWDIM)
    assert flatten_obs(obs, batched=True).shape == (4, 42)
    assert flatten_obs(obs[0], batched=False).shape == (42,)


def test_pixels_to_nhwc():
    obs = _batch(PIXELS, b=2)
    nhwc = pixels_to_nhwc(obs, batched=True)
    assert nhwc.shape == (2, 50, 50, 12)
    # Channel packing: (r, c, rgb) → channel index r*cams*3 + c*3 + rgb;
    # flat frames are plane-major: (cam, rgb, y, x).
    planes = np.asarray(obs).reshape(2, 2, 2, 3, 50, 50)
    np.testing.assert_allclose(
        nhwc[1, 7, 9, 1 * 6 + 1 * 3 + 2], planes[1, 1, 1, 2, 7, 9]
    )


def test_policy_and_q_shapes():
    obs = _batch(LOWDIM)
    for cls in (DiscretePolicy, QNetwork):
        model = cls(num_actions=5)
        params = model.init(jax.random.PRNGKey(0), obs)
        out = model.apply(params, obs)
        assert out.shape == (4, 5)
        assert out.dtype == jnp.float32


def test_actor_critic_shapes():
    obs = _batch(LOWDIM)
    actor = Actor(action_dim=2)
    a_params = actor.init(jax.random.PRNGKey(0), obs)
    act = actor.apply(a_params, obs)
    assert act.shape == (4, 2)
    assert float(jnp.max(jnp.abs(act))) <= 1.0

    critic = Critic()
    c_params = critic.init(jax.random.PRNGKey(1), obs, act)
    q = critic.apply(c_params, obs, act)
    assert q.shape == (4,)


def test_pixel_trunk_shapes():
    obs = _batch(PIXELS, b=2)
    for enc in ("dense", "conv"):
        actor = Actor(action_dim=2, use_raw_pixels=True, pixel_encoder=enc)
        params = actor.init(jax.random.PRNGKey(0), obs)
        assert actor.apply(params, obs).shape == (2, 2)


def test_pixel_trunk_pooled_obs_dims():
    """Networks must honor non-default obs dims (config.obs_pool shrinks the
    frames the pipeline carries — regression: the conv path hardcoded 50×50
    and crashed on 2-camera obs_pool=2 runs)."""
    h = w = 25
    for cams in (1, 2):
        obs = jnp.zeros((2, 3, cams * 3 * h * w), jnp.uint8)
        for enc in ("dense", "conv"):
            actor = Actor(
                action_dim=2, use_raw_pixels=True, pixel_encoder=enc,
                height=h, width=w,
            )
            params = actor.init(jax.random.PRNGKey(0), obs)
            assert actor.apply(params, obs).shape == (2, 2)


def test_naf_advantage_is_nonpositive_and_zero_at_mu():
    obs = _batch(LOWDIM)
    net = NAFNetwork(action_dim=2)
    params = net.init(jax.random.PRNGKey(0), obs)
    v, mu, l_flat = net.apply(params, obs)
    assert v.shape == (4,) and mu.shape == (4, 2) and l_flat.shape == (4, 3)

    # A(s, µ) = 0 and A(s, a) ≤ 0 elsewhere (negative-definite quadratic).
    np.testing.assert_allclose(NAFNetwork.advantage(l_flat, mu, mu), 0.0, atol=1e-6)
    a = jnp.clip(mu + 0.3, -1, 1)
    adv = NAFNetwork.advantage(l_flat, mu, a)
    assert np.all(np.asarray(adv) <= 1e-6)
    # Q = V + A.
    np.testing.assert_allclose(
        NAFNetwork.q_value(v, l_flat, mu, mu), v, atol=1e-6
    )


def test_naf_lower_triangular_structure():
    l_flat = jnp.array([[0.5, 1.0, -0.2]])
    L = NAFNetwork.lower_triangular(l_flat, 2)[0]
    np.testing.assert_allclose(L[0, 1], 0.0)
    np.testing.assert_allclose(L[1, 0], 1.0)
    np.testing.assert_allclose(L[0, 0], np.exp(0.5), rtol=1e-6)
    np.testing.assert_allclose(L[1, 1], np.exp(-0.2), rtol=1e-6)


def test_soft_target_update_polyak():
    online = {"w": jnp.ones((3,))}
    target = {"w": jnp.zeros((3,))}
    out = soft_target_update(target, online, tau=0.1)
    np.testing.assert_allclose(out["w"], 0.1)
    # τ=1 → hard copy.
    out = soft_target_update(target, online, tau=1.0)
    np.testing.assert_allclose(out["w"], 1.0)


def test_pixel_pool_shrinks_embed_and_preserves_output_shape():
    """--pixel-pool k: the dense embed contracts (22500/k²)-wide input and
    the encoder output/head shapes are unchanged."""
    import jax
    import jax.numpy as jnp

    from cartpoleplusplus_tpu.models import Actor

    obs = jnp.zeros((4, 3, 7500), jnp.uint8)  # (B, repeats, cam·3·50·50)
    a1 = Actor(action_dim=2, use_raw_pixels=True, pixel_pool=1)
    a2 = Actor(action_dim=2, use_raw_pixels=True, pixel_pool=2)
    p1 = a1.init(jax.random.PRNGKey(0), obs)
    p2 = a2.init(jax.random.PRNGKey(0), obs)
    w1 = p1["params"]["ObsEncoder_0"]["pixel_embed"]["kernel"]
    w2 = p2["params"]["ObsEncoder_0"]["pixel_embed"]["kernel"]
    assert w1.shape[0] == 22500 and w2.shape[0] == 22500 // 4
    assert a2.apply(p2, obs).shape == (4, 2)
    # Pooling averages each 2x2 block: rows alternating (100, 156) pool to
    # the same planes as a constant 128 image, so the encodings must match
    # up to bf16 rounding of the decoded pixels (pool runs in the encoder's
    # bf16 compute dtype; outputs are tanh-bounded so atol=0.05 is tight).
    import numpy as np

    const = jnp.full_like(obs, 128)
    board = np.full((50, 50), 100, np.uint8)
    board[::2, :] = 156
    striped = jnp.asarray(
        np.broadcast_to(board.reshape(-1), (4, 3, 3, 2500)).reshape(4, 3, 7500)
    )
    np.testing.assert_allclose(
        np.asarray(a2.apply(p2, const)),
        np.asarray(a2.apply(p2, striped)),
        atol=0.05,
    )


def test_aug_random_shift_matches_crop_reference():
    """The MXU one-hot-matmul shift must equal a plain pad+crop (it replaced
    a vmap(dynamic_slice) crop that was 15x the rest of the train step on
    TPU), and be exact on uint8 frames."""
    from cartpoleplusplus_tpu.agents.ddpg import aug_random_shift

    b, r, h, w, planes, pad = 5, 3, 8, 8, 6, 2
    rng = jax.random.PRNGKey(7)
    obs = jax.random.randint(
        jax.random.PRNGKey(1), (b, r, planes * h * w), 0, 256, jnp.int32
    ).astype(jnp.uint8)

    got = aug_random_shift(obs, rng, pad, h, w)
    assert got.shape == obs.shape and got.dtype == obs.dtype

    # Reference: same RNG -> same offsets, naive pad + per-sample crop.
    off = jax.random.randint(rng, (b, 2), 0, 2 * pad + 1)
    x = np.asarray(obs).reshape(b, r * planes, h, w)
    x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    ref = np.stack([
        x[i, :, off[i, 0]:off[i, 0] + h, off[i, 1]:off[i, 1] + w]
        for i in range(b)
    ]).reshape(b, r, planes * h * w)
    np.testing.assert_array_equal(np.asarray(got), ref)
    # Offsets actually vary across the batch.
    assert len({(int(a), int(c)) for a, c in np.asarray(off)}) > 1
