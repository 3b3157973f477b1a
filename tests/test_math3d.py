"""Unit tests for quaternion / rigid-transform math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpoleplusplus_tpu.physics import math3d


def test_quat_identity_rotate():
    v = jnp.array([1.0, 2.0, 3.0])
    q = math3d.quat_identity()
    np.testing.assert_allclose(math3d.quat_rotate(q, v), v, atol=1e-6)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = math3d.quat_normalize(jnp.asarray(rng.normal(size=(32, 4)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    r = math3d.quat_to_mat(q)
    np.testing.assert_allclose(
        math3d.quat_rotate(q, v), jnp.einsum("bij,bj->bi", r, v), atol=1e-5
    )


def test_quat_rotate_inv_roundtrip():
    rng = np.random.default_rng(1)
    q = math3d.quat_normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    back = math3d.quat_rotate_inv(q, math3d.quat_rotate(q, v))
    np.testing.assert_allclose(back, v, atol=1e-5)


def test_quat_mul_axis_angle_compose():
    qa = math3d.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 4)
    qb = math3d.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 4)
    qc = math3d.quat_mul(qa, qb)
    expect = math3d.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
    np.testing.assert_allclose(qc, expect, atol=1e-6)


def test_quat_integrate_constant_omega():
    # Integrating ω = (0,0,π) for 1s in small steps ≈ 180° turn about z.
    q = math3d.quat_identity()
    omega = jnp.array([0.0, 0.0, np.pi])
    dt = 1e-3
    for _ in range(1000):
        q = math3d.quat_integrate(q, omega, dt)
    v = math3d.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, jnp.array([-1.0, 0.0, 0.0]), atol=5e-3)


def test_tilt_angle():
    upright = math3d.quat_identity()
    assert float(math3d.quat_tilt_angle(upright)) == pytest.approx(0.0, abs=1e-6)
    tipped = math3d.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), 0.3)
    assert float(math3d.quat_tilt_angle(tipped)) == pytest.approx(0.3, abs=1e-5)
    # Tilt must be invariant to spin about the body z-axis.
    spin = math3d.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 1.1)
    assert float(math3d.quat_tilt_angle(math3d.quat_mul(tipped, spin))) == pytest.approx(
        0.3, abs=1e-5
    )


def test_tangent_basis_orthonormal():
    rng = np.random.default_rng(2)
    n = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    t1, t2 = math3d.make_tangent_basis(n)
    for t in (t1, t2):
        np.testing.assert_allclose(jnp.linalg.norm(t, axis=-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(jnp.sum(t * n, axis=-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(jnp.sum(t1 * t2, axis=-1), 0.0, atol=1e-5)


def test_box_inertia():
    # Cube of mass 6, side 2 (half extent 1): I = m/3·(1+1) = 4 on each axis.
    inertia = math3d.box_inertia(6.0, jnp.array([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(inertia, jnp.array([4.0, 4.0, 4.0]), atol=1e-6)


def test_vmap_and_jit_compatibility():
    rng = np.random.default_rng(3)
    q = math3d.quat_normalize(jnp.asarray(rng.normal(size=(16, 4)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    f = jax.jit(jax.vmap(math3d.quat_rotate))
    np.testing.assert_allclose(f(q, v), math3d.quat_rotate(q, v), atol=1e-6)
