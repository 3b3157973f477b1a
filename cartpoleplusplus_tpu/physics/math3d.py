"""Quaternion / rigid-transform math for the batched TPU physics core.

All functions are pure, shape-polymorphic over leading batch dims, and safe
under ``jax.jit`` / ``jax.vmap`` / ``jax.grad``.  Quaternions use the
``(w, x, y, z)`` convention (scalar first).

This module replaces the pose arithmetic that the reference delegates to the
Bullet C++ engine (reference: bullet_cartpole.py:~L150-260 drives
``p.stepSimulation`` / ``p.getBasePositionAndOrientation``, which use Bullet's
``btQuaternion`` / ``btTransform`` internally).
"""

from __future__ import annotations

import jax.numpy as jnp

# A reasonable epsilon for normalisation guards in float32.
_EPS = 1e-8


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    """Identity rotation quaternion (w, x, y, z)."""
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalise quaternion(s) to unit length along the last axis."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, _EPS)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b, both (..., 4) in (w, x, y, z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v (..., 3) by unit quaternion(s) q (..., 4).

    Uses the 15-mul formulation ``v' = v + 2 w (u × v) + 2 (u × (u × v))``
    which is cheaper than forming the rotation matrix for a single vector.
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of unit quaternion q (world → body frame)."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion(s) (..., 4) → rotation matrix/matrices (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Axis (..., 3, need not be normalised) + angle (...,) → quaternion."""
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    half = 0.5 * angle
    w = jnp.cos(half)[..., None]
    xyz = axis * jnp.sin(half)[..., None]
    return jnp.concatenate([w, xyz], axis=-1)


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation: q ← normalize(q + dt/2 · (0, ω) ⊗ q).

    Matches Bullet's first-order exponential-map-free update (sufficient at
    240 Hz substeps) followed by renormalisation.
    """
    omega_q = jnp.concatenate([jnp.zeros_like(omega[..., :1]), omega], axis=-1)
    dq = quat_mul(omega_q, q)
    return quat_normalize(q + 0.5 * dt * dq)


def quat_tilt_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Angle (rad) between the body z-axis and world +z for quaternion(s) q.

    Used by the env's termination check (reference checks pole orientation in
    bullet_cartpole.py:~L230-250).
    """
    # Body z-axis in world frame is the third column of R; its z component is
    # R[2,2] = 1 - 2(x² + y²).
    x, y = q[..., 1], q[..., 2]
    cos_tilt = 1.0 - 2.0 * (x * x + y * y)
    return jnp.arccos(jnp.clip(cos_tilt, -1.0, 1.0))


def make_tangent_basis(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two unit tangents orthogonal to unit normal(s) n (..., 3), branchless.

    Uses the Duff et al. 'Building an Orthonormal Basis, Revisited'
    construction, made branch-free with ``copysign`` so it vmaps.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    s = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + nz)
    b = nx * ny * a
    t1 = jnp.stack([1.0 + s * nx * nx * a, s * b, -s * nx], axis=-1)
    t2 = jnp.stack([b, s + ny * ny * a, -ny], axis=-1)
    return t1, t2


def box_inertia(mass, half_extents: jnp.ndarray) -> jnp.ndarray:
    """Diagonal body-frame inertia of a solid box with given half extents.

    I_x = m/3 (hy² + hz²) etc. — same formula Bullet's
    ``btBoxShape::calculateLocalInertia`` uses.
    """
    hx, hy, hz = half_extents[..., 0], half_extents[..., 1], half_extents[..., 2]
    return (mass / 3.0) * jnp.stack(
        [hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy], axis=-1
    )
