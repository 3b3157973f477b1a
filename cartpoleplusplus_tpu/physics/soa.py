"""Batched SoA physics: the TPU hot path for thousands of envs.

Same math as engine/contacts/solver (the per-env AoS reference
implementation), restructured so that the ENV axis is the trailing vector
axis of every array: state components are (E,) rows, contact-slot quantities
are (16, E) planes.  Rationale (measured on v5e): the AoS path's arrays have
trailing dims of 3/4, so every XLA op uses a few of the VPU's 128 lanes and
the program degenerates into hundreds of tiny sequential ops per substep;
in SoA form the same substep is a short chain of full-width elementwise ops.

The public entry point keeps the AoS interface: ``step_substeps_batched``
takes/returns a batched RigidState (E, 2, ...) and transposes at the
boundary (26·E floats — negligible).

Replaces Bullet's stepSimulation for the vectorized env path (reference
bullet_cartpole.py:~L207-225; SURVEY.md §2.2).  Fidelity is pinned to the
AoS engine by tests/test_soa.py's equivalence suite.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.physics.bodies import RigidState, SceneParams
from cartpoleplusplus_tpu.physics.contacts import _BOTTOM4, _ALL8, _TOP_FACE_BAND

# ---------------------------------------------------------------------------
# Component-tuple vector/quaternion algebra.  A "vec" is a tuple of 3 equal-
# shape arrays, a "quat" a tuple of 4 (w, x, y, z).  Works for any array
# shape — (E,), (16, E), or Pallas (8, L) refs — which is what lets this
# module double as the math library for a future Pallas kernel.
# ---------------------------------------------------------------------------


def v_add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def v_sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def v_scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def v_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v_cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def q_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def q_rotate(q, v):
    """v + 2w(u×v) + 2(u×(u×v)) — same 15-mul form as math3d.quat_rotate."""
    w = q[0]
    u = (q[1], q[2], q[3])
    uv = v_cross(u, v)
    uuv = v_cross(u, uv)
    return (
        v[0] + 2.0 * (w * uv[0] + uuv[0]),
        v[1] + 2.0 * (w * uv[1] + uuv[1]),
        v[2] + 2.0 * (w * uv[2] + uuv[2]),
    )


def q_conj(q):
    return (q[0], -q[1], -q[2], -q[3])


def q_rotate_inv(q, v):
    return q_rotate(q_conj(q), v)


def q_normalize(q):
    inv = jax.lax.rsqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3] + 1e-12)
    return (q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv)


def q_integrate(q, omega, dt):
    """q ← normalize(q + dt/2 · (0, ω) ⊗ q) — math3d.quat_integrate."""
    ow, ox, oy, oz = 0.0, omega[0], omega[1], omega[2]
    dw = ow * q[0] - ox * q[1] - oy * q[2] - oz * q[3]
    dx = ow * q[1] + ox * q[0] + oy * q[3] - oz * q[2]
    dy = ow * q[2] - ox * q[3] + oy * q[0] + oz * q[1]
    dz = ow * q[3] + ox * q[2] - oy * q[1] + oz * q[0]
    h = 0.5 * dt
    return q_normalize((q[0] + h * dw, q[1] + h * dx, q[2] + h * dy, q[3] + h * dz))


def q_to_mat(q):
    """Quat → 3×3 rotation as a tuple-of-tuples of arrays (row major)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
        (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
        (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
    )


def m_vec(m, v):
    """3×3 (tuple rows) times vec."""
    return (
        m[0][0] * v[0] + m[0][1] * v[1] + m[0][2] * v[2],
        m[1][0] * v[0] + m[1][1] * v[1] + m[1][2] * v[2],
        m[2][0] * v[0] + m[2][1] * v[1] + m[2][2] * v[2],
    )


def inv_inertia_world_mat(r, inv_inertia_diag):
    """R diag(d) Rᵀ from an existing rotation matrix (tuple-of-tuples)."""
    d = inv_inertia_diag
    return tuple(
        tuple(
            r[i][0] * d[0] * r[j][0] + r[i][1] * d[1] * r[j][1] + r[i][2] * d[2] * r[j][2]
            for j in range(3)
        )
        for i in range(3)
    )


def inv_inertia_world(q, inv_inertia_diag):
    """R diag(d) Rᵀ with d a (3,) constant; returns 3×3 tuple-of-tuples."""
    return inv_inertia_world_mat(q_to_mat(q), inv_inertia_diag)


def tangent_basis(n):
    """Branchless Duff orthonormal basis for unit normals (component form).

    The sign is computed arithmetically (not via jnp.where with two scalar
    branches) so the same code lowers inside Mosaic kernels.
    """
    nx, ny, nz = n
    s = 2.0 * (nz >= 0.0).astype(nx.dtype) - 1.0
    a = -1.0 / (s + nz)
    b = nx * ny * a
    t1 = (1.0 + s * nx * nx * a, s * b, -s * nx)
    t2 = (b, s + ny * ny * a, -ny)
    return t1, t2


# ---------------------------------------------------------------------------
# SoA state + contact manifold
# ---------------------------------------------------------------------------


class SoAState(NamedTuple):
    """Per-body component arrays, each (..., E)."""

    cart_pos: tuple
    cart_quat: tuple
    cart_vel: tuple
    cart_ang: tuple
    pole_pos: tuple
    pole_quat: tuple
    pole_vel: tuple
    pole_ang: tuple


def from_rigid(state: RigidState) -> SoAState:
    """(E, 2, k) AoS → component rows.  One small transpose per field."""
    pos = jnp.moveaxis(state.pos, -1, 0)  # (3, E, 2)
    quat = jnp.moveaxis(state.quat, -1, 0)
    vel = jnp.moveaxis(state.vel, -1, 0)
    ang = jnp.moveaxis(state.ang, -1, 0)
    pick = lambda arr, b: tuple(arr[i, ..., b] for i in range(arr.shape[0]))
    return SoAState(
        cart_pos=pick(pos, 0), cart_quat=pick(quat, 0),
        cart_vel=pick(vel, 0), cart_ang=pick(ang, 0),
        pole_pos=pick(pos, 1), pole_quat=pick(quat, 1),
        pole_vel=pick(vel, 1), pole_ang=pick(ang, 1),
    )


def to_rigid(s: SoAState) -> RigidState:
    """Component rows → (E, 2, k) AoS."""
    stack2 = lambda a, b: jnp.stack([jnp.stack(a, -1), jnp.stack(b, -1)], -2)
    return RigidState(
        pos=stack2(s.cart_pos, s.pole_pos),
        quat=stack2(s.cart_quat, s.pole_quat),
        vel=stack2(s.cart_vel, s.pole_vel),
        ang=stack2(s.cart_ang, s.pole_ang),
    )


# Static slot constants (same 16-slot manifold as contacts.py).
_CART_CORNERS = np.asarray(_BOTTOM4, np.float32)  # (4,3) signs
# Pole corners reordered bottom-first (ALL8 rows with sz=-1, then sz=+1) so
# the 4 pole-BOTTOM corners (pole-on-cart slots) are a contiguous slice of
# the 8 pole-ground rows — no second corner transform.  Slot order within
# the pole-ground group only permutes the solver's per-body impulse sums
# (allclose-level reassociation; slots are otherwise independent).
_POLE_CORNERS8 = np.asarray(_ALL8, np.float32)[[0, 2, 4, 6, 1, 3, 5, 7]]
_POLE_BOTTOM = np.asarray(_BOTTOM4, np.float32)  # (4,3) == _POLE_CORNERS8[:4]
N_SLOTS = 16
# Slot → body map (static): slots 0-3 cart vs ground, 4-11 pole vs ground,
# 12-15 pole vs cart top.  _substep exploits this with static slicing rather
# than mask arrays (Pallas kernels reject captured array constants).


def _substep(scene: SceneParams, s: SoAState, force) -> SoAState:
    """One dt substep, everything (E,)/(16,E) shaped. Mirrors engine.substep."""
    dt = scene.dt
    g = scene.gravity  # numpy (3,)
    inv_m = scene.inv_mass  # numpy (2,)
    mu_cg = scene.friction_cart_ground
    mu_pc = scene.friction_pole_cart
    mu_pg = scene.friction_pole_ground

    # 1. integrate external forces into velocities
    cart_vel = (
        s.cart_vel[0] + dt * inv_m[0] * force[0],
        s.cart_vel[1] + dt * inv_m[0] * force[1],
        s.cart_vel[2] + dt * (g[2] + inv_m[0] * force[2]),
    )
    pole_vel = (s.pole_vel[0], s.pole_vel[1], s.pole_vel[2] + dt * g[2])
    if float(g[0]) != 0.0 or float(g[1]) != 0.0:
        # Tilted gravity (URDF/replace_scene can set it; engine.substep
        # applies the full vector).  Python-gated so the standard vertical-g
        # scene pays zero extra ops (the census pin holds).
        cart_vel = (cart_vel[0] + dt * g[0], cart_vel[1] + dt * g[1],
                    cart_vel[2])
        pole_vel = (pole_vel[0] + dt * g[0], pole_vel[1] + dt * g[1],
                    pole_vel[2])
    cart_ang, pole_ang = s.cart_ang, s.pole_ang
    if float(scene.linear_damping) != 0.0:
        d = 1.0 - scene.linear_damping
        cart_vel = v_scale(cart_vel, d)
        pole_vel = v_scale(pole_vel, d)
    if float(scene.angular_damping) != 0.0:
        d = 1.0 - scene.angular_damping
        cart_ang = v_scale(cart_ang, d)
        pole_ang = v_scale(pole_ang, d)

    # 2. contact manifold: slot-GROUPED quantities (round-3 op diet).
    #
    # The 16-slot manifold splits statically into
    #   G — slots 0-11 against the GROUND (0-3 cart corners, 4-11 pole
    #       corners), whose contact frame is the compile-time constant
    #       n=(0,0,1), t1=(1,0,0), t2=(0,1,0) (tangent_basis(+z) up to -0
    #       components that multiply out exactly), and
    #   P — slots 12-15 (pole bottom corners on the cart top face), whose
    #       frame rotates with the cart.
    # The r2 code ran every slot through the general contact-frame algebra,
    # spending ~40 VPU ops per slot per direction on effective masses and
    # 15 ops per slot per iteration on dots/impulse assembly that collapse
    # to slices for the 12 G slots.  Every specialized expression below is
    # the general formula with its multiply-by-0/±1 terms eliminated
    # (x*0=±0, x+±0=x, x*1=x in IEEE) — EXACT, so the three physics paths
    # stay equivalence-pinned (test_soa, test_pallas_physics).  Trip-
    # weighted census (Jacobi loop ×5): 10,784 → 6,780 element-ops per env
    # substep together with the shared-rotation-matrix manifold below
    # (BASELINE.md round-3 physics op diet), the lever past the 8.46M
    # low-dim plateau.
    che = scene.cart_half_extents  # numpy (3,)
    phe = scene.pole_half_extents

    def stack_rows(rows):
        return jnp.stack(rows, axis=0)  # (k, E)

    # One rotation matrix per body, REUSED for corners, the cart top-face
    # normal (a column), the cart-frame transform, and the world inertia —
    # the r2 code paid a separate 15-mul q_rotate per corner (16 of them)
    # plus q_to_mat twice inside inv_inertia_world.
    r_cm = q_to_mat(s.cart_quat)
    r_pm = q_to_mat(s.pole_quat)

    def corners_world_mat(pos, rmat, signs, he):
        """→ tuple of 3 arrays (k, E): pos + R·(signs*he), via the three
        half-extent-scaled columns of R (9 muls once) and a static ±column
        sum per corner (3 adds/comp) instead of a rotation per corner."""
        cols = tuple(
            tuple(rmat[j][k] * float(he[k]) for j in range(3)) for k in range(3)
        )
        comps = []
        for j in range(3):
            rows = []
            for k in range(signs.shape[0]):
                e = pos[j]
                for ax in range(3):
                    e = e + cols[ax][j] if signs[k, ax] > 0 else e - cols[ax][j]
                rows.append(e)
            comps.append(stack_rows(rows))
        return tuple(comps)

    cgw = corners_world_mat(s.cart_pos, r_cm, _CART_CORNERS, che)  # (4,E)
    pgw = corners_world_mat(s.pole_pos, r_pm, _POLE_CORNERS8, phe)  # (8,E)
    pbw = tuple(c[:4] for c in pgw)  # bottom-first ordering, see _POLE_CORNERS8

    inner = cgw[2].shape[1:]

    # Slot-group helpers.  Body assignments are static (slots 0-3: cart vs
    # ground; 4-11: pole vs ground; 12-15: pole vs cart-top), so per-slot
    # body selection is CONCATENATION of statically-sliced groups — no mask
    # arrays (Pallas kernels reject captured array constants).
    def a_sel(cart_comp, pole_comp):
        """Per-slot body_a value: cart for slots 0-3, pole for 4-15."""
        return jnp.concatenate(
            [
                jnp.broadcast_to(cart_comp[None], (4,) + inner),
                jnp.broadcast_to(pole_comp[None], (12,) + inner),
            ]
        )

    def g_rows(cart_comp, pole_comp):
        """(12,…) G-group plane: cart value rows 0-3, pole rows 4-11."""
        return jnp.concatenate(
            [
                jnp.broadcast_to(cart_comp[None], (4,) + inner),
                jnp.broadcast_to(pole_comp[None], (8,) + inner),
            ]
        )

    def b4(cart_comp):
        """Body_b (cart) value for the 4 pole-on-cart slots."""
        return jnp.broadcast_to(cart_comp[None], (4,) + inner)

    # --- G group: penetration = -corner z, frame = world axes. ------------
    pen_g = jnp.concatenate([-cgw[2], -pgw[2]])  # (12, E)
    act_g = (pen_g > 0.0).astype(pen_g.dtype)
    corners_g = tuple(jnp.concatenate([cgw[k], pgw[k]]) for k in range(3))
    r_g = v_sub(corners_g, tuple(g_rows(c, p) for c, p in zip(s.cart_pos, s.pole_pos)))

    # --- P group: pole-bottom corners in the cart frame; top face z=+hz. --
    rel = v_sub(pbw, (s.cart_pos[0][None], s.cart_pos[1][None], s.cart_pos[2][None]))
    # Cart-frame transform = Rᵀ·rel, reusing r_cm (was a q_rotate_inv).
    in_cart = tuple(
        r_cm[0][k][None] * rel[0]
        + r_cm[1][k][None] * rel[1]
        + r_cm[2][k][None] * rel[2]
        for k in range(3)
    )  # (4, E) components
    pen_p = float(che[2]) - in_cart[2]
    margin = 1e-3
    act_p = (
        (jnp.abs(in_cart[0]) <= float(che[0]) + margin)
        & (jnp.abs(in_cart[1]) <= float(che[1]) + margin)
        & (pen_p > 0.0)
        & (pen_p < _TOP_FACE_BAND * float(che[2]))
    ).astype(pen_p.dtype)

    # cart top-face normal in world (shared by the 4 pole-cart slots):
    # R·ẑ is the third column of r_cm — free.  The tangent basis is computed
    # once at (E,) and broadcast (the 4 P rows share the frame).
    n_pc = (r_cm[0][2], r_cm[1][2], r_cm[2][2])
    n_p = tuple(b4(c) for c in n_pc)  # (4, E)
    t1_e, t2_e = tangent_basis(n_pc)
    t1_p = tuple(b4(c) for c in t1_e)
    t2_p = tuple(b4(c) for c in t2_e)
    r_p = tuple(pbw[k] - s.pole_pos[k][None] for k in range(3))  # body_a=pole
    r_b4 = tuple(pbw[k] - s.cart_pos[k][None] for k in range(3))  # body_b=cart

    # 3. solver: mass-splitting Jacobi (same scheme as solver.py).
    iiw_c = inv_inertia_world_mat(r_cm, scene.inv_inertia_body[0])
    iiw_p = inv_inertia_world_mat(r_pm, scene.inv_inertia_body[1])

    # per-body active contact counts (mass splitting).  The cart is body_a of
    # slots 0-3 and body_b of 12-15; the pole is body_a of every slot 4-15.
    cnt_cart = jnp.maximum(
        jnp.sum(act_g[:4], axis=0) + jnp.sum(act_p, axis=0), 1.0
    )
    cnt_pole = jnp.maximum(
        jnp.sum(act_g[4:], axis=0) + jnp.sum(act_p, axis=0), 1.0
    )

    # Count-scaled per-body mass/inertia — (E,) scalars, not (16,E) planes.
    invm_c = inv_m[0] * cnt_cart
    invm_p = inv_m[1] * cnt_pole
    iic = tuple(tuple(iiw_c[i][j] * cnt_cart for j in range(3)) for i in range(3))
    iip = tuple(tuple(iiw_p[i][j] * cnt_pole for j in range(3)) for i in range(3))

    # G-group effective inverse masses, closed form for the static frame:
    #   k_d = invm + d · ((I⁻¹ (r × d)) × r)
    # with d a world axis, so r×d and the final dot keep only 2 of 3 terms.
    gx, gy, gz = r_g
    invm_g = g_rows(invm_c, invm_p)
    ii_g = tuple(
        tuple(g_rows(iic[i][j], iip[i][j]) for j in range(3)) for i in range(3)
    )
    # d = n = (0,0,1):  r×d = (ry, -rx, 0);  k = invm + ird0·ry - ird1·rx
    a0 = ii_g[0][0] * gy - ii_g[0][1] * gx
    a1 = ii_g[1][0] * gy - ii_g[1][1] * gx
    inv_kn_g = 1.0 / (invm_g + (a0 * gy - a1 * gx))
    # d = t1 = (1,0,0):  r×d = (0, rz, -ry);  k = invm + ird1·rz - ird2·ry
    b1 = ii_g[1][1] * gz - ii_g[1][2] * gy
    b2 = ii_g[2][1] * gz - ii_g[2][2] * gy
    inv_kt1_g = 1.0 / (invm_g + (b1 * gz - b2 * gy))
    # d = t2 = (0,1,0):  r×d = (-rz, 0, rx);  k = invm + ird2·rx - ird0·rz
    c2 = ii_g[2][2] * gx - ii_g[2][0] * gz
    c0 = ii_g[0][2] * gx - ii_g[0][0] * gz
    inv_kt2_g = 1.0 / (invm_g + (c2 * gx - c0 * gz))

    # P-group: general effective mass over both bodies (a=pole, b=cart).
    invm_p4 = b4(invm_p)
    invm_b4 = b4(invm_c)
    ii_p = tuple(tuple(b4(iip[i][j]) for j in range(3)) for i in range(3))
    ii_b4 = tuple(tuple(b4(iic[i][j]) for j in range(3)) for i in range(3))

    def eff_inv_mass_p(d):
        rxd = v_cross(r_p, d)
        ird = m_vec(ii_p, rxd)
        k = invm_p4 + v_dot(d, v_cross(ird, r_p))
        rxd_b = v_cross(r_b4, d)
        ird_b = m_vec(ii_b4, rxd_b)
        k = k + (invm_b4 + v_dot(d, v_cross(ird_b, r_b4)))
        return 1.0 / k

    inv_kn_p = eff_inv_mass_p(n_p)
    inv_kt1_p = eff_inv_mass_p(t1_p)
    inv_kt2_p = eff_inv_mass_p(t2_p)

    # Assemble the (16, E) loop planes.  `active` is folded into the
    # effective masses once — exact, since active ∈ {0, 1}.
    pen = jnp.concatenate([pen_g, pen_p])
    active = jnp.concatenate([act_g, act_p])
    mu = jnp.concatenate(
        [
            jnp.full((4,) + inner, float(mu_cg), pen.dtype),
            jnp.full((8,) + inner, float(mu_pg), pen.dtype),
            jnp.full((4,) + inner, float(mu_pc), pen.dtype),
        ]
    )
    r_a = tuple(jnp.concatenate([r_g[k], r_p[k]]) for k in range(3))
    inv_kn = jnp.concatenate([inv_kn_g, inv_kn_p]) * active
    inv_kt1 = jnp.concatenate([inv_kt1_g, inv_kt1_p]) * active
    inv_kt2 = jnp.concatenate([inv_kt2_g, inv_kt2_p]) * active

    bias = (scene.baumgarte / dt) * jnp.maximum(pen - scene.slop, 0.0)

    def body_vel_at_slots(cv, ca, pv, pa):
        """velocity of body_a at each slot, minus body_b side (slots 12-15)."""
        vel_a = tuple(a_sel(c, p) for c, p in zip(cv, pv))
        ang_a = tuple(a_sel(c, p) for c, p in zip(ca, pa))
        va = v_add(vel_a, v_cross(ang_a, r_a))
        vel_b4 = tuple(b4(c) for c in cv)
        ang_b4 = tuple(b4(c) for c in ca)
        vb4 = v_add(vel_b4, v_cross(ang_b4, r_b4))
        return tuple(
            jnp.concatenate([vak[:12], vak[12:] + -vb4k])
            for vak, vb4k in zip(va, vb4)
        )

    def iteration(_, carry):
        cv0, cv1, cv2, ca0, ca1, ca2, pv0, pv1, pv2, pa0, pa1, pa2, jn, jt1, jt2 = carry
        cv, ca = (cv0, cv1, cv2), (ca0, ca1, ca2)
        pv, pa = (pv0, pv1, pv2), (pa0, pa1, pa2)
        v = body_vel_at_slots(cv, ca, pv, pa)

        # Contact-frame velocities: G rows are plain world components
        # (frame = world axes — exact specialization, see section 2).
        vp = tuple(c[12:] for c in v)
        vn = jnp.concatenate([v[2][:12], v_dot(vp, n_p)])
        jn_new = jnp.maximum(jn + (bias - vn) * inv_kn, 0.0)
        dn = jn_new - jn
        bound = mu * jn_new
        vt1 = jnp.concatenate([v[0][:12], v_dot(vp, t1_p)])
        vt2 = jnp.concatenate([v[1][:12], v_dot(vp, t2_p)])
        jt1_new = jnp.clip(jt1 - vt1 * inv_kt1, -bound, bound)
        jt2_new = jnp.clip(jt2 - vt2 * inv_kt2, -bound, bound)
        d1 = jt1_new - jt1
        d2 = jt2_new - jt2

        # World impulse: G rows are (d1, d2, dn) exactly; P rows general.
        dn_p, d1_p, d2_p = dn[12:], d1[12:], d2[12:]
        imp = tuple(
            jnp.concatenate([dg, dn_p * a + d1_p * b + d2_p * c])
            for dg, a, b, c in zip(
                (d1[:12], d2[:12], dn[:12]), n_p, t1_p, t2_p
            )
        )  # (16,E) ×3

        # scatter to bodies (static slot ranges)
        imp_cart = tuple(
            jnp.sum(i[:4], axis=0) - jnp.sum(i[12:], axis=0) for i in imp
        )
        imp_pole = tuple(jnp.sum(i[4:], axis=0) for i in imp)
        cv = v_add(cv, v_scale(imp_cart, inv_m[0]))
        pv = v_add(pv, v_scale(imp_pole, inv_m[1]))

        tau_a = v_cross(r_a, imp)  # (16,E)
        imp4 = tuple(i[12:] for i in imp)
        tau_b4 = v_cross(r_b4, imp4)
        tau_cart = tuple(
            jnp.sum(ta[:4], axis=0) - jnp.sum(tb, axis=0)
            for ta, tb in zip(tau_a, tau_b4)
        )
        tau_pole = tuple(jnp.sum(ta[4:], axis=0) for ta in tau_a)
        ca = v_add(ca, m_vec(iiw_c, tau_cart))
        pa = v_add(pa, m_vec(iiw_p, tau_pole))

        return (*cv, *ca, *pv, *pa, jn_new, jt1_new, jt2_new)

    zeros = jnp.zeros_like(pen)
    carry = (*cart_vel, *cart_ang, *pole_vel, *pole_ang, zeros, zeros, zeros)
    carry = jax.lax.fori_loop(0, scene.solver_iterations, iteration, carry)
    cart_vel, cart_ang = carry[0:3], carry[3:6]
    pole_vel, pole_ang = carry[6:9], carry[9:12]

    # 4. integrate pose
    cart_pos = v_add(s.cart_pos, v_scale(cart_vel, dt))
    pole_pos = v_add(s.pole_pos, v_scale(pole_vel, dt))
    cart_quat = q_integrate(s.cart_quat, cart_ang, dt)
    pole_quat = q_integrate(s.pole_quat, pole_ang, dt)
    return SoAState(
        cart_pos=cart_pos, cart_quat=cart_quat, cart_vel=cart_vel, cart_ang=cart_ang,
        pole_pos=pole_pos, pole_quat=pole_quat, pole_vel=pole_vel, pole_ang=pole_ang,
    )


def step_substeps_batched(
    scene: SceneParams,
    state: RigidState,
    cart_force: jnp.ndarray,
    num_substeps: int,
) -> RigidState:
    """Batched drop-in for vmap(engine.step_substeps): (E,…) in/out.

    ``cart_force``: (E, 3) world-frame force applied at the cart COM, held
    constant across the substeps (reference bullet_cartpole.py:~L207-215).
    """
    s = from_rigid(state)
    force = tuple(cart_force[..., i] for i in range(3))

    def body(s, _):
        return _substep(scene, s, force), None

    s, _ = jax.lax.scan(body, s, None, length=num_substeps)
    return to_rigid(s)
