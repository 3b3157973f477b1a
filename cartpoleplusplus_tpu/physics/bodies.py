"""Scene description for the cartpole++ world: ground plane + cart + pole.

The reference loads three URDF files through Bullet's C++ URDF importer
(reference: bullet_cartpole.py:~L75-90, models/ground.urdf / cart.urdf /
pole.urdf).  Here the scene is a static, jit-friendly dataclass of arrays: the
geometry is fixed (two boxes + a plane) so everything — masses, inertias,
half-extents, friction — bakes into the compiled step as constants.

``from_urdf_dir`` recovers the same constants from URDF files when they are
available (see physics/urdf.py), preserving the reference's asset-driven
workflow without a native importer.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct

from cartpoleplusplus_tpu.physics import math3d

# Body indices used throughout the engine (static Python ints so that all
# indexing in the solver is static).
CART = 0
POLE = 1
NUM_BODIES = 2


@struct.dataclass
class SceneParams:
    """All physical constants of the 3-body scene.

    Array fields are leaves (traced), so a single compiled step can serve any
    parameter setting; in practice they are compile-time constants via closure.
    """

    # Geometry (half extents of the two boxes; ground is the z=0 plane).
    cart_half_extents: jnp.ndarray  # (3,)
    pole_half_extents: jnp.ndarray  # (3,)

    # Mass properties.
    mass: jnp.ndarray  # (2,) [cart, pole]
    inv_mass: jnp.ndarray  # (2,)
    inv_inertia_body: jnp.ndarray  # (2, 3) diagonal body-frame inverse inertia

    # Contact material.
    friction_cart_ground: jnp.ndarray  # scalar
    friction_pole_cart: jnp.ndarray  # scalar
    friction_pole_ground: jnp.ndarray  # scalar
    restitution: jnp.ndarray  # scalar (Bullet default 0)

    # Integration / solver.
    dt: jnp.ndarray  # substep timestep (Bullet default 1/240 s)
    gravity: jnp.ndarray  # (3,)
    baumgarte: jnp.ndarray  # position-correction factor β
    slop: jnp.ndarray  # allowed penetration before correction
    linear_damping: jnp.ndarray  # Bullet-style per-step velocity damping
    angular_damping: jnp.ndarray
    solver_iterations: int = struct.field(pytree_node=False, default=8)

    @property
    def cart_top_z(self):
        """Resting height of the cart top face above the ground."""
        return 2.0 * self.cart_half_extents[2]


def make_scene(
    cart_half_extents=(0.25, 0.25, 0.1),
    pole_half_extents=(0.05, 0.05, 0.5),
    cart_mass=1.0,
    pole_mass=0.1,
    friction_cart_ground=0.5,
    friction_pole_cart=0.6,
    friction_pole_ground=0.6,
    restitution=0.0,
    dt=1.0 / 240.0,
    gravity_z=-9.81,
    baumgarte=0.2,
    slop=1e-4,
    linear_damping=0.0,
    angular_damping=0.0,
    solver_iterations=8,
    dtype=jnp.float32,
) -> SceneParams:
    """Build scene constants.

    Defaults mirror the reference assets: a ~0.5 m cart box with a thin 1 m
    free-standing pole resting (not hinged) on its top face
    (reference: models/cart.urdf, models/pole.urdf; README intro).
    """
    cart_he = jnp.asarray(cart_half_extents, dtype)
    pole_he = jnp.asarray(pole_half_extents, dtype)
    mass = jnp.asarray([cart_mass, pole_mass], dtype)
    inv_mass = 1.0 / mass
    inertia = jnp.stack(
        [
            math3d.box_inertia(mass[0], cart_he),
            math3d.box_inertia(mass[1], pole_he),
        ]
    )
    return SceneParams(
        cart_half_extents=cart_he,
        pole_half_extents=pole_he,
        mass=mass,
        inv_mass=inv_mass,
        inv_inertia_body=1.0 / inertia,
        friction_cart_ground=jnp.asarray(friction_cart_ground, dtype),
        friction_pole_cart=jnp.asarray(friction_pole_cart, dtype),
        friction_pole_ground=jnp.asarray(friction_pole_ground, dtype),
        restitution=jnp.asarray(restitution, dtype),
        dt=jnp.asarray(dt, dtype),
        gravity=jnp.asarray([0.0, 0.0, gravity_z], dtype),
        baumgarte=jnp.asarray(baumgarte, dtype),
        slop=jnp.asarray(slop, dtype),
        linear_damping=jnp.asarray(linear_damping, dtype),
        angular_damping=jnp.asarray(angular_damping, dtype),
        solver_iterations=solver_iterations,
    )


@struct.dataclass
class RigidState:
    """Dynamic state of the two free bodies; leading dims broadcast/batch.

    Replaces Bullet's internal ``btRigidBody`` state that the reference reads
    back via ``p.getBasePositionAndOrientation`` (bullet_cartpole.py:~L100-150).
    """

    pos: jnp.ndarray  # (..., 2, 3)
    quat: jnp.ndarray  # (..., 2, 4) (w, x, y, z)
    vel: jnp.ndarray  # (..., 2, 3)
    ang: jnp.ndarray  # (..., 2, 3) world-frame angular velocity


def rest_state(scene: SceneParams, dtype=jnp.float32) -> RigidState:
    """Cart at origin on the ground, pole upright resting on the cart top."""
    cart_z = scene.cart_half_extents[2]
    pole_z = 2.0 * scene.cart_half_extents[2] + scene.pole_half_extents[2]
    pos = jnp.stack(
        [
            jnp.array([0.0, 0.0, 1.0], dtype) * cart_z,
            jnp.array([0.0, 0.0, 1.0], dtype) * pole_z,
        ]
    )
    quat = jnp.tile(math3d.quat_identity(dtype), (NUM_BODIES, 1))
    zeros = jnp.zeros((NUM_BODIES, 3), dtype)
    return RigidState(pos=pos, quat=quat, vel=zeros, ang=zeros)


def replace_scene(scene: SceneParams, **kwargs) -> SceneParams:
    """Functional update helper (mirrors dataclasses.replace for the struct)."""
    return dataclasses.replace(scene, **kwargs)
