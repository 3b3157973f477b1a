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
import numpy as np
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

    Calling convention differs by path.  The AoS reference engine
    (engine.py) treats every field as a traceable leaf, so a scene may be
    passed as a jit argument.  The SoA/Pallas HOT paths (soa.py,
    pallas_step.py) require a HOST-CONCRETE scene: they specialize the
    compiled program on scalar fields via Python-level branches
    (``float(scene.linear_damping) != 0`` gates, slot-group constants) —
    deliberately, both for the op diet and for the axon-tunnel rule that
    jits must not close over device arrays (CLAUDE.md).  In practice every
    scene is host numpy from make_scene()/urdf, so this only matters if you
    try to trace a scene THROUGH the SoA step.
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
    solver_iterations: int = struct.field(pytree_node=False, default=3)

    @property
    def cart_top_z(self):
        """Resting height of the cart top face above the ground."""
        return 2.0 * self.cart_half_extents[2]


def make_scene(
    cart_half_extents=(0.25, 0.25, 0.1),
    pole_half_extents=(0.05, 0.05, 0.5),
    cart_mass=10.0,
    pole_mass=0.1,
    friction_cart_ground=0.05,
    friction_pole_cart=0.8,
    friction_pole_ground=0.6,
    restitution=0.0,
    dt=1.0 / 240.0,
    gravity_z=-9.81,
    baumgarte=0.2,
    slop=1e-4,
    linear_damping=0.0,
    angular_damping=0.0,
    solver_iterations=3,
    dtype=jnp.float32,
) -> SceneParams:
    """Build scene constants.

    Geometry mirrors the reference assets: a ~0.5 m cart box with a thin 1 m
    free-standing pole resting (not hinged) on its top face
    (reference: models/cart.urdf, models/pole.urdf; README intro).  Masses and
    frictions are tuned for gameplay parity with the reference's described
    behavior, since the URDF numbers could not be read (empty mount): the cart
    is heavy (10 kg) so --action-force 50 N gives ~5 m/s² of control
    authority; the ground is slippery (µ=0.05) so the cart glides; the cart
    top is grippy (µ=0.8) so the pole rides cart accelerations up to ~7.8 m/s²
    before slipping — the inverted-pendulum coupling that makes the task
    playable-but-hard.
    """
    # Host-side numpy constants on purpose: closure-captured scene params
    # embed into jitted programs as literals with no device→host round-trip
    # at lowering time (device arrays here would force one per compile).
    np_dtype = np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype)
    cart_he = np.asarray(cart_half_extents, np_dtype)
    pole_he = np.asarray(pole_half_extents, np_dtype)
    mass = np.asarray([cart_mass, pole_mass], np_dtype)
    inv_mass = 1.0 / mass

    def _box_inertia(m, he):
        hx, hy, hz = he
        return (m / 3.0) * np.asarray(
            [hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy], np_dtype
        )

    inertia = np.stack([_box_inertia(mass[0], cart_he), _box_inertia(mass[1], pole_he)])
    return SceneParams(
        cart_half_extents=cart_he,
        pole_half_extents=pole_he,
        mass=mass,
        inv_mass=inv_mass,
        inv_inertia_body=1.0 / inertia,
        friction_cart_ground=np_dtype.type(friction_cart_ground),
        friction_pole_cart=np_dtype.type(friction_pole_cart),
        friction_pole_ground=np_dtype.type(friction_pole_ground),
        restitution=np_dtype.type(restitution),
        dt=np_dtype.type(dt),
        gravity=np.asarray([0.0, 0.0, gravity_z], np_dtype),
        baumgarte=np_dtype.type(baumgarte),
        slop=np_dtype.type(slop),
        linear_damping=np_dtype.type(linear_damping),
        angular_damping=np_dtype.type(angular_damping),
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
