"""Pallas TPU kernel: fused multi-substep physics for an env tile.

The hand-tiled counterpart of physics/soa.py — Bullet's ``stepSimulation``
hot loop (reference bullet_cartpole.py:~L207-225) as ONE Mosaic kernel: all
``num_substeps`` substeps (integrate → contacts → Jacobi solve → integrate
pose) run back-to-back on VMEM-resident state, eliminating the per-fusion
HBM round-trips of the XLA path.

The kernel body calls ``soa._substep`` VERBATIM: that module's component
algebra is rank-polymorphic (components here are (8, L) planes — env index
e = s·L + l spread over sublanes and lanes) and written Mosaic-safe (no
bf16 comparisons, no scalar-splat selects, arithmetic masks).  One physics
implementation, three execution paths: per-env AoS (engine.py), batched XLA
(soa.py), and this kernel — all pinned together by tests.

State wire layout: (26, 8, L) f32 — 26 component rows in FIELD order
[cart pos(3) quat(4) vel(3) ang(3) | pole pos(3) quat(4) vel(3) ang(3)],
each row an (8, L) plane with L = E/8.  Grid tiles the lane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cartpoleplusplus_tpu.physics import soa
from cartpoleplusplus_tpu.physics.bodies import RigidState, SceneParams

# Component row order (26 rows).
_FIELDS = (
    ("cart_pos", 3), ("cart_quat", 4), ("cart_vel", 3), ("cart_ang", 3),
    ("pole_pos", 3), ("pole_quat", 4), ("pole_vel", 3), ("pole_ang", 3),
)
N_ROWS = sum(n for _, n in _FIELDS)  # 26
SUBLANES = 8


def _unpack(state_ref) -> soa.SoAState:
    comps = {}
    row = 0
    for name, n in _FIELDS:
        comps[name] = tuple(state_ref[row + k] for k in range(n))
        row += n
    return soa.SoAState(**comps)


def _pack(out_ref, s: soa.SoAState) -> None:
    row = 0
    for name, n in _FIELDS:
        comp = getattr(s, name)
        for k in range(n):
            out_ref[row + k] = comp[k]
        row += n


def _phys_kernel(scene: SceneParams, num_substeps: int,
                 state_ref, force_ref, out_ref):
    s = _unpack(state_ref)
    force = (force_ref[0], force_ref[1], force_ref[2])

    def body(_, s):
        return soa._substep(scene, s, force)

    s = jax.lax.fori_loop(0, num_substeps, body, s)
    _pack(out_ref, s)


# Pose snapshot rows written per repeat, matching the render kernels'
# (E, 16) pose-matrix column order (render/pallas_kernel.py): cart pos+quat,
# pole pos+quat, 2 pad columns.
_POSE_FIELDS = ("cart_pos", "cart_quat", "pole_pos", "pole_quat")
POSE_ROWS = 16


def _phys_repeats_kernel(scene: SceneParams, substeps_per_repeat: int,
                         repeats: int, state_ref, force_ref,
                         out_ref, poses_ref):
    """All ``repeats × substeps_per_repeat`` substeps in ONE kernel.

    State stays in VMEM across every substep of the env step (the per-repeat
    variant round-trips it through HBM between repeats); after each repeat
    the pose components are snapshotted to ``poses_ref`` rows
    ``[r·16, r·16+14)`` for the batched renderer.
    """
    s = _unpack(state_ref)
    force = (force_ref[0], force_ref[1], force_ref[2])

    def body(_, s):
        return soa._substep(scene, s, force)

    zero = jnp.zeros_like(s.cart_pos[0])
    for r in range(repeats):
        s = jax.lax.fori_loop(0, substeps_per_repeat, body, s)
        row = r * POSE_ROWS
        for name in _POSE_FIELDS:
            for c in getattr(s, name):
                poses_ref[row] = c
                row += 1
        # Zero the 2 pad columns.  (Historical: the render kernel once
        # derived a layout-anchoring ones column from column 14; it now
        # reads only columns 0-13 and takes its ones row from the rays
        # block.  Kept zeroed so the 16-wide pose slab never carries
        # uninitialized VMEM into downstream consumers.)
        poses_ref[row] = zero
        poses_ref[row + 1] = zero
    _pack(out_ref, s)


def step_repeats_pallas(
    scene: SceneParams,
    state: RigidState,
    cart_force: jnp.ndarray,
    substeps_per_repeat: int,
    repeats: int,
    l_tile: int = 128,
    interpret: bool = False,
) -> tuple[RigidState, jnp.ndarray]:
    """One env step's physics in a single launch → (state, poses (R, E, 16)).

    Fuses the ``action_repeats`` per-repeat kernel calls of
    :func:`step_substeps_pallas` and additionally returns the pose snapshot
    after each repeat — the input the batched repeat renderer
    (render/pallas_kernel.make_render_repeats) consumes.  Pose layout per
    repeat: [cart pos(3) quat(4) | pole pos(3) quat(4) | 0 0] = 16 columns.
    """
    e = state.pos.shape[0]
    lanes = e // SUBLANES
    if e % (SUBLANES * l_tile) != 0:
        raise ValueError(f"num envs {e} must be a multiple of {SUBLANES * l_tile}")

    s = soa.from_rigid(state)
    rows = [c for name, _ in _FIELDS for c in getattr(s, name)]
    packed = jnp.stack(rows).reshape(N_ROWS, SUBLANES, lanes)
    force = jnp.stack(
        [cart_force[:, 0], cart_force[:, 1], cart_force[:, 2]]
    ).reshape(3, SUBLANES, lanes)

    kernel = functools.partial(
        _phys_repeats_kernel, scene, substeps_per_repeat, repeats
    )
    out, poses = pl.pallas_call(
        kernel,
        grid=(lanes // l_tile,),
        in_specs=[
            pl.BlockSpec((N_ROWS, SUBLANES, l_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, SUBLANES, l_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N_ROWS, SUBLANES, l_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((repeats * POSE_ROWS, SUBLANES, l_tile),
                         lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_ROWS, SUBLANES, lanes), jnp.float32),
            jax.ShapeDtypeStruct(
                (repeats * POSE_ROWS, SUBLANES, lanes), jnp.float32
            ),
        ],
        interpret=interpret,
    )(packed, force)

    flat = out.reshape(N_ROWS, e)
    comps = {}
    row = 0
    for name, n in _FIELDS:
        comps[name] = tuple(flat[row + k] for k in range(n))
        row += n
    # (R·16, 8, L) → (R, E, 16): tiny transpose (R·16·E floats) in XLA.
    pose_mat = jnp.transpose(poses.reshape(repeats, POSE_ROWS, e), (0, 2, 1))
    return soa.to_rigid(soa.SoAState(**comps)), pose_mat


def step_substeps_pallas(
    scene: SceneParams,
    state: RigidState,
    cart_force: jnp.ndarray,
    num_substeps: int,
    l_tile: int = 128,
    interpret: bool = False,
) -> RigidState:
    """Drop-in for soa.step_substeps_batched via the Mosaic kernel.

    E must be a multiple of 8·l_tile (1024 at the default tile).  Wider
    tiles (fewer grid cells) were raced at 4096 envs and measured SLOWER
    (512 lanes: 1.94 ms/step vs 1.71 at 128) — the per-cell VPU ops grow
    with tile width faster than the saved grid overhead.
    """
    e = state.pos.shape[0]
    lanes = e // SUBLANES
    if e % (SUBLANES * l_tile) != 0:
        raise ValueError(f"num envs {e} must be a multiple of {SUBLANES * l_tile}")

    s = soa.from_rigid(state)
    rows = [c for name, _ in _FIELDS for c in getattr(s, name)]
    packed = jnp.stack(rows).reshape(N_ROWS, SUBLANES, lanes)
    force = jnp.stack(
        [cart_force[:, 0], cart_force[:, 1], cart_force[:, 2]]
    ).reshape(3, SUBLANES, lanes)

    kernel = functools.partial(_phys_kernel, scene, num_substeps)
    out = pl.pallas_call(
        kernel,
        grid=(lanes // l_tile,),
        in_specs=[
            pl.BlockSpec((N_ROWS, SUBLANES, l_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, SUBLANES, l_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_ROWS, SUBLANES, l_tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_ROWS, SUBLANES, lanes), jnp.float32),
        interpret=interpret,
    )(packed, force)

    flat = out.reshape(N_ROWS, e)
    comps = {}
    row = 0
    for name, n in _FIELDS:
        comps[name] = tuple(flat[row + k] for k in range(n))
        row += n
    return soa.to_rigid(soa.SoAState(**comps))
