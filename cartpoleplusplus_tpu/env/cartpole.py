"""Pure-functional cartpole++ environment: the TPU-native `reset`/`step`.

This is the rebuild of the reference's ``BulletCartpole`` gym env
(reference: bullet_cartpole.py:~L60-260).  The reference drives Bullet through
per-substep FFI calls; here `reset` and `step` are pure JAX functions over a
``RigidState``, so they jit, vmap over thousands of envs, and fuse with the
learner.  The gym-style stateful class lives in env/gym_env.py; batched
auto-reset vectorization in env/vector.py.

Semantics preserved from the reference:
  * reset: cart at origin / pole upright (+ small pose jitter), then a random
    planar push of ``initial_force`` N applied for ``initial_force_steps``
    substeps so a do-nothing policy fails (bullet_cartpole.py reset:~L150-190).
  * step: action → planar force on the cart, re-applied across
    ``action_repeats × steps_per_repeat`` substeps; one observation frame is
    captured per repeat (bullet_cartpole.py:~L190-260).
  * termination: POLE (x, y) beyond ``pos_threshold``, pole roll/pitch beyond
    ``angle_threshold``, or episode length cap (~L230-250).
  * reward: +1 per surviving step, with the --reward-calc shaped variants.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from cartpoleplusplus_tpu.env.config import (
    DISCRETE_ACTIONS,
    REWARD_ACTION,
    REWARD_ANGLE,
    REWARD_ANGLE_ACTION,
    CartpoleConfig,
)
from cartpoleplusplus_tpu.physics import engine, math3d, soa
from cartpoleplusplus_tpu.physics.bodies import (
    CART,
    POLE,
    RigidState,
    SceneParams,
    make_scene,
    rest_state,
)

# Observation capture: (scene, rigid) → one frame. Low-dim default below;
# render/observe.py provides the pixel version (reference --use-raw-pixels).
ObserveFn = Callable[[SceneParams, RigidState], jnp.ndarray]


@struct.dataclass
class EnvState:
    """Dynamic env state threaded through the pure step."""

    rigid: RigidState
    steps: jnp.ndarray  # () int32, episode step counter
    done: jnp.ndarray  # () bool, sticky terminal flag


def scene_for(config: CartpoleConfig) -> SceneParams:
    """Scene constants matching the config's physics cadence."""
    return make_scene(dt=config.dt,
                      solver_iterations=config.solver_iterations)


def observe_lowdim(scene: SceneParams, rigid: RigidState) -> jnp.ndarray:
    """One low-dim frame: (2 bodies, 7) = pos(3) + quat(4) per body.

    Matches the reference state layout (bullet_cartpole.py:~L100-150: cart and
    pole position + orientation quaternion per repeat).
    """
    del scene
    return jnp.concatenate([rigid.pos, rigid.quat], axis=-1)


def action_to_force(config: CartpoleConfig, action: jnp.ndarray) -> jnp.ndarray:
    """Map an agent action to a world-frame (3,) force on the cart.

    Discrete: index into the 5-way nop/±x/±y table × action_force
    (reference bullet_cartpole.py:~L195-205).  Continuous: clip each of
    (fx, fy) to [-1, 1] and scale (reference DDPG/NAF path).
    """
    if config.discrete_actions:
        table = jnp.asarray(DISCRETE_ACTIONS, jnp.float32)
        dir_xy = table[jnp.asarray(action, jnp.int32)]
    else:
        dir_xy = jnp.clip(jnp.asarray(action, jnp.float32).reshape(2), -1.0, 1.0)
    force_xy = config.action_force * dir_xy
    return jnp.concatenate([force_xy, jnp.zeros((1,), jnp.float32)])


def pole_roll_pitch(rigid: RigidState) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pole orientation as (roll, pitch) Euler angles.

    The reference converts the pole quaternion with
    ``p.getEulerFromQuaternion`` and bounds-checks roll and pitch
    (bullet_cartpole.py:~L230-250).
    """
    q = rigid.quat[..., POLE, :]
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    return roll, pitch


def _violation(config: CartpoleConfig, rigid: RigidState) -> jnp.ndarray:
    """True when the pole is out of position or orientation bounds."""
    px, py = rigid.pos[..., POLE, 0], rigid.pos[..., POLE, 1]
    roll, pitch = pole_roll_pitch(rigid)
    out_pos = (jnp.abs(px) > config.pos_threshold) | (
        jnp.abs(py) > config.pos_threshold
    )
    out_ang = (jnp.abs(roll) > config.angle_threshold) | (
        jnp.abs(pitch) > config.angle_threshold
    )
    return out_pos | out_ang


def _reward(
    config: CartpoleConfig,
    rigid: RigidState,
    action: jnp.ndarray,
    violated: jnp.ndarray,
) -> jnp.ndarray:
    """Per-step reward under --reward-calc (reference bullet_cartpole.py).

    Base +1 per surviving step; 0 on a bounds/tilt violation.  Shaped
    variants (reconstructed semantics): 'angle' scales by pole uprightness,
    'action' subtracts an action-magnitude penalty, 'angle_action' does both.
    """
    base = jnp.asarray(1.0, jnp.float32)
    if config.reward_calc in (REWARD_ANGLE, REWARD_ANGLE_ACTION):
        tilt = math3d.quat_tilt_angle(rigid.quat[..., POLE, :])
        base = base * jnp.maximum(jnp.cos(tilt), 0.0)
    if config.reward_calc in (REWARD_ACTION, REWARD_ANGLE_ACTION):
        if config.discrete_actions:
            mag = (jnp.asarray(action) != 0).astype(jnp.float32)
        else:
            a = jnp.clip(jnp.asarray(action, jnp.float32).reshape(2), -1.0, 1.0)
            mag = 0.5 * jnp.sum(a * a)
        base = base - 0.1 * mag
    return jnp.where(violated, 0.0, base)


def reset(
    config: CartpoleConfig,
    scene: SceneParams,
    rng: jax.Array,
    observe_fn: Optional[ObserveFn] = None,
) -> tuple[EnvState, jnp.ndarray]:
    """Reset one env → (EnvState, obs of shape (repeats, *frame)).

    Reference reset (bullet_cartpole.py:~L150-190): reposition cart & pole at
    rest with slight random pole jitter, then push the cart with a fixed-
    magnitude force in a uniformly random planar direction for 30 substeps.
    """
    observe = observe_fn or observe_lowdim
    k_theta, k_jitter = jax.random.split(rng)

    rigid = rest_state(scene)
    # Small random pole tilt so episodes are not bitwise identical.
    jit_ang = config.random_theta_jitter * jax.random.normal(k_jitter, (2,))
    axis = jnp.array([1.0, 0.0, 0.0]) * jit_ang[0] + jnp.array([0.0, 1.0, 0.0]) * jit_ang[1]
    angle = jnp.linalg.norm(jit_ang) + 1e-12
    pole_q = math3d.quat_from_axis_angle(axis, angle)
    rigid = rigid.replace(quat=rigid.quat.at[POLE].set(pole_q))

    # Random planar push (the reference's "initial force" so nop fails).
    theta = jax.random.uniform(k_theta, (), minval=0.0, maxval=2.0 * jnp.pi)
    push = config.initial_force * jnp.stack(
        [jnp.cos(theta), jnp.sin(theta), jnp.zeros(())]
    ).astype(jnp.float32)
    rigid = engine.step_substeps(scene, rigid, push, config.initial_force_steps)

    frame = observe(scene, rigid)
    obs = jnp.broadcast_to(frame, (config.action_repeats,) + frame.shape)
    state = EnvState(
        rigid=rigid,
        steps=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), jnp.bool_),
    )
    return state, obs


def step(
    config: CartpoleConfig,
    scene: SceneParams,
    state: EnvState,
    action: jnp.ndarray,
    observe_fn: Optional[ObserveFn] = None,
) -> tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Advance one env step → (EnvState, obs, reward, done).

    Obs has shape (action_repeats, *frame): one captured frame per repeat,
    exactly the reference's repeat-stacked state (bullet_cartpole.py:~L207-225
    re-applies the same force before every substep and snapshots once per
    repeat).
    """
    observe = observe_fn or observe_lowdim
    force = action_to_force(config, action)

    def repeat_body(rigid, _):
        rigid = engine.step_substeps(scene, rigid, force, config.steps_per_repeat)
        return rigid, observe(scene, rigid)

    rigid, frames = jax.lax.scan(
        repeat_body, state.rigid, None, length=config.action_repeats
    )

    steps = state.steps + 1
    violated = _violation(config, rigid)
    timeout = steps >= config.max_episode_len
    done = state.done | violated | timeout
    reward = jnp.where(state.done, 0.0, _reward(config, rigid, action, violated))

    return EnvState(rigid=rigid, steps=steps, done=done), frames, reward, done


# ---------------------------------------------------------------------------
# Batched fast path: SoA physics + vmapped observation.  Semantics identical
# to vmap(reset)/vmap(step) (pinned by tests/test_env.py::test_batched_*);
# the physics runs through physics/soa.py, which keeps the env axis on the
# VPU lanes instead of per-env vmap over trailing-3 arrays (~2.5× faster at
# 4096 envs on v5e).
# ---------------------------------------------------------------------------


def _batched_observe(observe_fn, observe_batched_fn):
    """Pick the batched observation fn: explicit batched (e.g. the Pallas
    renderer) or vmap of the per-env hook."""
    if observe_batched_fn is not None:
        return observe_batched_fn
    observe = observe_fn or observe_lowdim
    return lambda scene, rigid: jax.vmap(lambda r: observe(scene, r))(rigid)


def reset_batched(
    config: CartpoleConfig,
    scene: SceneParams,
    rng: jax.Array,
    num_envs: int,
    observe_fn: Optional[ObserveFn] = None,
    observe_batched_fn=None,
    physics_fn=None,
) -> tuple[EnvState, jnp.ndarray]:
    """Batched reset → (EnvState[E], obs[E, repeats, …]).

    ``physics_fn``: batched substepper (scene, rigid, force, n) → rigid;
    defaults to the XLA SoA path; physics.pallas_step.step_substeps_pallas is
    the Mosaic alternative.
    """
    observe_b = _batched_observe(observe_fn, observe_batched_fn)
    physics = physics_fn or soa.step_substeps_batched
    k_theta, k_jitter = jax.random.split(rng)

    base = rest_state(scene)
    rigid = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), base
    )
    jit_ang = config.random_theta_jitter * jax.random.normal(k_jitter, (num_envs, 2))
    axis = (
        jnp.array([1.0, 0.0, 0.0]) * jit_ang[:, :1]
        + jnp.array([0.0, 1.0, 0.0]) * jit_ang[:, 1:]
    )
    angle = jnp.linalg.norm(jit_ang, axis=-1) + 1e-12
    pole_q = math3d.quat_from_axis_angle(axis, angle)  # (E, 4)
    rigid = rigid.replace(quat=rigid.quat.at[:, POLE].set(pole_q))

    theta = jax.random.uniform(k_theta, (num_envs,), minval=0.0, maxval=2.0 * jnp.pi)
    push = config.initial_force * jnp.stack(
        [jnp.cos(theta), jnp.sin(theta), jnp.zeros_like(theta)], axis=-1
    )
    rigid = physics(scene, rigid, push, config.initial_force_steps)

    frame = observe_b(scene, rigid)
    obs = jnp.broadcast_to(
        frame[:, None], (num_envs, config.action_repeats) + frame.shape[1:]
    )
    state = EnvState(
        rigid=rigid,
        steps=jnp.zeros((num_envs,), jnp.int32),
        done=jnp.zeros((num_envs,), jnp.bool_),
    )
    return state, obs


def step_batched(
    config: CartpoleConfig,
    scene: SceneParams,
    state: EnvState,
    action: jnp.ndarray,
    observe_fn: Optional[ObserveFn] = None,
    observe_batched_fn=None,
    physics_fn=None,
    sim_fn=None,
) -> tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched step → (EnvState[E], obs[E, repeats, …], reward[E], done[E]).

    ``sim_fn``: optional fully-fused simulate+observe hook
    ``(scene, rigid, force) → (rigid, obs[E, repeats, …])`` covering ALL
    action repeats — one physics launch + one render launch per step
    (agents/common.make_venv wires the Pallas pair).  Overrides the
    per-repeat physics/observe composition below.
    """
    force = jax.vmap(lambda a: action_to_force(config, a))(action)

    if sim_fn is not None:
        rigid, obs = sim_fn(scene, state.rigid, force)
    else:
        observe_b = _batched_observe(observe_fn, observe_batched_fn)
        physics = physics_fn or soa.step_substeps_batched
        # Statically unrolled repeats (2-4), stacking frames straight into
        # the (E, repeats, …) obs layout.  A lax.scan would emit frames as
        # (repeats, E, …) and need a moveaxis afterwards — at 4096 pixel
        # envs that transpose alone moves 184 MB of HBM per step (measured:
        # the single biggest "env bookkeeping" cost in
        # scripts/bench_stages.py); with the unroll, XLA fuses each render
        # epilogue into its slice of the obs slab and the transpose
        # disappears.
        rigid = state.rigid
        frames = []
        for _ in range(config.action_repeats):
            rigid = physics(scene, rigid, force, config.steps_per_repeat)
            frames.append(observe_b(scene, rigid))
        obs = jnp.stack(frames, axis=1)  # (E, repeats, …)

    steps = state.steps + 1
    violated = _violation(config, rigid)
    timeout = steps >= config.max_episode_len
    done = state.done | violated | timeout
    reward = jnp.where(state.done, 0.0, _reward(config, rigid, action, violated))
    return EnvState(rigid=rigid, steps=steps, done=done), obs, reward, done
