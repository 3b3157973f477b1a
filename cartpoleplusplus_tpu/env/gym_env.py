"""Gym-style stateful wrapper — drop-in surface for the reference env.

The reference exposes ``class BulletCartpole(gym.Env)`` with ``reset()``,
``step(action)``, ``observation_space``/``action_space``, and a module-level
``add_opts`` (reference: bullet_cartpole.py:~L30-260).  This wrapper gives the
TPU env the same stateful face so third-party agents (the reference's keras-rl
DQN pattern, dqn_cartpole.py) run against it unchanged, while all compute
stays in the jitted pure functions of env/cartpole.py.

gym itself is optional: if importable we subclass ``gym.Env`` and build real
spaces; otherwise lightweight stand-ins keep the same attributes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.env import cartpole
from cartpoleplusplus_tpu.env.cartpole import ObserveFn
from cartpoleplusplus_tpu.env.config import (
    NUM_DISCRETE_ACTIONS,
    CartpoleConfig,
)
from cartpoleplusplus_tpu.env.config import add_opts as add_opts  # re-export
from cartpoleplusplus_tpu.env.config import config_from_opts
from cartpoleplusplus_tpu.physics.bodies import SceneParams

try:  # pragma: no cover - exercised implicitly by import
    import gym as _gym
    from gym import spaces as _spaces

    _GymBase = _gym.Env
except Exception:  # gym not installed — minimal stand-ins
    _gym = None
    _spaces = None
    _GymBase = object


class _DiscreteSpace:
    def __init__(self, n):
        self.n = n
        self.shape = ()
        self.dtype = np.int32

    def sample(self, rng=np.random):
        return int(rng.randint(self.n))


class _BoxSpace:
    def __init__(self, low, high, shape):
        self.low, self.high, self.shape = low, high, shape
        self.dtype = np.float32

    def sample(self, rng=np.random):
        return rng.uniform(self.low, self.high, self.shape).astype(np.float32)


class Cartpole(_GymBase):
    """Stateful single-env wrapper over the pure functional cartpole++ env.

    API parity with the reference ``BulletCartpole``:
      * ``reset() → obs``                 (np.ndarray, shape (repeats, 2, 7)
                                           low-dim or (repeats, cams, H, W, 3))
      * ``step(a) → (obs, r, done, info)`` with ``info['done_reason']``
      * ``observation_space`` / ``action_space``
    """

    metadata = {"render.modes": ["rgb_array", "human"]}

    def __init__(
        self,
        config: Optional[CartpoleConfig] = None,
        scene: Optional[SceneParams] = None,
        observe_fn: Optional[ObserveFn] = None,
        seed: int = 0,
    ):
        if config is not None and not isinstance(config, CartpoleConfig):
            # The reference constructs the env straight from parsed args
            # (``env = BulletCartpole(opts)``, ddpg_cartpole.py:~L280) —
            # accept an ``add_opts`` argparse Namespace the same way.
            config = config_from_opts(
                config,
                discrete_actions=not getattr(config, "continuous", False),
            )
        self.config = config or CartpoleConfig()
        self.scene = scene if scene is not None else cartpole.scene_for(self.config)
        if observe_fn is None and self.config.use_raw_pixels:
            # Pixel observations need the camera observer (reference:
            # state assembly calls getCameraImage, bullet_cartpole.py:
            # ~L120-150); without this, --use-raw-pixels silently fell
            # back to low-dim poses.
            from cartpoleplusplus_tpu.render import make_observe_pixels

            observe_fn = make_observe_pixels(self.config, dtype=jnp.uint8)
        self._observe_fn = observe_fn
        self._rng = jax.random.PRNGKey(seed)
        self._state = None
        self._render_fn = None  # built lazily on first render()
        self._render_cfg = None

        cfg, scn, obs_fn = self.config, self.scene, self._observe_fn
        self._reset_fn = jax.jit(lambda k: cartpole.reset(cfg, scn, k, obs_fn))
        self._step_fn = jax.jit(lambda s, a: cartpole.step(cfg, scn, s, a, obs_fn))

        # Spaces (reference: bullet_cartpole.py ctor builds gym spaces).
        # Pixel observations are uint8 in [0, 255]; low-dim poses are
        # unbounded float32.
        if self.config.use_raw_pixels:
            obs_lo, obs_hi, obs_dtype = 0, 255, np.uint8
        else:
            obs_lo, obs_hi, obs_dtype = -np.inf, np.inf, np.float32
        if _spaces is not None:
            if self.config.discrete_actions:
                self.action_space = _spaces.Discrete(NUM_DISCRETE_ACTIONS)
            else:
                self.action_space = _spaces.Box(-1.0, 1.0, shape=(2,), dtype=np.float32)
            self.observation_space = _spaces.Box(
                obs_lo, obs_hi, shape=self.config.obs_shape, dtype=obs_dtype
            )
        else:
            if self.config.discrete_actions:
                self.action_space = _DiscreteSpace(NUM_DISCRETE_ACTIONS)
            else:
                self.action_space = _BoxSpace(-1.0, 1.0, (2,))
            self.observation_space = _BoxSpace(
                obs_lo, obs_hi, self.config.obs_shape
            )
            self.observation_space.dtype = obs_dtype

    def _next_key(self) -> jax.Array:
        self._rng, key = jax.random.split(self._rng)
        return key

    def seed(self, seed: int):
        self._rng = jax.random.PRNGKey(seed)
        return [seed]

    def reset(self) -> np.ndarray:
        self._state, obs = self._reset_fn(self._next_key())
        return np.asarray(obs)

    def step(self, action):
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        if self.config.discrete_actions:
            action = jnp.asarray(int(action), jnp.int32)
        else:
            action = jnp.asarray(action, jnp.float32)
        self._state, obs, reward, done = self._step_fn(self._state, action)
        done = bool(done)
        info = {}
        if done:
            timeout = int(self._state.steps) >= self.config.max_episode_len
            info["done_reason"] = "max_episode_len" if timeout else "out_of_bounds"
        return np.asarray(obs), float(reward), done, info

    def render(self, mode="rgb_array"):
        """Render the current state → (H, W, 3) uint8 from camera 0.

        The reference's ``--gui`` opens Bullet's OpenGL window
        (bullet_cartpole.py:~L60-75); the TPU analogue is an on-demand
        raycast of the live state (same renderer as pixel observations, at
        the configured render resolution regardless of --use-raw-pixels).
        ``mode="human"`` is accepted and returns the same array (no window
        in this runtime); for whole-trajectory inspection use the event-log
        tools (utils/event_log.py --img-output-dir / --gif-out).
        """
        if self._state is None:
            raise RuntimeError("call reset() before render()")
        import dataclasses

        from cartpoleplusplus_tpu.render.raycast import (
            frame_to_images, make_observe_pixels,
        )

        if self._render_fn is None:
            # One full-res camera, no pooling, float path (off the hot loop).
            cfg = dataclasses.replace(
                self.config, use_raw_pixels=True, num_cameras=1, obs_pool=1
            )
            observe = make_observe_pixels(cfg, dtype=jnp.uint8)
            scene = self.scene
            self._render_cfg = cfg
            self._render_fn = jax.jit(lambda rigid: observe(scene, rigid))
        frame = self._render_fn(self._state.rigid)
        return frame_to_images(self._render_cfg, np.asarray(frame))[0]


# Alias matching the reference class name so ported scripts read naturally.
BulletCartpole = Cartpole
