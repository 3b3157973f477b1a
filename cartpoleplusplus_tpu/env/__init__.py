"""Environment layer: functional cartpole++ env, vectorization, gym surface.

Rebuild of the reference's L1 (bullet_cartpole.py — see SURVEY.md §1).
"""

from cartpoleplusplus_tpu.env.cartpole import (
    EnvState,
    action_to_force,
    observe_lowdim,
    reset,
    scene_for,
    step,
)
from cartpoleplusplus_tpu.env.config import (
    DISCRETE_ACTIONS,
    NUM_DISCRETE_ACTIONS,
    CartpoleConfig,
    add_opts,
    config_from_opts,
)
from cartpoleplusplus_tpu.env.gym_env import BulletCartpole, Cartpole
from cartpoleplusplus_tpu.env.vector import VectorCartpole

__all__ = [
    "EnvState",
    "action_to_force",
    "observe_lowdim",
    "reset",
    "scene_for",
    "step",
    "DISCRETE_ACTIONS",
    "NUM_DISCRETE_ACTIONS",
    "CartpoleConfig",
    "add_opts",
    "config_from_opts",
    "BulletCartpole",
    "Cartpole",
    "VectorCartpole",
]
