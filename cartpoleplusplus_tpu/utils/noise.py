"""Exploration noise as pure RNG streams.

Rebuild of the reference's Ornstein-Uhlenbeck noise used for DDPG/NAF
exploration (reference: util.py:~L30-60 ``OrnsteinUhlenbeckNoise`` — a
stateful ``x += θ(µ−x) + σ·N(0,1)`` iterator).  The TPU version threads the
noise state functionally so it lives inside the jitted training loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ou_step(
    state: jnp.ndarray,
    rng: jax.Array,
    theta: float = 0.15,
    sigma: float = 0.2,
    mu: float = 0.0,
) -> jnp.ndarray:
    """One OU update: x ← x + θ(µ−x) + σ·ε.  Shape-polymorphic (vmap-safe)."""
    eps = jax.random.normal(rng, state.shape, state.dtype)
    return state + theta * (mu - state) + sigma * eps


def ou_init(shape, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.zeros(shape, dtype)
