"""Target-network utilities.

Rebuild of the reference's target-network machinery: ``base_network.py``
builds a second variable-scoped copy of each net plus soft-update assign ops
``target ← τ·src + (1-τ)·target`` (base_network.py:~L40-90).  With functional
params this collapses to a pytree polyak average — pure, jit-safe, donation-
friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_target_update(target_params, online_params, tau: float):
    """target ← τ·online + (1-τ)·target, elementwise over the param pytree."""
    return jax.tree.map(
        lambda t, o: (1.0 - tau) * t + tau * o.astype(t.dtype),
        target_params,
        online_params,
    )


def hard_target_update(target_params, online_params):
    """target ← online (reference's initial target sync)."""
    del target_params
    return jax.tree.map(jnp.asarray, online_params)
