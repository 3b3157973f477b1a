"""On-device replay memory — rebuild of the reference's ``replay_memory.py``.

The reference keeps a fixed-capacity circular buffer of (s1, a, r, s2,
terminal) in preallocated host numpy arrays with a write cursor
(replay_memory.py:~L20-120: ``add`` advances the cursor with wraparound,
``batch`` uniform-samples index arrays).  The TPU rebuild keeps the same
semantics but stores everything in device arrays inside a pytree, with pure
functional ``add``/``sample`` so the whole step→add→sample→train cycle fuses
under one jit (buffers are donated across steps, so updates are in-place at
the XLA level — no reallocation).

Memory-saving trick from the reference (storing each state once, s2 = next
slot's s1) is NOT replicated: HBM is plentiful for low-dim state, and for
pixels the fused loop trains on-policy batches straight from the env where
possible.  A 4096-env × 50×50×3 pixel replay at 100k capacity would not fit
anyway; capacity bounds are the caller's concern as upstream.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    """Circular buffer contents + cursor (all device-resident)."""

    s1: jnp.ndarray  # (capacity, *obs_shape)
    action: jnp.ndarray  # (capacity, *action_shape)
    reward: jnp.ndarray  # (capacity,)
    s2: jnp.ndarray  # (capacity, *obs_shape)
    terminal: jnp.ndarray  # (capacity,) bool
    cursor: jnp.ndarray  # () int32 — next write slot
    size: jnp.ndarray  # () int32 — valid entries

    @property
    def capacity(self) -> int:
        return self.s1.shape[0]


def create(
    capacity: int,
    obs_shape: Tuple[int, ...],
    action_shape: Tuple[int, ...],
    obs_dtype=jnp.float32,
    action_dtype=jnp.float32,
) -> ReplayState:
    """Preallocate the buffer (reference ReplayMemory.__init__)."""
    return ReplayState(
        s1=jnp.zeros((capacity,) + obs_shape, obs_dtype),
        action=jnp.zeros((capacity,) + action_shape, action_dtype),
        reward=jnp.zeros((capacity,), jnp.float32),
        s2=jnp.zeros((capacity,) + obs_shape, obs_dtype),
        terminal=jnp.zeros((capacity,), jnp.bool_),
        cursor=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def add_batch(
    replay: ReplayState,
    s1: jnp.ndarray,
    action: jnp.ndarray,
    reward: jnp.ndarray,
    s2: jnp.ndarray,
    terminal: jnp.ndarray,
) -> ReplayState:
    """Write a batch of B transitions at the cursor with wraparound.

    Generalises the reference's one-at-a-time ``add`` (replay_memory.py) to
    the vectorized-env case: all B env transitions land in consecutive slots
    modulo capacity.  B is a static shape so this stays jit-friendly.
    """
    b = s1.shape[0]
    cap = replay.capacity
    if cap % b == 0:
        # Aligned fast path: the cursor starts at 0 and advances by b, so a
        # batch never wraps mid-write — one contiguous dynamic_update_slice
        # per field.  This is what keeps the fused loop fast: XLA updates the
        # donated buffer in place, whereas a general scatter with computed
        # indices can force a full-buffer materialisation per step (for
        # pixel observations that is hundreds of MB per env step).
        def upd(buf, val):
            start = (replay.cursor,) + (jnp.zeros((), jnp.int32),) * (buf.ndim - 1)
            return jax.lax.dynamic_update_slice(buf, val.astype(buf.dtype), start)

        return replay.replace(
            s1=upd(replay.s1, s1),
            action=upd(replay.action, action),
            reward=upd(replay.reward, reward),
            s2=upd(replay.s2, s2),
            terminal=upd(replay.terminal, terminal),
            cursor=(replay.cursor + b) % cap,
            size=jnp.minimum(replay.size + b, cap),
        )
    idx = (replay.cursor + jnp.arange(b, dtype=jnp.int32)) % cap
    return replay.replace(
        s1=replay.s1.at[idx].set(s1.astype(replay.s1.dtype)),
        action=replay.action.at[idx].set(action.astype(replay.action.dtype)),
        reward=replay.reward.at[idx].set(reward.astype(jnp.float32)),
        s2=replay.s2.at[idx].set(s2.astype(replay.s2.dtype)),
        terminal=replay.terminal.at[idx].set(terminal),
        cursor=(replay.cursor + b) % cap,
        size=jnp.minimum(replay.size + b, cap),
    )


def add(replay: ReplayState, s1, action, reward, s2, terminal) -> ReplayState:
    """Single-transition add (reference ReplayMemory.add signature)."""
    one = lambda x: jnp.asarray(x)[None]
    return add_batch(
        replay, one(s1), one(action), one(reward), one(s2), one(terminal)
    )


def encode_obs(obs: jnp.ndarray, storage_dtype) -> jnp.ndarray:
    """Quantize [0,1] float observations for storage (uint8 = 4× less HBM).

    Pixel replay at scale is HBM-bound (4096 envs × 22.5k floats per obs);
    the reference stored renders as PNG bytes on disk (event_log.py) — the
    on-device analogue is uint8 quantization.
    """
    if storage_dtype == jnp.uint8:
        if obs.dtype == jnp.uint8:
            return obs  # renderer already quantized (uint8 end-to-end path)
        return jnp.clip(obs * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    return obs.astype(storage_dtype)


def decode_obs(stored: jnp.ndarray) -> jnp.ndarray:
    """Inverse of encode_obs: back to float32 in [0,1]."""
    if stored.dtype == jnp.uint8:
        return stored.astype(jnp.float32) * (1.0 / 255.0)
    return stored.astype(jnp.float32)


def sample(
    replay: ReplayState, rng: jax.Array, batch_size: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniform random batch (reference ReplayMemory.batch).

    Indices are drawn over [0, size); sampling before the buffer holds
    ``batch_size`` entries returns repeated early entries (the reference
    simply does not train until the buffer has warmed up — callers gate the
    train step the same way on ``replay.size``).
    """
    hi = jnp.maximum(replay.size, 1)
    idx = jax.random.randint(rng, (batch_size,), 0, hi)
    return (
        replay.s1[idx],
        replay.action[idx],
        replay.reward[idx],
        replay.s2[idx],
        replay.terminal[idx],
    )
