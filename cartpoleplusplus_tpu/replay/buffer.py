"""On-device replay memory — rebuild of the reference's ``replay_memory.py``.

The reference keeps a fixed-capacity circular buffer of (s1, a, r, s2,
terminal) in preallocated host numpy arrays with a write cursor
(replay_memory.py:~L20-120: ``add`` advances the cursor with wraparound,
``batch`` uniform-samples index arrays).  The TPU rebuild keeps the same
semantics but stores everything in device arrays inside a pytree, with pure
functional ``add``/``sample`` so the whole step→add→sample→train cycle fuses
under one jit (buffers are donated across steps, so updates are in-place at
the XLA level — no reallocation).

Two storage modes:

* ``store_s2=True`` (general): both observations of every transition are
  stored — works for arbitrary insertion orders (the reference semantics).
* ``store_s2=False`` (the fused-loop fast path): only s1 is stored and
  ``s2(i) = s1 row (i + block) % capacity`` — the next vectorized step's
  observation for the same env slot, because the fused loops write exactly
  one ``block``-sized batch (all envs) per step.  This is the reference's
  own memory-saving trick (replay_memory.py stores each state once and
  reuses index+1 as s2 — SURVEY.md §2.1), generalized to block writes.  It
  halves replay HBM capacity AND halves the per-step write traffic (the
  92 MB/step s2 write at 4096 pixel envs disappears; see BASELINE.md stage
  table).  Correctness notes:
    - for terminal transitions the "next" row is the *reset* observation,
      not the terminal frame, but TD targets mask bootstrap with
      ``(1 - terminal)`` so that row is never read into a value;
    - the newest block has no next row yet, so ``sample`` draws only from
      the ``size - block`` older entries.
"""

from __future__ import annotations

import sys
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    """Circular buffer contents + cursor (all device-resident).

    ``block`` is static: 0 = s2 stored explicitly; >0 = s2-free mode with
    that insertion-batch size.
    """

    s1: jnp.ndarray  # (capacity, *obs_shape)
    action: jnp.ndarray  # (capacity, *action_shape)
    reward: jnp.ndarray  # (capacity,)
    s2: jnp.ndarray  # (capacity, *obs_shape) — or (0,) in s2-free mode
    terminal: jnp.ndarray  # (capacity,) bool
    cursor: jnp.ndarray  # () int32 — next write slot
    size: jnp.ndarray  # () int32 — valid entries
    # (capacity,) f32 — per-slot sampling priority, or (0,) when the buffer
    # is uniform-only.  Fresh buffers initialize to ONES so that an old
    # checkpoint restored without this field (restore keeps the fresh
    # value) degrades to uniform sampling rather than a zero distribution.
    priority: jnp.ndarray = None
    block: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.s1.shape[0]

    @property
    def prioritized(self) -> bool:
        return self.priority is not None and self.priority.shape[0] > 0


def create(
    capacity: int,
    obs_shape: Tuple[int, ...],
    action_shape: Tuple[int, ...],
    obs_dtype=jnp.float32,
    action_dtype=jnp.float32,
    block: int = 0,
    prioritized: bool = False,
) -> ReplayState:
    """Preallocate the buffer (reference ReplayMemory.__init__).

    ``block > 0`` selects s2-free storage (see module docstring); it must
    equal the batch size of every subsequent ``add_batch`` and be < capacity.
    ``prioritized`` allocates the per-slot priority array (see
    :func:`sample_prioritized`); inserts then stamp new rows with the
    running max priority and :func:`update_priorities` writes back TD
    magnitudes after each train step.
    """
    if block < 0 or block >= capacity:
        raise ValueError(f"block {block} must be in [0, capacity={capacity})")
    if block and capacity % block:
        trimmed = (capacity // block) * block
        if trimmed > block:
            # Keep the aligned in-place write path (see add_batch): a
            # capacity that isn't a block multiple would push EVERY insert
            # onto the scatter path — for pixel buffers that is a
            # whole-buffer materialization per env step.  Trimming loses
            # <1 block of capacity; the default agent capacities (100000)
            # are not multiples of num_envs, so this fires routinely.
            print(
                f"# replay: capacity {capacity} -> {trimmed} "
                f"(multiple of insertion block {block}; aligned write path)",
                file=sys.stderr,
            )
            capacity = trimmed
        # else: only one block fits after trimming — keep the requested
        # capacity and let add_batch's scatter path handle it (correct,
        # just not in-place).
    s2_shape = (0,) if block else (capacity,) + obs_shape
    return ReplayState(
        s1=jnp.zeros((capacity,) + obs_shape, obs_dtype),
        action=jnp.zeros((capacity,) + action_shape, action_dtype),
        reward=jnp.zeros((capacity,), jnp.float32),
        s2=jnp.zeros(s2_shape, obs_dtype),
        terminal=jnp.zeros((capacity,), jnp.bool_),
        cursor=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
        priority=jnp.ones((capacity if prioritized else 0,), jnp.float32),
        block=block,
    )


def add_batch(
    replay: ReplayState,
    s1: jnp.ndarray,
    action: jnp.ndarray,
    reward: jnp.ndarray,
    s2: jnp.ndarray | None,
    terminal: jnp.ndarray,
) -> ReplayState:
    """Write a batch of B transitions at the cursor with wraparound.

    Generalises the reference's one-at-a-time ``add`` (replay_memory.py) to
    the vectorized-env case: all B env transitions land in consecutive slots
    modulo capacity.  B is a static shape so this stays jit-friendly.  In
    s2-free mode (``replay.block > 0``) the ``s2`` argument is ignored.
    """
    b = s1.shape[0]
    if replay.block and b != replay.block:
        raise ValueError(
            f"s2-free replay requires fixed batch {replay.block}, got {b}"
        )
    cap = replay.capacity
    updates = {"cursor": (replay.cursor + b) % cap,
               "size": jnp.minimum(replay.size + b, cap)}
    if replay.prioritized:
        # New transitions enter at the running max priority (Schaul et al.
        # PER convention: every transition is replayed at least once before
        # its priority is corrected by a measured TD error).  The O(cap)
        # max reduce is one VPU pass over a (cap,) f32 row — noise next to
        # the obs writes.  jnp.maximum(…, 1.0) keeps the distribution
        # non-degenerate before the first train step.
        pmax = jnp.maximum(jnp.max(replay.priority), 1.0)
        fill = jnp.full((b,), pmax, jnp.float32)
        if replay.block and cap % b == 0:
            updates["priority"] = jax.lax.dynamic_update_slice(
                replay.priority, fill, (replay.cursor,)
            )
        else:
            pidx = (replay.cursor + jnp.arange(b, dtype=jnp.int32)) % cap
            updates["priority"] = replay.priority.at[pidx].set(fill)
    if replay.block and cap % b == 0:
        # Aligned fast path: in s2-free mode every insert is exactly one
        # ``block`` (enforced above) and create() trims capacity to a block
        # multiple, so the cursor is always a multiple of b and a batch
        # never wraps mid-write — one contiguous dynamic_update_slice per
        # field.  This is what keeps the fused loop fast: XLA updates the
        # donated buffer in place, whereas a general scatter with computed
        # indices can force a full-buffer materialisation per step (for
        # pixel observations that is hundreds of MB per env step).
        # Explicit-s2 mode (block=0) always scatters: its public add()/
        # add_batch mix can leave the cursor unaligned, and a clamped
        # dynamic_update_slice at an unaligned cursor would silently
        # overwrite the wrong slots instead of wrapping.
        def upd(buf, val):
            start = (replay.cursor,) + (jnp.zeros((), jnp.int32),) * (buf.ndim - 1)
            return jax.lax.dynamic_update_slice(buf, val.astype(buf.dtype), start)

        return replay.replace(
            s1=upd(replay.s1, s1),
            action=upd(replay.action, action),
            reward=upd(replay.reward, reward),
            terminal=upd(replay.terminal, terminal),
            **updates,
        )
    idx = (replay.cursor + jnp.arange(b, dtype=jnp.int32)) % cap
    if not replay.block:
        updates["s2"] = replay.s2.at[idx].set(s2.astype(replay.s2.dtype))
    return replay.replace(
        s1=replay.s1.at[idx].set(s1.astype(replay.s1.dtype)),
        action=replay.action.at[idx].set(action.astype(replay.action.dtype)),
        reward=replay.reward.at[idx].set(reward.astype(jnp.float32)),
        terminal=replay.terminal.at[idx].set(terminal),
        **updates,
    )


def add(replay: ReplayState, s1, action, reward, s2, terminal) -> ReplayState:
    """Single-transition add (reference ReplayMemory.add signature)."""
    one = lambda x: jnp.asarray(x)[None]
    return add_batch(
        replay, one(s1), one(action), one(reward),
        None if replay.block else one(s2), one(terminal),
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
    replay: ReplayState, rng: jax.Array, batch_size: int,
    n_step: int = 1, gamma: float = 0.99,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniform random batch (reference ReplayMemory.batch).

    Indices are drawn over the valid region; sampling before the buffer has
    warmed up returns repeated early entries (the reference simply does not
    train until warm — callers gate the train step the same way).  In
    s2-free mode the newest ``n_step`` blocks are excluded (their successor
    rows don't exist yet) and s2 is gathered from ``(idx + n·block) %
    capacity``.  ``n_step > 1`` returns accumulated n-step rewards and the
    any-terminal-in-window flag (see :func:`nstep_batch`); callers
    bootstrap with ``gamma ** n_step``.
    """
    if replay.block:
        valid = jnp.maximum(replay.size - n_step * replay.block, 1)
        start = jnp.where(
            replay.size < replay.capacity,
            jnp.zeros((), jnp.int32),
            replay.cursor,  # full ring: oldest entry sits at the cursor
        )
        off = jax.random.randint(rng, (batch_size,), 0, valid)
        idx = (start + off) % replay.capacity
        if n_step > 1:
            return nstep_batch(replay, idx, n_step, gamma)
        s2 = replay.s1[(idx + replay.block) % replay.capacity]
    else:
        if n_step > 1:
            raise ValueError("n-step sampling requires s2-free block mode")
        hi = jnp.maximum(replay.size, 1)
        idx = jax.random.randint(rng, (batch_size,), 0, hi)
        s2 = replay.s2[idx]
    return (
        replay.s1[idx],
        replay.action[idx],
        replay.reward[idx],
        s2,
        replay.terminal[idx],
    )


def _valid_mask(
    replay: ReplayState, n_step: int = 1
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mask[capacity] bool, count) of slots ``sample`` may legally draw.

    Mirrors :func:`sample`'s index arithmetic: in s2-free mode the newest
    ``n_step`` blocks are excluded (transition i's k-th successor lives at
    ``i + k·block``; the n-step window must be fully written) and the
    window starts at the cursor once the ring is full; in explicit-s2 mode
    the first ``size`` slots.
    """
    cap = replay.capacity
    pos = jnp.arange(cap, dtype=jnp.int32)
    if replay.block:
        valid = jnp.maximum(replay.size - n_step * replay.block, 1)
        start = jnp.where(
            replay.size < cap, jnp.zeros((), jnp.int32), replay.cursor
        )
        return ((pos - start) % cap) < valid, valid
    valid = jnp.maximum(replay.size, 1)
    return pos < valid, valid


def nstep_batch(
    replay: ReplayState, idx: jnp.ndarray, n_step: int, gamma: float
):
    """Gather an n-step transition batch at ``idx`` (s2-free block mode).

    The block layout makes multi-step returns pure stride gathers — no
    per-env episode bookkeeping: transition i's k-th successor for the
    SAME env slot is row ``(i + k·block) % capacity``, so

        r_n(i)   = Σ_{k<n} γ^k · r(i + k·block) · Π_{j<k} alive(i + j·block)
        done_n(i)= any terminal inside the window
        s2_n(i)  = s1 row (i + n·block)

    Rewards past the first terminal belong to the NEXT episode in that
    slot (auto-reset) and are masked by the alive product; the bootstrap
    is masked by ``done_n`` exactly as in 1-step TD.  n is static, so the
    loop unrolls to n strided gathers of (B,) scalars + one obs gather.
    """
    if not replay.block:
        raise ValueError("n-step sampling requires s2-free block mode")
    cap = replay.capacity
    r_n = jnp.zeros(idx.shape, jnp.float32)
    alive = jnp.ones(idx.shape, jnp.float32)
    for k in range(n_step):
        j = (idx + k * replay.block) % cap
        r_n = r_n + (gamma**k) * alive * replay.reward[j]
        alive = alive * (1.0 - replay.terminal[j].astype(jnp.float32))
    s2 = replay.s1[(idx + n_step * replay.block) % cap]
    done_n = alive < 0.5
    return (
        replay.s1[idx],
        replay.action[idx],
        r_n,
        s2,
        done_n,
    )


def sample_prioritized(
    replay: ReplayState,
    rng: jax.Array,
    batch_size: int,
    alpha: float,
    beta: jnp.ndarray | float,
    n_step: int = 1,
    gamma: float = 0.99,
):
    """Proportional prioritized sampling (Schaul et al. 2016) — TPU-native.

    The classic implementation is a host-side sum tree with O(log n)
    pointer chasing per draw — a scalar-serial structure XLA cannot
    batch.  On TPU the whole distribution fits one VPU pass: mask the
    valid window, raise priorities to ``alpha``, one ``cumsum`` builds the
    CDF in HBM-resident f32, and ``searchsorted`` (branchless vectorized
    bisection) inverts it for all ``batch_size`` draws at once.  O(cap +
    B·log cap) fused work per train step, no host round-trip, no tree.

    Returns ``(s1, a, r, s2, term), idx, iw`` where ``iw`` are the
    importance-sampling weights ``(N·P(i))^-beta`` normalized to max 1
    over the batch (the reference PER normalization).
    """
    # Mask AFTER the power: at alpha == 0 (uniform ablation) 0**0 == 1
    # would otherwise resurrect every invalid slot.
    w = jnp.where(
        _valid_mask(replay, n_step)[0], replay.priority ** alpha, 0.0
    )
    cdf = jnp.cumsum(w)
    total = cdf[-1]
    # The (1 - eps) shrink keeps u strictly below total after f32 rounding:
    # u == total would searchsorted past the last valid slot.  side="right"
    # also handles u == 0 (first cdf > 0 = first VALID slot, skipping any
    # zero-weight prefix).
    u = (jax.random.uniform(rng, (batch_size,))
         * (1.0 - jnp.finfo(jnp.float32).eps)) * total
    idx = jnp.clip(
        jnp.searchsorted(cdf, u, side="right").astype(jnp.int32),
        0, replay.capacity - 1,
    )
    n = _valid_mask(replay, n_step)[1].astype(jnp.float32)
    # P(i) under the masked distribution; total==0 cannot happen after the
    # first insert (new rows stamp max(pmax, 1)), but guard the cold read.
    p = w[idx] / jnp.maximum(total, 1e-12)
    iw = (n * jnp.maximum(p, 1e-12)) ** (-beta)
    iw = iw / jnp.maximum(jnp.max(iw), 1e-12)
    if n_step > 1:
        return nstep_batch(replay, idx, n_step, gamma), idx, iw
    if replay.block:
        s2 = replay.s1[(idx + replay.block) % replay.capacity]
    else:
        s2 = replay.s2[idx]
    batch = (
        replay.s1[idx],
        replay.action[idx],
        replay.reward[idx],
        s2,
        replay.terminal[idx],
    )
    return batch, idx, iw


def update_priorities(
    replay: ReplayState, idx: jnp.ndarray, td_abs: jnp.ndarray,
    eps: float = 1e-2, gate=None,
) -> ReplayState:
    """Write measured |TD error| + eps back as the sampled rows' priority.

    ``gate`` (scalar bool, optional): when False the rows keep their
    existing (max-stamped) priorities — the agents' convention before the
    replay-warm train gate opens, so ungated zero TDs can't flatten the
    distribution against unwritten rows.
    """
    new_p = td_abs + eps
    if gate is not None:
        new_p = jnp.where(gate, new_p, replay.priority[idx])
    return replay.replace(priority=replay.priority.at[idx].set(new_p))
