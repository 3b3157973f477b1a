"""Checkpoint / resume — rebuild of the reference's Saver wrapper.

The reference wraps ``tf.train.Saver`` with a --ckpt-dir + save-every-N
policy and restores at startup if a checkpoint exists (util.py:~L90-130,
SURVEY.md §5 "the one auxiliary subsystem that genuinely exists and must be
preserved behaviorally").  Here any pytree (params, opt state, replay cursor,
RNG key) serializes via flax msgpack to numbered files; ``restore_latest``
reproduces the restore-if-present startup behavior.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
from flax import serialization

_CKPT_RE = re.compile(r"^ckpt_(\d+)\.msgpack$")


def save(ckpt_dir: str, step: int, tree: Any) -> str:
    """Serialize ``tree`` to <ckpt_dir>/ckpt_<step>.msgpack (atomic rename)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    tree = jax.device_get(tree)
    path = os.path.join(ckpt_dir, f"ckpt_{step}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(tree))
    os.replace(tmp, path)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(ckpt_dir)
        if (m := _CKPT_RE.match(name))
    ]
    return max(steps) if steps else None


def load_raw(ckpt_dir: str, step: int) -> Any:
    """Load a checkpoint as raw nested dicts (no target structure needed)."""
    path = os.path.join(ckpt_dir, f"ckpt_{step}.msgpack")
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_latest(ckpt_dir: str, target: Any) -> tuple[Any, Optional[int]]:
    """Restore the newest checkpoint into ``target``'s structure.

    Returns (tree, step) — (target, None) when no checkpoint exists, matching
    the reference's start-fresh-if-absent behavior.
    """
    step = latest_step(ckpt_dir)
    if step is None:
        return target, None
    path = os.path.join(ckpt_dir, f"ckpt_{step}.msgpack")
    with open(path, "rb") as f:
        tree = serialization.from_bytes(target, f.read())
    return tree, step
