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
import sys
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

_CKPT_RE = re.compile(r"^ckpt_(\d+)\.msgpack$")
# Multi-process (multi-host) rank-shard files: ckpt_<step>.rank<k>of<n>.msgpack
_CKPT_RANK_RE = re.compile(r"^ckpt_(\d+)\.rank(\d+)of(\d+)\.msgpack$")


def strip_replay(tree: Any) -> Any:
    """Replace every ReplayState in ``tree`` with an EMPTY one (same pytree
    structure, zero-length data arrays, cursor/size = 0).

    The production-checkpoint mode (--ckpt-skip-replay): a pixel-run replay
    buffer is multi-GB (100k × stacked uint8 frames) and serializing it on
    the step path is neither fast nor useful — on restore the buffer refills
    within ``capacity/num_envs`` env steps anyway.  Cursor/size are zeroed
    TOO: restoring a nonzero size against dropped data would sample zeros
    into the TD targets.  ``restore_latest`` recognizes the zero-length
    arrays (shape mismatch vs the fresh target) and keeps the target's
    freshly-allocated buffer.
    """
    from cartpoleplusplus_tpu.replay import ReplayState

    def f(x):
        if isinstance(x, ReplayState):
            # .dtype reads array metadata only — no device_get here, or the
            # skip saves the serialization but still pays the multi-GB D2H
            # fetch the flag exists to avoid.
            empty = lambda a: np.zeros((0,), np.dtype(a.dtype))
            zero = np.zeros((), np.int32)
            return x.replace(
                s1=empty(x.s1), action=empty(x.action), reward=empty(x.reward),
                s2=empty(x.s2), terminal=empty(x.terminal),
                # priority may be None on hand-built states (buffer.create
                # always sets it, but ad-hoc tooling may not).
                priority=(empty(x.priority) if x.priority is not None
                          else np.zeros((0,), np.float32)),
                cursor=zero, size=zero,
            )
        return x

    return jax.tree.map(f, tree, is_leaf=lambda x: isinstance(x, ReplayState))


def save(ckpt_dir: str, step: int, tree: Any, skip_replay: bool = False) -> str:
    """Serialize ``tree`` to <ckpt_dir>/ckpt_<step>.msgpack (atomic rename).

    Works for SHARDED runs too: ``jax.device_get`` gathers each global array
    from its mesh shards to host (params are replicated, env/replay shards
    concatenate along their leading dim), so the file always holds the
    host-global state and can be restored onto any fresh mesh — or none.
    ``skip_replay``: see :func:`strip_replay`.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    if skip_replay:
        tree = strip_replay(tree)
    if jax.process_count() > 1:
        # Multi-process jobs can't device_get non-addressable global arrays
        # — each rank persists exactly its own shard instead (SURVEY.md §5
        # failure recovery, extended to multi-host in round 5).
        return _save_process_shard(ckpt_dir, step, tree)
    tree = jax.device_get(tree)
    path = os.path.join(ckpt_dir, f"ckpt_{step}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(tree))
    os.replace(tmp, path)
    return path


def _process_local_data(x):
    """This process's host chunk of a (possibly global) array.

    Sharded leaves (1-D leading-dim shardings — the only kind this framework
    uses) concatenate this process's addressable shards in leading-offset
    order; replicated leaves dedupe to one full copy.  Fully-addressable
    arrays (single-process) and host values pass through.
    """
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_addressable:
        return np.asarray(jax.device_get(x))
    by_start = {}
    for s in x.addressable_shards:
        idx = s.index
        start = (idx[0].start or 0) if idx and isinstance(idx[0], slice) else 0
        by_start.setdefault(start, np.asarray(s.data))
    chunks = [by_start[k] for k in sorted(by_start)]
    return chunks[0] if len(chunks) == 1 else np.concatenate(chunks, axis=0)


def _save_process_shard(ckpt_dir: str, step: int, tree: Any) -> str:
    """Rank-sharded save: each process writes its local env/replay shard
    (plus its — identical — copy of the replicated params/opt leaves) to
    ``ckpt_<step>.rank<k>of<n>.msgpack``.  A step is restorable once ALL n
    rank files exist; :func:`restore_latest_sharded` checks completeness.
    """
    pid, n = jax.process_index(), jax.process_count()
    local = jax.tree.map(_process_local_data,
                         serialization.to_state_dict(tree))
    path = os.path.join(ckpt_dir, f"ckpt_{step}.rank{pid}of{n}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(local))
    os.replace(tmp, path)
    return path


_BEST_NAME = "ckpt_best.msgpack"


def save_best(ckpt_dir: str, step: int, eval_len: float, tree: Any,
              skip_replay: bool = False) -> str:
    """Keep the best-eval state as ``ckpt_best.msgpack`` (+ json sidecar).

    The --ckpt-best policy (round 5): long runs can regress late (the SAC
    α-collapse shape); this file always holds the state at the best eval
    seen so far, independent of the numbered save cadence.  Callers gate on
    improvement — this just writes.  Single-process only (the multi-process
    rank-shard flavor would need its own completeness story; agents skip
    the flag there).

    The step/eval meta is embedded IN the msgpack payload so the whole
    best-checkpoint (weights + the improvement gate that protects them) is
    one atomic ``os.replace`` — a crash between two replaces, or a corrupt
    sidecar, used to reseed the gate below the stored weights and let a
    later WORSE eval clobber the better best (round-5 review).  The json
    sidecar is still written, but purely advisory (humans / dashboards)."""
    if jax.process_count() > 1:  # pragma: no cover - agents gate on this
        raise ValueError("--ckpt-best is single-process only")
    os.makedirs(ckpt_dir, exist_ok=True)
    if skip_replay:
        tree = strip_replay(tree)
    tree = jax.device_get(tree)
    path = os.path.join(ckpt_dir, _BEST_NAME)
    payload = {
        "state": serialization.to_state_dict(tree),
        "_best_meta": {"step": int(step), "eval_ep_len": float(eval_len)},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    import json as _json

    with open(path + ".json.tmp", "w") as f:
        _json.dump({"step": int(step), "eval_ep_len": float(eval_len)}, f)
    os.replace(path + ".json.tmp", path + ".json")
    return path


def best_meta(ckpt_dir: str) -> Optional[dict]:
    """``{"step", "eval_ep_len"}`` of ``ckpt_best.msgpack``, or None.

    Reads the embedded msgpack meta (atomic with the weights); falls back
    to the advisory json sidecar for pre-round-5 files that only had the
    sidecar.  This is THE gate-seeding read: BestCkptKeeper must never see
    a gate below the eval of the weights actually on disk."""
    path = os.path.join(ckpt_dir or "", _BEST_NAME)
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        if isinstance(raw, dict) and "_best_meta" in raw:
            m = raw["_best_meta"]
            return {"step": int(m["step"]),
                    "eval_ep_len": float(m["eval_ep_len"])}
    except Exception as e:
        print(f"checkpoint {path}: unreadable ({type(e).__name__}); "
              "trying the json sidecar", file=sys.stderr)
    try:
        import json as _json

        with open(path + ".json") as f:
            m = _json.load(f)
        return {"step": int(m["step"]),
                "eval_ep_len": float(m["eval_ep_len"])}
    except Exception:
        print(f"checkpoint {path}: no readable step/eval meta (legacy file "
              "with a missing sidecar?)", file=sys.stderr)
        return None


def restore_best(ckpt_dir: str, target: Any) -> tuple[Any, Optional[int]]:
    """Restore ``ckpt_best.msgpack`` (same lenient merge as restore_latest);
    (target, None) when absent.  The returned step comes from the embedded
    meta (sidecar fallback for legacy files; 0 + a stderr warning when
    neither is readable — weights restored, provenance lost)."""
    path = os.path.join(ckpt_dir, _BEST_NAME)
    if not os.path.exists(path):
        return target, None
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    meta = None
    if isinstance(raw, dict) and "_best_meta" in raw and "state" in raw:
        meta = raw["_best_meta"]
        raw = raw["state"]
    skipped: list = []
    merged = _merge_state_dict(serialization.to_state_dict(target), raw, skipped)
    if skipped:
        print(
            f"checkpoint {path}: partial restore, kept fresh values for "
            f"{len(skipped)} leaves (first: {skipped[:3]})",
            file=sys.stderr,
        )
    if meta is not None:
        step = int(meta["step"])
    else:
        legacy = best_meta(ckpt_dir)  # sidecar fallback (warns when absent)
        step = int(legacy["step"]) if legacy else 0
    return serialization.from_state_dict(target, merged), step


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


_REPLAY_SIG = {"s1", "action", "reward", "terminal", "cursor", "size"}
_REPLAY_DATA = ("s1", "action", "reward", "s2", "terminal")


def _merge_state_dict(target_sd: Any, raw: Any, skipped: list, path: str = ""):
    """Recursively take ``raw`` leaves whose shape+dtype match the target's;
    keep the target's (fresh) value otherwise, recording the skip.

    A ReplayState subtree merges as a UNIT: if any of its data arrays is
    kept fresh (shape mismatch — a --ckpt-skip-replay file, a capacity
    trim, a changed env count), its cursor/size scalars reset to the
    target's fresh zeros too.  Restoring a stale nonzero size over a fresh
    zero buffer would open the agents' replay-warm train gate against
    unwritten rows."""
    if isinstance(target_sd, dict):
        local: list = []
        out = {}
        for k, v in target_sd.items():
            if isinstance(raw, dict) and k in raw:
                out[k] = _merge_state_dict(v, raw[k], local, f"{path}/{k}")
            else:
                local.append(f"{path}/{k}")
                out[k] = v
        if _REPLAY_SIG <= set(target_sd) and any(
            loc[len(path) + 1:].split(" ")[0].split("/")[0] in _REPLAY_DATA
            for loc in local
        ):
            out["cursor"] = target_sd["cursor"]
            out["size"] = target_sd["size"]
            local.append(f"{path}/cursor,size (reset with unrestored replay data)")
        skipped.extend(local)
        return out
    t, r = np.asarray(target_sd), np.asarray(raw)
    if t.shape == r.shape and t.dtype == r.dtype:
        return raw
    skipped.append(f"{path} (shape {r.shape} vs {t.shape})")
    return target_sd


def restore_latest(ckpt_dir: str, target: Any) -> tuple[Any, Optional[int]]:
    """Restore the newest checkpoint into ``target``'s structure.

    Returns (tree, step) — (target, None) when no checkpoint exists, matching
    the reference's start-fresh-if-absent behavior.

    Restoration is SHAPE-LENIENT: leaves whose shape/dtype disagree with the
    target keep the target's freshly-initialized value (reported on stderr).
    This is what makes ``--ckpt-skip-replay`` checkpoints (zero-length
    replay arrays) restore into a fresh full-size buffer, and lets a
    checkpoint taken at one env count resume at another (params restore;
    env/obs/noise state re-initializes).
    """
    step = latest_step(ckpt_dir)
    # A multi-process run's rank-0 shard files compete on step number:
    # replicated leaves (params, opt state, counters) are complete in every
    # rank's file, so a single-process job (--eval-only, a fresh fine-tune)
    # restores the policy from them; the rank-local env/replay shards
    # mismatch the single-process shapes and re-initialize via the lenient
    # merge.  The NEWEST step wins regardless of flavor — an old global
    # file must not shadow a later multi-process run's checkpoints.
    ranks = sorted(
        (int(m.group(1)), m.group(0))
        for name in os.listdir(ckpt_dir)
        if (m := _CKPT_RANK_RE.match(name)) and int(m.group(2)) == 0
    ) if os.path.isdir(ckpt_dir) else []
    if step is None and not ranks:
        return target, None
    if ranks and (step is None or ranks[-1][0] > step):
        step, name = ranks[-1]
        path = os.path.join(ckpt_dir, name)
    else:
        path = os.path.join(ckpt_dir, f"ckpt_{step}.msgpack")
    with open(path, "rb") as f:
        data = f.read()
    # ALWAYS merge through state dicts rather than flax from_bytes: from_bytes
    # silently adopts stored arrays of the wrong shape (e.g. the zero-length
    # replay of a --ckpt-skip-replay file), which would crash the next
    # dynamic_update_slice deep inside the fused loop.
    raw = serialization.msgpack_restore(data)
    skipped: list = []
    merged = _merge_state_dict(serialization.to_state_dict(target), raw, skipped)
    if skipped:
        print(
            f"checkpoint {path}: partial restore, kept fresh values for "
            f"{len(skipped)} leaves (first: {skipped[:3]})",
            file=sys.stderr,
        )
    return serialization.from_state_dict(target, merged), step


def latest_sharded_step(ckpt_dir: str, num_processes: int) -> Optional[int]:
    """Newest step whose rank-shard set is COMPLETE (all n rank files).

    An incomplete set (a rank died mid-save, or the job was killed between
    rank writes) is skipped — resuming from it would silently reset the
    missing rank's env/replay shard while the others continue."""
    if not os.path.isdir(ckpt_dir):
        return None
    ranks_by_step: dict[int, set] = {}
    for name in os.listdir(ckpt_dir):
        if m := _CKPT_RANK_RE.match(name):
            if int(m.group(3)) == num_processes:
                ranks_by_step.setdefault(int(m.group(1)), set()).add(
                    int(m.group(2)))
    complete = [s for s, r in ranks_by_step.items()
                if r >= set(range(num_processes))]
    return max(complete) if complete else None


def _slice_global_to_local(local_tsd: Any, raw: Any, pid: int, n: int):
    """Adapt a GLOBAL (single-process) checkpoint's state dict to one rank's
    local template: a raw leaf whose leading dim is exactly n× the local
    leaf's (trailing dims equal) is an env/replay-sharded field — slice this
    rank's contiguous rows (device order is process-major, mesh.py).  Leaves
    that already match (replicated params, scalars) pass through; anything
    else is left for the lenient merge to keep fresh."""
    if isinstance(local_tsd, dict):
        if not isinstance(raw, dict):
            return raw
        return {k: (_slice_global_to_local(local_tsd[k], v, pid, n)
                    if k in local_tsd else v)
                for k, v in raw.items()}
    t, r = np.asarray(local_tsd), np.asarray(raw)
    if (t.ndim >= 1 and r.ndim == t.ndim and r.shape[1:] == t.shape[1:]
            and t.shape[0] > 0 and r.shape[0] == t.shape[0] * n):
        chunk = t.shape[0]
        return r[pid * chunk:(pid + 1) * chunk]
    return raw


def restore_latest_sharded(ckpt_dir: str, target: Any) -> tuple[Any, Optional[int]]:
    """Multi-process resume: restore this rank's shard file into ``target``.

    ``target`` is the SHARDED global state (i.e. AFTER ``shard_state`` placed
    it on the job mesh) — sharded leaves reassemble into global arrays via
    ``jax.make_array_from_process_local_data`` from each rank's local chunk;
    replicated leaves re-place with ``device_put``.  The same shape-lenient
    state-dict merge as :func:`restore_latest` applies per-rank, so
    ``--ckpt-skip-replay`` files restore into fresh full-size replay shards.

    Every rank must call this.  The chosen step is allgathered and asserted
    IDENTICAL across ranks before anything loads — with per-host ckpt dirs a
    lagging sync could otherwise hand rank 0 step 4 and rank 1 step 2, and
    the "replicated" params would silently diverge.

    A PLAIN single-process checkpoint in the same dir participates too: if
    it is newer than the newest complete rank set (or no rank set exists),
    every rank reads the global file; sharded leaves whose global leading
    dim is exactly n× the local shard slice this rank's rows out, the rest
    merge leniently.  That upgrades the documented single-process →
    multi-process flow from a silent fresh start to a real resume.
    """
    pid, n = jax.process_index(), jax.process_count()
    step = latest_sharded_step(ckpt_dir, n)
    global_step = latest_step(ckpt_dir)
    use_global = global_step is not None and (step is None
                                              or global_step > step)
    step = global_step if use_global else step
    # Cross-rank agreement: every rank must see the same newest step.
    try:
        from jax.experimental import multihost_utils

        steps = multihost_utils.process_allgather(
            np.int32(-1 if step is None else step))
        if len(set(int(s) for s in steps)) > 1:
            raise SystemExit(
                f"checkpoint resume aborted: ranks disagree on the newest "
                f"restorable step ({[int(s) for s in steps]}) — ckpt dirs "
                "out of sync across hosts; sync them and relaunch"
            )
    except ImportError:  # pragma: no cover - very old jax
        pass
    if step is None:
        return target, None
    path = os.path.join(
        ckpt_dir,
        f"ckpt_{step}.msgpack" if use_global
        else f"ckpt_{step}.rank{pid}of{n}.msgpack")
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    tsd = serialization.to_state_dict(target)
    local = jax.tree.map(_process_local_data, tsd)
    if use_global:
        raw = _slice_global_to_local(local, raw, pid, n)
    skipped: list = []
    merged = _merge_state_dict(local, raw, skipped)
    if skipped:
        print(
            f"checkpoint {path}: partial restore, kept fresh values for "
            f"{len(skipped)} leaves (first: {skipped[:3]})",
            file=sys.stderr,
        )
    t_leaves, tdef = jax.tree.flatten(tsd)
    m_leaves, mdef = jax.tree.flatten(merged)
    assert str(tdef) == str(mdef), "merge changed the state structure"

    def place(t, m):
        if isinstance(t, jax.Array) and not t.is_fully_addressable:
            m = np.asarray(m)
            if m.shape == t.shape:  # replicated: full array on every rank
                return jax.device_put(m, t.sharding)
            return jax.make_array_from_process_local_data(t.sharding, m)
        return m

    merged_global = jax.tree.unflatten(
        mdef, [place(t, m) for t, m in zip(t_leaves, m_leaves)])
    return serialization.from_state_dict(target, merged_global), step
