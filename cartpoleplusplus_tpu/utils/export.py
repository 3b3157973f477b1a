"""Serving-grade policy export: serialized StableHLO via ``jax.export``.

The reference has no deployment story at all — a trained policy exists only
as a TF-1.x checkpoint readable by the same Python class that wrote it
(util.py:~L90-130 Saver wrapper; SURVEY.md §5 checkpoint/resume).  A
TPU-native framework intended for production serving needs the opposite: a
**self-contained, process-independent artifact** a server can load without
the agent's Python code, flax module definitions, or even this package.

``jax.export`` gives exactly that: the greedy policy (trained weights baked
in as constants) is traced once, lowered to StableHLO, and serialized with

- a **symbolic batch dimension** — the server picks any batch size at call
  time without re-export (XLA specializes per concrete size, cached), and
- **multi-platform lowering** (cpu + tpu by default) — one artifact runs on
  a dev box and on the serving fleet.

The observation ABI matches training end-to-end conventions: raw **uint8**
frames for pixel policies (the trunk's decode epilogue normalizes on-chip;
models/trunks.py), float32 for low-dim.  Loading needs only jax:

    from cartpoleplusplus_tpu.utils import export as pe
    policy = pe.load_policy("actor.stablehlo")
    actions = policy(obs_batch)          # any batch size

Every agent CLI writes one with ``--export-policy PATH`` (after training,
or from a checkpoint via ``--eval-only``); this module's own CLI inspects
and smoke-runs artifacts:

    python -m cartpoleplusplus_tpu.utils.export --load actor.stablehlo --batch 64
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

# Artifacts run wherever these platforms' XLA backends exist; order is
# cosmetic.  (jax.export refuses to CALL an artifact on a platform it was
# not lowered for, so default to both rather than the build machine's.)
DEFAULT_PLATFORMS = ("cpu", "tpu")


def host_fetch(tree):
    """Fetch a pytree of arrays to host numpy, multi-process-safe.

    ``jax.device_get`` refuses arrays that span non-addressable devices
    (any global array in a multi-process job).  For FULLY-REPLICATED
    shardings — trained params, scalar metrics — every process holds a
    complete copy, so the local shard IS the value.  Sharded-but-
    unreplicated arrays still raise: silently returning one shard would
    truncate data.
    """

    def f(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.sharding.is_fully_replicated:
                return np.asarray(x.addressable_data(0))
            raise ValueError(
                "host_fetch: array spans processes and is not replicated; "
                "gather it explicitly (e.g. checkpoint from single-process)"
            )
        return np.asarray(x) if isinstance(x, jax.Array) else x

    return jax.tree.map(f, tree)


def export_policy(
    act_fn: Callable,
    params,
    obs_shape: Sequence[int],
    obs_dtype=jnp.float32,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
) -> jax_export.Exported:
    """Lower ``act_fn(params, obs)`` to a weights-baked Exported policy.

    ``params`` are fetched to host (:func:`host_fetch` — multi-process-safe
    for replicated trained params) and closed over as numpy constants — the
    artifact is self-contained, and closing a jit over *host* arrays is safe
    everywhere (device-array closure is what the axon tunnel rejects; see
    CLAUDE.md).  ``obs_shape`` excludes the batch dim, which is exported
    symbolically.
    """
    host_params = host_fetch(params)

    def policy(obs):
        return act_fn(host_params, obs)

    (b,) = jax_export.symbolic_shape("b")
    args = jax.ShapeDtypeStruct((b, *obs_shape), obs_dtype)
    return jax_export.export(jax.jit(policy), platforms=tuple(platforms))(args)


def save_policy(
    path: str,
    act_fn: Callable,
    params,
    obs_shape: Sequence[int],
    obs_dtype=jnp.float32,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
) -> int:
    """Export and serialize to ``path``; returns the artifact size in bytes."""
    blob = export_policy(act_fn, params, obs_shape, obs_dtype, platforms).serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_policy(path: str) -> Callable:
    """Deserialize an artifact; returns ``policy(obs_batch) -> actions``."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read()).call


def describe(path: str) -> dict:
    """Artifact metadata (signature, platforms, size) without running it."""
    with open(path, "rb") as f:
        blob = f.read()
    exp = jax_export.deserialize(blob)
    return {
        "bytes": len(blob),
        "platforms": list(exp.platforms),
        "in_avals": [str(a) for a in exp.in_avals],
        "out_avals": [str(a) for a in exp.out_avals],
    }


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Inspect / smoke-run an exported policy artifact"
    )
    parser.add_argument("--load", required=True, help="artifact path")
    parser.add_argument("--batch", type=int, default=8,
                        help="batch size for the smoke run")
    parser.add_argument("--steps", type=int, default=0,
                        help="also time this many repeat calls")
    opts = parser.parse_args(argv)

    meta = describe(opts.load)
    print(f"ARTIFACT {meta}", file=sys.stderr)

    with open(opts.load, "rb") as f:
        exp = jax_export.deserialize(f.read())
    aval = exp.in_avals[0]
    obs = np.zeros((opts.batch, *aval.shape[1:]), dtype=aval.dtype)
    out = exp.call(obs)
    out = jax.device_get(out)
    leaves = jax.tree.leaves(out)
    print(f"CALL ok batch={opts.batch} out_shapes="
          f"{[np.asarray(x).shape for x in leaves]}", file=sys.stderr)
    if opts.steps > 0:
        _ = jax.device_get(exp.call(obs))  # warm the concrete-shape cache
        t0 = time.perf_counter()
        for _ in range(opts.steps):
            out = exp.call(obs)
        jax.tree.map(lambda x: np.asarray(jax.device_get(x)), out)
        dt = time.perf_counter() - t0
        print(f"TIMING {opts.steps} calls x batch {opts.batch}: "
              f"{dt * 1e3 / opts.steps:.3f} ms/call "
              f"({opts.steps * opts.batch / dt:,.0f} actions/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
