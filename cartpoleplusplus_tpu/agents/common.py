"""Shared agent plumbing: CLI flags, eval rollouts, checkpoint cadence.

The reference repeats an argparse + train-loop + periodic-eval + Saver block
at the top of every agent main (SURVEY.md §3.2-3.4); this module is that
block factored once.  Each agent keeps the reference's CLI shape:
``python -m cartpoleplusplus_tpu.agents.<name> --flags…``.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Callable

import jax
import jax.numpy as jnp

from cartpoleplusplus_tpu.env import cartpole as cartpole_mod
from cartpoleplusplus_tpu.env import config as env_config
from cartpoleplusplus_tpu.env.vector import VectorCartpole


def add_agent_opts(parser: argparse.ArgumentParser) -> None:
    """Flags shared by every agent main (reference agent argparse blocks)."""
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num-train-batches", type=int, default=200,
                        help="number of training updates")
    parser.add_argument("--num-envs", type=int, default=64,
                        help="vectorized env replicas (reference: 1)")
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--gamma", type=float, default=0.99,
                        help="discount factor")
    parser.add_argument("--eval-freq", type=int, default=20,
                        help="updates between greedy eval rollouts")
    parser.add_argument("--num-eval", type=int, default=16,
                        help="episodes per eval")
    parser.add_argument("--ckpt-dir", type=str, default=None)
    parser.add_argument("--ckpt-freq", type=int, default=50,
                        help="updates between checkpoints")
    parser.add_argument("--ckpt-skip-replay", action="store_true",
                        help="checkpoint without the replay buffer contents "
                             "(production pixel runs: a full 100k-frame "
                             "uint8 buffer is multi-GB per save). On resume "
                             "the buffer restarts empty and refills within "
                             "capacity/num-envs steps; params, optimizer, "
                             "env and RNG state restore exactly.")
    parser.add_argument("--ckpt-best", action="store_true",
                        help="additionally keep ckpt_best.msgpack — the "
                             "state at the best eval episode length so far "
                             "(+ a .json sidecar with step/eval). Guards "
                             "long runs against late-training regressions; "
                             "--eval-only --ckpt-best restores it instead "
                             "of the latest numbered checkpoint. "
                             "Single-process runs only.")
    parser.add_argument("--event-log-out", type=str, default=None,
                        help="write eval trajectories to this event log")
    parser.add_argument("--eval-only", action="store_true",
                        help="restore the latest --ckpt-dir checkpoint and "
                             "run the greedy eval (plus --event-log-out / "
                             "--export-policy outputs) WITHOUT training — "
                             "the 'watch the trained policy' mode the "
                             "reference only had as GUI replay")
    parser.add_argument("--export-policy", type=str, default=None,
                        help="after training (or under --eval-only), export "
                             "the greedy policy as a self-contained "
                             "serialized-StableHLO serving artifact "
                             "(weights baked in, symbolic batch dim, "
                             "cpu+tpu lowering; utils/export.py)")
    parser.add_argument("--metrics-jsonl", type=str, default=None,
                        help="structured metrics sink")
    parser.add_argument("--tb-dir", type=str, default=None,
                        help="also write numeric metrics as TensorBoard "
                             "scalars to this logdir (SURVEY §5 'optional "
                             "TensorBoard'; requires torch, gracefully "
                             "degrades without it)")
    parser.add_argument("--hidden", type=int, nargs="+", default=[100, 50])
    parser.add_argument("--pixel-encoder", type=str, default="dense",
                        choices=["dense", "conv"],
                        help="pixel trunk: dense MXU embedding (fast) or the "
                             "reference-style conv stack")
    parser.add_argument("--pixel-pool", type=int, default=1,
                        help="k×k average-pool frames before the dense pixel "
                             "embed: k=2 shrinks the 22500-wide contraction "
                             "(the hottest learner+acting op at scale) 4× "
                             "for sub-pixel information loss")
    parser.add_argument("--pallas-physics", action="store_true",
                        help="run training-env physics through the fused "
                             "Mosaic kernel (physics/pallas_step.py); "
                             "requires num-envs (per device) to be a "
                             "multiple of 1024")
    parser.add_argument("--pallas-render", action="store_true",
                        help="render training-env pixels with the Mosaic "
                             "camera kernel (render/pallas_kernel.py); "
                             "requires num-envs (per device) to be a "
                             "multiple of 32.  With both kernels on, the "
                             "fully-fused one-launch step path engages")
    parser.add_argument("--render-raster", action="store_true", default=None,
                        help="render via the projective inverse-depth "
                             "rasterizer instead of the slab cascade "
                             "(110 vs 162 census ops/ray; applies to both "
                             "the XLA and Pallas renderers).  Default: auto "
                             "per config from the round-4 on-chip race "
                             "(render.prefer_raster — raster for exact-"
                             "sampling configs, slab for multi-camera "
                             "sampled ones)")
    parser.add_argument("--no-render-raster", dest="render_raster",
                        action="store_false",
                        help="force the slab cascade")
    # Multi-process (multi-host) runs: one process per host, chips pooled
    # into one job-global mesh (parallel.init_multihost; SURVEY.md §2.3 —
    # gradient pmean rides ICI within a slice, DCN across hosts).
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-process coordinator address host:port "
                             "(process 0's host); requires --num-processes")
    parser.add_argument("--num-processes", type=int, default=1,
                        help="processes in the job (1 = single-host). Each "
                             "process contributes its local devices; "
                             "--num-devices is the JOB-GLOBAL mesh size")
    parser.add_argument("--process-id", type=int, default=0,
                        help="this process's rank in [0, num-processes)")


def make_parser(description: str) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    env_config.add_opts(parser)
    add_agent_opts(parser)
    return parser


def make_venv(
    config, num_envs: int, pallas_render: bool = False,
    pallas_physics: bool = False, fused_step: bool = True,
    render_tile_e: int = 32, render_recip: bool = True,
    render_raster: bool | None = None, render_mxu: bool = False,
    render_hoist: bool = False, render_interpret: bool = False,
) -> VectorCartpole:
    """Vector env with the right observation fn (pixels iff --use-raw-pixels).

    ``pallas_render``: use the hand-tiled Pallas camera kernel
    (render/pallas_kernel.py) instead of the XLA ray caster for the batched
    path.  Requires num_envs to be a multiple of the kernel's env tile.

    ``render_raster=None`` picks the measured per-config winner
    (render.prefer_raster).  Callers that probe the backend first
    (probe_raster_or_downgrade) resolve it on ``opts`` before this call.
    """
    if render_raster is None:
        from cartpoleplusplus_tpu.render import prefer_raster

        render_raster = prefer_raster(
            config.num_cameras, getattr(config, "obs_pool", 1),
            getattr(config, "obs_samples", 0))
    observe_fn = None
    observe_batched_fn = None
    physics_fn = None
    if pallas_physics:
        from cartpoleplusplus_tpu.physics.pallas_step import step_substeps_pallas

        physics_fn = step_substeps_pallas
    if config.use_raw_pixels:
        from cartpoleplusplus_tpu.render import make_observe_pixels

        # uint8 end-to-end: frames leave the renderer replay-ready and every
        # obs hop (carry, replay write, policy read) moves 4× fewer bytes;
        # networks decode in ObsEncoder.  Also removes the train/act
        # distribution mismatch of quantizing only the stored copy.
        observe_fn = make_observe_pixels(config, dtype=jnp.uint8, raster=render_raster)
        if pallas_render:
            from cartpoleplusplus_tpu.render.pallas_kernel import make_render_batched

            observe_batched_fn = make_render_batched(
                config, tile_e=render_tile_e, recip=render_recip,
                raster=render_raster, mxu=render_mxu, hoist=render_hoist,
                interpret=render_interpret,
            )
    sim_fn = None
    if fused_step and pallas_physics and pallas_render and config.use_raw_pixels:
        # Fully-fused step path: ONE physics launch covering every substep
        # of the step (state never leaves VMEM between repeats, pose
        # snapshots per repeat) + ONE render launch shading every repeat's
        # frame straight into the (E, repeats, …) obs slab.
        from cartpoleplusplus_tpu.physics.pallas_step import step_repeats_pallas
        from cartpoleplusplus_tpu.render.pallas_kernel import make_render_repeats

        render_rep = make_render_repeats(
            config, tile_e=render_tile_e, recip=render_recip,
            raster=render_raster, mxu=render_mxu, hoist=render_hoist,
            interpret=render_interpret,
        )

        def sim_fn(scene, rigid, force):
            rigid, poses = step_repeats_pallas(
                scene, rigid, force,
                config.steps_per_repeat, config.action_repeats,
            )
            return rigid, render_rep(scene, poses)

    return VectorCartpole(
        config, num_envs=num_envs, observe_fn=observe_fn,
        observe_batched_fn=observe_batched_fn, physics_fn=physics_fn,
        sim_fn=sim_fn,
    )


def probe_raster_or_downgrade(config, opts) -> None:
    """Validate the raster render kernel's BACKEND compile; downgrade on
    rejection (mutates ``opts.render_raster``).

    The projective raster kernel's Mosaic FRONT-END lowering is CI-pinned
    (tests/test_tpu_lowering.py), but the LLO backend compile only happens on
    real hardware — without this probe a backend rejection would kill a
    training run minutes into its first segment compile with no recourse
    (ADVICE r3: agents had no fallback, only the bench did).  One tiny
    single-frame render (tile_e envs) answers in seconds; the persistent
    compile cache makes later runs free.  Mutating ``opts`` before any
    ``make_venv`` call keeps every downstream consumer (venv, record/eval
    renderers) on the SAME kernel.

    Also resolves the ``--render-raster`` tristate (None = auto) to the
    measured per-config winner (render.prefer_raster), so every later
    ``getattr(opts, "render_raster", False)`` consumer sees one concrete
    decision.
    """
    if getattr(opts, "render_raster", None) is None:
        from cartpoleplusplus_tpu.render import prefer_raster

        opts.render_raster = config.use_raw_pixels and prefer_raster(
            config.num_cameras, getattr(config, "obs_pool", 1),
            getattr(config, "obs_samples", 0))
    if not (getattr(opts, "pallas_render", False)
            and getattr(opts, "render_raster", False)
            and config.use_raw_pixels):
        return
    try:
        from cartpoleplusplus_tpu.physics.bodies import rest_state
        from cartpoleplusplus_tpu.render.pallas_kernel import (
            make_render_batched,
            make_render_repeats,
        )

        tile_e = getattr(opts, "render_tile_e", 32)
        scene = cartpole_mod.scene_for(config)
        rigid = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (tile_e,) + x.shape),
            rest_state(scene),
        )
        render = make_render_batched(config, tile_e=tile_e, raster=True)
        # Fetch a scalar: under remote-execution runtimes block_until_ready
        # returns at enqueue; only a D2H read proves the compile landed.
        int(jnp.asarray(render(scene, rigid)).sum())
        if getattr(opts, "pallas_physics", False):
            # The fused step path (make_venv sim_fn) renders through the
            # DIFFERENT one-launch repeats kernel — bigger VMEM slab, its
            # own backend compile.  Probe it too or the downgrade misses
            # the kernel the training loop actually runs.
            poses = jnp.concatenate(
                [rigid.pos[:, 0], rigid.quat[:, 0],
                 rigid.pos[:, 1], rigid.quat[:, 1],
                 jnp.zeros((tile_e, 2))], axis=-1,
            )[None]  # (1 repeat, tile_e, 16)
            rep = make_render_repeats(config, tile_e=tile_e, raster=True)
            int(jnp.asarray(rep(scene, poses)).sum())
    except Exception as e:
        print(f"[common] raster render kernel rejected by the backend "
              f"({type(e).__name__}: {e}); falling back to the slab kernel",
              file=sys.stderr)
        opts.render_raster = False


def add_per_opts(parser) -> None:
    """Prioritized-replay + n-step flags shared by the off-policy agents
    (replay/buffer.py sample_prioritized / nstep_batch)."""
    parser.add_argument("--per", action="store_true",
                        help="prioritized experience replay (Schaul et "
                             "al.): sample transitions proportional to "
                             "|TD error|^alpha with importance-weighted "
                             "loss.  TPU-native: masked cumsum + "
                             "vectorized searchsorted inside the fused "
                             "segment, no host-side sum tree")
    parser.add_argument("--per-alpha", type=float, default=0.6,
                        help="priority exponent (0 = uniform ablation)")
    parser.add_argument("--per-beta0", type=float, default=0.4,
                        help="initial importance-sampling exponent; "
                             "anneals linearly to 1.0 over the run")
    parser.add_argument("--per-eps", type=float, default=1e-2,
                        help="priority floor added to |TD| so no "
                             "transition starves")
    parser.add_argument("--n-step", type=int, default=1,
                        help="multi-step TD target: accumulate N rewards, "
                             "bootstrap gamma^N from the N-th successor — "
                             "pure stride gathers on the s2-free block "
                             "replay (requires block mode)")


def add_ou_anneal_opts(parser) -> None:
    parser.add_argument("--ou-sigma-min", type=float, default=None,
                        help="anneal OU sigma linearly down to this value "
                             "over --ou-decay-steps vectorized env steps "
                             "(default: no annealing)")
    parser.add_argument("--ou-decay-steps", type=int, default=0,
                        help="vectorized steps over which --ou-sigma anneals "
                             "to --ou-sigma-min (0 = constant sigma)")


def ou_sigma_at(env_steps, sigma: float, sigma_min, decay_steps: int):
    """Annealed OU sigma at vectorized step ``env_steps`` (traced scalar).

    Linear ramp sigma → sigma_min over ``decay_steps``; identity when
    annealing is off so the constant-sigma fast path stays fusion-friendly.
    """
    if not decay_steps or sigma_min is None or sigma_min == sigma:
        return sigma
    import jax.numpy as jnp

    frac = jnp.clip(env_steps.astype(jnp.float32) / decay_steps, 0.0, 1.0)
    return sigma + (sigma_min - sigma) * frac


def add_lr_schedule_opt(parser) -> None:
    parser.add_argument("--lr-schedule", type=str, default="const",
                        choices=["const", "cosine"],
                        help="cosine: decay the learning rate to ~0 over the "
                             "run — freezes late training and stops the "
                             "policy-churn oscillation seen in long NAF/DDPG "
                             "runs (eval peaks then degrades)")


def make_lr(opts, lr: float):
    """Learning-rate (or schedule) for optax.adam per --lr-schedule."""
    import optax

    if getattr(opts, "lr_schedule", "const") == "cosine":
        total_updates = opts.num_train_batches * opts.steps_per_segment
        return optax.cosine_decay_schedule(lr, max(total_updates, 1), alpha=0.02)
    return lr


def replay_block(opts, num_envs: int) -> int:
    """Insertion-block size for the s2-free replay fast path.

    The fused loops write exactly one all-envs batch per step, so the replay
    buffer can store s1 only and derive s2 from the next block
    (replay/buffer.py module docstring) — halving replay HBM and write
    traffic.  One block = one vectorized step's transitions per device
    shard.  Falls back to explicit-s2 storage (0) when a shard's capacity
    can't hold at least two blocks.
    """
    devices = max(getattr(opts, "num_devices", 1), 1)
    local_envs = num_envs // devices
    local_cap = opts.replay_capacity // devices
    return local_envs if 0 < local_envs < local_cap else 0


def replay_min_fill(
    warmup_steps: int, num_envs: int, capacity: int, n_step: int = 1
) -> int:
    """Transitions the replay must hold before the train gate may open.

    The agents gate each update on BOTH the step counter and this fill
    level, so a --ckpt-skip-replay resume (env_steps large, buffer empty)
    re-warms for the fresh-run warmup duration instead of training on
    unwritten rows.  (warmup_steps + 1)·num_envs matches a fresh run's
    first train step exactly — env_steps > warmup first holds at
    warmup_steps + 1 steps — and keeps the resumed gate from opening one
    vector-step early, where s2-free sampling's clamped index 0 would pair
    a real s1 with an unwritten zero successor.  Capped at one block below
    capacity so small buffers can still train (the newest block is always
    excluded from sampling).

    The ``(n_step + 1)·num_envs`` floor guards the degenerate corner the
    cap alone can't: sampling excludes the newest ``n_step`` blocks (their
    successor windows are unwritten), so until one block BEYOND them is
    written the clamped valid-window is a single row whose n-step
    successor is unwritten zeros — or, at ``capacity == n_step·block``,
    wraps onto the row itself.  (Agents additionally reject capacities
    below ``(n_step + 1)`` blocks outright.)
    """
    fresh = min((warmup_steps + 1) * num_envs, capacity - num_envs)
    floor = min((n_step + 1) * num_envs, capacity)
    return max(fresh, floor)


def eval_rollout(
    venv: VectorCartpole,
    act_fn: Callable,  # (params, obs[E, ...]) -> greedy action[E, ...]
    params,
    rng: jax.Array,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy eval: one episode per env slot → (mean episode len, mean reward).

    Rebuild of each reference agent's ``run_eval`` (exploration off,
    e.g. ddpg_cartpole.py:~L180-200) but batched: ``num_envs`` episodes run in
    parallel inside one ``lax.scan``.  Pure — callers jit it (closed over
    venv/act_fn).
    """
    states, obs = venv.reset(rng)

    def body(carry, _):
        states, obs, ep_len, ep_rew, alive = carry
        action = act_fn(params, obs)
        states, obs, reward, done = cartpole_mod.step_batched(
            venv.config, venv.scene, states, action, venv.observe_fn,
            venv.observe_batched_fn, venv.physics_fn, venv.sim_fn,
        )
        ep_len = ep_len + alive.astype(jnp.int32)
        ep_rew = ep_rew + reward * alive
        alive = alive & ~done
        return (states, obs, ep_len, ep_rew, alive), None

    zeros_i = jnp.zeros((venv.num_envs,), jnp.int32)
    zeros_f = jnp.zeros((venv.num_envs,), jnp.float32)
    alive = jnp.ones((venv.num_envs,), bool)
    (_, _, ep_len, ep_rew, _), _ = jax.lax.scan(
        body,
        (states, obs, zeros_i, zeros_f, alive),
        None,
        length=venv.config.max_episode_len,
    )
    return jnp.mean(ep_len.astype(jnp.float32)), jnp.mean(ep_rew)


def maybe_init_multihost(opts, supported: bool = True) -> None:
    """CLI entry for multi-process (multi-host) jobs — call from ``main()``
    BEFORE ``train()``, i.e. before any jax backend use.

    Wires ``parallel.init_multihost`` (jax.distributed) from the shared
    ``--coordinator/--num-processes/--process-id`` flags and enforces the
    multi-process contract:

    - ``--num-devices`` must be the job-global mesh size (>1);
    - ``--ckpt-dir`` works rank-sharded: EVERY rank keeps the flag and
      writes ``ckpt_<step>.rank<k>of<n>.msgpack`` with its local env/replay
      shard (+ its identical copy of the replicated params) — see
      utils.checkpoint.save/restore_latest_sharded.  The directory must be
      reachable by all ranks at resume (shared fs, or per-host dirs synced
      before relaunch);
    - ranks > 0 clear their other output flags — metrics/event-log/export
      artifacts have exactly one writer, process 0.

    ``supported=False`` (agents whose train loop has not been validated
    multi-process) turns the flags into a clear error instead of a silent
    single-process run.
    """
    n = getattr(opts, "num_processes", 1) or 1
    if n <= 1:
        return
    if not supported:
        raise SystemExit(
            "--num-processes > 1 is not wired for this entry point; "
            "it scales single-process with --num-devices"
        )
    if not getattr(opts, "coordinator", None):
        raise SystemExit("--num-processes > 1 needs --coordinator host:port")
    if getattr(opts, "num_devices", 1) <= 1:
        raise SystemExit(
            "--num-processes > 1 needs --num-devices set to the job-global "
            "device count (the mesh spans every process's chips)"
        )
    if getattr(opts, "eval_only", False):
        raise SystemExit(
            "--eval-only needs no mesh: run it single-process (params "
            "restore from either checkpoint flavor's rank-0/global file)"
        )
    from cartpoleplusplus_tpu.parallel import init_multihost

    init_multihost(
        coordinator_address=opts.coordinator,
        num_processes=n,
        process_id=getattr(opts, "process_id", 0),
    )
    if getattr(opts, "process_id", 0) != 0:
        opts.metrics_jsonl = None
        opts.tb_dir = None
        opts.event_log_out = None
        opts.export_policy = None


def host_fetch(tree):
    """Multi-process-safe host fetch (see utils.export.host_fetch)."""
    from cartpoleplusplus_tpu.utils.export import host_fetch as _hf

    return _hf(tree)


def maybe_export_policy(opts, config, act_fn, params, logger) -> None:
    """Honor ``--export-policy``: write the serving artifact (utils/export.py).

    The observation ABI mirrors the training pipeline: uint8 frames for
    pixel policies (the trunk normalizes on-chip), float32 for low-dim.
    """
    path = getattr(opts, "export_policy", None)
    if not path:
        return
    from cartpoleplusplus_tpu.utils import export as export_mod

    obs_dtype = jnp.uint8 if config.use_raw_pixels else jnp.float32
    nbytes = export_mod.save_policy(path, act_fn, params,
                                    config.obs_shape, obs_dtype)
    logger.log("export_policy", path=path, bytes=nbytes)


class BestCkptKeeper:
    """--ckpt-best policy: persist the state at the best eval seen so far.

    Constructed once per train(); ``update`` is called after every eval and
    writes ``ckpt_best.msgpack`` only on improvement.  On resume
    ``checkpoint.best_meta`` (embedded-in-msgpack meta, sidecar fallback)
    seeds the gate so a restart cannot clobber a better historical best
    with an early worse one.  Off (no-op) unless --ckpt-dir AND
    --ckpt-best, and always off multi-process (rank-sharded best files
    would need their own completeness story)."""

    def __init__(self, opts, multiproc: bool):
        self.on = bool(getattr(opts, "ckpt_dir", None)
                       and getattr(opts, "ckpt_best", False) and not multiproc)
        self.best = float("-inf")
        self._opts = opts
        if self.on:
            from cartpoleplusplus_tpu.utils import checkpoint as ckpt_mod

            meta = ckpt_mod.best_meta(opts.ckpt_dir)
            if meta is not None:
                self.best = float(meta["eval_ep_len"])

    def update(self, step: int, eval_len: float, st) -> None:
        if self.on and eval_len > self.best:
            self.best = eval_len
            from cartpoleplusplus_tpu.utils import checkpoint as ckpt_mod

            ckpt_mod.save_best(
                self._opts.ckpt_dir, step, eval_len, st,
                skip_replay=getattr(self._opts, "ckpt_skip_replay", False),
            )


def restore_for_startup(opts, st):
    """The shared restore-if-present startup policy: restore_best when the
    run is --eval-only --ckpt-best, restore_latest otherwise.  Multi-process
    callers do NOT use this (they restore after mesh placement; every agent
    gates the call on ``not multiproc``)."""
    from cartpoleplusplus_tpu.utils import checkpoint as ckpt_mod

    if getattr(opts, "eval_only", False) and getattr(opts, "ckpt_best", False):
        return ckpt_mod.restore_best(opts.ckpt_dir, st)
    return ckpt_mod.restore_latest(opts.ckpt_dir, st)


def run_eval_only(opts, config, logger, restored_step, eval_venv,
                  act_fn, params) -> float:
    """The ``--eval-only`` path shared by every agent: greedy eval from a
    restored checkpoint, plus the optional event-log and serving-artifact
    outputs — no training segment is ever built or compiled.

    ``restored_step`` is ``restore_latest``'s step (None = nothing restored,
    which is a hard error here: silently evaluating fresh random weights
    would look like a catastrophically regressed policy).
    """
    if restored_step is None:
        raise SystemExit(
            "--eval-only needs --ckpt-dir pointing at a restorable checkpoint"
        )
    eval_fn = jax.jit(lambda p, k: eval_rollout(eval_venv, act_fn, p, k))
    elen, erew = eval_fn(params, jax.random.PRNGKey(opts.seed + 1))
    logger.log("eval_only", segment=restored_step,
               eval_ep_len=float(elen), eval_ep_rew=float(erew))
    if opts.event_log_out:
        lens = record_eval_episodes(
            config, act_fn, params, opts.event_log_out, seed=opts.seed,
            raster=bool(getattr(opts, "render_raster", False)),
        )
        logger.log("event_log", episodes=len(lens), lengths=lens)
    maybe_export_policy(opts, config, act_fn, params, logger)
    logger.close()
    return float(elen)


def record_eval_episodes(
    config,
    act_fn: Callable,
    params,
    path: str,
    num_episodes: int = 3,
    seed: int = 0,
    raster: bool = False,
) -> list[int]:
    """Record greedy-policy eval episodes to an event log (host loop).

    The reference's README evidence is GIFs of trained policies (SURVEY.md
    §6); its trajectory tooling is the event log (event_log.py:~L40-90).
    This joins them for every agent: after training, roll ``num_episodes``
    greedy episodes through the single-env AoS step and write pose/action/
    reward events (+ velocities, so the fidelity harness can re-simulate).
    GIFs then come from the standard CLI:
    ``python -m cartpoleplusplus_tpu.utils.event_log --log-file X --gif-out d``.

    ``act_fn(params, obs) → action``: greedy policy over a BATCHED
    observation (the helper adds/strips the batch dim).  ``params`` are the
    trained weights, passed through as a jit *argument* — never close the
    jit over device-resident params (the axon tunnel rejects the D2H copy
    that embedding them as compile-time constants requires).
    ``raster`` mirrors the training-time ``--render-raster`` backend so
    pixel policies are recorded on the frames they were trained on.
    Returns the episode lengths.
    """
    from cartpoleplusplus_tpu.utils import event_log as event_log_mod

    params = host_fetch(params)  # multi-process: replicated params → host
    scene = cartpole_mod.scene_for(config)
    observe_fn = None
    if config.use_raw_pixels:
        # Pixel policies act on rendered uint8 frames — mirror the training
        # observation pipeline (make_venv wires the same renderer/dtype).
        from cartpoleplusplus_tpu.render import make_observe_pixels

        observe_fn = make_observe_pixels(config, dtype=jnp.uint8, raster=raster)
    reset_fn = jax.jit(lambda k: cartpole_mod.reset(config, scene, k, observe_fn))
    step_fn = jax.jit(lambda s, a: cartpole_mod.step(config, scene, s, a, observe_fn))
    act1 = jax.jit(lambda p, o: act_fn(p, o[None])[0])

    # The host episode loop + event assembly live in random_agent.run_episode
    # (one owner for the pose/velocity event convention the fidelity
    # resimulator depends on); here we only swap its random draws for the
    # trained greedy policy.
    from cartpoleplusplus_tpu.agents.random_agent import run_episode

    log = event_log_mod.EventLog(path)
    rng = jax.random.PRNGKey(seed)
    lengths = []
    for _ in range(num_episodes):
        rng, steps, _, events = run_episode(
            config, scene, step_fn, reset_fn, rng, collect=True,
            policy=lambda o: act1(params, o),
        )
        log.add_episode(events)
        lengths.append(steps)
    log.close()
    return lengths
