"""Checkpoint / resume behavior (reference util.py Saver wrapper parity).

The reference saves every N episodes into --ckpt-dir and restores-if-present
at startup (SURVEY.md §5).  These tests pin the same behavior: round-trip of
arbitrary pytrees, latest-step selection, and a full agent-level
train → restart → resume cycle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cartpoleplusplus_tpu.utils import checkpoint as ckpt


def test_save_restore_roundtrip(tmp_path):
    tree = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)},
        "step": jnp.int32(7),
        "rng": jax.random.PRNGKey(3),
    }
    ckpt.save(str(tmp_path), 10, tree)
    target = jax.tree.map(jnp.zeros_like, tree)
    restored, step = ckpt.restore_latest(str(tmp_path), target)
    assert step == 10
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_latest_picks_newest(tmp_path):
    for step in (5, 20, 10):
        ckpt.save(str(tmp_path), step, {"v": jnp.float32(step)})
    restored, step = ckpt.restore_latest(str(tmp_path), {"v": jnp.float32(0)})
    assert step == 20
    assert float(restored["v"]) == 20.0


def test_restore_missing_dir_returns_target(tmp_path):
    target = {"v": jnp.float32(1.5)}
    restored, step = ckpt.restore_latest(str(tmp_path / "nope"), target)
    assert step is None
    assert restored is target


def _ddpg_opts(tmp_path, num_train_batches):
    from cartpoleplusplus_tpu.agents import ddpg

    argv = [
        "--num-train-batches", str(num_train_batches),
        "--num-envs", "4", "--num-eval", "4",
        "--action-repeats", "2", "--steps-per-repeat", "2",
        "--max-episode-len", "10", "--steps-per-segment", "3",
        "--batch-size", "8", "--replay-capacity", "64", "--warmup-steps", "1",
        "--eval-freq", "1", "--ckpt-dir", str(tmp_path), "--ckpt-freq", "1",
    ]
    parser = __import__(
        "cartpoleplusplus_tpu.agents.common", fromlist=["make_parser"]
    ).make_parser("t")
    ddpg.add_ddpg_opts(parser)
    return parser.parse_args(argv)


def test_agent_level_resume(tmp_path):
    """DDPG trains, checkpoints, restarts from the checkpoint and continues.

    Resume carries the SEGMENT counter (ADVICE round 1): run 2 with a higher
    --num-train-batches picks up at run 1's last segment and numbers new
    checkpoints monotonically after it — never re-saving ckpt_1..N with newer
    weights under older filenames.
    """
    from cartpoleplusplus_tpu.agents import ddpg

    ddpg.train(_ddpg_opts(tmp_path, 2))
    step = ckpt.latest_step(str(tmp_path))
    assert step == 2
    raw1 = ckpt.load_raw(str(tmp_path), 2)
    steps_run1 = int(raw1["env_steps"])
    assert steps_run1 == 2 * 3  # 2 segments × 3 steps

    # Second run restores-if-present and continues from segment 2 → runs 2
    # more segments, saved as ckpt_3 and ckpt_4 (monotonic numbering).
    ddpg.train(_ddpg_opts(tmp_path, 4))
    assert ckpt.latest_step(str(tmp_path)) == 4
    raw2 = ckpt.load_raw(str(tmp_path), 4)
    assert int(raw2["env_steps"]) == steps_run1 + 2 * 3

    # A re-run that is already complete (num-train-batches == restored
    # segment) trains zero additional segments and must NOT clobber newer
    # checkpoints with stale lower-numbered ones.
    ddpg.train(_ddpg_opts(tmp_path, 4))
    assert ckpt.latest_step(str(tmp_path)) == 4
    raw3 = ckpt.load_raw(str(tmp_path), 4)
    assert int(raw3["env_steps"]) == steps_run1 + 2 * 3


def test_skip_replay_checkpoint(tmp_path):
    """--ckpt-skip-replay drops the buffer from the file; resume restores
    params/opt/env/rng exactly and restarts with a fresh empty buffer
    (VERDICT r2 weak #6: a production pixel checkpoint must not serialize a
    multi-GB replay on the step path)."""
    from cartpoleplusplus_tpu.agents import ddpg

    full = _ddpg_opts(tmp_path / "full", 2)
    ddpg.train(full)
    lean = _ddpg_opts(tmp_path / "lean", 2)
    lean.ckpt_skip_replay = True
    ddpg.train(lean)

    import os

    full_size = os.path.getsize(tmp_path / "full" / "ckpt_2.msgpack")
    lean_size = os.path.getsize(tmp_path / "lean" / "ckpt_2.msgpack")
    assert lean_size < full_size  # buffer truly absent
    raw = ckpt.load_raw(str(tmp_path / "lean"), 2)
    assert raw["replay"]["s1"].shape == (0,)
    assert int(raw["replay"]["size"]) == 0

    # Resume from the lean checkpoint: params restore bit-exact, replay
    # comes back fresh and full-size, and training continues.
    lean2 = _ddpg_opts(tmp_path / "lean", 4)
    lean2.ckpt_skip_replay = True
    final = ddpg.train(lean2)
    assert ckpt.latest_step(str(tmp_path / "lean")) == 4
    assert np.isfinite(final)


def test_sharded_save_restores_onto_fresh_mesh(tmp_path):
    """A checkpoint taken from a 4-device sharded run restores onto a fresh
    mesh (and would equally restore single-device): ckpt.save device_gets
    the global host state, so the file is placement-free."""
    import optax

    from cartpoleplusplus_tpu.agents import common, ddpg as ddpg_mod
    from cartpoleplusplus_tpu.env.config import CartpoleConfig
    from cartpoleplusplus_tpu.models import Actor, Critic
    from cartpoleplusplus_tpu.parallel import make_mesh
    from cartpoleplusplus_tpu.parallel.distributed import (
        global_ddpg_state,
        make_distributed_segment,
    )

    config = CartpoleConfig(
        discrete_actions=False, action_repeats=2, steps_per_repeat=2,
        initial_force_steps=2, max_episode_len=10,
    )
    actor, critic = Actor(action_dim=2, hidden=(8, 8)), Critic(hidden=(8, 8))
    atx, ctx = optax.adam(1e-3), optax.adam(1e-3)
    n_dev, envs, cap = 4, 8, 64
    mesh = make_mesh(n_dev)
    local_venv = common.make_venv(config, envs // n_dev)
    build, shard_state = make_distributed_segment(
        mesh, local_venv, actor, critic, atx, ctx,
        batch_size=4, warmup_steps=1, steps_per_segment=3,
    )
    st = global_ddpg_state(config, envs, cap, actor, critic, atx, ctx,
                           seed=5, num_devices=n_dev)
    st = shard_state(st)
    segment = build(st)
    st, _ = segment(st)
    ckpt.save(str(tmp_path), 1, st)  # device_get gathers the mesh shards

    # Fresh process-equivalent: new host state, restore, place on a NEW mesh.
    st2 = global_ddpg_state(config, envs, cap, actor, critic, atx, ctx,
                            seed=99, num_devices=n_dev)
    st2, step = ckpt.restore_latest(str(tmp_path), st2)
    assert step == 1
    for a, b in zip(jax.tree.leaves(st2), jax.tree.leaves(st)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(jax.device_get(b)))
    st2 = shard_state(st2)
    st2, metrics = segment(st2)
    assert np.isfinite(float(np.asarray(metrics["reward"])))


def test_skip_replay_resume_rewarms_before_training(tmp_path):
    """After a --ckpt-skip-replay resume the buffer is empty even though
    env_steps restored large; the train gate must wait for the buffer to
    actually re-fill (min_fill transitions) instead of taking gradient
    steps on unwritten zero rows (review finding, round 3)."""
    from cartpoleplusplus_tpu.agents import ddpg

    opts = _ddpg_opts(tmp_path, 2)
    opts.ckpt_skip_replay = True
    opts.warmup_steps = 5  # min_fill = 5 steps x 4 envs = 20 transitions
    ddpg.train(opts)
    before = ckpt.load_raw(str(tmp_path), 2)

    # One resumed segment = 3 steps x 4 envs = 12 < 20 transitions: the
    # buffer is not warm yet, so params must come through bit-identical.
    opts3 = _ddpg_opts(tmp_path, 3)
    opts3.ckpt_skip_replay = True
    opts3.warmup_steps = 5
    ddpg.train(opts3)
    after = ckpt.load_raw(str(tmp_path), 3)
    a0 = jax.tree.leaves(before["actor_params"])
    a1 = jax.tree.leaves(after["actor_params"])
    for x, y in zip(a0, a1):
        np.testing.assert_array_equal(x, y)

    # Two more segments push the refill past min_fill: training resumes.
    opts5 = _ddpg_opts(tmp_path, 5)
    opts5.ckpt_skip_replay = True
    opts5.warmup_steps = 5
    ddpg.train(opts5)
    final = ckpt.load_raw(str(tmp_path), 5)
    f = jax.tree.leaves(final["actor_params"])
    assert any(
        not np.array_equal(x, y) for x, y in zip(a0, f)
    ), "training never resumed after the buffer re-warmed"


def test_replay_subtree_restores_as_unit(tmp_path):
    """If replay data arrays can't restore (capacity trim between versions,
    changed env count, or a skip-replay file), the cursor/size scalars must
    reset WITH them — a stale nonzero size over a fresh zero buffer would
    open the replay-warm train gate against unwritten rows."""
    from cartpoleplusplus_tpu.replay.buffer import add_batch, create

    old = create(capacity=96, obs_shape=(3,), action_shape=(), block=8)
    for t in range(12):  # fill completely: size=96, cursor wraps to 0... use 11
        old = add_batch(old, jnp.full((8, 3), float(t)), jnp.zeros(8),
                        jnp.zeros(8), None, jnp.zeros(8, bool))
    assert int(old.size) == 96
    ckpt.save(str(tmp_path), 1, {"replay": old, "env_steps": jnp.int32(500)})

    # New-version target: different capacity (e.g. trimmed differently).
    fresh = create(capacity=80, obs_shape=(3,), action_shape=(), block=8)
    restored, step = ckpt.restore_latest(
        str(tmp_path), {"replay": fresh, "env_steps": jnp.int32(0)}
    )
    assert step == 1
    assert int(restored["env_steps"]) == 500  # unrelated leaves restore
    assert int(restored["replay"].size) == 0  # reset with the dropped data
    assert int(restored["replay"].cursor) == 0

    # Same-shape replay still restores fully (cursor/size come through).
    same = create(capacity=96, obs_shape=(3,), action_shape=(), block=8)
    restored2, _ = ckpt.restore_latest(
        str(tmp_path), {"replay": same, "env_steps": jnp.int32(0)}
    )
    assert int(restored2["replay"].size) == 96
    np.testing.assert_array_equal(
        np.asarray(restored2["replay"].s1), np.asarray(old.s1)
    )


def test_sac_agent_resume(tmp_path):
    """SAC checkpoints carry the extra temperature state (log_alpha +
    alpha_opt) and resume exactly like the other agents: monotonic segment
    numbering, env_steps continuity."""
    from cartpoleplusplus_tpu.agents import common as C
    from cartpoleplusplus_tpu.agents import sac

    def opts(n):
        parser = C.make_parser("t")
        sac.add_sac_opts(parser)
        return parser.parse_args([
            "--num-envs", "4", "--num-eval", "4", "--eval-freq", "100",
            "--action-repeats", "2", "--steps-per-repeat", "2",
            "--max-episode-len", "10", "--steps-per-segment", "3",
            "--batch-size", "4", "--replay-capacity", "64",
            "--warmup-steps", "1", "--seed", "0",
            "--ckpt-dir", str(tmp_path), "--ckpt-freq", "1",
            "--num-train-batches", str(n),
        ])

    sac.train(opts(2))
    assert ckpt.latest_step(str(tmp_path)) == 2
    raw1 = ckpt.load_raw(str(tmp_path), 2)
    assert "log_alpha" in raw1 and "alpha_opt" in raw1
    steps_run1 = int(raw1["env_steps"])
    assert steps_run1 == 2 * 3

    sac.train(opts(4))
    assert ckpt.latest_step(str(tmp_path)) == 4
    raw2 = ckpt.load_raw(str(tmp_path), 4)
    assert int(raw2["env_steps"]) == steps_run1 + 2 * 3


def test_restore_latest_falls_back_to_rank0_shard(tmp_path):
    """A single-process run (--eval-only, a fine-tune) restores replicated
    leaves from a multi-process run's rank-0 shard file; rank-local shard
    leaves whose shapes mismatch re-initialize via the lenient merge."""
    from flax import serialization

    params = {"w": np.arange(6.0, dtype=np.float32).reshape(2, 3)}
    # Rank files hold LOCAL env shards (here 4 of a global 8).
    rank0 = {"params": params, "obs": np.ones((4, 7), np.float32)}
    for step, pid in ((2, 0), (2, 1), (5, 0)):  # step 5: rank 1 missing
        with open(tmp_path / f"ckpt_{step}.rank{pid}of2.msgpack", "wb") as f:
            f.write(serialization.msgpack_serialize(
                jax.tree.map(np.asarray, rank0)))

    target = {"params": {"w": jnp.zeros((2, 3))}, "obs": jnp.zeros((8, 7))}
    restored, step = ckpt.restore_latest(str(tmp_path), target)
    # Newest rank-0 file wins even without a complete rank set (params are
    # complete in every rank's file; that's all single-process needs).
    assert step == 5
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), params["w"])
    # The (4,7) local shard mismatches the (8,7) fresh target -> kept fresh.
    np.testing.assert_array_equal(np.asarray(restored["obs"]), np.zeros((8, 7)))

    # The NEWEST step wins across flavors: an older global file must not
    # shadow the rank files (and a newer one must).
    ckpt.save(str(tmp_path), 1, target)
    _, step2 = ckpt.restore_latest(str(tmp_path), target)
    assert step2 == 5
    ckpt.save(str(tmp_path), 9, target)
    _, step3 = ckpt.restore_latest(str(tmp_path), target)
    assert step3 == 9


def test_latest_sharded_step_requires_complete_rank_set(tmp_path):
    from flax import serialization

    blob = serialization.msgpack_serialize({"x": np.zeros(2, np.float32)})
    for name in ("ckpt_2.rank0of2.msgpack", "ckpt_2.rank1of2.msgpack",
                 "ckpt_7.rank0of2.msgpack",  # rank 1 of step 7 missing
                 "ckpt_9.rank0of4.msgpack"):  # wrong world size
        (tmp_path / name).write_bytes(blob)
    assert ckpt.latest_sharded_step(str(tmp_path), 2) == 2
    assert ckpt.latest_sharded_step(str(tmp_path), 4) is None
    assert ckpt.latest_sharded_step(str(tmp_path / "nope"), 2) is None


def test_slice_global_to_local_per_rank():
    """The single->multi resume path slices each rank's contiguous rows out
    of a GLOBAL checkpoint's sharded fields (device order is process-major)
    and passes replicated/mismatched leaves through untouched."""
    local = {"obs": np.zeros((4, 7), np.float32),      # global 8 over 2 ranks
             "params": {"w": np.zeros((2, 3), np.float32)},  # replicated
             "scalar": np.zeros((), np.int32)}
    glob = {"obs": np.arange(56, dtype=np.float32).reshape(8, 7),
            "params": {"w": np.ones((2, 3), np.float32)},
            "scalar": np.int32(9)}
    for pid in (0, 1):
        out = ckpt._slice_global_to_local(local, glob, pid, 2)
        np.testing.assert_array_equal(out["obs"], glob["obs"][pid * 4:(pid + 1) * 4])
        np.testing.assert_array_equal(out["params"]["w"], glob["params"]["w"])
        assert out["scalar"] == 9
    # A leaf whose leading dim is NOT local*n is left alone (lenient merge
    # keeps the fresh value later).
    odd = {"obs": np.zeros((5, 7), np.float32)}
    out = ckpt._slice_global_to_local({"obs": np.zeros((4, 7), np.float32)},
                                      odd, 0, 2)
    assert out["obs"].shape == (5, 7)


def test_ckpt_best_keeps_best_eval(tmp_path):
    """--ckpt-best maintains ckpt_best.msgpack + sidecar at the best eval
    seen; --eval-only --ckpt-best restores it (round-5 feature: guards long
    runs against late-training regressions, the SAC α-collapse shape)."""
    import json
    import os

    from cartpoleplusplus_tpu.agents import ddpg

    opts = _ddpg_opts(tmp_path, 3)
    opts.ckpt_best = True
    ddpg.train(opts)
    best = tmp_path / "ckpt_best.msgpack"
    assert best.exists() and (tmp_path / "ckpt_best.msgpack.json").exists()
    side = json.loads((tmp_path / "ckpt_best.msgpack.json").read_text())
    assert side["step"] >= 1 and side["eval_ep_len"] > 0
    # The sidecar seeds the improvement gate on resume: a fresh keeper
    # starts at the recorded best, not -inf.
    from cartpoleplusplus_tpu.agents import common

    keeper = common.BestCkptKeeper(opts, multiproc=False)
    assert keeper.best == side["eval_ep_len"]
    mtime = os.path.getmtime(best)
    keeper.update(99, side["eval_ep_len"] - 1.0, None)  # worse: no write
    assert os.path.getmtime(best) == mtime

    # eval-only restores the best file.
    opts2 = _ddpg_opts(tmp_path, 3)
    opts2.ckpt_best = True
    opts2.eval_only = True
    final = ddpg.train(opts2)
    assert 0.0 < final <= 10.0


def test_ckpt_best_meta_is_atomic_with_weights(tmp_path):
    """The improvement gate (step/eval meta) lives INSIDE ckpt_best.msgpack
    (round-5 review): losing/corrupting the json sidecar must not reseed the
    gate to -inf — that let a later WORSE eval clobber better weights via a
    crash between the two os.replace calls."""
    import os

    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
            "step": np.int32(7)}
    d = str(tmp_path)
    ckpt.save_best(d, step=42, eval_len=180.5, tree=tree)

    # Sidecar gone (the crash-between-replaces / corruption stand-in).
    os.remove(os.path.join(d, "ckpt_best.msgpack.json"))

    meta = ckpt.best_meta(d)
    assert meta == {"step": 42, "eval_ep_len": 180.5}

    target = {"w": np.zeros((2, 3), np.float32), "step": np.int32(0)}
    restored, step = ckpt.restore_best(d, target)
    assert step == 42
    np.testing.assert_array_equal(restored["w"], tree["w"])

    # The keeper seeds its gate from the embedded meta too.
    from types import SimpleNamespace

    from cartpoleplusplus_tpu.agents import common

    opts = SimpleNamespace(ckpt_dir=d, ckpt_best=True)
    keeper = common.BestCkptKeeper(opts, multiproc=False)
    assert keeper.best == 180.5

    # Missing file entirely: no meta, keeper starts at -inf.
    assert ckpt.best_meta(str(tmp_path / "nope")) is None
