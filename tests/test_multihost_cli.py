"""Multi-process training from the USER-FACING agent CLI.

tests/test_multihost.py drives the distributed segment through a bespoke
worker; this test goes one level up the stack: two OS processes run the
real ``python -m cartpoleplusplus_tpu.agents.ddpg`` entry point with the
shared ``--coordinator/--num-processes/--process-id`` flags (each process
contributing 2 virtual CPU devices to a 4-device job mesh), exactly the
command a user types per host on a TPU pod.  Asserts:

- both ranks exit 0 (segments, evals, and the final event-free teardown all
  work across the process boundary);
- exactly ONE process (rank 0) writes the metrics file, with real train
  rows (the output-gating contract of common.maybe_init_multihost);
- --ckpt-dir under multi-process is RANK-SHARDED (round 5): every rank
  writes/restores its own ckpt_<step>.rank<k>of<n>.msgpack, proven by a
  real save→kill→resume sequence plus a single-process --eval-only restore
  from the rank-0 file;
- every agent accepts --num-processes (ddpg/sac richly, the other four via
  the parametrized smoke at the bottom).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _cli_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    # Real CPU backend with 2 virtual devices per process; PYTHONPATH set to
    # the repo only (drops the axon sitecustomize that force-selects TPU).
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = _REPO
    return env


def _argv(port, pid, extra=()):
    return [
        sys.executable, "-m", "cartpoleplusplus_tpu.agents.ddpg",
        "--coordinator", f"localhost:{port}",
        "--num-processes", "2", "--process-id", str(pid),
        "--num-devices", "4",
        "--num-train-batches", "2", "--num-envs", "8", "--num-eval", "4",
        "--action-repeats", "2", "--steps-per-repeat", "2",
        "--max-episode-len", "10", "--steps-per-segment", "3",
        "--batch-size", "8", "--replay-capacity", "128",
        "--warmup-steps", "1", "--eval-freq", "1", "--seed", "0",
        *extra,
    ]


def test_two_process_ddpg_cli(tmp_path):
    port = _free_port()
    env = _cli_env()
    metrics = [tmp_path / "rank0.jsonl", tmp_path / "rank1.jsonl"]
    procs = [
        subprocess.Popen(
            _argv(port, pid, ("--metrics-jsonl", str(metrics[pid]))),
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out[-3000:]}"

    # Single-writer contract: rank 0 logs, rank 1's flag was cleared.
    assert metrics[0].exists() and not metrics[1].exists()
    rows = [json.loads(line) for line in metrics[0].read_text().splitlines()]
    train = [r for r in rows if r.get("event") == "train"]
    assert len(train) == 2
    assert all(0.0 < r["eval_ep_len"] <= 10.0 for r in train)


def _run_pair(port, extras_by_rank, module="cartpoleplusplus_tpu.agents.ddpg",
              batches="2"):
    env = _cli_env()
    procs = []
    for pid in (0, 1):
        argv = _argv(port, pid, extras_by_rank[pid])
        argv[2] = module
        argv[argv.index("--num-train-batches") + 1] = batches
        procs.append(subprocess.Popen(
            argv, env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = [p.communicate(timeout=420)[0].decode(errors="replace")
            for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out[-3000:]}"
    return outs


def test_two_process_ckpt_save_kill_resume(tmp_path):
    """SURVEY §5 failure recovery, multi-host: train 2 segments with a
    --ckpt-dir (both ranks write their ckpt_2.rank<k>of2 shard), 'kill' the
    job (it exits), then relaunch asking for 4 segments — both ranks must
    restore at step 2 and train exactly segments 3..4."""
    port = _free_port()
    ck = tmp_path / "ck"
    metrics = tmp_path / "m0.jsonl"
    common = ("--ckpt-dir", str(ck), "--ckpt-freq", "2")
    _run_pair(port, {0: (*common, "--metrics-jsonl", str(metrics)),
                     1: common})
    names = sorted(p.name for p in ck.iterdir())
    assert names == ["ckpt_2.rank0of2.msgpack", "ckpt_2.rank1of2.msgpack"], names

    metrics2 = tmp_path / "m0_resume.jsonl"
    _run_pair(_free_port(), {0: (*common, "--metrics-jsonl", str(metrics2)),
                             1: common}, batches="4")
    rows = [json.loads(l) for l in metrics2.read_text().splitlines()]
    restores = [r for r in rows if r.get("event") == "restore"]
    assert restores and restores[0]["step"] == 2
    segs = [r["segment"] for r in rows if r.get("event") == "train"]
    assert segs == [3, 4], f"resume retrained wrong segments: {segs}"
    # The resumed run checkpoints at 4 (both ranks again).
    assert (ck / "ckpt_4.rank0of2.msgpack").exists()
    assert (ck / "ckpt_4.rank1of2.msgpack").exists()

    # Single-process --eval-only restores the policy from the rank-0 shard
    # file (replicated params are complete in every rank's file).
    eval_metrics = tmp_path / "eval.jsonl"
    proc = subprocess.run(
        [sys.executable, "-m", "cartpoleplusplus_tpu.agents.ddpg",
         "--ckpt-dir", str(ck), "--eval-only",
         "--num-envs", "8", "--num-eval", "4",
         "--action-repeats", "2", "--steps-per-repeat", "2",
         "--max-episode-len", "10", "--seed", "0",
         "--metrics-jsonl", str(eval_metrics)],
        env=_cli_env(), cwd=_REPO, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    rows = [json.loads(l) for l in eval_metrics.read_text().splitlines()]
    evals = [r for r in rows if r.get("event") == "eval_only"]
    assert evals and evals[0]["segment"] == 4
    assert 0.0 < evals[0]["eval_ep_len"] <= 10.0


def test_single_to_multiprocess_resume(tmp_path):
    """The documented upgrade path: checkpoint single-process, relaunch
    multi-process with the same --ckpt-dir.  The global file must RESUME
    (params restore, env/replay shards slice per rank), not silently restart
    from scratch (round-5 review finding)."""
    ck = tmp_path / "ck"
    metrics = tmp_path / "single.jsonl"
    proc = subprocess.run(
        [sys.executable, "-m", "cartpoleplusplus_tpu.agents.ddpg",
         "--ckpt-dir", str(ck), "--ckpt-freq", "2",
         "--num-train-batches", "2", "--num-envs", "8", "--num-eval", "4",
         "--action-repeats", "2", "--steps-per-repeat", "2",
         "--max-episode-len", "10", "--steps-per-segment", "3",
         "--batch-size", "8", "--replay-capacity", "128",
         "--warmup-steps", "1", "--eval-freq", "1", "--seed", "0",
         "--metrics-jsonl", str(metrics)],
        env=_cli_env(), cwd=_REPO, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (ck / "ckpt_2.msgpack").exists()

    common = ("--ckpt-dir", str(ck), "--ckpt-freq", "2")
    metrics2 = tmp_path / "multi.jsonl"
    _run_pair(_free_port(), {0: (*common, "--metrics-jsonl", str(metrics2)),
                             1: common}, batches="4")
    rows = [json.loads(l) for l in metrics2.read_text().splitlines()]
    restores = [r for r in rows if r.get("event") == "restore"]
    assert restores and restores[0]["step"] == 2
    segs = [r["segment"] for r in rows if r.get("event") == "train"]
    assert segs == [3, 4], f"multi-process resume retrained: {segs}"


def test_two_process_sac_cli(tmp_path):
    """SAC is the second multi-process agent (VERDICT r4 item 5)."""
    metrics = tmp_path / "sac0.jsonl"
    _run_pair(_free_port(),
              {0: ("--metrics-jsonl", str(metrics)), 1: ()},
              module="cartpoleplusplus_tpu.agents.sac")
    rows = [json.loads(l) for l in metrics.read_text().splitlines()]
    train = [r for r in rows if r.get("event") == "train"]
    assert len(train) == 2
    assert all(0.0 < r["eval_ep_len"] <= 10.0 for r in train)


def test_multiprocess_rejects_eval_only(tmp_path):
    proc = subprocess.run(
        _argv(_free_port(), 0, ("--eval-only",)),
        env=_cli_env(), cwd=_REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0
    assert "--eval-only needs no mesh" in proc.stderr


# Per-agent extra flags: the off-policy agents share the replay knobs; the
# on-policy pair has its own rollout shape.
_MP_EXTRA = {
    "dqn": ("--steps-per-segment", "3", "--batch-size", "8",
            "--replay-capacity", "128", "--warmup-steps", "1"),
    "naf": ("--steps-per-segment", "3", "--batch-size", "8",
            "--replay-capacity", "128", "--warmup-steps", "1"),
    "lrpg": (),
    "ppo": ("--rollout-steps", "8", "--ppo-epochs", "1",
            "--ppo-minibatches", "2"),
}


@pytest.mark.parametrize("agent", sorted(_MP_EXTRA))
def test_two_process_cli_all_agents(tmp_path, agent):
    """Round 5: EVERY agent accepts --num-processes (ddpg/sac have their own
    richer tests above; this pins the other four through the real CLI)."""
    port = _free_port()
    env = _cli_env()
    metrics = tmp_path / "rank0.jsonl"
    base = [
        sys.executable, "-m", f"cartpoleplusplus_tpu.agents.{agent}",
        "--coordinator", f"localhost:{port}",
        "--num-processes", "2", "--num-devices", "4",
        "--num-train-batches", "1", "--num-envs", "8", "--num-eval", "4",
        "--action-repeats", "2", "--steps-per-repeat", "2",
        "--max-episode-len", "10", "--eval-freq", "1", "--seed", "0",
        *_MP_EXTRA[agent],
    ]
    procs = [
        subprocess.Popen(
            [*base, "--process-id", str(pid),
             *(("--metrics-jsonl", str(metrics)) if pid == 0 else ())],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=420)[0].decode(errors="replace")
            for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"{agent} rank failed:\n{out[-3000:]}"
    rows = [json.loads(l) for l in metrics.read_text().splitlines()]
    train = [r for r in rows if r.get("event") == "train"]
    assert len(train) == 1
    assert 0.0 < train[0]["eval_ep_len"] <= 10.0
