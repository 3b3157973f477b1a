"""Worker process for tests/test_multihost.py — NOT a test module.

Each of 2 localhost processes contributes 2 virtual CPU devices; the job
mesh spans all 4.  The worker drives the SAME agent-generic distributed
DDPG segment used single-process (parallel/distributed.py) over the
multi-host mesh: env/replay shards place round-robin across processes,
params replicate, and the per-update gradient ``pmean`` crosses the
process boundary through the Gloo CPU collectives backend — the CPU
stand-in for DCN (SURVEY.md §2.3 comm-backend row; on a TPU pod the same
program rides ICI/DCN with zero code change).

Usage: python _multihost_worker.py <process_id> <coordinator_port> <out_dir>
"""

import json
import os
import sys


def main():
    pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    # The subsystem under test: init_multihost must run BEFORE other JAX use.
    from cartpoleplusplus_tpu.parallel import init_multihost

    init_multihost(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )

    import jax
    import numpy as np
    import optax

    from cartpoleplusplus_tpu.agents import common
    from cartpoleplusplus_tpu.agents import ddpg as ddpg_mod
    from cartpoleplusplus_tpu.env.config import CartpoleConfig
    from cartpoleplusplus_tpu.models import Actor, Critic
    from cartpoleplusplus_tpu.parallel import make_mesh
    from cartpoleplusplus_tpu.parallel.distributed import (
        global_ddpg_state,
        make_distributed_segment,
    )

    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

    config = CartpoleConfig(
        discrete_actions=False, action_repeats=2, steps_per_repeat=2,
        initial_force_steps=2, max_episode_len=20,
    )
    actor = Actor(action_dim=2, hidden=(16, 16))
    critic = Critic(hidden=(16, 16))
    atx, ctx = optax.adam(1e-3), optax.adam(1e-3)

    n_dev, global_envs, capacity = 4, 16, 256
    mesh = make_mesh()  # spans all 4 devices, both processes
    local_venv = common.make_venv(config, global_envs // n_dev)
    build, shard_state = make_distributed_segment(
        mesh, local_venv, actor, critic, atx, ctx,
        batch_size=8, warmup_steps=2, steps_per_segment=5,
    )
    # Same-seed host state is bit-identical on both processes, so the
    # multi-process device_put sees consistent global values.
    st = global_ddpg_state(
        config, global_envs, capacity, actor, critic, atx, ctx,
        seed=3, num_devices=n_dev,
    )
    st = shard_state(st)
    segment = build(st)

    rewards = []
    for _ in range(2):
        st, metrics = segment(st)
        # Metrics are pmean-replicated: every process reads its local copy.
        rewards.append(float(np.asarray(metrics["reward"].addressable_data(0))))

    assert all(np.isfinite(r) for r in rewards), rewards
    assert 0.0 < rewards[-1] <= 1.0, rewards

    with open(os.path.join(out_dir, f"worker_{pid}.json"), "w") as f:
        json.dump({"rewards": rewards, "ok": True}, f)


if __name__ == "__main__":
    main()
