"""Serving-artifact export (utils/export.py) and the shared --eval-only path.

The reference has no deployment story (a policy exists only as a TF Saver
checkpoint readable by its own Python class, util.py:~L90-130); the rebuild
exports the greedy policy as a self-contained serialized-StableHLO artifact
(weights baked in, symbolic batch dim) and gives every agent a train-free
``--eval-only`` mode.  These tests pin:

- export → serialize → deserialize → call equals direct apply, bit-exact,
  at MULTIPLE batch sizes (the symbolic batch dim actually generalizes);
- the agent CLI surface: ``--export-policy`` writes a loadable artifact with
  the uint8-for-pixels / float32-for-low-dim observation ABI;
- ``--eval-only`` restores a checkpoint, evaluates, honors the output flags,
  and refuses to run without a restorable checkpoint.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpoleplusplus_tpu.models import Actor
from cartpoleplusplus_tpu.utils import export as export_mod


def _tiny_actor():
    actor = Actor(action_dim=2, hidden=(8, 8))
    obs = jnp.zeros((4, 2, 2, 7), jnp.float32)
    params = actor.init(jax.random.PRNGKey(0), obs)
    return actor, params, obs.shape[1:]


def test_export_roundtrip_matches_direct_apply(tmp_path):
    actor, params, obs_shape = _tiny_actor()
    act = lambda p, o: actor.apply(p, o)
    path = str(tmp_path / "actor.stablehlo")
    nbytes = export_mod.save_policy(path, act, params, obs_shape)
    assert nbytes > 0 and os.path.getsize(path) == nbytes

    policy = export_mod.load_policy(path)
    for batch in (1, 5, 16):  # symbolic batch dim: no re-export needed
        obs = jax.random.normal(jax.random.PRNGKey(batch), (batch, *obs_shape))
        np.testing.assert_array_equal(
            np.asarray(policy(obs)), np.asarray(act(params, obs))
        )


def test_describe_reports_signature(tmp_path):
    actor, params, obs_shape = _tiny_actor()
    path = str(tmp_path / "actor.stablehlo")
    export_mod.save_policy(path, lambda p, o: actor.apply(p, o), params,
                           obs_shape)
    meta = export_mod.describe(path)
    assert "cpu" in meta["platforms"] and "tpu" in meta["platforms"]
    assert meta["in_avals"] and "b" in meta["in_avals"][0]  # symbolic batch


def test_export_cli_smoke(tmp_path, capsys):
    actor, params, obs_shape = _tiny_actor()
    path = str(tmp_path / "actor.stablehlo")
    export_mod.save_policy(path, lambda p, o: actor.apply(p, o), params,
                           obs_shape)
    export_mod.main(["--load", path, "--batch", "3", "--steps", "2"])
    err = capsys.readouterr().err
    assert "ARTIFACT" in err and "CALL ok" in err and "TIMING" in err


def _ddpg_opts(tmp_path, extra=()):
    from cartpoleplusplus_tpu.agents import common, ddpg

    argv = [
        "--num-train-batches", "2",
        "--num-envs", "4", "--num-eval", "4",
        "--action-repeats", "2", "--steps-per-repeat", "2",
        "--max-episode-len", "10", "--steps-per-segment", "3",
        "--batch-size", "8", "--replay-capacity", "64", "--warmup-steps", "1",
        "--eval-freq", "1", "--ckpt-dir", str(tmp_path / "ckpt"),
        "--ckpt-freq", "1", *extra,
    ]
    parser = common.make_parser("t")
    ddpg.add_ddpg_opts(parser)
    return parser.parse_args(argv)


def test_agent_export_flag_lowdim(tmp_path):
    from cartpoleplusplus_tpu.agents import ddpg

    art = tmp_path / "policy.stablehlo"
    ddpg.train(_ddpg_opts(tmp_path, ("--export-policy", str(art))))
    policy = export_mod.load_policy(str(art))
    obs = np.zeros((6, 2, 2, 7), np.float32)
    a = np.asarray(policy(obs))
    assert a.shape == (6, 2)
    assert np.all(np.isfinite(a)) and np.all(np.abs(a) <= 1.0)


def test_agent_export_flag_pixels_uint8_abi(tmp_path):
    from cartpoleplusplus_tpu.agents import ddpg

    art = tmp_path / "pixel_policy.stablehlo"
    opts = _ddpg_opts(
        tmp_path,
        ("--use-raw-pixels", "--render-width", "16", "--render-height", "16",
         "--export-policy", str(art)),
    )
    ddpg.train(opts)
    meta = export_mod.describe(str(art))
    assert "ui8" in meta["in_avals"][0] or "uint8" in meta["in_avals"][0]
    policy = export_mod.load_policy(str(art))
    obs = np.zeros((3, 2, 16 * 16 * 3), np.uint8)  # raw frames, as served
    a = np.asarray(policy(obs))
    assert a.shape == (3, 2) and np.all(np.isfinite(a))


def test_eval_only_restores_and_exports(tmp_path):
    from cartpoleplusplus_tpu.agents import ddpg

    ddpg.train(_ddpg_opts(tmp_path))  # writes ckpt_1, ckpt_2

    art = tmp_path / "from_eval_only.stablehlo"
    events = tmp_path / "eval.events"
    opts = _ddpg_opts(
        tmp_path,
        ("--eval-only", "--export-policy", str(art),
         "--event-log-out", str(events)),
    )
    elen = ddpg.train(opts)
    assert 0.0 < elen <= 10.0  # a real rollout happened, capped by max len
    assert art.exists() and events.exists()
    # No training ran: checkpoint numbering is untouched.
    from cartpoleplusplus_tpu.utils import checkpoint as ckpt

    assert ckpt.latest_step(str(tmp_path / "ckpt")) == 2


def test_eval_only_refuses_without_checkpoint(tmp_path):
    from cartpoleplusplus_tpu.agents import ddpg

    opts = _ddpg_opts(tmp_path, ("--eval-only",))
    opts.ckpt_dir = str(tmp_path / "empty")
    with pytest.raises(SystemExit):
        ddpg.train(opts)


def test_eval_only_dqn(tmp_path):
    """The shared path works for the discrete/param-name-divergent agents
    too (dqn: st.params; ddpg covered above)."""
    from cartpoleplusplus_tpu.agents import common, dqn

    argv = [
        "--num-train-batches", "2",
        "--num-envs", "4", "--num-eval", "4",
        "--action-repeats", "2", "--steps-per-repeat", "2",
        "--max-episode-len", "10", "--steps-per-segment", "3",
        "--batch-size", "8", "--replay-capacity", "64", "--warmup-steps", "1",
        "--eval-freq", "1", "--ckpt-dir", str(tmp_path / "ckpt"),
        "--ckpt-freq", "1",
    ]
    parser = common.make_parser("t")
    dqn.add_dqn_opts(parser)
    dqn.train(parser.parse_args(argv))

    art = tmp_path / "q.stablehlo"
    opts = parser.parse_args(argv + ["--eval-only",
                                     "--export-policy", str(art)])
    elen = dqn.train(opts)
    assert 0.0 < elen <= 10.0
    policy = export_mod.load_policy(str(art))
    acts = np.asarray(policy(np.zeros((5, 2, 2, 7), np.float32)))
    assert acts.shape == (5,) and set(np.unique(acts)) <= set(range(5))


def test_agent_export_flag_multidevice(tmp_path):
    """--export-policy after a --num-devices run: the distributed state's
    replicated actor params must gather to host and export identically to a
    single-device artifact's calling convention."""
    from cartpoleplusplus_tpu.agents import ddpg

    art = tmp_path / "dp_policy.stablehlo"
    ddpg.train(_ddpg_opts(tmp_path, ("--num-devices", "2",
                                     "--export-policy", str(art))))
    policy = export_mod.load_policy(str(art))
    a = np.asarray(policy(np.zeros((4, 2, 2, 7), np.float32)))
    assert a.shape == (4, 2) and np.all(np.isfinite(a))
