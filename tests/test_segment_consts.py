"""Guard: no agent's jitted function may close over a device array.

Round-4 postmortem (VERDICT.md Weak #1): agents/dqn.py built the C51
support with an EAGER ``jnp.linspace`` at ``make_segment`` time; the
resulting ``jax.Array`` was captured by the jitted segment as a closed-over
constant.  On CPU that is invisible, but the tunnel-backed TPU platform
rejects the D2H copy XLA needs to export a device constant into the
program (``_array_mlir_constant_handler`` → FAILED_PRECONDITION), so the
full-scale Rainbow chip run crashed on a bug 231 green tests could not see.

The rule (CLAUDE.md "Environment gotchas"): anything a jit closes over must
be host data — numpy arrays or Python scalars.  This test enforces the rule
for EVERY agent by monkeypatching ``jax.jit``: each wrapped function is
re-traced with ``jax.make_jaxpr`` on its first real call and the closed
jaxpr's ``consts`` are asserted free of ``jax.Array`` instances.  Values
built *inside* a traced function are staged by omnistaging and never appear
as consts, so in-trace ``jnp`` helpers (e.g. dqn.greedy_act's unit
linspace) stay legal — exactly matching what the TPU backend accepts.

Reference: bullet_cartpole.py has no analogue (TF sessions hide constant
placement); this is a rebuild-specific hardware-contract test.
"""

import jax
import pytest

from cartpoleplusplus_tpu.agents import common, ddpg, dqn, lrpg, naf, ppo, sac

_REAL_JIT = jax.jit

# Ultra-tiny budget: one segment + one eval is enough — the guard fires on
# the FIRST call of every jitted function train() builds.
_TINY = [
    "--num-envs", "8", "--num-eval", "8",
    "--action-repeats", "2", "--steps-per-repeat", "2",
    "--max-episode-len", "20", "--eval-freq", "1",
    "--steps-per-segment", "5", "--batch-size", "16",
    "--replay-capacity", "256", "--warmup-steps", "4", "--seed", "0",
    "--num-train-batches", "1",
]


def _guarded_jit(fun=None, **jit_kwargs):
    if fun is None:
        return lambda f: _guarded_jit(f, **jit_kwargs)
    real = _REAL_JIT(fun, **jit_kwargs)
    state = {"checked": False}

    def wrapper(*args, **kwargs):
        if not state["checked"]:
            state["checked"] = True
            closed = jax.make_jaxpr(
                fun, static_argnums=jit_kwargs.get("static_argnums", ()),
            )(*args, **kwargs)
            bad = [c for c in closed.consts if isinstance(c, jax.Array)]
            assert not bad, (
                f"jit({getattr(fun, '__name__', fun)}) closes over device "
                f"arrays {[(b.shape, str(b.dtype)) for b in bad]} — build "
                "them with host numpy (CLAUDE.md gotcha; crashes the tunnel "
                "TPU backend at constant export)"
            )
        return real(*args, **kwargs)

    return wrapper


def _run_guarded(monkeypatch, train_fn, argv):
    monkeypatch.setattr(jax, "jit", _guarded_jit)
    parser = common.make_parser("t")
    add_opts = {
        ddpg.train: ddpg.add_ddpg_opts, dqn.train: dqn.add_dqn_opts,
        naf.train: naf.add_naf_opts, sac.train: sac.add_sac_opts,
        ppo.train: ppo.add_ppo_opts,
    }.get(train_fn)
    if add_opts is not None:
        add_opts(parser)
    train_fn(parser.parse_args(argv))


def test_dqn_rainbow_segment_has_no_device_consts(monkeypatch):
    """The exact round-4 crash config: every Rainbow component on."""
    _run_guarded(monkeypatch, dqn.train, [
        "--c51", "11", "--c51-vmax", "8.0", "--per", "--n-step", "3",
        "--dueling", "--noisy", "--reward-scale", "0.1", *_TINY,
    ])


def test_ddpg_td3_segment_has_no_device_consts(monkeypatch):
    _run_guarded(monkeypatch, ddpg.train, [
        "--twin-critic", "--policy-delay", "2", "--target-noise", "0.2",
        "--per", "--n-step", "2", "--reward-scale", "0.1", *_TINY,
    ])


def test_naf_segment_has_no_device_consts(monkeypatch):
    _run_guarded(monkeypatch, naf.train,
                 ["--reward-scale", "0.1", *_TINY])


def test_sac_segment_has_no_device_consts(monkeypatch):
    _run_guarded(monkeypatch, sac.train,
                 ["--reward-scale", "0.1", *_TINY])


def test_ppo_train_step_has_no_device_consts(monkeypatch):
    _run_guarded(monkeypatch, ppo.train, [
        "--num-envs", "8", "--num-eval", "8", "--action-repeats", "2",
        "--steps-per-repeat", "2", "--max-episode-len", "20",
        "--eval-freq", "1", "--seed", "0", "--num-train-batches", "1",
    ])


def test_lrpg_train_step_has_no_device_consts(monkeypatch):
    _run_guarded(monkeypatch, lrpg.train, [
        "--num-envs", "8", "--num-eval", "8", "--action-repeats", "2",
        "--steps-per-repeat", "2", "--max-episode-len", "20",
        "--eval-freq", "1", "--seed", "0", "--num-train-batches", "1",
    ])


def test_guard_actually_detects_device_consts():
    """Meta-test: the wrapper must flag an eager jnp closure (the round-4
    bug shape) so the agent tests above can be trusted."""
    import jax.numpy as jnp

    trap = jnp.linspace(0.0, 1.0, 4)
    f = _guarded_jit(lambda x: x * trap)
    with pytest.raises(AssertionError, match="closes over device arrays"):
        f(jnp.ones(4))
