"""In-jit venv observation diff: the REAL training render path, both backends.

The standalone-kernel probe (render_diff_probe.py) measured raster ≡ slab
byte-identical on the chip, yet the raster learning run flatlined.  The
remaining hypothesis class is in-PROGRAM divergence: the training venv
renders inside the jitted step (donated buffers, fused layouts, reachable
states) — this probe drives the actual ``VectorCartpole.step_batched`` path
under both backends with identical seeds/actions and diffs the observation
streams step by step.  One JSON line per rollout step.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.agents import common
from cartpoleplusplus_tpu.env.config import CartpoleConfig


def run(render_raster: bool, steps: int = 12, envs: int = 64):
    cfg = CartpoleConfig(
        discrete_actions=False,
        use_raw_pixels=True, num_cameras=2, render_width=50,
        render_height=50, obs_pool=2, obs_samples=2,
        action_repeats=3, steps_per_repeat=5,
    )
    venv = common.make_venv(cfg, envs, pallas_render=True,
                            render_raster=render_raster,
                            render_interpret=jax.default_backend() == "cpu")
    reset = jax.jit(venv.reset)
    step = jax.jit(venv.step)

    states, obs = reset(jax.random.PRNGKey(0))
    traj = [np.asarray(obs)]
    k = jax.random.PRNGKey(1)
    for _ in range(steps):
        k, ka, ks = jax.random.split(k, 3)
        act = jax.random.uniform(ka, (envs, 2), minval=-1.0, maxval=1.0)
        states, obs, reward, done, next_obs = step(states, act, ks)
        traj.append(np.asarray(obs))
    return traj


def main():
    ras = run(True)
    slab = run(False)
    for t, (a, b) in enumerate(zip(ras, slab)):
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        print(json.dumps({
            "step": t, "backend": jax.default_backend(),
            "mean": round(float(d.mean()), 4),
            "frac_gt2": round(float((d > 2).mean()), 6),
            "max": int(d.max()),
            "ras_mean": round(float(a.mean()), 2),
            "slab_mean": round(float(b.mean()), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
