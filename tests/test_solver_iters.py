"""--solver-iters 3: fidelity + census pins for the round-4 physics lever.

The Jacobi solver's iteration count is the largest remaining low-dim op
lever: 924 census ops/substep per iteration on a 2160-op fixed base
(scripts/roofline.py physics_census).  5 is the validated default; this
module pins the evidence that 3 is a sound race candidate — identical
topple timing and a settle pose within the external-arbiter bounds — plus
the census linearity the bench's ceiling model (utils/benchmark.py
PHYS_OPS_FIXED/PER_ITER) relies on.  The on-chip race is queued
(scripts/chip_queue.sh lowdim_4096_it3); the default flips only on a
measured win with this file green.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cartpoleplusplus_tpu.physics import engine
from cartpoleplusplus_tpu.physics.bodies import POLE, make_scene, rest_state

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import roofline  # noqa: E402

DT = 1.0 / 240.0
T_TOPPLE_ANALYTIC = 0.6844  # no-slip corner pivot (scripts/topple_analysis.py)


def test_census_linear_in_iterations():
    """ops(it) = FIXED + it·PER_ITER, matching the bench's ceiling model."""
    from cartpoleplusplus_tpu.utils import benchmark as B

    ops3, _ = roofline.physics_census(iterations=3)
    ops5, _ = roofline.physics_census(iterations=5)
    per_iter = (ops5 - ops3) / 2
    fixed = ops5 - 5 * per_iter
    assert abs(per_iter - B.PHYS_OPS_PER_ITER) <= 0.01 * B.PHYS_OPS_PER_ITER
    assert abs(fixed - B.PHYS_OPS_FIXED) <= 0.01 * B.PHYS_OPS_FIXED
    assert ops3 <= 4982  # 4932 measured + ~1% headroom (see test_op_census)


def _tilt(q):
    w, x, y, z = q
    return np.arccos(np.clip(1.0 - 2.0 * (x * x + y * y), -1.0, 1.0))


@pytest.fixture(scope="module")
def scene3():
    return make_scene(solver_iterations=3)


def _pole_tilted(scene, ang0=0.2):
    q0 = np.array([np.cos(ang0 / 2), 0.0, np.sin(ang0 / 2), 0.0])
    r = rest_state(scene)
    return r.replace(
        pos=r.pos.at[POLE].set(jnp.asarray([5.0, 0.0, 0.5], jnp.float32)),
        quat=r.quat.at[POLE].set(jnp.asarray(q0, jnp.float32)),
    )


def test_topple_time_unchanged_at_3_iters(scene3):
    """Time-to-45° at 12.5 ms granularity must equal the 5-iteration (and
    analytic) value — the headline invariance claim behind the knob."""
    r = _pole_tilted(scene3)
    chunk = jax.jit(
        lambda rr: engine.step_substeps(scene3, rr, jnp.zeros(3, jnp.float32), 3)
    )
    t = None
    for i in range(1, 1200):
        r = chunk(r)
        if _tilt(np.asarray(r.quat[POLE])) > np.pi / 4:
            t = i * 3 * DT
            break
    assert t is not None
    assert abs(t - T_TOPPLE_ANALYTIC) / T_TOPPLE_ANALYTIC < 0.02, t


def test_settle_envelope_holds_at_3_iters(scene3):
    """Contact-rich topple→impact→slide→settle at 3 iterations must meet the
    SAME absolute bounds the 5-iteration external-fidelity test enforces
    (flat, resting at half-width, motionless).  Measured deviation from a
    30-iteration reference: ≤4 mm in rest position (vs ~0.6 mm at 5)."""
    r = _pole_tilted(scene3)
    out = jax.jit(
        lambda rr: engine.step_substeps(
            scene3, rr, jnp.zeros(3, jnp.float32), int(2.5 / DT)
        )
    )(r)
    out = jax.tree.map(np.asarray, out)
    assert abs(_tilt(out.quat[POLE]) - np.pi / 2) < 0.05
    assert abs(out.pos[POLE, 2] - 0.05) < 0.01
    assert np.abs(out.vel[POLE]).max() < 0.05
    assert np.abs(out.ang[POLE]).max() < 0.2
