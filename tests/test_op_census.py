"""Op-census regression pins for the hot kernels.

The round-3 perf work (BASELINE.md "Round 3: render roofline" / "physics op
diet") established that both production kernels run at the VPU's measured
element-op rate, so the *census* — element-weighted VPU ops per shaded ray
(render) or per substep-env (physics), counted by tracing the exact kernel
math to a jaxpr (scripts/roofline.py) — IS the performance model.  These
tests pin the census so an innocent-looking edit that re-inflates the op
count fails CI instead of silently costing throughput at the next chip run.

Bounds are the measured values + ~1% headroom (the census is deterministic,
but jax versions may re-associate a few scalar folds).  If you *intend* to
change the op count, update the bound AND the BASELINE.md tables together.

Reference anchor: the reference renders via p.getCameraImage and steps via
Bullet's C++ solver (SURVEY.md §2.2) — it has no analogous op budget; this
harness is the TPU-native replacement for "the C++ is fast".
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import roofline  # noqa: E402

# variant -> (measured census, what would regress it)
RENDER_PINS = {
    "current": 247.3,  # r2 ratio cascade (historical; census baseline)
    "recip": 162.4,    # r3 affine + approx-reciprocal slabs (the shipped
                       # slab-kernel fallback + agents' default)
    "qraster": 110.5,  # r3.5 projective inverse-depth raster (bench default)
    "qraster-mxu": 62.5,  # r3.5 + 18-plane MXU offload (--render-mxu VPU rest)
}

PHYSICS_PIN = 4982.0  # r4 3-iter default soa._substep, trip-weighted
                      # (r2 general solver 10784, r3 op diet @5it 6780)


@pytest.mark.parametrize("variant", sorted(RENDER_PINS))
def test_render_census_pinned(variant):
    ops, _ = roofline.census(variant)
    assert ops <= RENDER_PINS[variant], (
        f"render '{variant}' census grew to {ops:.1f} ops/ray "
        f"(pin {RENDER_PINS[variant]}); see BASELINE.md roofline tables"
    )


def test_render_census_generations_monotonic():
    """Each kernel generation must stay cheaper than its predecessor."""
    r2, _ = roofline.census("current")
    recip, _ = roofline.census("recip")
    qraster, _ = roofline.census("qraster")
    mxu, _ = roofline.census("qraster-mxu")
    assert mxu < qraster < recip < r2


def test_census_rejects_unknown_variant():
    """A typo'd variant must raise, not census the wrong pipeline."""
    with pytest.raises(ValueError):
        roofline.census("slab")


def test_physics_census_pinned():
    ops, _ = roofline.physics_census()
    assert ops <= PHYSICS_PIN, (
        f"soa._substep census grew to {ops:.1f} ops/substep/env "
        f"(pin {PHYSICS_PIN}); see BASELINE.md physics op-diet table"
    )
