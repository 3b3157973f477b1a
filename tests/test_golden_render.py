"""Golden-image regression test for the renderer.

SURVEY.md §4 calls for golden-image raster tests; with no pybullet available
the golden is this framework's own f32 CPU render of the canonical rest
scene, checked in as a compact npz.  Catches unintended changes to camera
placement, shading, colors, or geometry handling.

Regenerate (only after an INTENTIONAL visual change):
  JAX_PLATFORMS=cpu python tests/test_golden_render.py --regen
"""

import os

import jax
import numpy as np

from cartpoleplusplus_tpu.env import CartpoleConfig
from cartpoleplusplus_tpu.env import cartpole as cartpole_mod
from cartpoleplusplus_tpu.physics.bodies import rest_state
from cartpoleplusplus_tpu.render import make_observe_pixels

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_rest_render.npz")
CFG = CartpoleConfig(use_raw_pixels=True, num_cameras=2)


def _render_rest():
    import jax.numpy as jnp

    scene = cartpole_mod.scene_for(CFG)
    observe = make_observe_pixels(CFG, dtype=jnp.float32)
    frame = jax.jit(lambda r: observe(scene, r))(rest_state(scene))
    return np.asarray(frame, np.float32)


def test_rest_render_matches_golden():
    assert os.path.exists(GOLDEN), "golden missing — run with --regen"
    golden = np.load(GOLDEN)["frame"]
    frame = _render_rest()
    assert frame.shape == golden.shape
    diff = np.abs(frame - golden)
    # Allow tiny numeric drift but no visual change.
    assert (diff <= 2e-2).mean() > 0.9995, f"{(diff > 2e-2).mean():.4%} px changed"
    assert diff.mean() < 1e-3


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        np.savez_compressed(GOLDEN, frame=_render_rest())
        print(f"wrote {GOLDEN}")
