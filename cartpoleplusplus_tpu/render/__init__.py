"""Render layer: TPU-native pixel observations.

Rebuild of the reference's ``p.getCameraImage`` path (Bullet TinyRenderer,
SURVEY.md §2.2): analytic ray casting in XLA (raycast.py) with a hand-tiled
Pallas TPU kernel for the hot path (pallas_kernel.py), fixed cameras
(camera.py).
"""

from cartpoleplusplus_tpu.render.camera import DEFAULT_CAMERAS, Camera, ray_grid
from cartpoleplusplus_tpu.render.raycast import make_observe_pixels, render_rays


def prefer_raster(num_cameras: int, obs_pool: int, obs_samples: int) -> bool:
    """Per-config render-algorithm pick, decided by the on-chip races.

    The projective inverse-depth rasterizer (raycast._ray_obb_q, 110 census
    ops/ray) beats the slab cascade (162 ops/ray) by moving per-ray sign
    tests and reciprocals into per-env-PER-CAMERA scalar precompute.  The
    round-4 morning race split by rays/camera (raster +9% at 1-cam exact,
    −7% at config-5).  The round-4b re-race — same chip session, slab
    cells as controls (both reproduce the morning slab numbers to ~1.5%),
    everything at the 3-iteration solver default (BASELINE.md round 4b) —
    has the raster winning every measured config:

    - 1-cam exact:  raster 1.504M vs slab 1.359M  (+10.7%)
    - config-5:     raster 1.083M vs slab 1.062M  (+2.0%, same session;
      the morning −7% did not reproduce once both kernels raced
      back-to-back at the new physics default)
    - 2-cam exact:  raster 815k = 90% of its 905k ceiling; the slab's
      CENSUS ceiling there is ~616k — the raster wins by construction.

    Rule: raster everywhere.  The slab cascade remains one
    ``--no-render-raster`` away (and is the automatic fallback when the
    backend rejects the raster kernel — agents/common.py probe).
    """
    return True


__all__ = [
    "DEFAULT_CAMERAS",
    "Camera",
    "ray_grid",
    "make_observe_pixels",
    "prefer_raster",
    "render_rays",
]
