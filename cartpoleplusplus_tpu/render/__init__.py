"""Render layer: TPU-native pixel observations.

Rebuild of the reference's ``p.getCameraImage`` path (Bullet TinyRenderer,
SURVEY.md §2.2): analytic ray casting in XLA (raycast.py) with a hand-tiled
Pallas TPU kernel for the hot path (pallas_kernel.py), fixed cameras
(camera.py).
"""

from cartpoleplusplus_tpu.render.camera import DEFAULT_CAMERAS, Camera, ray_grid
from cartpoleplusplus_tpu.render.raycast import make_observe_pixels, render_rays


def prefer_raster(num_cameras: int, obs_pool: int, obs_samples: int) -> bool:
    """Per-config render-algorithm pick, decided by the round-4 on-chip race.

    The projective inverse-depth rasterizer (raycast._ray_obb_q, 110 census
    ops/ray) beats the slab cascade (162 ops/ray) by moving per-ray sign
    tests and reciprocals into per-env-PER-CAMERA scalar precompute — so its
    win scales with rays per camera frame.  Measured (BASELINE.md round 4,
    4096 envs, fused DDPG loop):

    - 1-cam exact (2500 rays/cam/frame): raster 1.503M vs slab 1.379M (+9%)
    - config-5, 2-cam samples=2 (1250):  raster 0.978M vs slab 1.047M (-7%)

    Rule: slab for multi-camera *sampled* configs (config-5 measured; fewer
    rays/camera amortize the precompute strictly worse, so 2-cam samples=1
    follows by monotonicity), raster everywhere else (1-cam exact measured;
    2-cam exact implied — raster measures 90% of its 905k census ceiling
    while the slab's census ceiling there is only ~616k).  Single-camera
    sampled configs keep raster pending their queued slab race cells.
    """
    pool = max(1, obs_pool)
    samples = obs_samples or pool * pool  # 0 = all sub-pixels = exact
    sampled = samples < pool * pool
    return not (num_cameras >= 2 and sampled)


__all__ = [
    "DEFAULT_CAMERAS",
    "Camera",
    "ray_grid",
    "make_observe_pixels",
    "prefer_raster",
    "render_rays",
]
