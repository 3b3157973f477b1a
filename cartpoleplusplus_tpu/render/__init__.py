"""Render layer: TPU-native pixel observations.

Rebuild of the reference's ``p.getCameraImage`` path (Bullet TinyRenderer,
SURVEY.md §2.2): analytic ray casting in XLA (raycast.py) with a hand-tiled
Pallas TPU kernel for the hot path (pallas_kernel.py), fixed cameras
(camera.py).
"""

from cartpoleplusplus_tpu.render.camera import DEFAULT_CAMERAS, Camera, ray_grid
from cartpoleplusplus_tpu.render.raycast import make_observe_pixels, render_rays

__all__ = [
    "DEFAULT_CAMERAS",
    "Camera",
    "ray_grid",
    "make_observe_pixels",
    "render_rays",
]
