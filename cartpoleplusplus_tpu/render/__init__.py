"""Render layer: TPU-native pixel observations.

Rebuild of the reference's ``p.getCameraImage`` path (Bullet TinyRenderer,
SURVEY.md §2.2): analytic ray casting in XLA (raycast.py) with a hand-tiled
Pallas TPU kernel for the hot path (pallas_kernel.py), fixed cameras
(camera.py).
"""

from cartpoleplusplus_tpu.render.camera import DEFAULT_CAMERAS, Camera, ray_grid
from cartpoleplusplus_tpu.render.raycast import make_observe_pixels, render_rays


def prefer_raster(num_cameras: int, obs_pool: int, obs_samples: int) -> bool:
    """Per-config render-algorithm pick, decided by the on-chip races AND
    the round-5 learning A/B.

    The projective inverse-depth rasterizer (raycast._ray_obb_q, 110 census
    ops/ray) beats the slab cascade (162 ops/ray) on throughput at every
    measured config (round-4b same-session re-race: 1-cam exact +10.7%,
    config-5 +2.0%; BASELINE.md round 4b), and round 4 promoted it
    everywhere on that basis.

    Round 5 DEMOTED it for SAMPLED configs (obs_samples > 0): the
    same-seed 2-cam samples=2 learning A/B (chip_queue6 ab_2cam_*) has the
    slab backend learning normally (final 109/200, the historical band)
    while the raster backend flatlines at the nop baseline for all 15000
    segments — despite the on-chip render-diff probe measuring the two
    kernels byte-identical on randomized states at tile_e=8
    (scripts/render_diff_probe.py; the production-shape probe is queued).
    Until the divergence mechanism is isolated, the learning-validated
    assignment is:

    - exact configs (obs_samples == 0): raster — throughput-raced AND
      learning-validated (1-cam: TD3 4-seed bar; 2-cam exact: the
      35000-segment push run, final 123.7).
    - sampled configs (obs_samples > 0): slab — the round-2/3
      learning-validated production kernel (2-cam samples=2: 100-133
      band across runs incl. the round-5 control).

    The other kernel stays one --render-raster/--no-render-raster away,
    and slab remains the automatic fallback when the backend rejects the
    raster kernel (agents/common.py probe).
    """
    return obs_samples == 0


__all__ = [
    "DEFAULT_CAMERAS",
    "Camera",
    "ray_grid",
    "make_observe_pixels",
    "prefer_raster",
    "render_rays",
]
