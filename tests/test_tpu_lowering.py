"""AOT TPU-lowering smoke tests for the Pallas kernels.

CI runs on CPU, where the Pallas equivalence suites execute in interpret
mode — which validates semantics but never invokes the Mosaic front-end
(tracing, layout inference, serialization into ``tpu_custom_call``).  A
kernel edit can therefore pass every CPU test and still fail to *lower* on
the real chip (this nearly happened in round 3: the physics op diet rewrote
``soa._substep``, the shared body of the fused Mosaic step kernel, with no
chip available to compile it).

``jax.jit(f).trace(...).lower(lowering_platforms=("tpu",))`` runs that
front-end on any host: it catches unsupported-op / layout / shape errors at
trace time without needing a device.  (The Mosaic→LLO *backend* compile
still only happens on hardware; these tests bound the risk, not eliminate
it.)
"""

import jax
import jax.numpy as jnp
import pytest

from cartpoleplusplus_tpu.env.config import CartpoleConfig
from cartpoleplusplus_tpu.physics.bodies import RigidState
from cartpoleplusplus_tpu.physics.pallas_step import step_repeats_pallas
from cartpoleplusplus_tpu.physics.urdf import default_asset_dir, scene_from_urdf_dir
from cartpoleplusplus_tpu.render import pallas_kernel


def _rigid(e):
    pos = jnp.zeros((e, 2, 3)) + jnp.array([[0.0, 0.0, 0.08], [0.0, 0.0, 0.5]])
    quat = jnp.zeros((e, 2, 4)).at[:, :, 0].set(1.0)
    return RigidState(
        pos=pos, quat=quat, vel=jnp.zeros((e, 2, 3)), ang=jnp.zeros((e, 2, 3))
    )


def _lower_tpu(fn, *args):
    return jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


@pytest.mark.parametrize(
    "cameras,samples",
    [(1, 0), (2, 2)],  # r1/r2 headline shape + production config 5
)
def test_fused_step_and_render_lower_for_tpu(cameras, samples):
    scene = scene_from_urdf_dir(default_asset_dir())
    cfg = CartpoleConfig(
        use_raw_pixels=True, num_cameras=cameras, obs_pool=2, obs_samples=samples
    )
    e, r, spr = 1024, 3, 5  # min env count of the fused step kernel's tiling
    render = pallas_kernel.make_render_repeats(cfg)

    def full(rigid, force):
        out, poses = step_repeats_pallas(scene, rigid, force, spr, r)
        return out, render(scene, poses)

    lowered = _lower_tpu(full, _rigid(e), jnp.zeros((e, 3)))
    # Both kernels must survive Mosaic serialization into custom calls.
    assert lowered.as_text().count("tpu_custom_call") == 2


def test_batched_render_lowers_for_tpu():
    scene = scene_from_urdf_dir(default_asset_dir())
    cfg = CartpoleConfig(use_raw_pixels=True, num_cameras=2, obs_pool=2)
    render = pallas_kernel.make_render_batched(cfg)
    lowered = _lower_tpu(lambda rg: render(scene, rg), _rigid(64))
    assert "tpu_custom_call" in lowered.as_text()


@pytest.mark.parametrize("cameras,samples", [(1, 0), (2, 2)])
def test_raster_render_lowers_for_tpu(cameras, samples):
    """The projective inverse-depth raster kernel must survive the Mosaic
    front-end too (per-env bound routing uses broadcast selects)."""
    scene = scene_from_urdf_dir(default_asset_dir())
    cfg = CartpoleConfig(
        use_raw_pixels=True, num_cameras=cameras, obs_pool=2,
        obs_samples=samples,
    )
    render = pallas_kernel.make_render_batched(cfg, raster=True)
    lowered = _lower_tpu(lambda rg: render(scene, rg), _rigid(64))
    assert "tpu_custom_call" in lowered.as_text()

    rep = pallas_kernel.make_render_repeats(cfg, raster=True)

    def full(rigid, force):
        out, poses = step_repeats_pallas(scene, rigid, force, 5, 3)
        return out, rep(scene, poses)

    lowered = _lower_tpu(full, _rigid(1024), jnp.zeros((1024, 3)))
    assert lowered.as_text().count("tpu_custom_call") == 2


def test_raster_mxu_render_lowers_for_tpu():
    """The MXU w-plane matmul (tiny-K f32 dot inside the kernel) must
    survive the Mosaic front-end — layout/shape support for (6·TILE_E, 8) ×
    (8, width) dots is exactly what CPU interpret mode cannot check."""
    scene = scene_from_urdf_dir(default_asset_dir())
    cfg = CartpoleConfig(use_raw_pixels=True, num_cameras=2, obs_pool=2)
    render = pallas_kernel.make_render_batched(cfg, raster=True, mxu=True)
    lowered = _lower_tpu(lambda rg: render(scene, rg), _rigid(64))
    assert "tpu_custom_call" in lowered.as_text()

    rep = pallas_kernel.make_render_repeats(cfg, raster=True, mxu=True)

    def full(rigid, force):
        out, poses = step_repeats_pallas(scene, rigid, force, 5, 3)
        return out, rep(scene, poses)

    lowered = _lower_tpu(full, _rigid(1024), jnp.zeros((1024, 3)))
    assert lowered.as_text().count("tpu_custom_call") == 2
