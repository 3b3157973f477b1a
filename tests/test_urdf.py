"""URDF reader: asset files reproduce the canonical scene constants."""

import numpy as np

from cartpoleplusplus_tpu.physics.bodies import make_scene
from cartpoleplusplus_tpu.physics.urdf import (
    default_asset_dir,
    parse_urdf,
    scene_from_urdf_dir,
)


def test_parse_cart_urdf():
    import os

    body = parse_urdf(os.path.join(default_asset_dir(), "cart.urdf"))
    assert body.mass == 10.0
    assert body.half_extents == (0.25, 0.25, 0.1)
    assert body.mu == 0.05
    assert body.top_mu == 0.8


def test_scene_from_urdf_matches_defaults():
    urdf_scene = scene_from_urdf_dir(default_asset_dir())
    default = make_scene()
    for field in (
        "cart_half_extents", "pole_half_extents", "mass", "inv_mass",
        "inv_inertia_body", "friction_cart_ground", "friction_pole_cart",
        "friction_pole_ground", "dt", "gravity",
    ):
        np.testing.assert_allclose(
            getattr(urdf_scene, field), getattr(default, field),
            err_msg=field, rtol=1e-6,
        )


def test_overrides_pass_through():
    scene = scene_from_urdf_dir(default_asset_dir(), dt=1.0 / 120.0)
    assert abs(float(scene.dt) - 1.0 / 120.0) < 1e-8
