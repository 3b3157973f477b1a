"""On-chip render equivalence probe: Mosaic pallas raster vs slab vs XLA.

The round-5 2-cam samples=2 learning A/B flatlined under the pallas raster
backend while interpret mode is byte-exact vs the XLA raster — this probe
runs the REAL Mosaic kernels on the TPU over the same randomized states and
prints diff stats, separating "Mosaic miscompiles this config" from "the
recipe fails for another reason".  One JSON line per comparison.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.env import CartpoleConfig
from cartpoleplusplus_tpu.env import cartpole as cartpole_mod
from cartpoleplusplus_tpu.physics.bodies import RigidState
from cartpoleplusplus_tpu.render import make_observe_pixels
from cartpoleplusplus_tpu.render.pallas_kernel import make_render_batched


def _random_states(e=32, seed=0):
    rng = np.random.RandomState(seed)
    pos = np.zeros((e, 2, 3), np.float32)
    pos[:, 0, :2] = rng.uniform(-2.2, 2.2, (e, 2))
    pos[:, 0, 2] = rng.uniform(0.05, 0.3, e)
    pos[:, 1, :2] = rng.uniform(-2.2, 2.2, (e, 2))
    pos[:, 1, 2] = rng.uniform(0.1, 1.2, e)
    q = rng.normal(size=(e, 2, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return RigidState(pos=jnp.asarray(pos), quat=jnp.asarray(q),
                      vel=jnp.zeros((e, 2, 3)), ang=jnp.zeros((e, 2, 3)))


def main():
    # Production shape FIRST (the A/B cells ran tile_e=32 at 512 envs —
    # a Mosaic miscompile can be tile-size/batch dependent; the tile_e=8
    # E=32 sweep below measured byte-identical while the tile-32 learning
    # run flatlined).
    cfg5 = CartpoleConfig(
        use_raw_pixels=True, num_cameras=2, render_width=50,
        render_height=50, obs_pool=2, obs_samples=2,
    )
    scene5 = cartpole_mod.scene_for(cfg5)
    rigid5 = _random_states(e=512, seed=3)
    interp5 = jax.default_backend() == "cpu"
    ras5 = np.asarray(make_render_batched(
        cfg5, tile_e=32, recip=True, raster=True,
        interpret=interp5)(scene5, rigid5), np.int32)
    slab5 = np.asarray(make_render_batched(
        cfg5, tile_e=32, recip=True, raster=False,
        interpret=interp5)(scene5, rigid5), np.int32)
    d = np.abs(ras5 - slab5)
    per_env = (d.reshape(512, -1) > 2).mean(axis=1)
    print(json.dumps({
        "shape": "production tile_e=32 E=512 cfg5",
        "backend": jax.default_backend(),
        "mean": round(float(d.mean()), 4),
        "frac_gt2": round(float((d > 2).mean()), 6), "max": int(d.max()),
        "envs_gt1pct_off": int((per_env > 0.01).sum()),
        "ras_stats": [round(float(ras5.mean()), 2), int(ras5.min()),
                      int(ras5.max())],
        "slab_stats": [round(float(slab5.mean()), 2), int(slab5.min()),
                       int(slab5.max())],
    }), flush=True)

    for samples in (2, 1, 0):
        cfg = CartpoleConfig(
            use_raw_pixels=True, num_cameras=2, render_width=50,
            render_height=50, obs_pool=2, obs_samples=samples,
        )
        scene = cartpole_mod.scene_for(cfg)
        rigid = _random_states(e=32, seed=2)
        out = {"backend": jax.default_backend()}
        interp = jax.default_backend() == "cpu"  # Mosaic needs real TPU
        ras = np.asarray(
            make_render_batched(cfg, tile_e=8, raster=True,
                                interpret=interp)(scene, rigid), np.int32)
        slab = np.asarray(
            make_render_batched(cfg, tile_e=8, raster=False,
                                interpret=interp)(scene, rigid), np.int32)
        xla = jax.vmap(
            lambda r: make_observe_pixels(cfg, dtype=jnp.float32,
                                          raster=True)(scene, r))(rigid)
        xla_u8 = np.clip(np.asarray(xla, np.float32) * 255.0 + 0.5,
                         0, 255).astype(np.int32)
        for name, a, b in (("ras_vs_slab", ras, slab),
                           ("ras_vs_xla", ras, xla_u8),
                           ("slab_vs_xla", slab, xla_u8)):
            d = np.abs(a - b)
            out[name] = {"mean": round(float(d.mean()), 4),
                         "frac_gt2": round(float((d > 2).mean()), 6),
                         "max": int(d.max())}
        out["ras_stats"] = [round(float(ras.mean()), 2), int(ras.min()),
                            int(ras.max())]
        out["slab_stats"] = [round(float(slab.mean()), 2), int(slab.min()),
                             int(slab.max())]
        print(json.dumps({"samples": samples, **out}), flush=True)


if __name__ == "__main__":
    main()
