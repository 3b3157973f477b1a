"""Render-kernel roofline: is the 10M steps/s north star reachable?

VERDICT r2 "Missing #1": the repo asserted the renderer is VPU-op-bound from
one null result but never checked in a roofline.  This script produces it:

  1. --vpu      measure the chip's ACHIEVABLE VPU element-op rate with
                synthetic Mosaic kernels over several op mixes (fma, a
                cascade-like mul/add/cmp/select mix, bf16, reciprocal);
  2. --census   count the render pipeline's VPU ops per shaded ray by
                tracing the exact per-ray math to a jaxpr and summing
                element-weighted equation outputs (no hand counting);
  3. --ceiling  combine 1+2 into feasible env-steps/s/chip ceilings per obs
                config (cams x obs-samples), plus measured kernel time ->
                achieved efficiency vs the synthetic bound;
  4. --cull     static ray-culling feasibility: the conservative reachable
                volume of cart+pole vs each camera's static ray grid -> the
                fraction of rays that can NEVER see a box (candidates for
                skipping both OBB cascades).

Run on the TPU for 1+3; 2 and 4 are host-side.  Results are checked into
BASELINE.md ("Round 3: roofline").
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------- VPU rate --
def _time_call(fn, *args, reps=5):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)[:1, :1]))  # sync via scalar fetch
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)[:1, :1]))
        best = min(best, time.perf_counter() - t0)
    return best


def measure_vpu(iters=60000, shape=(512, 1280)):
    """Synthetic Mosaic kernels: elementwise op chains on a VMEM block.

    Returns {mix_name: (ops_per_el_per_iter, achieved_el_ops_per_sec)}.
    The 'mix' kernel mirrors the cascade's op distribution (mul/add/compare/
    select roughly 2:1:1:1) - the honest peak for THIS workload, not an fma
    marketing number.

    Tunnel-latency-robust: each mix is timed at N and 2N loop iterations and
    the rate comes from the DIFFERENCE, cancelling the constant per-call
    overhead (enqueue + scalar fetch through the axon tunnel measured ~30 ms,
    which swamps any single sub-100ms kernel).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    el = shape[0] * shape[1]
    results = {}

    def build(body, ops_per_iter, dtype=jnp.float32, n_iters=iters):
        def make(n):
            def kernel(x_ref, o_ref):
                x = x_ref[:]
                x = jax.lax.fori_loop(0, n, lambda i, v: body(v), x)
                o_ref[:] = x

            @jax.jit
            def run(x):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct(shape, dtype),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(x)

            return run

        x = jnp.full(shape, 1.001, dtype)
        # Differential timing cancels launch/enqueue overhead, but a jitter
        # spike can make the 2N run no slower than the N run — retry rather
        # than divide by a clamped epsilon and report an absurd rate.
        for attempt in range(4):
            t1 = _time_call(make(n_iters), x)
            t2 = _time_call(make(2 * n_iters), x)
            if t2 - t1 > 0.2 * t1:
                break
            print(f"#   non-positive/noisy delta (t1={t1:.4f}s t2={t2:.4f}s),"
                  f" retry {attempt + 1}", file=sys.stderr)
        else:
            raise RuntimeError(
                f"VPU timing never stabilized (t1={t1:.4f}s t2={t2:.4f}s)"
            )
        rate = ops_per_iter * n_iters * el / (t2 - t1)
        return ops_per_iter, rate

    # 2 ops/el/iter: the classic fma chain.
    results["fma_f32"] = build(lambda v: v * 1.0000001 + 1e-7, 2)
    results["fma_bf16"] = build(
        lambda v: v * jnp.bfloat16(1.001) + jnp.bfloat16(1e-3),
        2, dtype=jnp.bfloat16,
    )

    # Cascade-like mix: mul, add, cmp, select, max  (5 ops/el/iter).
    def mix(v):
        a = v * 1.0000001
        b = v + 1e-7
        m = b > a
        v = jnp.where(m, a, b)
        return jnp.maximum(v, 0.5)

    results["mix_f32"] = build(mix, 5)

    def mix_bf16(v):
        a = v * jnp.bfloat16(1.001)
        b = v + jnp.bfloat16(1e-3)
        m = b > a
        v = jnp.where(m, a, b)
        return jnp.maximum(v, jnp.bfloat16(0.5))

    try:
        results["mix_bf16"] = build(mix_bf16, 5, dtype=jnp.bfloat16)
    except Exception as e:  # Mosaic rejects some bf16 compares
        results["mix_bf16"] = (5, float("nan"))
        print(f"  (mix_bf16 failed to compile: {type(e).__name__})")

    # Reciprocal cost: chain of approx reciprocals + fixup mul.
    def recip(v):
        r = pl.reciprocal(v, approx=True)
        return r * 1.0000001 + 1.0

    results["recip_f32"] = build(recip, 3)

    # Divide for comparison (what the ratio cascade avoids).
    results["div_f32"] = build(lambda v: 1.0000001 / v + 1.0, 3)
    return results


# ------------------------------------------------------------------ census --
def _per_ray_pipeline(variant: str, num_cams=1, p2=4, stride=640):
    """Build a traceable fn replicating the Pallas kernel's per-ray math for
    ONE env tile row, so the jaxpr op census is the kernel's, not a guess.

    variant:
      'current'     - what render/pallas_kernel.py ships (r2): eye carried as
                      full per-ray vector rows, ratio cascade, ground-depth
                      occlusion tests.
    variant:
      'current'     - r2 kernel (vector eye, ratio cascade, ground tests)
      'affine'      - r3 kernel: static scalar eye, screen-affine d_l, no
                      ground tests, ratio cascade
      'recip'       - r3 kernel with one-op approx reciprocal slab times
      'qraster'     - r3.5 projective inverse-depth rasterizer: all slab
                      bounds affine in screen coords (raycast._ray_obb_q)
      'qraster-mxu' - the VPU-RESIDENT remainder of the raster kernel when
                      --render-mxu moves the 18 routed bound planes onto
                      the MXU matmul: bounds arrive as inputs (rays rows
                      4-21), so the census counts only the cascades, hit
                      fold, shading, and epilogue the VPU still executes
    Returns fn(poses(16,), rays(R, W)) -> (3*stride,) colors.
    """
    known = ("current", "affine", "recip", "qraster", "qraster-mxu")
    if variant not in known:
        # No silent fallthrough: a typo'd variant must not census the
        # retired r2 pipeline and pass a CI pin against the wrong kernel.
        raise ValueError(f"unknown census variant {variant!r}; one of {known}")
    from cartpoleplusplus_tpu.render.raycast import (
        CART_COLOR, LIGHT_DIR, POLE_COLOR, SKY_COLOR, _AMBIENT,
        _obb_q_cast, _obb_q_setup, _ray_obb_affine, _ray_obb_q,
        _ray_obb_ratio,
    )

    W = p2 * stride
    che = (0.25, 0.25, 0.1)
    phe = (0.05, 0.05, 0.5)

    if variant == "qraster-mxu":
        basis = ((0.0, 0.9, -0.3), (1.0, 0.0, 0.0), (0.0, 0.3, 0.9))
        eye = (0.0, -2.4, 1.1)

        def fn(poses, rays):
            col = lambda j: poses[j : j + 1]
            cart_c = (col(0), col(1), col(2))
            cart_q = (col(3), col(4), col(5), col(6))
            pole_c = (col(7), col(8), col(9))
            pole_q = (col(10), col(11), col(12), col(13))
            px, py, gval, smask = rays[0], rays[1], rays[2], rays[3]
            f32 = jnp.float32

            su_c = _obb_q_setup(basis, eye, cart_c, cart_q, che, LIGHT_DIR)
            su_p = _obb_q_setup(basis, eye, pole_c, pole_q, phe, LIGHT_DIR)
            b = lambda i: rays[4 + i]
            b_c = ((b(0), b(1), b(2)), (b(3), b(4), b(5)), (b(6), b(7), b(8)))
            b_p = (
                (b(9), b(10), b(11)),
                (b(12), b(13), b(14)),
                (b(15), b(16), b(17)),
            )
            nc, lam_c, hit_c = _obb_q_cast(px, py, su_c, bounds=b_c)
            np_, lam_p, hit_p = _obb_q_cast(px, py, su_p, bounds=b_p)
            f_c = hit_c.astype(f32) * (nc >= np_).astype(f32)
            f_p = hit_p.astype(f32) * (1.0 - f_c)
            lambert = jnp.maximum(f_c * lam_c + (1.0 - f_c) * lam_p, 0.0)
            shade = _AMBIENT + (1.0 - _AMBIENT) * lambert
            bgm = 1.0 - f_c - f_p
            a, bb = f_c * shade, f_p * shade
            g, s = bgm * gval, bgm * smask

            def pool(f):
                acc = f[0:stride]
                for i in range(1, p2):
                    acc = acc + f[i * stride : (i + 1) * stride]
                return acc * (1.0 / p2)

            if p2 > 1:
                a, bb, g, s = pool(a), pool(bb), pool(g), pool(s)
            outs = []
            for k in range(3):
                color = (
                    CART_COLOR[k] * a + POLE_COLOR[k] * bb + g + SKY_COLOR[k] * s
                )
                outs.append(jnp.floor(jnp.clip(color * 255.0 + 0.5, 0.0, 255.0)))
            return jnp.concatenate(outs)

        return fn, W

    if variant in ("affine", "recip", "qraster"):
        basis = ((0.0, 0.9, -0.3), (1.0, 0.0, 0.0), (0.0, 0.3, 0.9))
        eye = (0.0, -2.4, 1.1)
        recip = (lambda v: 1.0 / v) if variant == "recip" else None

        def fn(poses, rays):
            col = lambda j: poses[j : j + 1]
            cart_c = (col(0), col(1), col(2))
            cart_q = (col(3), col(4), col(5), col(6))
            pole_c = (col(7), col(8), col(9))
            pole_q = (col(10), col(11), col(12), col(13))
            px, py, gval, smask = rays[0], rays[1], rays[2], rays[3]

            f32 = jnp.float32
            if variant == "qraster":
                nc, lam_c, hit_c = _ray_obb_q(
                    px, py, basis, eye, cart_c, cart_q, che, LIGHT_DIR)
                np_, lam_p, hit_p = _ray_obb_q(
                    px, py, basis, eye, pole_c, pole_q, phe, LIGHT_DIR)
                f_c = hit_c.astype(f32) * (nc >= np_).astype(f32)
            else:
                nc, dc, lam_c, hit_c = _ray_obb_affine(
                    px, py, basis, eye, cart_c, cart_q, che, LIGHT_DIR, recip)
                np_, dp, lam_p, hit_p = _ray_obb_affine(
                    px, py, basis, eye, pole_c, pole_q, phe, LIGHT_DIR, recip)
            if variant == "qraster":
                pass
            elif variant == "recip":
                f_c = hit_c.astype(f32) * (nc <= np_).astype(f32)
            else:
                f_c = hit_c.astype(f32) * (nc * dp <= np_ * dc).astype(f32)
            f_p = hit_p.astype(f32) * (1.0 - f_c)
            lambert = jnp.maximum(f_c * lam_c + (1.0 - f_c) * lam_p, 0.0)
            shade = _AMBIENT + (1.0 - _AMBIENT) * lambert
            bgm = 1.0 - f_c - f_p
            a, b = f_c * shade, f_p * shade
            g, s = bgm * gval, bgm * smask

            def pool(f):
                acc = f[0:stride]
                for i in range(1, p2):
                    acc = acc + f[i * stride : (i + 1) * stride]
                return acc * (1.0 / p2)

            if p2 > 1:
                a, b, g, s = pool(a), pool(b), pool(g), pool(s)
            outs = []
            for k in range(3):
                color = CART_COLOR[k] * a + POLE_COLOR[k] * b + g + SKY_COLOR[k] * s
                outs.append(jnp.floor(jnp.clip(color * 255.0 + 0.5, 0.0, 255.0)))
            return jnp.concatenate(outs)

        return fn, W

    def fn(poses, rays):
        one = jnp.ones((1,), jnp.float32)
        col = lambda j: poses[j : j + 1]
        cart_c = (col(0), col(1), col(2))
        cart_q = (col(3), col(4), col(5), col(6))
        pole_c = (col(7), col(8), col(9))
        pole_q = (col(10), col(11), col(12), col(13))
        row = lambda k: rays[k] * one
        d = (row(0), row(1), row(2))
        o = (row(3), row(4), row(5))
        gval, smask, t_g = row(6), row(7), row(8)

        nc, dc, lam_c, hit_c = _ray_obb_ratio(o, d, cart_c, cart_q, che, light=LIGHT_DIR)
        np_, dp, lam_p, hit_p = _ray_obb_ratio(o, d, pole_c, pole_q, phe, light=LIGHT_DIR)
        f32 = jnp.float32
        f_c = hit_c.astype(f32) * (nc < t_g * dc).astype(f32) * (nc * dp <= np_ * dc).astype(f32)
        f_p = hit_p.astype(f32) * (np_ < t_g * dp).astype(f32) * (1.0 - f_c)
        lambert = jnp.maximum(f_c * lam_c + (1.0 - f_c) * lam_p, 0.0)
        shade = _AMBIENT + (1.0 - _AMBIENT) * lambert
        bgm = 1.0 - f_c - f_p
        a = f_c * shade
        b = f_p * shade
        g = bgm * gval
        s = bgm * smask

        def pool(f):
            acc = f[0:stride]
            for i in range(1, p2):
                acc = acc + f[i * stride : (i + 1) * stride]
            return acc * (1.0 / p2)

        if p2 > 1:
            a, b, g, s = pool(a), pool(b), pool(g), pool(s)
        outs = []
        for k in range(3):
            color = CART_COLOR[k] * a + POLE_COLOR[k] * b + g + SKY_COLOR[k] * s
            outs.append(jnp.floor(jnp.clip(color * 255.0 + 0.5, 0.0, 255.0)))
        return jnp.concatenate(outs)

    return fn, W


def census(variant="current", p2=4, stride=640):
    """Element-weighted op count per shaded ray, from the traced jaxpr."""
    fn, W = _per_ray_pipeline(variant, p2=p2, stride=stride)
    rows = 22 if variant == "qraster-mxu" else 9
    jaxpr = jax.make_jaxpr(fn)(
        jnp.zeros((16,), jnp.float32), jnp.zeros((rows, W), jnp.float32)
    )

    total_el = 0
    by_prim: dict[str, float] = {}
    def walk(jx):
        nonlocal total_el
        for eqn in jx.eqns:
            subs = [
                v.jaxpr if hasattr(v, "jaxpr") else v
                for v in eqn.params.values()
                if hasattr(v, "eqns") or hasattr(v, "jaxpr")
            ]
            if subs:  # count the inner eqns only, not the call wrapper
                for sub in subs:
                    walk(sub)
                continue
            if eqn.primitive.name in ("broadcast_in_dim", "concatenate", "slice",
                                      "squeeze", "reshape"):
                continue  # layout ops, not VPU ALU work
            el = sum(int(np.prod(v.aval.shape)) for v in eqn.outvars)
            total_el += el
            by_prim[eqn.primitive.name] = by_prim.get(eqn.primitive.name, 0) + el / W
    walk(jaxpr.jaxpr)
    return total_el / W, dict(sorted(by_prim.items(), key=lambda kv: -kv[1]))


# -------------------------------------------------------------------- cull --
def cull_feasibility(margin_xy=0.4, margin_tilt=0.4, verbose=True):
    """Fraction of static rays that can NEVER hit the cart/pole reachable set.

    Conservative reachable volumes (see BASELINE.md round-3 notes):
      - termination checks the POLE pose: |x|,|y| <= pos_threshold (2.0),
        tilt <= angle_threshold (0.3 rad) - but the TERMINAL frame is still
        rendered, so the volume must cover one further step of motion:
        margin_xy on position, margin_tilt on tilt.
      - cart region: |xy| <= pos'+diag, z in [0, 2*hz+pop]
      - pole region: |xy| <= pos'+reach,  z in [0, top]
    A ray is CULLABLE iff its segment from the eye to its ground hit (or to
    infinity above the horizon) misses both AABBs.
    """
    from cartpoleplusplus_tpu.env.config import CartpoleConfig
    from cartpoleplusplus_tpu.render.camera import DEFAULT_CAMERAS, ray_grid

    cfg = CartpoleConfig(use_raw_pixels=True, num_cameras=2)
    pos = cfg.pos_threshold + margin_xy
    tilt = cfg.angle_threshold + margin_tilt
    che = np.array([0.25, 0.25, 0.1])
    phe = np.array([0.05, 0.05, 0.5])
    cart_diag = float(np.hypot(che[0], che[1]))  # yawed cart corner reach
    pole_reach = float(phe[2] * math.sin(tilt) + phe[0])
    regions = [
        # (xy half-extent, zlo, zhi)
        (pos + cart_diag, 0.0, 2 * che[2] + 0.15),            # cart (+hop)
        (pos + pole_reach, 0.0, 2 * che[2] + 2 * phe[2] * math.cos(0.0) + 0.15),  # pole
    ]

    out = {}
    for ci, cam in enumerate(DEFAULT_CAMERAS):
        dirs, eye = ray_grid(cam, cfg.render_height, cfg.render_width)
        d = dirs  # (P, 3)
        with np.errstate(divide="ignore", invalid="ignore"):
            t_g = np.where(np.abs(d[:, 2]) > 1e-9, -eye[2] / d[:, 2], np.inf)
        t_g = np.where(t_g > 0, t_g, np.inf)  # ground occlusion bound

        can_hit = np.zeros(len(d), bool)
        for hxy, zlo, zhi in regions:
            lo = np.array([-hxy, -hxy, zlo])
            hi = np.array([hxy, hxy, zhi])
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = 1.0 / d
            a = (lo[None] - eye[None]) * inv
            b = (hi[None] - eye[None]) * inv
            tmin = np.nanmax(np.minimum(a, b), axis=1)
            tmax = np.nanmin(np.maximum(a, b), axis=1)
            hit = (tmax >= np.maximum(tmin, 0.0)) & (np.maximum(tmin, 0.0) <= t_g)
            can_hit |= hit
        frac_cull = 1.0 - can_hit.mean()
        inside = all(
            abs(eye[0]) <= r[0] and abs(eye[1]) <= r[0] and r[1] <= eye[2] <= r[2]
            for r in regions[1:]
        )
        out[f"cam{ci}"] = frac_cull
        if verbose:
            print(f"  cam{ci} eye={tuple(round(float(v), 2) for v in eye)}: "
                  f"cullable rays = {frac_cull * 100:.1f}%"
                  f"{'  (eye INSIDE pole reachable volume)' if inside else ''}")
    return out


def cull_dynamic(num_envs=256, steps=200, pool=2, verbose=True):
    """Feasibility of DYNAMIC per-band culling (VERDICT r3 candidate lever).

    The kernel processes (TILE_E, 128-lane band) blocks; a block could skip
    both OBB cascades iff NO env in the tile projects a box into the band's
    pooled rows.  This measures that fraction over REALISTIC states — a
    random-policy rollout with auto-reset (the same state distribution the
    bench sees) — for several tile heights.  The verdict drives whether the
    Mosaic implementation is worth building: the skip is all-or-nothing per
    (tile × band), so the UNION of 8-32 envs' screen extents must leave
    whole bands empty to pay.
    """
    import jax as _jax

    from cartpoleplusplus_tpu.agents import common as agents_common
    from cartpoleplusplus_tpu.env.config import CartpoleConfig
    from cartpoleplusplus_tpu.render.camera import DEFAULT_CAMERAS

    cfg = CartpoleConfig(use_raw_pixels=False, discrete_actions=False)
    venv = agents_common.make_venv(cfg, num_envs)
    rng = _jax.random.PRNGKey(0)
    states, obs = venv.reset(rng)
    reset_pool = (states, obs)

    h = w = 50
    n_rows_pooled = h // pool
    rows_per_band = 128 / (w // pool)  # lanes per band / pooled row width

    che = np.array([0.25, 0.25, 0.1])
    phe = np.array([0.05, 0.05, 0.5])
    signs = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32,
    )  # (8, 3)

    def q_to_mat(q):
        # (E, 4) WXYZ → (E, 3, 3); the repo stores quats wxyz everywhere
        # (physics/soa.q_to_mat, event_log 'quat wxyz').  An earlier xyzw
        # unpack here misrotated every box and corrupted the published
        # cullable-fraction numbers (re-measured below after the fix).
        w_, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        return np.stack([
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w_), 2 * (x * z + y * w_)], -1),
            np.stack([2 * (x * y + z * w_), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w_)], -1),
            np.stack([2 * (x * z - y * w_), 2 * (y * z + x * w_), 1 - 2 * (x * x + y * y)], -1),
        ], 1)

    def row_range(rigid, cam):
        eye = np.asarray(cam.eye, np.float32)
        target = np.asarray(cam.target, np.float32)
        up = np.asarray(cam.up, np.float32)
        fwd = target - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        cup = np.cross(right, fwd)
        tan_half = math.tan(math.radians(cam.fov_deg) * 0.5)

        lo = np.full(rigid.pos.shape[0], np.inf)
        hi = np.full(rigid.pos.shape[0], -np.inf)
        for b, he in ((0, che), (1, phe)):
            c = np.asarray(rigid.pos[:, b])  # (E, 3)
            r = q_to_mat(np.asarray(rigid.quat[:, b]))  # (E, 3, 3)
            corners = c[:, None, :] + np.einsum(
                "eij,kj->eki", r, signs * he[None]
            )  # (E, 8, 3)
            rel = corners - eye[None, None]
            zf = rel @ fwd
            behind = zf <= 1e-3  # corner behind the camera → whole rows
            py = (rel @ cup) / np.maximum(zf, 1e-3)
            i = (1.0 - py / tan_half) * 0.5 * h - 0.5  # pixel row
            i = np.where(behind, np.where(py >= 0, 0.0, h - 1.0), i)
            lo = np.minimum(lo, i.min(1))
            hi = np.maximum(hi, i.max(1))
        # margin 1 px then pooled rows
        lo = np.clip(np.floor((lo - 1) / pool), 0, n_rows_pooled - 1)
        hi = np.clip(np.ceil((hi + 1) / pool), 0, n_rows_pooled - 1)
        return lo, hi

    step = _jax.jit(lambda s, a: venv.step_lazy(s, a, reset_pool))
    rng_a = _jax.random.PRNGKey(1)
    samples = {t: [] for t in (8, 16, 32)}
    n_bands = int(math.ceil(n_rows_pooled / rows_per_band))
    for t_step in range(steps):
        rng_a, k = _jax.random.split(rng_a)
        a = _jax.random.uniform(k, (num_envs, 2), minval=-1.0, maxval=1.0)
        states, obs, rew, done = step(states, a)
        if t_step % 5:
            continue
        for cam in DEFAULT_CAMERAS:
            lo, hi = row_range(states.rigid, cam)
            for tile in samples:
                l = lo.reshape(-1, tile).min(1)  # union per tile
                h_ = hi.reshape(-1, tile).max(1)
                # fraction of bands fully outside [l, h_]
                empty = 0
                for b in range(n_bands):
                    b_lo, b_hi = b * rows_per_band, (b + 1) * rows_per_band - 1
                    empty += ((h_ < b_lo) | (l > b_hi)).mean()
                samples[tile].append(empty / n_bands)
    out = {t: float(np.mean(v)) for t, v in samples.items()}
    if verbose:
        for t, frac in out.items():
            print(f"  tile_e={t:<3} cullable (tile × 128-lane band) blocks = "
                  f"{frac * 100:.1f}%  (random-policy rollout, both cameras)")
    return out


# ---------------------------------------------------------------- ceilings --
def ceilings(vpu, ops_per_ray, repeats=3, pool=2, hw=50):
    """Feasible env steps/s/chip per obs config at the measured mix rate."""
    rate = vpu["mix_f32"][1]
    n_pooled = (hw // pool) ** 2
    rows = []
    for cams in (1, 2):
        for samples, label in ((pool * pool, "exact"), (2, "samples=2"), (1, "samples=1")):
            rays = cams * repeats * n_pooled * samples
            ceil = rate / (rays * ops_per_ray)
            rows.append((cams, label, rays, ceil))
    return rate, rows


def physics_census(num_envs=256, iterations=None):
    """Element-weighted op count per env SUBSTEP of soa._substep (the shared
    body of all three physics paths), from the traced jaxpr — the physics
    analogue of :func:`census`.  Loop bodies (the Jacobi fori_loop lowers to
    a length-N scan) are weighted by their trip count.  The low-dim fused
    loop runs action_repeats × steps_per_repeat = 15 substeps per env step,
    so its physics-only ceiling is  rate / (15 · ops).  History (trip-
    weighted): round-2 general 16-slot solver 10784 ops; round-3 slot-group
    specialization + shared-rotation-matrix manifold (soa.py section-2
    comment) 6780.  Round-2's measured 8.46M lowdim loop = 86% of the
    10784-op ceiling at the 1.59 Tops/s cascade-mix rate — the physics
    kernel exploits ILP beyond the dependent-fma-chain rate."""
    from cartpoleplusplus_tpu.env import cartpole as cp
    from cartpoleplusplus_tpu.env.config import CartpoleConfig
    from cartpoleplusplus_tpu.physics import soa
    from cartpoleplusplus_tpu.physics.bodies import RigidState

    scene = cp.scene_for(CartpoleConfig(discrete_actions=False))
    if iterations is not None:  # --solver-iters sensitivity (round 4)
        scene = scene.replace(solver_iterations=iterations)
    E = num_envs
    rig = RigidState(
        pos=jnp.zeros((E, 2, 3)),
        quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (E, 2, 1)),
        vel=jnp.zeros((E, 2, 3)),
        ang=jnp.zeros((E, 2, 3)),
    )
    st = soa.from_rigid(rig)
    jaxpr = jax.make_jaxpr(lambda s, f: soa._substep(scene, s, f))(
        st, jnp.zeros((3, E))
    )
    total = 0
    by_prim: dict[str, float] = {}

    def walk(jx, mult):
        nonlocal total
        for eqn in jx.eqns:
            length = eqn.params.get("length", 1) if eqn.primitive.name == "scan" else 1
            subs = [
                v.jaxpr if hasattr(v, "jaxpr") else v
                for v in eqn.params.values()
                if hasattr(v, "eqns") or hasattr(v, "jaxpr")
            ]
            if subs:
                for sub in subs:
                    walk(sub, mult * length)
                continue
            if eqn.primitive.name in ("broadcast_in_dim", "concatenate",
                                      "slice", "squeeze", "reshape"):
                continue
            el = mult * sum(int(np.prod(v.aval.shape)) for v in eqn.outvars)
            total += el
            by_prim[eqn.primitive.name] = by_prim.get(eqn.primitive.name, 0) + el / E

    walk(jaxpr.jaxpr, 1)
    return total / E, dict(sorted(by_prim.items(), key=lambda kv: -kv[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vpu", action="store_true")
    p.add_argument("--census", action="store_true")
    p.add_argument("--physics-census", action="store_true")
    p.add_argument("--cull", action="store_true")
    p.add_argument("--cull-dynamic", action="store_true")
    p.add_argument("--ceiling", action="store_true")
    opts = p.parse_args()
    run_all = not (opts.vpu or opts.census or opts.cull or opts.cull_dynamic
                   or opts.ceiling or opts.physics_census)

    vpu = None
    if opts.vpu or opts.ceiling or run_all:
        print(f"== VPU achievable rate (backend={jax.default_backend()}) ==")
        vpu = measure_vpu()
        for name, (ops, rate) in vpu.items():
            print(f"  {name:<10} {rate / 1e12:6.2f} Tops/s  ({ops} ops/el/iter)")

    ops_per_ray = None
    if opts.census or opts.ceiling or run_all:
        print("== per-ray op census (traced jaxpr, element-weighted) ==")
        for variant in ("current", "affine", "recip", "qraster", "qraster-mxu"):
            ops, prims = census(variant)
            if variant == "qraster":  # the production/bench default kernel
                ops_per_ray = ops
            top = ", ".join(f"{k}={v:.0f}" for k, v in list(prims.items())[:6])
            print(f"  {variant:<11} {ops:6.1f} VPU ops/shaded ray   ({top})")

    if opts.physics_census or run_all:
        print("== physics op census (soa._substep, element-weighted) ==")
        ops, prims = physics_census()
        top = ", ".join(f"{k}={v:.0f}" for k, v in list(prims.items())[:6])
        print(f"  {ops:6.1f} VPU ops/env substep   ({top})")
        for name, rate in (("fma-chain f32", 0.81e12), ("mix f32", 1.59e12)):
            print(f"  low-dim physics-only ceiling at {name}: "
                  f"{rate / (15 * ops) / 1e6:6.2f} M env steps/s/chip "
                  f"(15 substeps/env step)")
        print("  (measured r2: 8.46M = 86% of the mix-rate ceiling at the "
              "then-10784-op census — ILP beats the dependent-chain rate)")

    if opts.cull or run_all:
        print("== static cull feasibility (conservative reachable volume) ==")
        cull_feasibility()

    if opts.cull_dynamic or run_all:
        print("== dynamic per-band cull feasibility (rollout states) ==")
        cull_dynamic()

    if (opts.ceiling or run_all) and vpu is not None and ops_per_ray is not None:
        rate, rows = ceilings(vpu, ops_per_ray)
        print(f"== render-only ceilings at mix rate {rate / 1e12:.2f} Tops/s, "
              f"{ops_per_ray:.0f} ops/ray ==")
        for cams, label, rays, ceil in rows:
            print(f"  {cams} cam {label:<10} {rays:>6} rays/env-step  "
                  f"ceiling {ceil / 1e6:6.2f} M env steps/s/chip")
        print("  (full-loop ceiling = 1 / (1/render_ceiling + physics+learner"
              "+bookkeeping time); see BASELINE.md stage table)")


if __name__ == "__main__":
    main()
