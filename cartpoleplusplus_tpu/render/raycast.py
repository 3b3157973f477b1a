"""Branchless ray-cast renderer for the cartpole++ scene (pure XLA, SoA).

TPU-native replacement for Bullet's TinyRenderer software rasterizer behind
``p.getCameraImage`` (reference: bullet_cartpole.py:~L120-150; SURVEY.md §2.2
native-component table).  Rather than translating a triangle rasterizer, the
scene's tiny analytic geometry (2 oriented boxes + ground plane) makes
per-pixel ray casting the idiomatic TPU design: every pixel is independent
VPU work, there is no z-buffer ordering, and everything is `where`-masked.

Layout notes (the part that actually sets the speed): every vector quantity
is a COMPONENT TUPLE of (P,) pixel arrays — never a (P, 3) array.  TPU tiling
pads the trailing two dims of materialized arrays to (8, 128), so (P, 3)
intermediates run on 3 of 128 VPU lanes and cost ~40× the HBM traffic
(measured ~16 ms/frame at 4096 envs vs ~1 ms in component form).  For the
same reason a rendered frame is returned FLAT and plane-major:
``(3·P,)`` = [R plane | G plane | B plane] per camera, cameras concatenated.
Use ``frame_to_images`` for host-side viewing.

Shading: one directional light + ambient, Lambert on the hit normal, distinct
albedo per body (ground checker, blue cart, red pole), sky background.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cartpoleplusplus_tpu.physics import soa
from cartpoleplusplus_tpu.physics.bodies import CART, POLE, RigidState, SceneParams
from cartpoleplusplus_tpu.render.camera import DEFAULT_CAMERAS, Camera, ray_grid

_BIG = 1e9

# Albedos (RGB) — chosen for contrast; the reference's exact URDF colors are
# unrecoverable (empty mount).
GROUND_A = (0.82, 0.82, 0.82)
GROUND_B = (0.62, 0.62, 0.62)
CART_COLOR = (0.15, 0.35, 0.9)
POLE_COLOR = (0.9, 0.15, 0.15)
SKY_COLOR = (0.7, 0.85, 1.0)

_L = np.array([0.45, 0.3, 0.84])
_L = _L / np.linalg.norm(_L)
LIGHT_DIR = (float(_L[0]), float(_L[1]), float(_L[2]))
_AMBIENT = 0.35


def _ray_box(origin_l, dir_l, half_extents):
    """Slab-test ray vs axis-aligned box, component form.

    origin_l / dir_l: component tuples (arrays broadcastable to (P,));
    half_extents: (3,) python/numpy floats.  Returns (t_hit, normal_l tuple,
    hit mask); t_hit = _BIG where missed.  Branchless.
    """
    t_lo, t_hi = [], []
    for k in range(3):
        inv = jnp.where(jnp.abs(dir_l[k]) > 1e-9, 1.0 / dir_l[k], _BIG)
        a = (-float(half_extents[k]) - origin_l[k]) * inv
        b = (float(half_extents[k]) - origin_l[k]) * inv
        t_lo.append(jnp.minimum(a, b))
        t_hi.append(jnp.maximum(a, b))
    tmin = jnp.maximum(jnp.maximum(t_lo[0], t_lo[1]), t_lo[2])
    tmax = jnp.minimum(jnp.minimum(t_hi[0], t_hi[1]), t_hi[2])
    hit = (tmax >= tmin) & (tmax > 0.0)
    t_hit = jnp.where(hit & (tmin > 0.0), tmin, jnp.where(hit, tmax, _BIG))
    # Normal = axis of the slab that produced tmin, signed against the ray.
    n = tuple(
        jnp.where(t_lo[k] == tmin, -jnp.sign(dir_l[k]), 0.0) for k in range(3)
    )
    norm = jnp.sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
    inv = 1.0 / jnp.maximum(norm, 1e-9)
    return t_hit, (n[0] * inv, n[1] * inv, n[2] * inv), hit


def _ray_obb(origin, direction, center, quat, half_extents):
    """Ray vs oriented box: rotate into the box frame, slab-test.

    ``origin``/``center``: component tuples of scalars (per-env);
    ``direction``: component tuple of (P,) arrays; ``quat``: 4-tuple scalars.
    """
    rel = (origin[0] - center[0], origin[1] - center[1], origin[2] - center[2])
    origin_l = soa.q_rotate_inv(quat, rel)
    dir_l = soa.q_rotate_inv(quat, direction)
    t, normal_l, hit = _ray_box(origin_l, dir_l, half_extents)
    normal_w = soa.q_rotate(quat, normal_l)
    return t, normal_w, hit


def _ray_obb_ratio(origin, direction, center, quat, half_extents, light=None):
    """Division-free ray vs oriented box → (num, den, shade_or_normal, hit).

    Same geometry as :func:`_ray_obb` but the hit depth is returned as a
    RATIO ``num/den`` with ``den > 0`` and no division is performed: slab
    entry/exit times are fractions ``n_k / p_k`` with ``p_k = |dir_l_k| > 0``,
    and max/min over slabs + the hit test are evaluated by cross-multiplying.
    Rationale: the renderer is VPU-compute-bound (BASELINE.md) and divisions
    are multi-op sequences on the VPU — 6 divides + a normalize (rsqrt+mul)
    per ray/box dominated the per-pixel cost.  Depth comparisons across
    objects stay division-free too: ``n1/d1 < n2/d2 ⟺ n1·d2 < n2·d1``.

    The world normal comes out of the same slab argmax cascade by selecting
    the (exactly unit-length) rotation-matrix column of the winning axis —
    no normalization needed.  Misses return ``(BIG, 1, …, False)``.

    ``light``: optional (3,) static direction.  When given, the third return
    value is the scalar LAMBERT value n·L instead of the normal tuple: the
    per-axis candidate is ``∓(L · R_col_k)`` — a per-env SCALAR times the
    per-pixel sign — so the cascade carries one plane instead of three and
    the final dot product disappears (the renderer is op-bound; this trims
    ~25 VPU ops/ray/box).
    """
    # Box→world rotation once per env (scalars); per-pixel work is only the
    # local-frame direction (9 mul + 6 add) and the slab cascade.
    r = soa.q_to_mat(quat)
    rel = (origin[0] - center[0], origin[1] - center[1], origin[2] - center[2])
    # Rᵀ · rel (per-env scalars) and Rᵀ · d (per-pixel).
    o_l = tuple(
        r[0][k] * rel[0] + r[1][k] * rel[1] + r[2][k] * rel[2] for k in range(3)
    )
    d_l = tuple(
        r[0][k] * direction[0] + r[1][k] * direction[1] + r[2][k] * direction[2]
        for k in range(3)
    )

    one = jnp.ones_like(d_l[0])
    # Per-slab positive denominator p_k and entry/exit numerators: with
    # s = sign(d_k), t_lo = (-he - s·o)/|d|, t_hi = (he - s·o)/|d|.  The
    # sign is arithmetic (Mosaic-safe) and |d| is clamped so parallel rays
    # degrade to ±huge slab times exactly like the dividing slab test.
    s = tuple(2.0 * (d_l[k] >= 0.0).astype(d_l[0].dtype) - 1.0 for k in range(3))
    p = tuple(jnp.maximum(s[k] * d_l[k], 1e-9) for k in range(3))
    so = tuple(s[k] * o_l[k] for k in range(3))
    n_lo = tuple(-float(half_extents[k]) - so[k] for k in range(3))
    n_hi = tuple(float(half_extents[k]) - so[k] for k in range(3))
    if light is None:
        # Candidate world normals per slab axis: ∓R column k (unit length).
        cand = tuple(tuple(-s[k] * r[i][k] for i in range(3)) for k in range(3))
    else:
        # Per-axis Lambert: ∓(L · R column k); the dot is a per-env scalar.
        ldot = tuple(
            light[0] * r[0][k] + light[1] * r[1][k] + light[2] * r[2][k]
            for k in range(3)
        )
        cand = tuple((-s[k] * ldot[k],) for k in range(3))

    # tmin = max_k n_lo_k / p_k via cross-multiplied cascade, carrying the
    # winning axis' shade (or normal components) along.
    n, pd = n_lo[0], p[0]
    carry = list(cand[0])
    for k in (1, 2):
        take = n_lo[k] * pd > n * p[k]
        n = jnp.where(take, n_lo[k], n)
        carry = [jnp.where(take, ck, c) for ck, c in zip(cand[k], carry)]
        pd = jnp.where(take, p[k], pd)

    # tmax = min_k n_hi_k / p_k.
    m, q = n_hi[0], p[0]
    for k in (1, 2):
        take = n_hi[k] * q < m * p[k]
        m = jnp.where(take, n_hi[k], m)
        q = jnp.where(take, p[k], q)

    hit = (m * pd >= n * q) & (m > 0.0)
    # Depth ratio: tmin when the origin is outside (tmin > 0 ⟺ n > 0),
    # else tmax (matches _ray_box's inside-the-box behavior).
    inside = n <= 0.0
    num = jnp.where(hit, jnp.where(inside, m, n), _BIG)
    den = jnp.where(hit, jnp.where(inside, q, pd), one)
    out = carry[0] if light is not None else tuple(carry)
    return num, den, out, hit


def _ray_obb_affine(
    px, py, basis, eye, center, quat, half_extents, light, recip=None
):
    """Screen-affine ray vs oriented box → ``(num, den, lambert, hit)``.

    The round-3 op diet of :func:`_ray_obb_ratio` (see BASELINE.md roofline):
    per-ray work drops ~25% by exploiting two structural facts the r2 kernel
    ignored —

    1. **The camera eye is static.**  ``eye`` is a float 3-tuple, so the
       box-local origin ``o_l`` and every slab numerator offset are per-env
       SCALARS (columns), not per-ray vectors.  The r2 Mosaic kernel carried
       the eye as three (1, W) rows and paid ~27 vector ops/box for algebra
       that never varied across rays.
    2. **Ray directions are affine in screen coords.**  ``d = fwd + px·right
       + py·up`` (UNNORMALIZED — every comparison in the pipeline is a ratio,
       so the |d| scale cancels), hence the box-frame direction is
       ``d_l_k = A_k + B_k·px + C_k·py`` with per-env scalar A/B/C: 4 vector
       ops/axis instead of 5, and only two static rows (px, py) instead of
       three normalized direction rows.

    ``basis``: static float triples ``(fwd, right, up)`` of the camera.
    ``center``/``quat``: per-env scalars or (E, 1) columns.
    ``light``: static (3,) direction; the third return is the Lambert value
    n·L of the entry face (see :func:`_ray_obb_ratio`).

    ``recip``: optional fast-reciprocal callable (``pl.reciprocal`` in Mosaic,
    ``lambda v: 1.0 / v`` under XLA).  When given, slab times are computed
    DIRECTLY as ``t = num · (1/d_l)`` — cheaper than the cross-multiplied
    cascade when the backend has a one-op approximate reciprocal — and the
    return is ``(t, one, lambert, hit)`` so callers can compare depths
    without cross-multiplying.  Misses return ``t=BIG``.

    Ground-plane occlusion tests are the caller's job; in this scene they are
    unnecessary (both boxes live above z=0 and a ray's height is monotonic in
    t, so a hit box ALWAYS occludes the ray's ground point — penetration
    deeper than the solver's ~1e-4 slop never happens).
    """
    fwd, right, up = basis
    r = soa.q_to_mat(quat)
    rel = tuple(eye[i] - center[i] for i in range(3))
    # Per-env scalar algebra: box-local origin + affine direction coeffs.
    o_l = tuple(
        r[0][k] * rel[0] + r[1][k] * rel[1] + r[2][k] * rel[2] for k in range(3)
    )
    A = tuple(
        r[0][k] * fwd[0] + r[1][k] * fwd[1] + r[2][k] * fwd[2] for k in range(3)
    )
    B = tuple(
        r[0][k] * right[0] + r[1][k] * right[1] + r[2][k] * right[2]
        for k in range(3)
    )
    C = tuple(
        r[0][k] * up[0] + r[1][k] * up[1] + r[2][k] * up[2] for k in range(3)
    )
    ldot = tuple(
        light[0] * r[0][k] + light[1] * r[1][k] + light[2] * r[2][k]
        for k in range(3)
    )
    # Per-ray vector work starts here.
    d_l = tuple(A[k] + B[k] * px + C[k] * py for k in range(3))
    one = jnp.ones_like(d_l[0])

    if recip is not None:
        t_lo, t_hi, cand = [], [], []
        for k in range(3):
            # Arithmetic sign (Mosaic-safe: no select between scalar splats),
            # sign-preserving nudge away from 0, then one-op reciprocal.
            s = 2.0 * (d_l[k] >= 0.0).astype(d_l[0].dtype) - 1.0
            inv = recip(d_l[k] + s * 1e-9)
            a = (-float(half_extents[k]) - o_l[k]) * inv
            b = (float(half_extents[k]) - o_l[k]) * inv
            t_lo.append(jnp.minimum(a, b))
            t_hi.append(jnp.maximum(a, b))
            cand.append(-s * ldot[k])
        tmin, lam = t_lo[0], cand[0]
        for k in (1, 2):
            take = t_lo[k] > tmin
            tmin = jnp.maximum(tmin, t_lo[k])
            lam = jnp.where(take, cand[k], lam)
        tmax = jnp.minimum(jnp.minimum(t_hi[0], t_hi[1]), t_hi[2])
        hit = (tmax >= tmin) & (tmax > 0.0)
        t = jnp.where(tmin > 0.0, tmin, tmax)
        t = jnp.where(hit, t, _BIG)
        return t, one, lam, hit

    # Division-free ratio cascade (same algebra as _ray_obb_ratio, but with
    # scalar o_l the slab numerators are scalar-times-vector).
    s = tuple(2.0 * (d_l[k] >= 0.0).astype(d_l[0].dtype) - 1.0 for k in range(3))
    p = tuple(jnp.maximum(s[k] * d_l[k], 1e-9) for k in range(3))
    so = tuple(s[k] * o_l[k] for k in range(3))
    n_lo = tuple(-float(half_extents[k]) - so[k] for k in range(3))
    n_hi = tuple(float(half_extents[k]) - so[k] for k in range(3))
    cand = tuple(-s[k] * ldot[k] for k in range(3))

    n, pd = n_lo[0], p[0]
    lam = cand[0]
    for k in (1, 2):
        take = n_lo[k] * pd > n * p[k]
        n = jnp.where(take, n_lo[k], n)
        lam = jnp.where(take, cand[k], lam)
        pd = jnp.where(take, p[k], pd)
    m, q = n_hi[0], p[0]
    for k in (1, 2):
        take = n_hi[k] * q < m * p[k]
        m = jnp.where(take, n_hi[k], m)
        q = jnp.where(take, p[k], q)
    hit = (m * pd >= n * q) & (m > 0.0)
    inside = n <= 0.0
    num = jnp.where(hit, jnp.where(inside, m, n), _BIG)
    den = jnp.where(hit, jnp.where(inside, q, pd), one)
    return num, den, lam, hit


def _obb_q_setup(basis, eye, center, quat, half_extents, light):
    """Per-env scalar algebra of the projective rasterizer.

    Everything here is per-env (scalars under vmap, (E, 1) columns in
    Mosaic) — amortized over the camera's rays.  Returns the tuple
    ``(A, B, C, inv_u, inv_l, ahead, cand, inside)`` consumed by
    :func:`_obb_q_cast`; see :func:`_ray_obb_q` for the math.  Split out so
    the Pallas kernel can read the affine coefficients A/B/C and evaluate
    ``w = A + B·px + C·py`` for all six box axes as ONE MXU matmul
    (render/pallas_kernel.py ``mxu`` flag) while the VPU cascade consumes
    the planes — the affine evaluation is 24 of the 110 census ops/ray and
    the MXU is otherwise idle during rendering.
    """
    fwd, right, up = basis
    r = soa.q_to_mat(quat)
    rel = tuple(center[i] - eye[i] for i in range(3))
    dt = rel[0].dtype

    g = tuple(
        r[0][k] * rel[0] + r[1][k] * rel[1] + r[2][k] * rel[2] for k in range(3)
    )
    sg = tuple(2.0 * (g[k] >= 0.0).astype(dt) - 1.0 for k in range(3))
    ga = tuple(sg[k] * g[k] for k in range(3))
    lo = tuple(ga[k] - float(half_extents[k]) for k in range(3))
    hi = tuple(ga[k] + float(half_extents[k]) for k in range(3))
    # Sign-preserving clamp of L away from 0 (grazing poses); U ≥ he > 0.
    sl = tuple(2.0 * (lo[k] >= 0.0).astype(dt) - 1.0 for k in range(3))
    lo = tuple(sl[k] * jnp.maximum(sl[k] * lo[k], 1e-7) for k in range(3))
    inv_u = tuple(1.0 / hi[k] for k in range(3))
    inv_l = tuple(1.0 / lo[k] for k in range(3))
    ahead = tuple(lo[k] > 0.0 for k in range(3))  # near plane ahead of eye
    # û_k·(fwd/right/up) and the Lambert candidate −û_k·L, per env.
    A = tuple(
        sg[k] * (r[0][k] * fwd[0] + r[1][k] * fwd[1] + r[2][k] * fwd[2])
        for k in range(3)
    )
    B = tuple(
        sg[k] * (r[0][k] * right[0] + r[1][k] * right[1] + r[2][k] * right[2])
        for k in range(3)
    )
    C = tuple(
        sg[k] * (r[0][k] * up[0] + r[1][k] * up[1] + r[2][k] * up[2])
        for k in range(3)
    )
    cand = tuple(
        -sg[k] * (light[0] * r[0][k] + light[1] * r[1][k] + light[2] * r[2][k])
        for k in range(3)
    )
    inside = ~(ahead[0] | ahead[1] | ahead[2])  # eye inside the box
    return A, B, C, inv_u, inv_l, ahead, cand, inside


def _obb_q_cast(px, py, setup, bounds=None):
    """Per-ray vector work of the projective rasterizer.

    ``setup``: from :func:`_obb_q_setup`.  ``bounds``: optionally the
    pre-evaluated-and-routed bound planes ``(a, ub, lb)`` (each a 3-tuple) —
    every one is affine in (px, py, 1) with per-env coefficients (the
    routing selects fold into the coefficients: scale ``ahead·inv_l`` /
    ``(1−ahead)·inv_l`` on the screen columns, bias ``(1−ahead)·BIG`` /
    ``−ahead·BIG`` on the ones column), which is how the Pallas kernel's
    MXU matmul emits all 18 planes of both boxes in one dot.  Computed on
    the VPU when None.  Returns ``(q, lambert, hit)`` — see
    :func:`_ray_obb_q`.
    """
    A, B, C, inv_u, inv_l, ahead, cand, inside = setup
    if bounds is None:
        w = tuple(A[k] + B[k] * px + C[k] * py for k in range(3))
        a = tuple(w[k] * inv_u[k] for k in range(3))  # far plane: lower bound
        b = tuple(w[k] * inv_l[k] for k in range(3))  # near plane (routed)
        ub = tuple(jnp.where(ahead[k], b[k], _BIG) for k in range(3))
        lb = tuple(jnp.where(ahead[k], -_BIG, b[k]) for k in range(3))
    else:
        a, ub, lb = bounds

    q_lo = jnp.maximum(
        jnp.maximum(jnp.maximum(a[0], a[1]), jnp.maximum(a[2], lb[0])),
        jnp.maximum(lb[1], lb[2]),
    )
    # lam starts per-env; the first vector-pred where broadcasts it to rays.
    q_hi, lam = ub[0], cand[0]
    for k in (1, 2):
        take = ub[k] < q_hi
        q_hi = jnp.minimum(q_hi, ub[k])
        lam = jnp.where(take, cand[k], lam)

    # hit ⟺ ∃ q > 0 in [q_lo, q_hi]  ⟺  q_hi ≥ max(q_lo, 0⁺); the q = 0
    # boundary is t = ∞, unreachable for a box at finite pose.
    hit = q_hi >= jnp.maximum(q_lo, 1e-30)
    q = jnp.where(inside, q_lo, q_hi)  # exit depth when inside (≡ tmax)
    q = jnp.where(hit, q, -_BIG)
    return q, lam, hit


def _ray_obb_q(px, py, basis, eye, center, quat, half_extents, light):
    """Projective (inverse-depth) rasterization of one oriented box.

    The round-3.5 algorithm-class change past :func:`_ray_obb_affine` (which
    BASELINE.md's roofline showed running AT the VPU op bound *for the slab
    algorithm*): instead of slab entry/exit **times**, work in inverse depth
    ``q = 1/t`` along the unnormalized ray ``D = fwd + px·right + py·up``.
    The classic rasterization fact makes everything affine: for a box-axis
    plane, the hit's inverse depth is ``q = w_k / (ĝ_k ± he_k)`` with
    ``w_k = û_k·D`` affine in the static screen coords and the denominator a
    per-env SCALAR.  The slab constraints ``L_k ≤ t·w_k ≤ U_k`` therefore
    become, for ``q > 0``:

      * ``q ≥ w_k / U_k``                     (far plane — always a lower bound)
      * ``q ≤ w_k / L_k`` if ``L_k > 0``      (near plane ahead: upper bound)
      * ``q ≥ w_k / L_k`` if ``L_k < 0``      (eye inside slab k: lower bound)

    where ``û_k`` is box axis k oriented so ``ĝ_k = û_k·(c − eye) ≥ 0``,
    ``L_k = ĝ_k − he_k``, ``U_k = ĝ_k + he_k > 0``.  Which side each bound
    lands on is a PER-ENV decision, so the per-ray work collapses to three
    affine evaluations plus two scaled copies and pure min/max cascades —
    the per-ray sign tests, nudges, and reciprocals of the slab kernel all
    vanish (census: 162 → 110.4 ops/ray; scripts/roofline.py 'qraster').

    Returns ``(q, lambert, hit)``: ``q`` is the entry inverse depth (LARGER
    is nearer; exit inverse depth when the eye is inside the box, matching
    ``_ray_obb_affine``'s tmax fallback), already folded to ``-BIG`` on
    miss so callers compare depths directly; ``lambert`` is the entry-face
    n·L carried through the upper-bound cascade (per-env scalar candidates
    ``−û_k·L``).  Eye-inside-box lambert uses the first axis' candidate —
    that state (camera engulfed by a box) renders garbage in every backend
    and never occurs with the default cameras (eyes ≥ 1.9 m from the
    workspace; see tests/test_raster_render.py for the state envelope).

    Implementation lives in :func:`_obb_q_setup` (per-env scalar algebra)
    + :func:`_obb_q_cast` (per-ray vector work) so the Pallas kernel can
    batch the affine evaluations of both boxes into one MXU matmul.
    """
    return _obb_q_cast(
        px, py, _obb_q_setup(basis, eye, center, quat, half_extents, light)
    )


def pool_ray_layout(pool: int, height: int, width: int, samples: int = 0):
    """Static ray permutation that makes epilogue pooling layout-free.

    Returns ``(sel, (p2, n, stride))``: ``sel`` reorders a row-major H·W ray
    grid into ``p2`` blocks — block ``s`` holds, in pooled-row-major
    order, every pixel at intra-pool-window offset ``s`` — each tail-padded
    to a 128-lane-aligned ``stride``.  Average-pooling a field in this
    layout is ``p2`` ALIGNED lane slices summed elementwise, which XLA fuses
    into the cascade epilogue for free.  (The naive reshape-based pool on
    flat row-major frames measured ~1 ms/frame at 4096 envs — MORE than the
    ray cascade itself — because (…, h/k, k, w/k, k) reduces force tiled
    relayouts; this permutation is the same arithmetic with zero relayout,
    for ~2.4% padded-ray overhead.)

    ``samples``: number of intra-window sub-pixel samples actually shaded
    (0 or pool² = all: the exact average of the full-res render).  Fewer
    samples — e.g. 2 = quincunx (diagonal) antialiasing, 1 = point
    sampling — cut the renderer's ray count (its dominant cost,
    BASELINE.md) proportionally at a quality cost; offsets are spread
    diagonally across the window.
    """
    n = (height // pool) * (width // pool)
    stride = -(-n // 128) * 128
    idx = np.arange(height * width).reshape(height, width)
    offsets = [(r, c) for r in range(pool) for c in range(pool)]
    if samples and samples < len(offsets):
        # Spread picks along the window diagonal: for pool=2,
        # samples=2 → (0,0) and (1,1) (quincunx); samples=1 → (0,0).
        pick = np.linspace(0, len(offsets) - 1, samples).round().astype(int)
        offsets = [offsets[i] for i in pick]
    blocks = [idx[r::pool, c::pool].reshape(-1) for r, c in offsets]
    sel = np.concatenate(
        [np.pad(b, (0, stride - n), mode="edge") for b in blocks]
    )
    return sel, (len(offsets), n, stride)


def static_background(
    dirs: tuple[np.ndarray, np.ndarray, np.ndarray],
    eye: tuple[float, float, float],
    return_depth: bool = False,
):
    """Host-side static background planes: (ground_value, sky_mask), (P,) f32.

    The ground-plane depth, checker pattern, and Lambert shade depend only on
    the static rays/eye, so the whole background collapses to two constant
    planes baked at trace time; the compiled per-step work touches only the
    two dynamic boxes.  (Direction length does not matter — the ground hit
    POINT is scale-invariant.)  ``return_depth`` additionally returns the
    ground-hit parameter t_g (same direction scale as ``dirs``) for the
    legacy slab path's ground-occlusion tests — the ONE owner of this math;
    every backend (ratio/affine/raster/Pallas) bakes its background here.
    """
    ndx, ndy, ndz = (np.asarray(d, np.float32) for d in dirs)
    e = (float(eye[0]), float(eye[1]), float(eye[2]))
    with np.errstate(divide="ignore", invalid="ignore"):
        t_g = np.where(np.abs(ndz) > 1e-9, -e[2] / ndz, _BIG)
    t_g = np.where(t_g > 0.0, t_g, _BIG).astype(np.float32)
    gx = e[0] + t_g * ndx
    gy = e[1] + t_g * ndy
    checker = np.mod(np.floor(gx) + np.floor(gy), 2.0) > 0.5
    gvalid = t_g < _BIG * 0.5
    shade_g = _AMBIENT + (1.0 - _AMBIENT) * max(LIGHT_DIR[2], 0.0)
    ground_val = np.where(
        gvalid, np.where(checker, GROUND_B[0], GROUND_A[0]) * shade_g, 0.0
    ).astype(np.float32)
    sky_mask = (~gvalid).astype(np.float32)
    if return_depth:
        return ground_val, sky_mask, t_g
    return ground_val, sky_mask


def _render_fields_affine(
    scene: SceneParams,
    rigid: RigidState,
    px,
    py,
    basis,
    eye: tuple[float, float, float],
    bg: tuple[np.ndarray, np.ndarray],
    dtype=jnp.float32,
    pool_layout: tuple[int, int, int] | None = None,
    recip=None,
    raster: bool = False,
):
    """Screen-affine field renderer — the round-3 hot path (both backends).

    Same 4-field decomposition as :func:`_render_fields` but casting through
    :func:`_ray_obb_affine`: the camera eye stays a static scalar (no per-ray
    origin algebra), directions are affine in the static screen coords, and
    the ground-occlusion depth tests are GONE — both boxes live above z=0 and
    a ray's height is monotonic in t, so a hit box always occludes the ray's
    ground point (penetration beyond the solver's ~1e-4 slop never occurs; a
    sub-slop misordering would affect rays within ~1e-4 rad of silhouette
    edges, far below quantization).  See BASELINE.md round-3 roofline: this
    cuts the per-ray census from 247 to 188 ops (162 with ``recip``).

    ``bg``: the static (ground_value, sky_mask) planes from
    :func:`static_background`, already permuted to the ray layout.
    ``recip``: optional one-op reciprocal (Mosaic pl.reciprocal) — see
    :func:`_ray_obb_affine`.
    ``raster``: cast through the projective inverse-depth rasterizer
    :func:`_ray_obb_q` instead (the round-3.5 algorithm-class op diet —
    110.4 ops/ray vs 162.3, tests/test_op_census.py pins it; ``recip`` is ignored).  Depths compare as inverse
    depth (larger = nearer), already miss-folded inside the cascade.
    """
    gval = jnp.asarray(np.asarray(bg[0], np.float32), dtype)
    smask = jnp.asarray(np.asarray(bg[1], np.float32), dtype)
    px = jnp.asarray(np.asarray(px, np.float32), dtype)
    py = jnp.asarray(np.asarray(py, np.float32), dtype)

    cart_c = tuple(rigid.pos[CART, k].astype(dtype) for k in range(3))
    pole_c = tuple(rigid.pos[POLE, k].astype(dtype) for k in range(3))
    cart_q = tuple(rigid.quat[CART, k].astype(dtype) for k in range(4))
    pole_q = tuple(rigid.quat[POLE, k].astype(dtype) for k in range(4))
    if raster:
        qc, lam_c, hit_c = _ray_obb_q(
            px, py, basis, eye, cart_c, cart_q, scene.cart_half_extents,
            LIGHT_DIR,
        )
        qp, lam_p, hit_p = _ray_obb_q(
            px, py, basis, eye, pole_c, pole_q, scene.pole_half_extents,
            LIGHT_DIR,
        )
        # Inverse depth: larger is nearer; misses are already −BIG
        # (ties → cart, matching the slab paths).
        sel_c = hit_c & (qc >= qp)
    else:
        nc, dc, lam_c, hit_c = _ray_obb_affine(
            px, py, basis, eye, cart_c, cart_q, scene.cart_half_extents,
            LIGHT_DIR, recip,
        )
        np_, dp, lam_p, hit_p = _ray_obb_affine(
            px, py, basis, eye, pole_c, pole_q, scene.pole_half_extents,
            LIGHT_DIR, recip,
        )

        # Depth ordering between the boxes only (ties → cart, as before).
        if recip is not None:
            sel_c = hit_c & (nc <= np_)
        else:
            sel_c = hit_c & (nc * dp <= np_ * dc)
    sel_p = hit_p & ~sel_c

    lambert = jnp.maximum(jnp.where(sel_c, lam_c, lam_p), 0.0)
    shade = _AMBIENT + (1.0 - _AMBIENT) * lambert

    zero = jnp.zeros((), dtype)
    bgm = ~(sel_c | sel_p)
    fields = (
        jnp.where(sel_c, shade, zero),
        jnp.where(sel_p, shade, zero),
        jnp.where(bgm, gval, zero),
        jnp.where(bgm, smask, zero),
    )
    if pool_layout is not None:
        p2, n, stride = pool_layout
        inv = jnp.asarray(1.0 / p2, dtype)
        fields = tuple(
            sum(f[i * stride : i * stride + n] for i in range(p2)) * inv
            for f in fields
        )
    return jax.lax.optimization_barrier(fields)


def _render_fields(
    scene: SceneParams,
    rigid: RigidState,
    dirs: tuple[np.ndarray, np.ndarray, np.ndarray],
    eye: tuple[float, float, float],
    dtype=jnp.float32,
    pool_layout: tuple[int, int, int] | None = None,
):
    """Cast P rays ONCE → 4 scalar fields that linearly determine every
    channel: (cart_weight, pole_weight, ground_value, sky_mask), each
    average-pooled to (n,) when ``pool_layout`` (from :func:`pool_ray_layout`,
    with rays pre-permuted accordingly) is given.

    The image decomposes as
      ``out_k = CART_k·A + POLE_k·B + D + SKY_k·E``
    with A = shade·[cart visible], B = shade·[pole visible], D = the static
    gray ground value masked to background pixels, E = the sky mask on
    background pixels.  Channels differ only by the scalar constants, so the
    whole ray-cast cascade runs once per frame; per-channel work is a 4-term
    affine combination on (pooled) planes.  Two earlier layouts measured
    worse on-chip: per-channel planes made XLA clone the cascade into each
    channel's consumer fusion (3× the box tests), and a stacked (3, P) color
    axis forced sublane-padded relayouts.  An optimization_barrier pins the
    shared fields so consumer fusions cannot re-duplicate the cascade.
    """
    # --- Static background, baked host-side by static_background (the one
    # owner of the ground/checker/sky model; see its docstring).  Ground
    # albedo is gray (equal channels), so one static value plane covers all
    # three channels; sky contributes SKY_k · sky-mask.
    ground_np, sky_np, t_g_np = static_background(dirs, eye, return_depth=True)
    ground_val = jnp.asarray(ground_np, dtype)
    sky_mask = jnp.asarray(sky_np, dtype)
    t_g = jnp.asarray(t_g_np, dtype)
    e = (float(eye[0]), float(eye[1]), float(eye[2]))  # ray origin scalars

    dx, dy, dz = (jnp.asarray(d, dtype) for d in dirs)
    d = (dx, dy, dz)

    # Cart and pole boxes (per-env scalars from the rigid state), depths as
    # division-free ratios with positive denominators.
    cart_c = tuple(rigid.pos[CART, k].astype(dtype) for k in range(3))
    pole_c = tuple(rigid.pos[POLE, k].astype(dtype) for k in range(3))
    cart_q = tuple(rigid.quat[CART, k].astype(dtype) for k in range(4))
    pole_q = tuple(rigid.quat[POLE, k].astype(dtype) for k in range(4))
    nc, dc, lam_c, hit_c = _ray_obb_ratio(
        e, d, cart_c, cart_q, scene.cart_half_extents, light=LIGHT_DIR
    )
    np_, dp, lam_p, hit_p = _ray_obb_ratio(
        e, d, pole_c, pole_q, scene.pole_half_extents, light=LIGHT_DIR
    )

    # Depth ordering by cross-multiplication (ties → ground, then cart).
    sel_c = hit_c & (nc < t_g * dc) & (nc * dp <= np_ * dc)
    sel_p = hit_p & (np_ < t_g * dp) & ~sel_c

    # Lambert shade on the winning box (unused for background pixels).
    lambert = jnp.maximum(jnp.where(sel_c, lam_c, lam_p), 0.0)
    shade = _AMBIENT + (1.0 - _AMBIENT) * lambert

    zero = jnp.zeros((), dtype)
    bgm = ~(sel_c | sel_p)
    fields = (
        jnp.where(sel_c, shade, zero),
        jnp.where(sel_p, shade, zero),
        jnp.where(bgm, ground_val, zero),
        jnp.where(bgm, sky_mask, zero),
    )
    if pool_layout is not None:
        p2, n, stride = pool_layout
        inv = jnp.asarray(1.0 / p2, dtype)
        fields = tuple(
            sum(f[i * stride : i * stride + n] for i in range(p2)) * inv
            for f in fields
        )
    return jax.lax.optimization_barrier(fields)


def render_planes(
    scene: SceneParams,
    rigid: RigidState,
    dirs: tuple[np.ndarray, np.ndarray, np.ndarray],
    eye: tuple[float, float, float],
    dtype=jnp.float32,
    pool_layout: tuple[int, int, int] | None = None,
):
    """Shade P rays → (r, g, b) component planes, each (P,) of ``dtype``
    (or (n,) pooled planes when ``pool_layout`` is given — see
    :func:`pool_ray_layout`; rays must be pre-permuted with its ``sel``).

    Unbatched over envs (vmap at the env layer keeps the pixel axis
    trailing).  ``dirs`` are static numpy component arrays; ``eye`` static
    floats — both bake into the compiled program.

    ``dtype=jnp.bfloat16`` halves the renderer's HBM traffic; an 8-bit
    mantissa is ~0.4% relative error — sub-pixel at 50×50 and far below the
    uint8 quantization the replay buffer applies anyway.
    """
    a, b, g, s = _render_fields(scene, rigid, dirs, eye, dtype, pool_layout)
    return tuple(
        CART_COLOR[k] * a + POLE_COLOR[k] * b + g + SKY_COLOR[k] * s
        for k in range(3)
    )


def render_rays(
    scene: SceneParams, rigid: RigidState, origin: jnp.ndarray, dirs: jnp.ndarray
) -> jnp.ndarray:
    """Compatibility/testing surface: (N, 3) rays → (N, 3) RGB.

    Off the hot path (tests, host-side probes).  The fused loop uses
    ``render_planes`` through ``make_observe_pixels``.
    """
    o = np.asarray(origin, np.float32)
    d = np.asarray(dirs, np.float32)
    r, g, b = render_planes(
        scene, rigid, (d[:, 0], d[:, 1], d[:, 2]), (o[0], o[1], o[2])
    )
    return jnp.stack([r, g, b], axis=-1)


def make_observe_pixels(
    config,
    cameras: tuple[Camera, ...] | None = None,
    dtype=jnp.bfloat16,
    raster: bool = False,
):
    """Build an ObserveFn: (scene, rigid) → FLAT (num_cameras·3·H·W,) frame.

    Drop-in for env.cartpole's observe_fn hook — the pixel analogue of
    ``observe_lowdim`` (reference --use-raw-pixels state assembly,
    bullet_cartpole.py:~L120-150).  Frame layout is plane-major per camera:
    [cam0 R | cam0 G | cam0 B | cam1 R | …], row-major pixels within a plane
    (see module docstring for why).

    ``dtype=jnp.uint8`` renders in bfloat16 and quantizes ×255 on the way
    out — the fused-loop fast path: frames land replay-ready (uint8 is what
    the buffer stores anyway) and every obs hop moves 4× fewer bytes.  The
    policy-side decode lives in models.trunks.ObsEncoder.
    """
    from cartpoleplusplus_tpu.render.camera import ray_coords

    cams = (cameras or DEFAULT_CAMERAS)[: config.num_cameras]
    h, w = config.render_height, config.render_width
    pool = getattr(config, "obs_pool", 1)
    pool_layout = None
    sel = None
    if pool > 1:
        sel, pool_layout = pool_ray_layout(
            pool, h, w, getattr(config, "obs_samples", 0)
        )
    grids = []
    for c in cams:
        dirs, eye = ray_grid(c, h, w)
        px, py, basis, eye_t = ray_coords(c, h, w)
        bg = static_background((dirs[:, 0], dirs[:, 1], dirs[:, 2]), eye_t)
        if sel is not None:
            # offset-major pooled layout (see pool_ray_layout)
            px, py = px[sel], py[sel]
            bg = (bg[0][sel], bg[1][sel])
        grids.append((px, py, basis, eye_t, bg))
    quantize = dtype == jnp.uint8
    shade_dtype = jnp.bfloat16 if quantize else dtype

    def observe(scene: SceneParams, rigid: RigidState) -> jnp.ndarray:
        planes = []
        for px, py, basis, eye, bg in grids:
            # config.obs_pool pools INSIDE the fields fn (on the shared
            # scalar fields — 4 pooled reduces instead of 3 channels' worth).
            a, b, g, s = _render_fields_affine(
                scene, rigid, px, py, basis, eye, bg, dtype=shade_dtype,
                pool_layout=pool_layout, raster=raster,
            )
            for k in range(3):  # (P',): [R | G | B] per camera
                p = CART_COLOR[k] * a + POLE_COLOR[k] * b + g + SKY_COLOR[k] * s
                if quantize:
                    # Colors are already in [0, 1]; the +0.5 rounds. XLA
                    # fuses this into the per-channel epilogue.
                    p = jnp.clip(
                        p.astype(jnp.float32) * 255.0 + 0.5, 0.0, 255.0
                    ).astype(jnp.uint8)
                planes.append(p)
        return jnp.concatenate(planes) if len(planes) > 1 else planes[0]

    return observe


def frame_to_images(config, frame) -> np.ndarray:
    """Host-side: flat plane-major frame(s) (…, C·3·H·W) → (…, C, H, W, 3).

    H/W are the dims the pipeline carries — post ``config.obs_pool``.
    """
    h, w, c = config.obs_height, config.obs_width, config.num_cameras
    arr = np.asarray(frame)
    planes = arr.reshape(arr.shape[:-1] + (c, 3, h, w))
    return np.moveaxis(planes, -3, -1)
