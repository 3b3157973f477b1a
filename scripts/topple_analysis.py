"""Attribute the 2.4% topple-time gap vs MuJoCo (VERDICT r2 weak #7).

The free-standing pole toppling from a 0.2 rad tilt is the one fidelity case
that exercises the CONTACT model end-to-end (pivot on the bottom edge under
gravity).  Ours: 0.700 s to 45°; MuJoCo 3.x: 0.683 s.  Which is right?

Three instruments:

1. **Analytic arbiter** — a rigid rod pivoting WITHOUT SLIP about its bottom
   edge has closed-form energy dynamics:  ½·I_p·θ̇² = m·g·r_c·(cosθ₀ − cosθ)
   with I_p the inertia about the pivot edge and r_c the center-to-pivot
   distance.  Time to 45° = ∫ dθ/θ̇ — no contact model at all.  For our box
   pole (1.0 m × 0.1 m, uniform): the number this prints (~0.70 s).
2. **Solver-parameter sweep** — topple time under solver iterations
   {3, 5, 10, 30}, Baumgarte β {0.0, 0.2}, and dt {1/240, 1/480, 1/960}: if
   the gap were OUR discretization, it would move here.
3. **MuJoCo softness sweep** — topple time vs MuJoCo's contact stiffness
   (solref time constant): if the gap is MuJoCo's compliant contact letting
   the pivot corner sink/slip, hardening it should move MuJoCo toward the
   analytic/ours number.

Run: JAX_PLATFORMS=cpu python scripts/topple_analysis.py
Results are written up in BASELINE.md ("Round 3: topple gap attributed").
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ANG0, ANG1 = 0.2, math.pi / 4
G = 9.81


def analytic_time(length=1.0, width=0.1, n=200000):
    """No-slip rigid-box pivot: time from ANG0 to ANG1 (energy quadrature)."""
    hz, hx = length / 2.0, width / 2.0
    r_c = math.hypot(hz, hx)  # center → pivot edge
    # Uniform box about its center: I = m/12 (L² + w²); parallel axis to edge.
    i_p = (length**2 + width**2) / 12.0 + r_c**2  # per unit mass
    # Tilt θ is measured from vertical.  Pivoting on the LEAN-SIDE bottom
    # edge, the center sits at angle (θ − atan(hx/hz)) from vertical about
    # the pivot: the box balances at θ = atan(hx/hz) ≈ 0.0997 (center
    # directly above the edge), so from θ₀ = 0.2 the center starts only
    # ~0.1 rad past the apex — which is what makes the fall slow.
    off = math.atan2(hx, hz)
    h = lambda th: r_c * math.cos(th - off)

    t, th = 0.0, ANG0
    dth = (ANG1 - ANG0) / n
    for i in range(n):
        th_mid = th + 0.5 * dth
        v2 = 2.0 * G * (h(ANG0) - h(th_mid)) / i_p
        t += dth / math.sqrt(max(v2, 1e-12))
        th += dth
    return t


def ours_time(iters=None, baumgarte=None, dt=1.0 / 240.0):
    import jax
    import jax.numpy as jnp

    from cartpoleplusplus_tpu.physics import engine
    from cartpoleplusplus_tpu.physics.bodies import POLE, make_scene, rest_state

    kw = {"dt": dt}
    if baumgarte is not None:
        kw["baumgarte"] = baumgarte
    if iters is not None:
        kw["solver_iterations"] = iters
    scene = make_scene(**kw)
    q0 = np.array([math.cos(ANG0 / 2), 0.0, math.sin(ANG0 / 2), 0.0], np.float32)
    r = rest_state(scene)
    r = r.replace(
        pos=r.pos.at[POLE].set(jnp.asarray([5.0, 0.0, 0.5], jnp.float32)),
        quat=r.quat.at[POLE].set(jnp.asarray(q0)),
    )
    chunk = jax.jit(
        lambda rr: engine.step_substeps(scene, rr, jnp.zeros(3, jnp.float32), 3)
    )

    def tilt(q):
        up_z = 1.0 - 2.0 * (q[1] ** 2 + q[2] ** 2)  # stored wxyz
        return math.acos(max(min(up_z, 1.0), -1.0))

    t = None
    for i in range(1, int(2.0 / (3 * dt)) + 1):
        r = chunk(r)
        if tilt(np.asarray(r.quat[POLE])) > ANG1:
            t = i * 3 * dt
            break
    return t


def mujoco_time(timeconst=None, dt=1.0 / 240.0):
    import mujoco

    tc = f'solref="{timeconst} 1"' if timeconst else ""
    xml = f"""
    <mujoco>
      <option timestep="{dt}" integrator="Euler"/>
      <worldbody>
        <geom type="plane" size="20 20 1" friction="0.5 0.005 0.0001" {tc}/>
        <body pos="5 0 0.5">
          <freejoint/>
          <geom type="box" size="0.05 0.05 0.5" mass="0.1"
                friction="0.5 0.005 0.0001" {tc}/>
        </body>
      </worldbody>
    </mujoco>"""
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    q0 = np.array([math.cos(ANG0 / 2), 0.0, math.sin(ANG0 / 2), 0.0])
    d.qpos[3:7] = q0

    def tilt(q):
        up_z = 1.0 - 2.0 * (q[1] ** 2 + q[2] ** 2)  # mujoco wxyz
        return math.acos(max(min(up_z, 1.0), -1.0))

    for i in range(1, int(2.0 / dt) + 1):
        mujoco.mj_step(m, d)
        if tilt(d.qpos[3:7]) > ANG1:
            return i * dt
    return None


def main():
    print(f"analytic no-slip pivot:  {analytic_time():.4f} s")
    print("== ours (impulse solver) ==")
    for dt in (1.0 / 240.0, 1.0 / 480.0, 1.0 / 960.0):
        print(f"  dt=1/{round(1/dt)}: {ours_time(dt=dt):.4f} s")
    for it in (3, 5, 10, 30):
        print(f"  iters={it}: {ours_time(iters=it):.4f} s")
    for b in (0.0, 0.1, 0.2):
        print(f"  baumgarte={b}: {ours_time(baumgarte=b):.4f} s")
    print("== mujoco ==")
    print(f"  default:          {mujoco_time():.4f} s")
    for tc in (0.02, 0.005, 0.002, 0.001):
        print(f"  solref tc={tc}: {mujoco_time(timeconst=tc):.4f} s")
    print(f"  dt=1/960 default: {mujoco_time(dt=1/960):.4f} s")


if __name__ == "__main__":
    main()
