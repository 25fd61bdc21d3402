"""NumPy float64 oracle for the tpuquad env family (C7-C10).

Independent ground truth for ``reinmav_tpu/envs/tpuquad.py`` — the only
env family without one after round 1 (the native five are checked against
``oracle/native_envs.py``).  Everything here is re-derived from the
REFERENCE model definitions, not copied from the JAX env:

* Mass / CoM / inertia are computed from the XML geom tables
  (``/root/reference/gym_reinmav/envs/mujoco/assets/quadrotor_ground.xml``
  and ``quadrotor_quat.xml``: ``inertiafromgeom="true"`` — MuJoCo builds
  body inertia by summing geom inertias) via :func:`body_inertia`, using
  the XML's literal geom masses, poses, and (slightly-off-45°) quats.
  The env's hardcoded ``Params.inertia_diag`` constants are *validated*
  against this computation by ``tests/test_tpuquad_parity.py``.
* Actuators follow the XML gear table: ground model — four motors with
  gear ``[0 0 1 0 0 ∓0.1]`` (body-z force at (±0.1, ±0.1, 0.01) plus yaw
  torque), ctrlrange [0,1]; quat model — one central thrust (ctrlrange
  [0,4]) and three velocity servos ``τ = kv (ctrl − ω)`` with kv=0.1.
* Integration is semi-implicit Euler at dt=0.01 with frame_skip=2
  (``mujoco_quad.py:46``), quaternion advanced by the exponential map
  (MuJoCo ``mj_integratePos``), renormalised.
* The free joint sits at the body-frame origin while the CoM is offset
  (+3.33 mm z ground / +2.5 mm quat); dynamics are computed about the
  CoM and mapped back to the origin with the full coupling term
  ``a_origin = a_com − R·(α×c + ω×(ω×c))`` — exactly MuJoCo's rigid-body
  kinematics (validated to float64 round-off against ``mj_step``).
* Fluid drag per the XML's ``density="1" viscosity="1e-5"``: MuJoCo's
  inertia-equivalent-box model (quadratic per-axis drag + Stokes
  equivalent-sphere viscous terms), also validated to round-off.
* Contact is MuJoCo 3.x's soft-constraint model EXACTLY (same contact
  points, same convex QP, solved to convergence): plane-box corner /
  tilted plane-cylinder rim contact points with the engine's midpoint
  shift; impedance d(pen) from the default
  ``solimp = (0.9, 0.95, 0.001, 0.5, 2)`` spline; reference
  acceleration ``aref = d·K·pen − B·v_row`` per pyramid row with
  ``K = 1/(dmax²·τ²·ζ²)``, ``B = 2/(dmax·τ)`` from the default
  ``solref = (0.02, 1)``; the default PYRAMIDAL friction cone (rows
  ``e = n ± μ·t_i``, forces ≥ 0); the pyramidal regularizer
  ``R = (1−d)/d · 2μ²(1+μ²)/m``; and the coupled Delassus operator
  ``A = J M⁻¹ Jᵀ`` over all active rows.  The dual QP
  ``min_{f≥0} ½fᵀ(A+R)f + fᵀ(J·a_smooth − aref)`` is the one MuJoCo's
  Newton solver optimises; we solve it matrix-free by a hybrid
  projected relaxation sweep (see :data:`PGS_ITERS` and
  :func:`_contact_wrench`).

Measured divergence from real ``mj_step`` (mujoco 3.10, reference XMLs;
pinned by ``tests/test_mujoco_divergence.py``; full per-state validation
in ``tools/mj_coupled_check.py``):

* Off-ground flight: float64 round-off (≤1e-12) until chaotic tumbling
  amplifies it (Lyapunov growth), exact for the hovering task envelope.
* Flat drop-and-settle: ≤1.6e-6 m over 1 s; resting height equal to
  8e-8 (mj 3.10 settles at z = 0.02489224…, we settle at 0.02489232).
* Tilted drop with sliding (the old diagonal model's worst case,
  formerly ≤2e-2 m / 0.16 quat): ≤1.1e-6 m / 1.1e-5 quat over 1 s.
* Full-thrust takeoff through the contact regime: float64 round-off.
* 40° tumble over rotor-cylinder rim contacts: ≤5.3e-5 m over 1 s.
* z=0 reset pop-out (20 mj contacts incl. all arm boxes): ≤6.7e-6 m.
* arm-riding flip + random-thrust crawl (3 s, arms load-bearing —
  arms-disabled mj diverges >5e-2 there): 7e-4 at 120 sweeps,
  4.4e-9 m / 6.5e-8 quat at 1200 (chaotic flip amplifies the PGS
  residual; the 1200-sweep row is the model-exactness claim).
(All other rows at the shipped 120 sweeps; 240 sweeps reaches ≤5e-7 m
on every 1-2 s row.)
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# Geom tables, straight from the XMLs (mass, pos, z-quat (w, z), type+size).
# type: ("box", hx, hy, hz) half-sizes | ("cyl", radius, half_height).

_ARM_GEOMS = [
    (0.025, (0.071, 0.071, 0.0), (0.924, 0.383), ("box", 0.05, 0.01, 0.0025)),
    (0.025, (0.071, -0.071, 0.0), (0.383, 0.924), ("box", 0.05, 0.01, 0.0025)),
    (0.025, (-0.071, -0.071, 0.0), (-0.383, 0.924), ("box", 0.05, 0.01, 0.0025)),
    (0.025, (-0.071, 0.071, 0.0), (0.924, -0.383), ("box", 0.05, 0.01, 0.0025)),
]
_THRUSTER_GEOMS = [
    (0.025, (0.1, 0.1, 0.01), (1.0, 0.0), ("cyl", 0.05, 0.0025)),
    (0.025, (0.1, -0.1, 0.01), (1.0, 0.0), ("cyl", 0.05, 0.0025)),
    (0.025, (-0.1, -0.1, 0.01), (1.0, 0.0), ("cyl", 0.05, 0.0025)),
    (0.025, (-0.1, 0.1, 0.01), (1.0, 0.0), ("cyl", 0.05, 0.0025)),
]

GROUND_GEOMS = [(0.1, (0, 0, 0.0), (1.0, 0.0), ("box", 0.06, 0.035, 0.025))] + \
    _ARM_GEOMS + _THRUSTER_GEOMS
QUAT_GEOMS = [(0.2, (0, 0, 0.0), (1.0, 0.0), ("box", 0.06, 0.035, 0.025))] + \
    _ARM_GEOMS + _THRUSTER_GEOMS

# Motor layout (ground model): XML site order with gear yaw signs.
MOTOR_POS = np.array(
    [[0.1, 0.1, 0.01], [0.1, -0.1, 0.01], [-0.1, -0.1, 0.01], [-0.1, 0.1, 0.01]]
)
YAW_SIGN = np.array([-1.0, 1.0, -1.0, 1.0]) * 0.1  # gear [.. ∓0.1]

# Contact candidates (world-z plane floor), mirroring MuJoCo's collision
# functions on the XML geoms:
# * plane-box (core, half sizes 0.06/0.035/0.025): the below-plane corners
#   (mjc_PlaneBox reports every corner with dist<0, ≤4 per box);
# * plane-cylinder (4 thrusters, r=0.05, hh=0.0025 at (±0.1,±0.1,0.01)):
#   the deepest rim point of each end cap (the tilted-cylinder case).
#   mjc_PlaneCylinder's near-flat ±120° anti-rocking rim points are NOT
#   modelled: a cap can only reach the floor at body tilt ≳0.19 rad
#   (the core box holds it 0.0075 m up when level), where the extras sit
#   ≳r·sinθ·(1−cos120°) ≈ 15 mm above the deepest point — far outside
#   the ~1-3 mm reachable penetrations (probed vs mujoco 3.10,
#   2026-08-20: extras appear only in submerged states z<0).
# * plane-box on the FOUR ARM BOXES (half 0.05×0.01×0.0025 at
#   (±0.071,±0.071,0), z-rotated ±45°/±135° — quadrotor_ground.xml:9-12):
#   all 8 corners each, masked by dist<0 (r4 verdict #5; previously
#   excluded, ~2e-2 m over 3 s under random-thrust ground-crawling).
#   mjc_PlaneBox caps at 4 contacts per box, but ≥5 corners of one box
#   below the plane requires the thin arm more than half-buried —
#   unreachable at the impedance-limited penetrations (probed).
CORE_CORNERS = np.array(
    [[sx * 0.06, sy * 0.035, sz * 0.025]
     for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
)
THRUSTER_CENTERS = np.array(
    [[0.1, 0.1, 0.01], [0.1, -0.1, 0.01], [-0.1, -0.1, 0.01], [-0.1, 0.1, 0.01]]
)
THRUSTER_R, THRUSTER_HH = 0.05, 0.0025


def _arm_corners():
    """(32, 3) body-frame corner points of the four arm boxes, from the
    XML pos/quat/size verbatim (_ARM_GEOMS; the z-quat angle is
    normalisation-invariant via atan2)."""
    out = []
    for _, center, (qw, qz), (_, hx, hy, hz) in _ARM_GEOMS:
        th = 2.0 * np.arctan2(qz, qw)
        cth, sth = np.cos(th), np.sin(th)
        rot = np.array([[cth, -sth, 0.0], [sth, cth, 0.0], [0.0, 0.0, 1.0]])
        corners = np.array([[sx * hx, sy * hy, sz * hz]
                            for sx in (-1, 1) for sy in (-1, 1)
                            for sz in (-1, 1)])
        out.append(np.asarray(center, float) + corners @ rot.T)
    return np.concatenate(out)


ARM_CORNERS = _arm_corners()
N_CANDIDATES = 48  # 8 core corners + 4 thrusters × 2 caps + 4 arms × 8


def _geom_inertia_local(m, spec):
    kind = spec[0]
    if kind == "box":
        hx, hy, hz = spec[1:]
        return m / 3.0 * np.array([hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy])
    radius, hh = spec[1:]
    h = 2.0 * hh
    ixx = m * (3.0 * radius * radius + h * h) / 12.0
    return np.array([ixx, ixx, m * radius * radius / 2.0])


def body_inertia(geoms):
    """(mass, com, I) about the CoM, MuJoCo ``inertiafromgeom`` style:
    sum of geom inertias (rotated by their z-quats) + parallel-axis."""
    mass = sum(g[0] for g in geoms)
    com = sum(g[0] * np.asarray(g[1], float) for g in geoms) / mass
    inertia = np.zeros((3, 3))
    for m, pos, (qw, qz), spec in geoms:
        theta = 2.0 * np.arctan2(qz, qw)
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        ig = rot @ np.diag(_geom_inertia_local(m, spec)) @ rot.T
        d = np.asarray(pos, float) - com
        inertia += ig + m * (d @ d * np.eye(3) - np.outer(d, d))
    return mass, com, inertia


# --------------------------------------------------------------------------
# Quaternion math (wxyz), independent NumPy implementations.


def quat_mul(q, r):
    w1, x1, y1, z1 = q
    w2, x2, y2, z2 = r
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def quat_to_rotmat(q):
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def quat_exp_integrate(q, omega_body, dt):
    """q' = q ⊗ exp(½ ω dt), renormalised (mj_integratePos semantics)."""
    rot_vec = omega_body * dt
    angle = np.linalg.norm(rot_vec)
    if angle > 1e-9:
        axis = rot_vec / angle
        dq = np.concatenate([[np.cos(angle / 2.0)], np.sin(angle / 2.0) * axis])
    else:
        dq = np.concatenate([[np.cos(angle / 2.0)], 0.5 * rot_vec])
    out = quat_mul(q, dq)
    return out / np.linalg.norm(out)


# --------------------------------------------------------------------------
# Physics


# MuJoCo default constraint-solver constants (mirrored; see module docs).
SOLREF_TAU, SOLREF_ZETA = 0.02, 1.0
SOLIMP_D0, SOLIMP_DMAX, SOLIMP_WIDTH = 0.9, 0.95, 0.001
SOLIMP_MID, SOLIMP_POW = 0.5, 2.0
CONTACT_K = 1.0 / (SOLIMP_DMAX**2 * SOLREF_TAU**2 * SOLREF_ZETA**2)  # 2770.08
CONTACT_B = 2.0 / (SOLIMP_DMAX * SOLREF_TAU)  # 105.263


def impedance(pen):
    """solimp spline d(pen): power-2 midpoint-0.5 ramp d0 -> dmax over
    ``width`` of penetration (MuJoCo constraint impedance)."""
    x = np.clip(pen / SOLIMP_WIDTH, 0.0, 1.0)
    if x <= SOLIMP_MID:
        s = (x / SOLIMP_MID) ** SOLIMP_POW * SOLIMP_MID
    else:
        s = 1.0 - ((1.0 - x) / (1.0 - SOLIMP_MID)) ** SOLIMP_POW * (1.0 - SOLIMP_MID)
    return SOLIMP_D0 + s * (SOLIMP_DMAX - SOLIMP_D0)


def box_dims(mass, inertia_diag):
    """Inertia-equivalent box FULL widths (MuJoCo fluid model):
    D_i = sqrt(6 (I_j + I_k - I_i)/m)."""
    I = np.asarray(inertia_diag, float)
    return np.array([
        np.sqrt(6.0 * (I[1] + I[2] - I[0]) / mass),
        np.sqrt(6.0 * (I[0] + I[2] - I[1]) / mass),
        np.sqrt(6.0 * (I[0] + I[1] - I[2]) / mass),
    ])


class OracleParams:
    """Float64 mirror of ``envs/tpuquad.py`` Params/QuatParams (contact,
    fluid, and CoM-coupling constants per the MuJoCo mirroring there)."""

    def __init__(self, model="ground"):
        geoms = GROUND_GEOMS if model in ("ground", "hover") else QUAT_GEOMS
        self.mass, self.com, inertia = body_inertia(geoms)
        self.inertia_diag = np.diag(inertia)
        self.gravity = -9.81
        self.dt = 0.01
        self.frame_skip = 2
        self.contact_friction = 1.0
        self.density = 1.0  # XML <option density="1" viscosity="1e-5"/>
        self.viscosity = 1e-5
        self.box = box_dims(self.mass, self.inertia_diag)
        self.thrust_high = 4.0
        self.rate_kv = 0.1


def _fluid_wrench_body(p: OracleParams, vel_com_b, omega_b):
    """MuJoCo inertia-box fluid model (body frame): per-axis quadratic
    density drag + Stokes equivalent-sphere viscous terms."""
    D = p.box
    diam = D.mean()
    f = -3.0 * np.pi * p.viscosity * diam * vel_com_b
    t = -np.pi * p.viscosity * diam**3 * omega_b
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        f[i] += -0.5 * p.density * D[j] * D[k] * abs(vel_com_b[i]) * vel_com_b[i]
        t[i] += -p.density * D[i] * (D[j] ** 4 + D[k] ** 4) / 64.0 * abs(omega_b[i]) * omega_b[i]
    return f, t


# Pyramid tangents for the z-plane floor (mju_makeFrame(0,0,1) order:
# t1 = (0,1,0), t2 = (-1,0,0)) and the solver sweep count.  The solve is
# the exact dual of MuJoCo's Newton solver (unique optimum of a strictly
# convex QP); sweeps only set how tightly we reach it.  The sweep is a
# hybrid: Gauss-Seidel across the 4 pyramid row TYPES, damped Jacobi
# (ω = 1/n_active — classical mass splitting) across candidates — every
# stage is vectorized over candidates, which is what makes the JAX env
# and the Pallas kernel cheap to compile and fast to run; the fixed
# point is the QP optimum for any ω > 0, so the damping never changes
# the converged solution.  Measured (tools/mj_coupled_check.py, mujoco
# 3.10, 2026-08-19): at the shipped 120 sweeps, 1-2 s trajectories
# across the pinned contact scenarios agree with mj_step to ≤6.7e-6 m
# (≤5.3e-5 in the 40° tumble); at 240 sweeps ≤5e-7 m everywhere; at 480
# sweeps the worst per-state contact-force error vs the converged QP is
# ≤7e-8 — residual is solver convergence, not model error.  The count
# is shared with envs/tpuquad.py so env↔oracle parity stays at
# round-off; raise both together to trade throughput for convergence.
PYRAMID_T = np.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]])
PGS_ITERS = 120


def contact_candidates(pos, rot):
    """World-frame contact candidate points + signed distances.

    Returns (points (48,3) world, dist (48,)) — the below-plane subset
    mirrors MuJoCo's plane-box / tilted plane-cylinder contact sets
    (points are the SURFACE points; the engine's midpoint shift is
    applied by the caller).  Order: 8 core corners, 4 upper caps,
    4 lower caps, 32 arm corners (envs/tpuquad and the kernel mirror
    this order)."""
    pts = np.empty((N_CANDIDATES, 3))
    pts[:8] = pos + CORE_CORNERS @ rot.T
    axis = rot[:, 2]
    u = np.array([0.0, 0.0, -1.0]) + axis[2] * axis
    nu = np.linalg.norm(u)
    u = u / nu if nu > 1e-12 else np.zeros(3)
    caps = np.concatenate([
        THRUSTER_CENTERS + np.array([0.0, 0.0, THRUSTER_HH]),
        THRUSTER_CENTERS - np.array([0.0, 0.0, THRUSTER_HH]),
    ])
    pts[8:16] = pos + caps @ rot.T + THRUSTER_R * u
    pts[16:] = pos + ARM_CORNERS @ rot.T
    return pts, pts[:, 2].copy()


def _contact_wrench(p: OracleParams, pos, vel, omega, rot, acc0_com, alpha0):
    """Coupled plane-contact solve — the exact dual of MuJoCo's Newton
    solver on the same constraint model (pyramidal cone, condim 3):

        f* = argmin_{f≥0} ½ fᵀ(A+R)f + fᵀ(J a_smooth − aref)

    with per-contact pyramid rows e = n ± μ t_i, A = J M⁻¹ Jᵀ over ALL
    active rows (the coupling the old per-point diagonal law dropped),
    regularizer R = (1−d)/d · (2μ²(1+μ²)/m) (MuJoCo's pyramidal
    diagApprox), and aref = −k·d·dist − b·(J v).  J uses the engine's
    conventions exactly: contact point at the surface/plane midpoint,
    moment arm from the free-joint ORIGIN (so a0 carries no centripetal
    term), ω in the body frame.  Solved matrix-free by the hybrid sweep
    documented at :data:`PGS_ITERS` (GS across row types, ω-damped
    Jacobi across candidates — every stage vectorized over candidates).

    Needs the UNCONSTRAINED CoM/angular accelerations; returns
    (force_w, torque_b-about-CoM).  Validated row-for-row against
    mj_forward's efc arrays by tools/mj_coupled_check.py and pinned by
    tests/test_mujoco_divergence.py."""
    I = p.inertia_diag
    c = p.com
    mu = p.contact_friction
    pts, dist = contact_candidates(pos, rot)
    active = dist < 0.0
    if not active.any():
        return np.zeros(3), np.zeros(3)

    n = np.array([0.0, 0.0, 1.0])
    edges = np.stack([n + mu * PYRAMID_T[0], n - mu * PYRAMID_T[0],
                      n + mu * PYRAMID_T[1], n - mu * PYRAMID_T[1]])
    inv_m = 1.0 / p.mass
    com_w = pos + rot @ c

    # Per-candidate row data, vectorized over the 48 candidates.
    pen = -dist                                               # (16,)
    mid = pts.copy()
    mid[:, 2] = 0.5 * dist                                    # midpoint shift
    rho_b = (mid - com_w) @ rot                               # Rᵀx row-wise
    r_b = (mid - pos) @ rot                                   # from the origin
    d = np.array([impedance(x) for x in pen])
    R_reg = (1.0 - d) / d * (2.0 * mu * mu * (1.0 + mu * mu) * inv_m)
    v_pt = vel + np.cross(np.broadcast_to(omega, r_b.shape), r_b) @ rot.T
    a_o0 = acc0_com - rot @ (np.cross(alpha0, c) + np.cross(omega, np.cross(omega, c)))
    a_pt0 = a_o0 + np.cross(np.broadcast_to(alpha0, r_b.shape), r_b) @ rot.T
    edges_b = edges @ rot                                     # Rᵀe, (4, 3)
    arm = np.cross(rho_b[:, None, :], edges_b[None, :, :])    # (48, 4, 3)
    diag = (edges * edges).sum(1)[None, :] * inv_m + \
        (arm * arm / I).sum(2) + R_reg[:, None]
    # impedance scales only the stiffness term (mj_referenceConstraint)
    aref = (d * CONTACT_K * pen)[:, None] - CONTACT_B * (v_pt @ edges.T)
    b_arr = a_pt0 @ edges.T - aref                            # (48, 4)

    # Hybrid sweep on ½fᵀ(A+R)f + fᵀb, f ≥ 0 — matrix-free via the
    # aggregate generalized wrench (F_w, T_b) = Σ J_jᵀ f_j; stages
    # update one pyramid row type across ALL candidates at once with
    # step damping ω = 1/n_active (fixed point = the QP optimum for any
    # ω > 0, so damping affects convergence rate only).
    w = 1.0 / max(1, int(active.sum()))
    f = np.zeros((len(pts), 4))
    F_w = np.zeros(3)
    T_b = np.zeros(3)
    for _ in range(PGS_ITERS):
        for k in range(4):
            Af = arm[:, k] @ (T_b / I) + (edges[k] @ F_w) * inv_m
            new = np.maximum(0.0, f[:, k] - w * (Af + R_reg * f[:, k] + b_arr[:, k]) / diag[:, k])
            df = np.where(active, new - f[:, k], 0.0)
            f[:, k] += df
            F_w = F_w + edges[k] * df.sum()
            T_b = T_b + arm[:, k].T @ df
    return F_w, T_b


def _physics_step(p: OracleParams, state, thrusts, yaw_torque, extra_torque_b, contact,
                  motor_pos=MOTOR_POS):
    pos, quat, vel, omega = state[0:3], state[3:7], state[7:10], state[10:13]
    rot = quat_to_rotmat(quat)
    inertia = p.inertia_diag
    c = p.com

    force_w = rot[:, 2] * thrusts.sum() + np.array([0.0, 0.0, p.gravity * p.mass])
    mx = (motor_pos[:, 1] * thrusts).sum()
    my = -(motor_pos[:, 0] * thrusts).sum()
    # Thrust torques about the CoM equal those about the origin here: the
    # CoM offset is pure body-z and the motor forces are pure body-z.
    torque_b = np.array([mx, my, yaw_torque]) + extra_torque_b

    # Fluid drag (acts at the CoM -> no torque about it from the force).
    vel_com_b = rot.T @ vel + np.cross(omega, c)
    df, dtq = _fluid_wrench_body(p, vel_com_b, omega)
    force_w = force_w + rot @ df
    torque_b = torque_b + dtq

    if contact:
        # Two-pass: unconstrained accelerations feed the contact law.
        alpha0 = (torque_b - np.cross(omega, inertia * omega)) / inertia
        acc0_com = force_w / p.mass
        cf, ct = _contact_wrench(p, pos, vel, omega, rot, acc0_com, alpha0)
        force_w = force_w + cf
        torque_b = torque_b + ct

    omega_dot = (torque_b - np.cross(omega, inertia * omega)) / inertia
    acc_com = force_w / p.mass
    # Origin kinematics: the free joint lives at the body origin, not the
    # CoM -- a_origin = a_com - R.(alpha x c + omega x (omega x c))
    # (MuJoCo-exact; validated to round-off by test_mujoco_divergence).
    acc = acc_com - rot @ (np.cross(omega_dot, c) + np.cross(omega, np.cross(omega, c)))

    vel_new = vel + acc * p.dt
    omega_new = omega + omega_dot * p.dt
    pos_new = pos + vel_new * p.dt
    quat_new = quat_exp_integrate(quat, omega_new, p.dt)
    return np.concatenate([pos_new, quat_new, vel_new, omega_new])


def step_force(state, action, hovering=False, p: OracleParams | None = None,
               contact=True):
    """Ground/hovering model step: (next_state, obs, reward, done)."""
    p = p or OracleParams("ground")
    raw_a = np.asarray(action, float)
    ctrl = np.clip(raw_a, 0.0, 1.0)
    s = np.asarray(state, float)
    for _ in range(p.frame_skip):
        yaw = (YAW_SIGN * ctrl).sum()
        s = _physics_step(p, s, ctrl, yaw, np.zeros(3), contact)
    obs = s
    finite = np.all(np.isfinite(obs))
    if hovering:
        pos_err = obs[0:3] - np.array([0.0, 0.0, 1.0])
        reward = (
            -10.0 * (pos_err ** 2).sum()
            - 0.1 * (obs[7:13] ** 2).sum()
            - (raw_a ** 2).sum()
            + 0.1 * raw_a.sum()
            + 100.0
        )
        alive = finite and obs[2] > 0.3 and abs(obs[0]) < 2.0 and abs(obs[1]) < 2.0
        done = not alive
    else:
        reward = 0.0
        done = not finite
    return s, obs, reward, done


def step_quat(state, action, p: OracleParams | None = None, contact=True):
    """Quat model step (thrust + rate servos): (next_state, obs, 0, done)."""
    p = p or OracleParams("quat")
    a = np.asarray(action, float)
    thrust = np.clip(a[0], 0.0, p.thrust_high)
    rate_cmd = np.clip(a[1:4], -1.0, 1.0)
    s = np.asarray(state, float)
    # Central thrust site at the body origin (XML "thrust" site pos 0 0 0)
    # ⇒ no motor-arm pitch/roll moments.
    central = np.zeros((4, 3))
    for _ in range(p.frame_skip):
        omega = s[10:13]
        servo_torque = p.rate_kv * (rate_cmd - omega)
        thrusts = np.array([thrust, 0.0, 0.0, 0.0])
        s = _physics_step(p, s, thrusts, 0.0, servo_torque, contact, motor_pos=central)
    obs = s
    done = not np.all(np.isfinite(obs))
    return s, obs, 0.0, done
