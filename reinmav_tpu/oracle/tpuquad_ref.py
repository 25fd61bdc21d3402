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
* Contact mirrors MuJoCo 3.x's soft-constraint law in a per-point
  diagonal (Jacobi) approximation: impedance d(pen) from the default
  ``solimp = (0.9, 0.95, 0.001, 0.5, 2)`` spline, reference
  acceleration ``aref = d·(K·pen − B·v_n)`` with
  ``K = 1/(dmax²·τ²·ζ²)``, ``B = 2/(dmax·τ)`` from the default
  ``solref = (0.02, 1)``, and force
  ``f_n = max(0, d·(aref − a0_n)/A_n)`` where ``a0_n`` is the
  unconstrained normal acceleration of the point and ``A_n`` its
  effective inverse mass.  Friction is the elliptic clamp
  ``‖f_t‖ ≤ μ·f_n`` of the same law on the tangent axes (MuJoCo's
  default is a pyramidal cone — a documented approximation).

Measured divergence from real ``mj_step`` (mujoco 3.10, reference XMLs;
pinned by ``tests/test_mujoco_divergence.py``):

* Off-ground flight: float64 round-off (≤1e-12) until chaotic tumbling
  amplifies it (Lyapunov growth), exact for the hovering task envelope.
* Flat drop-and-settle: ≤3e-4 m position error; resting penetration
  within 3e-4 of MuJoCo's (the diagonal approximation vs the coupled
  Newton solve, and the 5-point analogue vs box-corner contacts).
* Tilted drop with sliding: ≤2 cm position / 0.16 quat over 1 s
  (multi-point contact is where the diagonal approximation is
  coarsest).
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

CONTACT_PTS = np.array(
    [
        [0.1, 0.1, 0.0075],
        [0.1, -0.1, 0.0075],
        [-0.1, -0.1, 0.0075],
        [-0.1, 0.1, 0.0075],
        [0.0, 0.0, -0.025],
    ]
)


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


def _contact_wrench(p: OracleParams, pos, vel, omega, rot, acc0_com, alpha0):
    """Impedance-regularised plane contact (module docs): needs the
    UNCONSTRAINED CoM/angular accelerations to form each point's a0."""
    force_w = np.zeros(3)
    torque_b = np.zeros(3)
    I = p.inertia_diag
    c = p.com
    for r_b in CONTACT_PTS:
        r_w = rot @ r_b
        pen = -(pos + r_w)[2]
        if pen <= 0.0:
            continue
        rho = r_b - c
        v_w = vel + rot @ np.cross(omega, r_b)
        a_pt = acc0_com + rot @ (np.cross(alpha0, rho) + np.cross(omega, np.cross(omega, rho)))
        d = impedance(pen)
        n_b = rot.T @ np.array([0.0, 0.0, 1.0])
        arm = np.cross(rho, n_b)
        a_n = 1.0 / p.mass + arm @ (arm / I)
        aref_n = d * (CONTACT_K * pen - CONTACT_B * v_w[2])
        fn = max(0.0, d * (aref_n - a_pt[2]) / a_n)
        ft = np.zeros(2)
        for ax in range(2):
            t_b = rot.T @ np.eye(3)[ax]
            arm_t = np.cross(rho, t_b)
            a_t = 1.0 / p.mass + arm_t @ (arm_t / I)
            ft[ax] = d * (d * (-CONTACT_B * v_w[ax]) - a_pt[ax]) / a_t
        nrm = np.hypot(ft[0], ft[1])
        lim = p.contact_friction * fn
        if nrm > lim:
            ft *= lim / max(nrm, 1e-30)
        f_w = np.array([ft[0], ft[1], fn])
        force_w += f_w
        torque_b += np.cross(rho, rot.T @ f_w)
    return force_w, torque_b


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
