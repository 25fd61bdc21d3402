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
* Contact is the documented compliant analogue (MuJoCo's LCP solver is
  out of scope per SURVEY.md §7 step 9): per-point critically-damped
  spring-damper with constants mapped from MuJoCo 1.5's DEFAULT
  ``solref = (0.02, 1)`` impedance and regularised Coulomb friction
  (μ = 1, the XML floor's default).  See ``envs/tpuquad.py:Params``.

Documented divergences from a true MuJoCo 1.5 simulation (shared by env
and oracle — the oracle pins the *spec*, these pin its distance to the C
engine):

* The free-joint frame sits at the body origin while the CoM is offset
  (+3.33 mm z for the ground model, +2.5 mm for quat); env and oracle
  integrate about the CoM-as-origin.  Thrust-torque arms are unaffected
  (forces are along body z), gravity torque is zero either way; the
  velocity reported for the origin differs from the CoM's by ω × r_com —
  sub-mm/s at the rates these tasks see.
* The XML sets ``density="1" viscosity="1e-5"`` so MuJoCo adds
  equivalent-sphere aerodynamic drag; at these speeds the resulting
  force is ≪ 1 mN and is omitted.
* Contact: compliant analogue, not LCP (above).
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


class OracleParams:
    """Float64 mirror of ``envs/tpuquad.py`` Params/QuatParams (contact
    constants per the solref derivation there)."""

    def __init__(self, model="ground"):
        geoms = GROUND_GEOMS if model in ("ground", "hover") else QUAT_GEOMS
        self.mass, self.com, inertia = body_inertia(geoms)
        self.inertia_diag = np.diag(inertia)
        self.gravity = -9.81
        self.dt = 0.01
        self.frame_skip = 2
        m_eff = self.mass / len(CONTACT_PTS)
        tau, zeta = 0.02, 1.0  # MuJoCo 1.5 default solref
        self.contact_stiffness = m_eff / (tau * tau * zeta * zeta)
        self.contact_damping = 2.0 * m_eff * zeta / tau
        self.contact_friction = 1.0
        self.contact_slide_vel = 0.5
        self.thrust_high = 4.0
        self.rate_kv = 0.1


def _contact_wrench(p: OracleParams, pos, vel, omega, rot):
    force_w = np.zeros(3)
    torque_b = np.zeros(3)
    for r_b in CONTACT_PTS:
        r_w = rot @ r_b
        p_w = pos + r_w
        v_w = vel + rot @ np.cross(omega, r_b)
        pen = -p_w[2]
        if pen > 0.0:
            fn = max(p.contact_stiffness * pen - p.contact_damping * v_w[2], 0.0)
            vt = v_w[:2]
            speed = np.hypot(vt[0], vt[1])
            ft = -p.contact_friction * fn * vt / max(speed, p.contact_slide_vel)
            f_w = np.array([ft[0], ft[1], fn])
            force_w += f_w
            torque_b += np.cross(r_b, rot.T @ f_w)
    return force_w, torque_b


def _physics_step(p: OracleParams, state, thrusts, yaw_torque, extra_torque_b, contact,
                  motor_pos=MOTOR_POS):
    pos, quat, vel, omega = state[0:3], state[3:7], state[7:10], state[10:13]
    rot = quat_to_rotmat(quat)
    inertia = p.inertia_diag

    force_w = rot[:, 2] * thrusts.sum() + np.array([0.0, 0.0, p.gravity * p.mass])
    mx = (motor_pos[:, 1] * thrusts).sum()
    my = -(motor_pos[:, 0] * thrusts).sum()
    torque_b = np.array([mx, my, yaw_torque]) + extra_torque_b
    if contact:
        cf, ct = _contact_wrench(p, pos, vel, omega, rot)
        force_w = force_w + cf
        torque_b = torque_b + ct

    omega_dot = (torque_b - np.cross(omega, inertia * omega)) / inertia
    acc = force_w / p.mass

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
