"""TPU-native 13-state controller-in-the-loop quadrotor (``reinmav-v0``).

Pure-JAX re-design of reference
``gym_reinmav/envs/native/reinmav_env.py`` (C2 in SURVEY.md §2): 13 states
``[pos(3), vel(3), quat wxyz(4), body rates pqr(3)]`` plus simulation time
carried as a 14th state component (the reference keeps ``self.t`` as object
state, ``reinmav_env.py:73``).

One outer step (dt=1/100) runs the inner PD controller + quintic
trajectory + rigid-body EOM inside an explicit-Euler substep loop
(ds=1/5000) — implemented as a masked ``lax.fori_loop`` of 51 iterations,
with the live substep count replicating ``len(np.arange(t, t+dt, ds))``
exactly (it floats between 50 and 51; ``reinmav_env.py:91-98``).

Parity quirks kept (Q9): ``step`` ignores the action, ``done`` is always
True with reward 90; the motor mixer clamps per-rotor thrust to
``[0, max_force/4]`` but passes Mz through unclamped
(``reinmav_env.py:204-216``); ``q̇`` uses the K_quat=2 norm-error feedback
(``:242-244``).  Divergence: ``reset`` restores the documented init state
(the reference's ``reset`` is a no-op returning stale state).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import quadmath as qm
from .core import EnvDef, StepOut


class Params(NamedTuple):
    mass: float = 0.18
    gravity: float = 9.81
    arm_length: float = 0.086
    min_force: float = 0.0
    max_force: float = 3.5316
    dt: float = 1.0 / 100.0
    ds: float = 1.0 / 5000.0
    # Inertia (reference reinmav_env.py:60-63) and its inverse, as rows.
    inertia: tuple = (
        (0.00025, 0.0, 2.55e-06),
        (0.0, 0.000232, 0.0),
        (2.55e-06, 0.0, 0.0003738),
    )
    kp: tuple = (10.0, 10.0, 35.0)
    kd: tuple = (5.0, 5.0, 22.0)
    kp_rot: tuple = (100.0, 100.0, 100.0)
    kd_rot: tuple = (0.1, 0.1, 0.1)
    t_max: float = 4.0
    k_quat: float = 2.0


STATE_DIM = 14  # 13 physical states + simulation time
INIT_STATE = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)


def trj_gen(p: Params, t: jnp.ndarray) -> jnp.ndarray:
    """Quintic min-jerk reference applied to x, y, z and yaw
    (reference ``reinmav_env.py:128-136``)."""
    t_max = p.t_max
    tc = jnp.maximum(0.0, jnp.minimum(t, t_max)) / t_max
    pos = 10.0 * tc**3 - 15.0 * tc**4 + 6.0 * tc**5
    vel = (30.0 / t_max) * tc**2 - (60.0 / t_max) * tc**3 + (30.0 / t_max) * tc**4
    acc = (60.0 / t_max**2) * tc - (180.0 / t_max**2) * tc**2 + (120.0 / t_max**2) * tc**3
    return jnp.stack([pos, pos, pos, vel, vel, vel, acc, acc, acc, pos, vel])


def state_to_qd(s13: jnp.ndarray) -> jnp.ndarray:
    """[pos, vel, quat, pqr] → [pos, vel, ZXY-euler, pqr] 12-vector
    (reference ``stateToQd``, ``reinmav_env.py:292-304``)."""
    rot = qm.quat_to_rotmat_nonunit(s13[6:10])
    phi, theta, psi = qm.rot_to_rpy_zxy(rot)
    return jnp.concatenate([s13[0:6], jnp.stack([phi, theta, psi]), s13[10:13]])


def inner_controller(p: Params, cur: jnp.ndarray, des: jnp.ndarray):
    """PD force/moment controller (reference ``controller``,
    ``reinmav_env.py:306-337``)."""
    kp = jnp.asarray(p.kp, cur.dtype)
    kd = jnp.asarray(p.kd, cur.dtype)
    kp_rot = jnp.asarray(p.kp_rot, cur.dtype)
    kd_rot = jnp.asarray(p.kd_rot, cur.dtype)

    error_p = des[0:3] - cur[0:3]
    error_v = des[3:6] - cur[3:6]
    phi, theta, psi = cur[6], cur[7], cur[8]
    pq = cur[9:12]
    psi_des, dpsi_des = des[9], des[10]

    ddr = des[6:9] + kd * error_v + kp * error_p
    u1 = p.mass * (p.gravity + ddr[2])

    phi_des = (ddr[0] * jnp.sin(psi_des) - ddr[1] * jnp.cos(psi_des)) / p.gravity
    theta_des = (ddr[0] * jnp.cos(psi_des) + ddr[1] * jnp.sin(psi_des)) / p.gravity
    mx = kp_rot[0] * (phi_des - phi) - kd_rot[0] * pq[0]
    my = kp_rot[1] * (theta_des - theta) - kd_rot[1] * pq[1]
    mz = kp_rot[2] * (psi_des - psi) + kd_rot[2] * (dpsi_des - pq[2])
    return u1, jnp.stack([mx, my, mz])


def eom(p: Params, s13: jnp.ndarray, force: jnp.ndarray, moment: jnp.ndarray) -> jnp.ndarray:
    """Rigid-body equations of motion with motor mixing
    (reference ``quad_eq_of_motion2``, ``reinmav_env.py:201-264``)."""
    dtype = s13.dtype
    arm = p.arm_length
    a_mix = jnp.asarray(
        [
            [0.25, 0.0, -0.5 / arm],
            [0.25, 0.5 / arm, 0.0],
            [0.25, 0.0, 0.5 / arm],
            [0.25, -0.5 / arm, 0.0],
        ],
        dtype,
    )
    t_rotor = a_mix @ jnp.concatenate([force[None], moment[:2]])
    t_rotor = jnp.clip(t_rotor, p.min_force / 4.0, p.max_force / 4.0)
    total_force = jnp.sum(t_rotor)
    # Mz passes through unclamped (Q9).
    mx = arm * (t_rotor[1] - t_rotor[3])
    my = arm * (t_rotor[2] - t_rotor[0])
    mixed_moment = jnp.stack([mx, my, moment[2]])

    vel = s13[3:6]
    quat = s13[6:10]
    pqr = s13[10:13]

    brw = qm.quat_to_rotmat_nonunit(quat)
    wrb = brw.T
    accel = (wrb[:, 2] * total_force - jnp.asarray([0.0, 0.0, p.mass * p.gravity], dtype)) / p.mass

    pq, q_, r_ = pqr[0], pqr[1], pqr[2]
    w0, x0, y0, z0 = quat[0], quat[1], quat[2], quat[3]
    # qdot = -1/2 Ω(p,q,r) q + K_quat (1-|q|²) q, with Ω as in the reference.
    qdot = jnp.stack(
        [
            -0.5 * (-pq * x0 - q_ * y0 - r_ * z0),
            -0.5 * (pq * w0 - r_ * y0 + q_ * z0),
            -0.5 * (q_ * w0 + r_ * x0 - pq * z0),
            -0.5 * (r_ * w0 - q_ * x0 + pq * y0),
        ]
    )
    quat_err = 1.0 - (w0 * w0 + x0 * x0 + y0 * y0 + z0 * z0)
    qdot = qdot + p.k_quat * quat_err * quat

    inertia = jnp.asarray(p.inertia, dtype)
    inv_inertia = jnp.linalg.inv(inertia)
    temp = jnp.cross(pqr, inertia @ pqr)
    pqrdot = inv_inertia @ (mixed_moment - temp)

    return jnp.concatenate([vel, accel, qdot, pqrdot])


def step(p: Params, s: jnp.ndarray, a: jnp.ndarray | None = None) -> StepOut:
    """One outer step: masked 51-iteration substep loop with the controller
    re-evaluated at every substep (continuous-control semantics,
    reference ``myODE``/``quad_eq_of_motion1``, ``reinmav_env.py:90-98``)."""
    del a  # the reference step() takes no action (Q9)
    s13 = s[:13]
    t = s[13]
    dt = jnp.asarray(p.dt, s.dtype)
    ds = jnp.asarray(p.ds, s.dtype)

    # Exact replica of len(np.arange(t, t+dt, ds)) in the working dtype.
    # dtype caveat: the 50/51 fluctuation is pure float rounding, so the
    # pattern depends on the carry dtype — f64 matches the reference
    # bit-for-bit (188×51 over the 400-step horizon); f32 production
    # drifts (14×51, ≤1e-2 closed-loop position impact).  Characterised
    # and pinned by tests/test_reinmav_f32_substeps.py.
    n_sub = jnp.ceil(((t + dt) - t) / ds).astype(jnp.int32)

    def substep(k, s13_):
        tk = t + k * ds
        cur = state_to_qd(s13_)
        des = trj_gen(p, tk)
        force, moment = inner_controller(p, cur, des)
        sdot = eom(p, s13_, force, moment)
        return jnp.where(k < n_sub, s13_ + ds * sdot, s13_)

    s13 = jax.lax.fori_loop(0, 51, substep, s13)
    t = t + dt

    state = jnp.concatenate([s13, t[None]])
    reward = jnp.asarray(90.0, s.dtype)  # 100 alive bonus − 10 (Q9)
    done = jnp.asarray(True)
    return StepOut(state, s13, reward, done)


def reset(p: Params, key) -> jnp.ndarray:
    """Documented init state at t=0 (reference ``init_state``,
    ``reinmav_env.py:79``; its reset() is a stale no-op — divergence)."""
    del p, key
    return jnp.asarray(INIT_STATE + (0.0,))


def make(params: Params | None = None) -> EnvDef:
    return EnvDef(
        name="reinmav-v0",
        state_dim=STATE_DIM,
        action_dim=0,
        obs_dim=13,
        params=params or Params(),
        step_fn=step,
        reset_fn=reset,
        control_fn=None,
    )
