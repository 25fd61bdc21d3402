"""TPU-native 3D quadrotor with slung load (``quadrotor3d-slungload-v0``).

Pure-JAX re-design of reference
``gym_reinmav/envs/native/quadrotor3d_slungload.py`` (C6 in SURVEY.md §2):
16-state ``[pos(3), quat wxyz(4), vel(3), load_pos(3), load_vel(3)]``,
action ``[thrust, wx, wy, wz]``.

Same taut/slack structure as the 2D slung-load env, but POSITION-first
Euler for both load and quad (``quadrotor3d_slungload.py:112-120,136-145``
— opposite order from the 2D sibling, Q3).  The quaternion follows the 3D
env's pyquaternion semantics (normalised for rotation/derivative,
unnormalised in storage, Q4).  Done on load-pos/quad-vel norms; reward
−‖load_pos‖ (``:149-156``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import quadmath as qm
from .core import EnvDef, StepOut, uniform_reset


class Params(NamedTuple):
    mass: float = 1.0
    load_mass: float = 0.1
    dt: float = 0.01
    gravity: float = -9.8
    tether_length: float = 1.5
    pos_limit: float = 3.0
    vel_limit: float = 10.0
    ref_x: float = 0.0
    ref_y: float = 0.0
    ref_z: float = 1.0
    kp: float = -5.0
    kv: float = -4.0
    tau: float = 0.3


def _safe_unit(v: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(v)
    return v / jnp.where(n > 0.0, n, 1.0)


def step(p: Params, s: jnp.ndarray, a: jnp.ndarray) -> StepOut:
    dt = jnp.asarray(p.dt, s.dtype)
    thrust = a[0]
    w = a[1:4]

    pos = s[0:3]
    att = s[3:7]
    vel = s[7:10]
    load_pos = s[10:13]
    load_vel = s[13:16]

    g = jnp.asarray([0.0, 0.0, p.gravity], s.dtype)

    tether_vec = load_pos - pos
    tnorm = jnp.linalg.norm(tether_vec)
    unit = _safe_unit(tether_vec)
    taut = tnorm >= p.tether_length

    qn = qm.quat_normalize(att)
    body_z = qm.quat_to_rotmat(qn)[:, 2]  # R(q̂)·ẑ

    # ---- taut branch (pos-first Euler) -----------------------------------
    thrust_vec = thrust * body_z
    la_t = jnp.dot(unit, thrust_vec - p.mass * p.tether_length * jnp.dot(load_vel, load_vel)) * unit
    la_t = (1.0 / (p.mass + p.load_mass)) * la_t + g
    lp_t = load_pos + load_vel * dt + 0.5 * la_t * dt * dt  # pos FIRST (old vel)
    lv_t = load_vel + la_t * dt

    tension = p.load_mass * jnp.linalg.norm(-g + la_t) * unit
    acc_t = thrust / p.mass * body_z + g + tension / p.mass
    pos_t = pos + vel * dt + 0.5 * acc_t * dt * dt          # old vel
    vel_t = vel + acc_t * dt

    load_dir = _safe_unit(lp_t - pos_t)
    lp_t = pos_t + load_dir * p.tether_length
    lv_t = lv_t - jnp.dot(lv_t - vel_t, load_dir) * load_dir

    # ---- slack branch ----------------------------------------------------
    lp_s = load_pos + load_vel * dt + 0.5 * g * dt * dt
    lv_s = load_vel + g * dt

    acc_s = thrust / p.mass * body_z + g
    pos_s = pos + vel * dt + 0.5 * acc_s * dt * dt
    vel_s = vel + acc_s * dt

    # ---- select + shared quaternion update -------------------------------
    pos = jnp.where(taut, pos_t, pos_s)
    vel = jnp.where(taut, vel_t, vel_s)
    load_pos = jnp.where(taut, lp_t, lp_s)
    load_vel = jnp.where(taut, lv_t, lv_s)
    att = att + qm.quat_derivative(qn, w) * dt  # same in both branches

    state = jnp.concatenate([pos, att, vel, load_pos, load_vel])
    lpn = jnp.linalg.norm(load_pos)
    vn = jnp.linalg.norm(vel)
    done = (lpn > p.pos_limit) | (vn > p.vel_limit)
    reward = jnp.where(done, jnp.asarray(1.0, s.dtype), -lpn)
    return StepOut(state, state, reward, done)


def control(p: Params, s: jnp.ndarray) -> jnp.ndarray:
    """Geometric controller identical to quadrotor3d's, ref at z=1
    (reference ``quadrotor3d_slungload.py:169-226``)."""
    pos = s[0:3]
    att = s[3:7]
    vel = s[7:10]

    ref_pos = jnp.asarray([p.ref_x, p.ref_y, p.ref_z], s.dtype)
    g = jnp.asarray([0.0, 0.0, p.gravity], s.dtype)

    desired_acc = p.kp * (pos - ref_pos) + p.kv * vel - g
    desired_quat = qm.acc2quat(desired_acc)

    qe = qm.quat_mul(qm.quat_conj(att), desired_quat)
    w = (2.0 / p.tau) * jnp.sign(qe[0]) * qe[1:4]

    rot = qm.quat_to_rotmat(qm.quat_normalize(att))
    thrust = desired_acc @ rot[:, 2]
    return jnp.concatenate([thrust[None], w])


#: Module-level reset (identity-checked by the fused-Pallas dispatch).
reset = uniform_reset(16)


def make(params: Params | None = None) -> EnvDef:
    return EnvDef(
        name="quadrotor3d-slungload-v0",
        state_dim=16,
        action_dim=4,
        obs_dim=16,
        params=params or Params(),
        step_fn=step,
        reset_fn=reset,
        control_fn=control,
    )
