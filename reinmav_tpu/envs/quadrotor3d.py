"""TPU-native 3D quadrotor (``quadrotor3d-v0``) — the flagship env.

Pure-JAX re-design of reference ``gym_reinmav/envs/native/quadrotor3d.py``
(C5 in SURVEY.md §2): 10-state ``[pos(3), quat wxyz(4), vel(3)]``, action
``[thrust, wx, wy, wz]`` (body rates).

Behavioural parity points:
* Acceleration ``(T/m)·R(q̂)·ẑ + g`` where ``q̂`` is the normalised
  quaternion (pyquaternion ``rotation_matrix`` normalises in place,
  ``quadrotor3d.py:94-96``, Q4).
* Position-first Euler with old velocity (``:98-99``).
* Quaternion update ``q += dt·½ q̂⊗(0,ω)`` — derivative of the *normalised*
  quaternion added to the *unnormalised* stored state (``:101-102``, Q4).
* Done: ``‖pos‖>3 ∨ ‖vel‖>10`` (dead Q2 clauses folded); reward −‖pos‖
  alive, +1 on the done step (``:106-122``).
* Geometric controller with Gram-Schmidt ``acc2quat`` and attitude error
  from the *unnormalised* current quaternion (``:126-180``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import quadmath as qm
from .core import EnvDef, StepOut, uniform_reset


class Params(NamedTuple):
    mass: float = 1.0
    dt: float = 0.01
    gravity: float = -9.8
    ref_x: float = 0.0
    ref_y: float = 0.0
    ref_z: float = 2.0
    pos_limit: float = 3.0
    vel_limit: float = 10.0
    kp: float = -5.0
    kv: float = -4.0
    tau: float = 0.3


def step(p: Params, s: jnp.ndarray, a: jnp.ndarray) -> StepOut:
    dt = jnp.asarray(p.dt, s.dtype)
    thrust = a[0]
    w = a[1:4]

    pos = s[0:3]
    att = s[3:7]
    vel = s[7:10]

    g = jnp.asarray([0.0, 0.0, p.gravity], s.dtype)
    qn = qm.quat_normalize(att)
    rot = qm.quat_to_rotmat(qn)
    acc = thrust / p.mass * rot[:, 2] + g  # R·ẑ is the third column

    pos = pos + vel * dt + 0.5 * acc * dt * dt  # old velocity (Q3)
    vel = vel + acc * dt
    att = att + qm.quat_derivative(qn, w) * dt  # stored quat stays unnormalised

    state = jnp.concatenate([pos, att, vel])
    pn = jnp.linalg.norm(pos)
    vn = jnp.linalg.norm(vel)
    done = (pn > p.pos_limit) | (vn > p.vel_limit)
    reward = jnp.where(done, jnp.asarray(1.0, s.dtype), -pn)
    return StepOut(state, state, reward, done)


def control(p: Params, s: jnp.ndarray) -> jnp.ndarray:
    """Geometric / tilt-prioritised attitude controller
    (reference ``quadrotor3d.py:126-180``).

    Order of operations matters for parity: the attitude error uses the raw
    (unnormalised) current quaternion; the thrust projection uses the
    normalised one.  ``sign(qe0)=0`` at 180° error is kept (Q10).
    """
    pos = s[0:3]
    att = s[3:7]
    vel = s[7:10]

    ref_pos = jnp.asarray([p.ref_x, p.ref_y, p.ref_z], s.dtype)
    g = jnp.asarray([0.0, 0.0, p.gravity], s.dtype)

    desired_acc = p.kp * (pos - ref_pos) + p.kv * vel - g
    desired_quat = qm.acc2quat(desired_acc)

    qe = qm.quat_mul(qm.quat_conj(att), desired_quat)  # raw quat (no normalise)
    w = (2.0 / p.tau) * jnp.sign(qe[0]) * qe[1:4]

    rot = qm.quat_to_rotmat(qm.quat_normalize(att))
    thrust = desired_acc @ rot[:, 2]
    return jnp.concatenate([thrust[None], w])


#: Module-level reset so wrapped/customised envs are detectable by
#: identity (the fused-Pallas dispatch in ``core.throughput_rollout``
#: refuses envs whose step/control/reset fns are not these exact objects).
reset = uniform_reset(10)


def make(params: Params | None = None) -> EnvDef:
    return EnvDef(
        name="quadrotor3d-v0",
        state_dim=10,
        action_dim=4,
        obs_dim=10,
        params=params or Params(),
        step_fn=step,
        reset_fn=reset,
        control_fn=control,
        action_low=0.0,
        action_high=10.0,
        # Q11: the declared Box(0,10)^4 (reference quadrotor3d.py:70)
        # forbids the negative body rates the dynamics need (the
        # reference's own control(), :173-178, commands them) — a
        # squashing actor confined to it cannot stabilise.  Physical box
        # for SAC/TD3/DDPG: thrust [0, 2·hover] so the tanh-zero init
        # sits at hover (m·|g| = 9.8), rates symmetric at the declared
        # magnitude.  step() is unclipped either way (reference :81-83).
        action_low_phys=(0.0, -10.0, -10.0, -10.0),
        action_high_phys=(19.6, 10.0, 10.0, 10.0),
    )
