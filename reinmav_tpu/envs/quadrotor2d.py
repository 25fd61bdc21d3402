"""TPU-native planar quadrotor (``quadrotor2d-v0``).

Pure-JAX re-design of reference ``gym_reinmav/envs/native/quadrotor2d.py``
(C3 in SURVEY.md §2): 5-state ``[x, z, theta, vx, vz]``, action
``[thrust_cmd, omega]``.

Behavioural parity points:
* 10x thrust scaling floored at zero (``quadrotor2d.py:75-78``, Q5).
* Position-first explicit Euler with *old* velocity (``:89-91``, Q3).
* Done predicate is the *intended* one behind the reference's syntax error
  (Q1): ``‖pos‖>3 ∨ ‖vel‖>10 ∨ ‖vel‖<-2 ∨ ‖vel‖>2`` — the always-false
  clauses (Q2) fold away, leaving ``‖pos‖>3 ∨ ‖vel‖>2``.
* Reward −‖pos‖ while alive, +1 on the done step (``:101-111``).
* State is a flat float vector (the reference's ragged tuple, Q6, is a
  documented divergence).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .core import EnvDef, StepOut, uniform_reset


class Params(NamedTuple):
    mass: float = 1.0
    dt: float = 0.01
    gravity: float = -9.8
    ref_x: float = 0.0
    ref_z: float = 0.0
    pos_limit: float = 3.0
    vel_limit: float = 2.0
    kp: float = -5.0
    kv: float = -4.0
    tau: float = 0.1
    thrust_scale: float = 10.0


def step(p: Params, s: jnp.ndarray, a: jnp.ndarray) -> StepOut:
    dt = jnp.asarray(p.dt, s.dtype)
    thrust = jnp.maximum(p.thrust_scale * a[0], 0.0)
    w = a[1]

    pos = s[0:2]
    att = s[2]
    vel = s[3:5]

    # Heading: cos/sin(att + pi/2) — thrust along the body "up" direction.
    heading = jnp.stack([jnp.cos(att + jnp.pi / 2), jnp.sin(att + jnp.pi / 2)])
    g = jnp.asarray([0.0, p.gravity], s.dtype)
    acc = thrust / p.mass * heading + g

    pos = pos + vel * dt + 0.5 * acc * dt * dt  # old velocity (Q3)
    vel = vel + acc * dt
    att = att + w * dt

    state = jnp.concatenate([pos, att[None], vel])
    pn = jnp.linalg.norm(pos)
    vn = jnp.linalg.norm(vel)
    done = (pn > p.pos_limit) | (vn > 10.0) | (vn > p.vel_limit)
    reward = jnp.where(done, jnp.asarray(1.0, s.dtype), -pn)
    return StepOut(state, state, reward, done)


def control(p: Params, s: jnp.ndarray) -> jnp.ndarray:
    """PD position + atan2 attitude + first-order rate loop
    (reference ``quadrotor2d.py:115-138``).

    Note the thrust is returned in Newtons while ``step`` applies a 10x
    gain — the closed loop flies with that implicit gain, as the reference
    does (Q5).
    """
    pos = s[0:2]
    att = s[2]
    vel = s[3:5]
    ref_pos = jnp.asarray([p.ref_x, p.ref_z], s.dtype)

    lift = jnp.asarray([0.0, 9.8], s.dtype)
    desired_acc = p.kp * (pos - ref_pos) + p.kv * vel + lift
    desired_att = jnp.arctan2(desired_acc[1], desired_acc[0]) - jnp.pi / 2
    w = (-1.0 / p.tau) * (att - desired_att)
    thrust = p.mass * jnp.linalg.norm(desired_acc)
    return jnp.stack([thrust, w])


#: Module-level reset (identity-checked by the fused-Pallas dispatch).
reset = uniform_reset(5)


def make(params: Params | None = None) -> EnvDef:
    return EnvDef(
        name="quadrotor2d-v0",
        state_dim=5,
        action_dim=2,
        obs_dim=5,
        params=params or Params(),
        step_fn=step,
        reset_fn=reset,
        control_fn=control,
    )
