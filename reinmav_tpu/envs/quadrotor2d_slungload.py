"""TPU-native planar quadrotor with slung load (``quadrotor2d-slungload-v0``).

Pure-JAX re-design of reference
``gym_reinmav/envs/native/quadrotor2d_slungload.py`` (C4 in SURVEY.md §2):
9-state ``[x, z, theta, vx, vz, lx, lz, lvx, lvz]``, action ``[thrust, w]``
(thrust in Newtons — no 10x gain here, unlike the plain 2D env).

The taut/slack tether branch (``quadrotor2d_slungload.py:96-132``) is
computed on both sides and selected with ``jnp.where`` (vmap/TPU friendly —
no divergent control flow).  Parity points:

* Taut load acceleration projects ``thrust_vec − m·L·⟨lv,lv⟩`` (a *scalar*
  broadcast-subtracted from the vector, exactly as the reference) onto the
  tether direction, then adds gravity; tension ``T = m_l·‖−g+a_l‖·û``.
* Velocity-FIRST Euler order for both load and quad (Q3 — opposite of the
  3D slung-load sibling).
* Kinematic projection of the load back onto the tether circle and removal
  of the radial relative velocity (taut branch only).
* Done on load-pos/load-vel norms; reward −‖quad pos‖ (``:136-143``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .core import EnvDef, StepOut, uniform_reset


class Params(NamedTuple):
    mass: float = 1.0
    load_mass: float = 0.1
    dt: float = 0.01
    gravity: float = -9.8
    tether_length: float = 0.5
    pos_limit: float = 2.0
    vel_limit: float = 10.0
    ref_x: float = 0.0
    ref_z: float = 0.0
    kp: float = -5.0
    kv: float = -4.0
    tau: float = 0.1


def _safe_unit(v: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(v)
    return v / jnp.where(n > 0.0, n, 1.0)


def step(p: Params, s: jnp.ndarray, a: jnp.ndarray) -> StepOut:
    dt = jnp.asarray(p.dt, s.dtype)
    thrust = a[0]
    w = a[1]

    pos = s[0:2]
    att = s[2]
    vel = s[3:5]
    load_pos = s[5:7]
    load_vel = s[7:9]

    g = jnp.asarray([0.0, p.gravity], s.dtype)
    heading = jnp.stack([jnp.cos(att + jnp.pi / 2), jnp.sin(att + jnp.pi / 2)])

    tether_vec = load_pos - pos
    tnorm = jnp.linalg.norm(tether_vec)
    unit = _safe_unit(tether_vec)  # ref divides unguarded; unit is unused when slack
    taut = tnorm >= p.tether_length

    # ---- taut branch -----------------------------------------------------
    thrust_vec = thrust * heading
    la_t = jnp.dot(unit, thrust_vec - p.mass * p.tether_length * jnp.dot(load_vel, load_vel)) * unit
    la_t = (1.0 / (p.mass + p.load_mass)) * la_t + g
    lv_t = load_vel + la_t * dt                       # velocity FIRST (Q3)
    lp_t = load_pos + lv_t * dt + 0.5 * la_t * dt * dt

    tension = p.load_mass * jnp.linalg.norm(-g + la_t) * unit
    acc_t = thrust / p.mass * heading + g + tension / p.mass
    vel_t = vel + acc_t * dt                          # velocity FIRST
    pos_t = pos + vel_t * dt + 0.5 * acc_t * dt * dt

    load_dir = _safe_unit(lp_t - pos_t)
    lp_t = pos_t + load_dir * p.tether_length
    lv_t = lv_t - jnp.dot(lv_t - vel_t, load_dir) * load_dir

    # ---- slack branch ----------------------------------------------------
    lv_s = load_vel + g * dt
    lp_s = load_pos + lv_s * dt + 0.5 * g * dt * dt

    acc_s = thrust / p.mass * heading + g
    vel_s = vel + acc_s * dt
    pos_s = pos + vel_s * dt + 0.5 * acc_s * dt * dt

    # ---- select ----------------------------------------------------------
    pos = jnp.where(taut, pos_t, pos_s)
    vel = jnp.where(taut, vel_t, vel_s)
    load_pos = jnp.where(taut, lp_t, lp_s)
    load_vel = jnp.where(taut, lv_t, lv_s)
    att = att + w * dt  # identical in both branches

    state = jnp.concatenate([pos, att[None], vel, load_pos, load_vel])
    lpn = jnp.linalg.norm(load_pos)
    lvn = jnp.linalg.norm(load_vel)
    done = (lpn > p.pos_limit) | (lvn > p.vel_limit)
    reward = jnp.where(done, jnp.asarray(1.0, s.dtype), -jnp.linalg.norm(pos))
    return StepOut(state, state, reward, done)


def control(p: Params, s: jnp.ndarray) -> jnp.ndarray:
    """Same PD position controller as the plain 2D env (on the quad state,
    ignoring the load — reference ``quadrotor2d_slungload.py:160-186``)."""
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
reset = uniform_reset(9)


def make(params: Params | None = None) -> EnvDef:
    return EnvDef(
        name="quadrotor2d-slungload-v0",
        state_dim=9,
        action_dim=2,
        obs_dim=9,
        params=params or Params(),
        step_fn=step,
        reset_fn=reset,
        control_fn=control,
    )
