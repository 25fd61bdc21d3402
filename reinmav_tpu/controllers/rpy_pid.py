"""Cascaded RPY PID controller as a pure function with explicit carry.

TPU-native re-design of the reference ``RpyController``
(``gym_reinmav/controller/rpy_pid_controller.py:88-191``; gains ``:12-58``;
mixer ``:70-85``): outer x/y PD → desired roll/pitch via a body-frame
rotation, inner [z, roll, pitch, yaw] PID with finite-difference derivative
and integrator, gravity feed-forward ``−m·g/(cosφ·cosθ)``, and the 4x4
mixer ``C_R`` mapping [u_z, u_roll, u_pitch, u_yaw] → per-motor forces.

The reference keeps error buffers as mutable object state
(``rpy_pid_controller.py:113-116``); here they are an explicit
:class:`PidCarry` pytree threaded through ``lax.scan`` — batched, jitted,
stateless.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import quadmath as qm


class Gains(NamedTuple):
    """PID gains (reference ``AttitudeControlGain``/``PositionControlGain``,
    ``rpy_pid_controller.py:12-68``)."""

    # attitude/height P/D/I for [z, roll, pitch, yaw]
    kp_zrpy: tuple = (2.0, 0.1, 0.1, 0.3)
    kd_zrpy: tuple = (0.5, 0.1, 0.1, 0.1)
    ki_zrpy: tuple = (0.01, 0.01, 0.01, 0.01)
    # position P/D for [x, y]
    kp_xy: tuple = (0.6, 0.6)
    kd_xy: tuple = (0.2, 0.2)
    # motor mixer constants (reference ``MotorParam``, L = C = 0.1)
    motor_c: float = 0.1
    motor_l: float = 0.1


class PidCarry(NamedTuple):
    """Error buffers of the cascaded PID (finite-difference + integrator)."""

    position_error: jnp.ndarray  # (2,)
    zrpy_error: jnp.ndarray  # (4,)
    zrpy_error_int: jnp.ndarray  # (4,)


def init_carry(dtype=jnp.float32) -> PidCarry:
    return PidCarry(
        position_error=jnp.zeros(2, dtype),
        zrpy_error=jnp.zeros(4, dtype),
        zrpy_error_int=jnp.zeros(4, dtype),
    )


def mixer_matrix(g: Gains, dtype=jnp.float32) -> jnp.ndarray:
    """C_R of ``MotorParam`` (``rpy_pid_controller.py:79-85``): rows are
    motors (++, +-, --, -+); a=1/4, b=1/(4L), c=1/(4C)."""
    a = 0.25
    b = 1.0 / (4.0 * g.motor_l)
    c = 1.0 / (4.0 * g.motor_c)
    return jnp.asarray(
        [[a, b, -b, -c], [a, -b, -b, c], [a, -b, b, -c], [a, b, b, c]], dtype
    )


def control(
    gains: Gains,
    carry: PidCarry,
    position: jnp.ndarray,
    quat: jnp.ndarray,
    position_d: jnp.ndarray,
    yaw_d,
    dt,
    mass,
    gravity=-9.81,
):
    """One controller evaluation → (motor forces (4,), new carry).

    Mirrors ``RpyController.control`` (``rpy_pid_controller.py:118-191``)
    including: desired roll = −(R_BW·u_s)[1], desired pitch = +(R_BW·u_s)[0]
    (body-frame projection of the position input), and the gravity
    feed-forward divided by cosφ·cosθ.
    """
    dtype = position.dtype
    rpy = qm.quat_to_rpy(quat)

    s_xy = position[0:2]
    x_state = jnp.concatenate([position[2][None], rpy])  # [z, roll, pitch, yaw]

    # Outer position PD with finite-difference derivative.
    es = position_d[0:2] - s_xy
    es_dot = (es - carry.position_error) / dt
    us = jnp.asarray(gains.kp_xy, dtype) * es + jnp.asarray(gains.kd_xy, dtype) * es_dot
    us3 = jnp.concatenate([us, jnp.zeros(1, dtype)])

    # Rotate the position input into the body frame: R_BW = R_WB⁻¹.
    # The reference applies the unit-quaternion formula to the raw quat and
    # then inverts the matrix (``rpy_pid_controller.py:164,197-207``) — kept
    # literally (inverse ≠ transpose only for non-unit quats).
    rot_bw = jnp.linalg.inv(qm.quat_to_rotmat(quat))
    us_b = rot_bw @ us3
    x_d = jnp.stack([position_d[2], -us_b[1], us_b[0], jnp.asarray(yaw_d, dtype)])

    # Inner z/r/p/y PID.
    ex = x_d - x_state
    ex_dot = (ex - carry.zrpy_error) / dt
    ex_int = carry.zrpy_error_int + ex * dt

    u = (
        jnp.asarray(gains.kp_zrpy, dtype) * ex
        + jnp.asarray(gains.kd_zrpy, dtype) * ex_dot
        + jnp.asarray(gains.ki_zrpy, dtype) * ex_int
    )
    gravity_ff = -mass * gravity / (jnp.cos(rpy[1]) * jnp.cos(rpy[0]))
    u = u.at[0].add(gravity_ff)

    forces = mixer_matrix(gains, dtype) @ u
    new_carry = PidCarry(position_error=es, zrpy_error=ex, zrpy_error_int=ex_int)
    return forces, new_carry
