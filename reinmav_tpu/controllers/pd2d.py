"""Planar PD position + attitude-rate controller as a pure function.

Shared by the 2D envs' ``control()`` (reference ``quadrotor2d.py:115-138``
and ``quadrotor2d_slungload.py:160-186`` — identical math).  Factored out
here for standalone use (e.g. custom reference trajectories); the env
``control_fn``s keep their own copies bound to the env params.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Gains(NamedTuple):
    kp: float = -5.0
    kv: float = -4.0
    tau: float = 0.1
    mass: float = 1.0
    lift: float = 9.8  # gravity-compensation feed-forward


def control(
    gains: Gains,
    pos: jnp.ndarray,
    att,
    vel: jnp.ndarray,
    ref_pos: jnp.ndarray,
    ref_vel: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """→ action ``[thrust_N, omega]`` (thrust in Newtons; the plain 2D env
    then applies its implicit 10x gain in ``step``, Q5)."""
    dtype = pos.dtype
    if ref_vel is None:
        ref_vel = jnp.zeros(2, dtype)
    lift = jnp.asarray([0.0, gains.lift], dtype)
    desired_acc = gains.kp * (pos - ref_pos) + gains.kv * (vel - ref_vel) + lift
    desired_att = jnp.arctan2(desired_acc[1], desired_acc[0]) - jnp.pi / 2
    w = (-1.0 / gains.tau) * (att - desired_att)
    thrust = gains.mass * jnp.linalg.norm(desired_acc)
    return jnp.stack([thrust, w])
