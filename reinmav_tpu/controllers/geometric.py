"""Geometric (quaternion / tilt-prioritised) controller as a pure function.

The reference embeds this controller three times with identical math:
``Quadrotor3D.control`` (``quadrotor3d.py:126-180``),
``Quadrotor3DSlungload.control`` (``quadrotor3d_slungload.py:169-226``) and
the MuJoCo demo ``example/mujoco/control_quat.py:74-129`` (its intended
home, ``controller/quat_pid_controller.py``, is an empty placeholder, C12).
Here it lives once, parameterised by reference pos/vel and gains, and is
re-used by the env ``control_fn``s and the circle-tracking demo policy.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import quadmath as qm


class Gains(NamedTuple):
    kp: tuple = (-5.0, -5.0, -5.0)
    kv: tuple = (-4.0, -4.0, -4.0)
    tau: float = 0.3
    gravity: float = -9.8


def control(
    gains: Gains,
    pos: jnp.ndarray,
    quat: jnp.ndarray,
    vel: jnp.ndarray,
    ref_pos: jnp.ndarray,
    ref_vel: jnp.ndarray | None = None,
    ref_acc: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """→ action ``[thrust, wx, wy, wz]``.

    Parity-relevant ordering (see oracle): attitude error from the *raw*
    quaternion, thrust projection from the normalised one; ``sign(qe0)``
    returns 0 at 180° error (Q10).
    """
    dtype = pos.dtype
    kp = jnp.asarray(gains.kp, dtype)
    kv = jnp.asarray(gains.kv, dtype)
    g = jnp.asarray([0.0, 0.0, gains.gravity], dtype)
    if ref_vel is None:
        ref_vel = jnp.zeros(3, dtype)
    feedback = kp * (pos - ref_pos) + kv * (vel - ref_vel)
    desired_acc = (ref_acc if ref_acc is not None else 0.0) + feedback - g

    desired_quat = qm.acc2quat(desired_acc)
    qe = qm.quat_mul(qm.quat_conj(quat), desired_quat)
    w = (2.0 / gains.tau) * jnp.sign(qe[0]) * qe[1:4]

    rot = qm.quat_to_rotmat(qm.quat_normalize(quat))
    thrust = desired_acc @ rot[:, 2]
    return jnp.concatenate([thrust[None], w])


def circle_reference(t, radius=0.5, omega=1.0, z=1.0, dtype=jnp.float32):
    """Circle trajectory of the MuJoCo demos
    (``control_quat.py:140-146``, ``control_rpy.py:66-72``)."""
    x = radius * jnp.cos(omega * t)
    y = radius * jnp.sin(omega * t)
    return jnp.stack([x, y, jnp.asarray(z, dtype) * jnp.ones_like(x)], axis=-1)
