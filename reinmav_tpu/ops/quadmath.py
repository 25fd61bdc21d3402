"""Quaternion / rotation math kernels for the TPU-native quadrotor suite.

Pure ``jax.numpy`` functions, unbatched over the trailing axis, dtype
polymorphic (float32 for TPU throughput, float64 under
``jax.config.enable_x64`` for CPU parity runs).  All functions are safe
under ``jax.vmap`` / ``jax.jit``.

Semantics notes (behavioural parity with the reference implementation,
ethz-asl/reinmav-gym):

* Quaternion layout is ``(w, x, y, z)`` everywhere — matching pyquaternion
  and the reference's hand-rolled ``quat2mat``
  (reference ``gym_reinmav/envs/native/reinmav_env.py:267-290``).
* ``quat_to_rotmat`` assumes a *unit* quaternion and matches pyquaternion's
  ``Quaternion.rotation_matrix`` after its in-place normalisation
  (reference ``quadrotor3d.py:94-96`` relies on that normalisation).
* ``quat_to_rotmat_nonunit`` replicates the reference's non-unit tolerant
  ``quat2mat`` (``reinmav_env.py:267-290``): scale ``s = 2/|q|^2`` with an
  identity fallback for ``|q|^2 <= eps``.
* ``quat_from_rotmat`` replicates pyquaternion's branchy matrix→quaternion
  conversion (euclideanspace.com algorithm operating on the transposed
  matrix), needed by the geometric controller's ``acc2quat``
  (reference ``quadrotor3d.py:127-141``).
"""

from __future__ import annotations

import jax.numpy as jnp

_FLOAT64_EPS = float(jnp.finfo(jnp.float64).eps)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``q1 ⊗ q2``, (w, x, y, z) layout.

    Matches pyquaternion ``Quaternion.__mul__`` (used by the reference
    geometric controller, ``quadrotor3d.py:168``).
    """
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate (w, -x, -y, -z)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_norm(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(q, axis=-1)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Safe normalisation: returns ``q`` unchanged when ``|q| == 0``.

    Mirrors pyquaternion ``_normalise`` (divides only when the norm is
    positive), so a zero quaternion stays zero instead of becoming NaN.
    """
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(n > 0.0, q / jnp.where(n > 0.0, n, 1.0), q)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix of a *unit* quaternion, (w, x, y, z) layout.

    Equals pyquaternion's ``rotation_matrix`` for normalised input
    (the reference always normalises first — see ``quadrotor3d.py:94``).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r00 = 1.0 - 2.0 * (yy + zz)
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = 1.0 - 2.0 * (xx + zz)
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = 1.0 - 2.0 * (xx + yy)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_to_rotmat_nonunit(q: jnp.ndarray) -> jnp.ndarray:
    """Non-unit tolerant quaternion → rotation matrix.

    Replicates the reference ``quat2mat`` (``reinmav_env.py:267-290``):
    ``s = 2 / (q·q)`` scaling with identity fallback for ``q·q <= eps``.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    nq = w * w + x * x + y * y + z * z
    safe_nq = jnp.where(nq > _FLOAT64_EPS, nq, 1.0)
    s = 2.0 / safe_nq
    X, Y, Z = x * s, y * s, z * s
    wX, wY, wZ = w * X, w * Y, w * Z
    xX, xY, xZ = x * X, x * Y, x * Z
    yY, yZ, zZ = y * Y, y * Z, z * Z
    row0 = jnp.stack([1.0 - (yY + zZ), xY - wZ, xZ + wY], axis=-1)
    row1 = jnp.stack([xY + wZ, 1.0 - (xX + zZ), yZ - wX], axis=-1)
    row2 = jnp.stack([xZ - wY, yZ + wX, 1.0 - (xX + yY)], axis=-1)
    mat = jnp.stack([row0, row1, row2], axis=-2)
    eye = jnp.eye(3, dtype=q.dtype)
    return jnp.where((nq > _FLOAT64_EPS)[..., None, None], mat, eye)


def quat_derivative(q: jnp.ndarray, omega: jnp.ndarray) -> jnp.ndarray:
    """``q̇ = ½ q ⊗ (0, ω)`` for body rates ``ω``.

    Matches pyquaternion ``Quaternion.derivative`` (reference
    ``quadrotor3d.py:101``).  Note the reference calls this on the
    *normalised* quaternion (in-place normalisation side effect of
    ``rotation_matrix``) — callers must normalise first for parity.
    """
    zero = jnp.zeros_like(omega[..., :1])
    omega_q = jnp.concatenate([zero, omega], axis=-1)
    return 0.5 * quat_mul(q, omega_q)


def quat_from_rotmat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix → unit quaternion, pyquaternion branch semantics.

    pyquaternion's ``_from_matrix`` transposes the matrix first (it assumes
    row-vector convention) and then applies the euclideanspace.com branchy
    algorithm.  Branch choice (hence quaternion *sign*) matters for parity
    of the geometric controller (``quadrotor3d.py:139,166-173``).
    Implemented with ``jnp.where`` over all four branches for vmap safety.
    """
    mt = jnp.swapaxes(m, -1, -2)

    def at(i, j):
        return mt[..., i, j]

    # Branch A: m[2,2] < 0 and m[0,0] > m[1,1]
    tA = 1.0 + at(0, 0) - at(1, 1) - at(2, 2)
    qA = jnp.stack([at(1, 2) - at(2, 1), tA, at(0, 1) + at(1, 0), at(2, 0) + at(0, 2)], axis=-1)
    # Branch B: m[2,2] < 0 and m[0,0] <= m[1,1]
    tB = 1.0 - at(0, 0) + at(1, 1) - at(2, 2)
    qB = jnp.stack([at(2, 0) - at(0, 2), at(0, 1) + at(1, 0), tB, at(1, 2) + at(2, 1)], axis=-1)
    # Branch C: m[2,2] >= 0 and m[0,0] < -m[1,1]
    tC = 1.0 - at(0, 0) - at(1, 1) + at(2, 2)
    qC = jnp.stack([at(0, 1) - at(1, 0), at(2, 0) + at(0, 2), at(1, 2) + at(2, 1), tC], axis=-1)
    # Branch D: m[2,2] >= 0 and m[0,0] >= -m[1,1]
    tD = 1.0 + at(0, 0) + at(1, 1) + at(2, 2)
    qD = jnp.stack([tD, at(1, 2) - at(2, 1), at(2, 0) - at(0, 2), at(0, 1) - at(1, 0)], axis=-1)

    neg_zz = at(2, 2) < 0.0
    q_neg = jnp.where((at(0, 0) > at(1, 1))[..., None], qA, qB)
    t_neg = jnp.where(at(0, 0) > at(1, 1), tA, tB)
    q_pos = jnp.where((at(0, 0) < -at(1, 1))[..., None], qC, qD)
    t_pos = jnp.where(at(0, 0) < -at(1, 1), tC, tD)
    q = jnp.where(neg_zz[..., None], q_neg, q_pos)
    t = jnp.where(neg_zz, t_neg, t_pos)
    return q * (0.5 / jnp.sqrt(t))[..., None]


def acc2quat(desired_acc: jnp.ndarray) -> jnp.ndarray:
    """Desired-acceleration → attitude quaternion (geometric controller).

    Gram-Schmidt frame construction with ``yc = [0, 1, 0]`` exactly as the
    reference (``quadrotor3d.py:127-141``): ``zb = â``, ``xb = yc × zb``
    (normalised), ``yb = zb × xb``; rotation matrix columns ``[xb yb zb]``;
    then pyquaternion matrix→quaternion conversion.
    """
    zb = desired_acc / jnp.linalg.norm(desired_acc, axis=-1, keepdims=True)
    yc = jnp.asarray([0.0, 1.0, 0.0], dtype=desired_acc.dtype)
    xb = jnp.cross(yc, zb)
    xb = xb / jnp.linalg.norm(xb, axis=-1, keepdims=True)
    yb = jnp.cross(zb, xb)
    zb = zb / jnp.linalg.norm(zb, axis=-1, keepdims=True)
    rotmat = jnp.stack([xb, yb, zb], axis=-1)  # columns are xb, yb, zb
    return quat_from_rotmat(rotmat)


def rot_to_rpy_zxy(r: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ZXY Euler extraction (phi, theta, psi) from a rotation matrix.

    Replicates the reference ``RotToRPY`` (``reinmav_env.py:341-346``):
    ``phi = asin(R[1,2])``, ``psi = atan2(-R[1,0]/cphi, R[1,1]/cphi)``,
    ``theta = atan2(-R[0,2]/cphi, R[2,2]/cphi)``.
    """
    phi = jnp.arcsin(r[..., 1, 2])
    cphi = jnp.cos(phi)
    psi = jnp.arctan2(-r[..., 1, 0] / cphi, r[..., 1, 1] / cphi)
    theta = jnp.arctan2(-r[..., 0, 2] / cphi, r[..., 2, 2] / cphi)
    return phi, theta, psi


def quat_to_rpy(q: jnp.ndarray) -> jnp.ndarray:
    """Roll/pitch/yaw extraction used by the cascaded RPY PID controller.

    Replicates ``RpyController._quat_to_rpy``
    (reference ``gym_reinmav/controller/rpy_pid_controller.py:209-217``).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(2.0 * (w * y - z * x))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)
