"""Pallas TPU kernel: fused reinmav-v0 simulation (outer steps × 50/51
controller-in-the-loop Euler substeps) resident in VMEM.

The generic dense8 scan path pays heavy relayout traffic: the double-
vmapped step builds many tiny stacked intermediates ((3,)/(4,)/(9,)
vectors per env → (k, 8, bt) concats).  Here every state component is one
(8, bt) tile and the whole substep — quat→ZXY Euler extraction, quintic
trajectory, PD controller, motor mixing, rigid-body EOM — is straight
elementwise tile arithmetic with zero stacking.

Float32 production path of ``envs/reinmav13.py`` (reference
``reinmav_env.py:90-264``): the masked 51-iteration substep loop with the
live ``len(np.arange(t, t+dt, ds))`` count computed in f32, the per-rotor
clamp with unclamped Mz, and the K_quat=2 norm feedback.  Differential-
tested against the scan path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False

# Physics constants (envs/reinmav13.py Params defaults,
# reference reinmav_env.py:55-63).
_MASS = 0.18
_G = 9.81
_ARM = 0.086
_MINF = 0.0
_MAXF = 3.5316
_DT = 1.0 / 100.0
_DS = 1.0 / 5000.0
_KQ = 2.0
_TMAX = 4.0
_KP = (10.0, 10.0, 35.0)
_KD = (5.0, 5.0, 22.0)
_KPR = (100.0, 100.0, 100.0)
_KDR = (0.1, 0.1, 0.1)
_INERTIA_NP = np.array(
    [[0.00025, 0.0, 2.55e-06], [0.0, 0.000232, 0.0], [2.55e-06, 0.0, 0.0003738]]
)
# Python-float constants: NumPy f64 scalars are strongly typed and would
# promote the f32 tiles under jax_enable_x64 (breaking the fori_loop carry).
_INERTIA = tuple(tuple(float(v) for v in row) for row in _INERTIA_NP)
_INV_I = tuple(tuple(float(v) for v in row) for row in np.linalg.inv(_INERTIA_NP))
_EPS = float(np.finfo(np.float64).eps)


def available() -> bool:
    return _PALLAS


# -- inverse-trig built from available primitives -------------------------
# Mosaic TPU has no asin/atan/atan2 lowerings (verified empirically), so
# they are implemented here: Cephes-style range-reduced minimax polynomial
# for atan (|err| ~ 1e-7 in f32), atan2 by quadrant fix-up, asin via
# atan2(x, sqrt(1-x^2)).

_PI = 3.14159265358979323846
_PI_2 = _PI / 2.0
_PI_4 = _PI / 4.0
_TAN_3PI_8 = 2.414213562373095  # tan(67.5 deg)
_TAN_PI_8 = 0.4142135623730950  # tan(22.5 deg)


def _atan_pos(x):
    """atan for x >= 0 (Cephes atanf range reduction + 4-term poly)."""
    big = x > _TAN_3PI_8
    mid = x > _TAN_PI_8
    safe_x = jnp.where(big, x, 1.0)
    x1 = jnp.where(
        big, -1.0 / safe_x, jnp.where(mid, (x - 1.0) / (x + 1.0), x)
    )
    z = x1 * x1
    p = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * x1 + x1
    return jnp.where(big, _PI_2 + p, jnp.where(mid, _PI_4 + p, p))


def _atan(x):
    return jnp.sign(x) * _atan_pos(jnp.abs(x))


def _atan2(y, x):
    safe_x = jnp.where(x != 0.0, x, 1.0)
    a = _atan(y / safe_x)
    return jnp.where(
        x > 0.0,
        a,
        jnp.where(
            x < 0.0,
            a + jnp.where(y >= 0.0, _PI, -_PI),
            jnp.where(y > 0.0, _PI_2, jnp.where(y < 0.0, -_PI_2, 0.0)),
        ),
    )


def _asin(x):
    # No clamp: |x| > 1 must produce NaN exactly like jnp.arcsin so the
    # kernel and the scan path agree at (unreachable-in-practice)
    # gimbal-lock overshoots instead of silently diverging.
    return _atan2(x, jnp.sqrt((1.0 - x) * (1.0 + x)))


def _substep(c, tk):
    """One Euler-substep derivative on 13 component tiles ``c``.

    Returns the 13 sdot tiles.  Mirrors ``reinmav13.step``'s inner body
    (state_to_qd → trj_gen → inner_controller → eom).
    """
    x, y, z, vx, vy, vz, qw, qx, qy, qz, p_, q_, r_ = c

    # -- quat2mat (non-unit tolerant, reference quat2mat) -----------------
    nq = qw * qw + qx * qx + qy * qy + qz * qz
    valid = nq > _EPS
    s2 = jnp.where(valid, 2.0 / jnp.where(valid, nq, 1.0), 0.0)
    X, Y, Z = qx * s2, qy * s2, qz * s2
    wX, wY, wZ = qw * X, qw * Y, qw * Z
    xX, xY, xZ = qx * X, qx * Y, qx * Z
    yY, yZ, zZ = qy * Y, qy * Z, qz * Z
    one = jnp.ones_like(nq)
    m00 = jnp.where(valid, 1.0 - (yY + zZ), one)
    m01 = jnp.where(valid, xY - wZ, 0.0)
    m02 = jnp.where(valid, xZ + wY, 0.0)
    m10 = jnp.where(valid, xY + wZ, 0.0)
    m11 = jnp.where(valid, 1.0 - (xX + zZ), one)
    m12 = jnp.where(valid, yZ - wX, 0.0)
    m20 = jnp.where(valid, xZ - wY, 0.0)
    m21 = jnp.where(valid, yZ + wX, 0.0)
    m22 = jnp.where(valid, 1.0 - (xX + yY), one)

    # -- ZXY euler extraction (reference RotToRPY) ------------------------
    phi = _asin(m12)
    cphi = jnp.cos(phi)
    psi = _atan2(-m10 / cphi, m11 / cphi)
    theta = _atan2(-m02 / cphi, m22 / cphi)

    # -- quintic min-jerk reference (reference trj_gen) -------------------
    tc = jnp.maximum(0.0, jnp.minimum(tk, _TMAX)) / _TMAX
    tc2 = tc * tc
    tc3 = tc2 * tc
    pos_d = 10.0 * tc3 - 15.0 * tc3 * tc + 6.0 * tc3 * tc2
    vel_d = (30.0 / _TMAX) * tc2 - (60.0 / _TMAX) * tc3 + (30.0 / _TMAX) * tc2 * tc2
    acc_d = (60.0 / _TMAX**2) * tc - (180.0 / _TMAX**2) * tc2 + (120.0 / _TMAX**2) * tc3
    psi_des, dpsi_des = pos_d, vel_d  # yaw follows the same quintic

    # -- inner PD controller (reference controller) -----------------------
    ddr0 = acc_d + _KD[0] * (vel_d - vx) + _KP[0] * (pos_d - x)
    ddr1 = acc_d + _KD[1] * (vel_d - vy) + _KP[1] * (pos_d - y)
    ddr2 = acc_d + _KD[2] * (vel_d - vz) + _KP[2] * (pos_d - z)
    u1 = _MASS * (_G + ddr2)

    sp, cp = jnp.sin(psi_des), jnp.cos(psi_des)
    phi_des = (ddr0 * sp - ddr1 * cp) / _G
    theta_des = (ddr0 * cp + ddr1 * sp) / _G
    mx = _KPR[0] * (phi_des - phi) - _KDR[0] * p_
    my = _KPR[1] * (theta_des - theta) - _KDR[1] * q_
    mz = _KPR[2] * (psi_des - psi) + _KDR[2] * (dpsi_des - r_)

    # -- motor mixing (reference quad_eq_of_motion2; Mz unclamped) --------
    h = 0.5 / _ARM
    t0 = jnp.clip(0.25 * u1 - h * my, _MINF / 4.0, _MAXF / 4.0)
    t1 = jnp.clip(0.25 * u1 + h * mx, _MINF / 4.0, _MAXF / 4.0)
    t2 = jnp.clip(0.25 * u1 + h * my, _MINF / 4.0, _MAXF / 4.0)
    t3 = jnp.clip(0.25 * u1 - h * mx, _MINF / 4.0, _MAXF / 4.0)
    total_f = t0 + t1 + t2 + t3
    mx_c = _ARM * (t1 - t3)
    my_c = _ARM * (t2 - t0)

    # -- accelerations: wRb·[0,0,F] = row 2 of bRw scaled -----------------
    inv_m = 1.0 / _MASS
    ax = m20 * total_f * inv_m
    ay = m21 * total_f * inv_m
    az = m22 * total_f * inv_m - _G

    # -- quaternion derivative with K_quat norm feedback ------------------
    k_err = _KQ * (1.0 - nq)
    qdw = -0.5 * (-p_ * qx - q_ * qy - r_ * qz) + k_err * qw
    qdx = -0.5 * (p_ * qw - r_ * qy + q_ * qz) + k_err * qx
    qdy = -0.5 * (q_ * qw + r_ * qx - p_ * qz) + k_err * qy
    qdz = -0.5 * (r_ * qw - q_ * qx + p_ * qy) + k_err * qz

    # -- angular acceleration: invI (M - pqr x (I pqr)) -------------------
    ixx, ixz = _INERTIA[0][0], _INERTIA[0][2]
    iyy, izz = _INERTIA[1][1], _INERTIA[2][2]
    ip = ixx * p_ + ixz * r_
    iq = iyy * q_
    ir = ixz * p_ + izz * r_
    cx = q_ * ir - r_ * iq
    cy = r_ * ip - p_ * ir
    cz = p_ * iq - q_ * ip
    rx = mx_c - cx
    ry = my_c - cy
    rz = mz - cz
    pd = _INV_I[0][0] * rx + _INV_I[0][1] * ry + _INV_I[0][2] * rz
    qd = _INV_I[1][0] * rx + _INV_I[1][1] * ry + _INV_I[1][2] * rz
    rd = _INV_I[2][0] * rx + _INV_I[2][1] * ry + _INV_I[2][2] * rz

    return [vx, vy, vz, ax, ay, az, qdw, qdx, qdy, qdz, pd, qd, rd]


def _rollout_kernel(horizon, s_ref, out_ref):
    def comp(s, i):
        return s[8 * i : 8 * (i + 1)]

    # Simulation time is a per-env tile (component 13); the substep count
    # replicates len(np.arange(t, t+dt, ds)) in f32, elementwise per env.
    def outer_tile(step_i, carry):
        s, t_tile = carry
        n_sub = jnp.ceil(((t_tile + _DT) - t_tile) / _DS).astype(jnp.int32)

        def inner(k, s_):
            tk = t_tile + k * _DS
            c = [comp(s_, i) for i in range(13)]
            sdot = _substep(c, tk)
            new = jnp.concatenate(
                [ci + _DS * di for ci, di in zip(c, sdot)], axis=0
            )
            return jnp.where(jnp.tile(k < n_sub, (13, 1)), new, s_)

        s = jax.lax.fori_loop(0, 51, inner, s)
        return s, t_tile + _DT

    s0 = s_ref[0:104, :]
    t0 = s_ref[104:112, :]
    s_final, t_final = jax.lax.fori_loop(0, horizon, outer_tile, (s0, t0))
    out_ref[0:104, :] = s_final
    out_ref[104:112, :] = t_final


@functools.partial(jax.jit, static_argnames=("horizon", "tile8"))
def reinmav_rollout_pallas8(states_t: jnp.ndarray, horizon: int, tile8: int = 256):
    """Fused reinmav-v0 rollout.  ``states_t``: (14, B) float32 (13 state
    components + simulation time), B a multiple of ``8 * tile8``.
    Returns final (14, B) states."""
    d, batch = states_t.shape
    assert d == 14 and batch % (8 * tile8) == 0, (d, batch, tile8)
    b8 = batch // 8
    s112 = states_t.reshape(112, b8)
    grid = (b8 // tile8,)
    out = pl.pallas_call(
        functools.partial(_rollout_kernel, horizon),
        grid=grid,
        in_specs=[pl.BlockSpec((112, tile8), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((112, tile8), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((112, b8), states_t.dtype),
    )(s112)
    return out.reshape(14, batch)
