"""Pallas TPU kernel: fused MujocoQuadForce-v1 (hovering) rollout.

The RL workhorse env (the reference trains on it,
``example/mujoco/train_hovering.py:37``) fused like
:mod:`ops.pallas_rollout`: grid over batch tiles, the whole horizon as a
``fori_loop`` in VMEM, sublane-dense 13-component layout
(pos3, quat4, vel3, omega3 → (104, bt) tiles).

Semantics: the float32 production path of ``envs/tpuquad.py``
``_force_env_step(hovering=True)`` with default params and a CONSTANT
per-motor control (the throughput workload — policy-in-the-loop rollouts
live in the PPO scan path): frame_skip=2 semi-implicit Euler substeps,
exp-map quaternion integration, rigid-body Euler equation with the
geom-derived inertia, the shaped reward with its raw-action quirk, and
fused auto-reset to the DETERMINISTIC initial pose (no RNG needed —
``mujoco_quad.py:65-69``).

Contact is exact by omission: the env terminates at z ≤ 0.3 while the
lowest contact point sits 0.025 below the CoM, so no live state can
touch the plane; resets restore z = 1.  (The ground env Force-v0 — which
does ride contact — stays on the scan path.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False


def available() -> bool:
    return _PALLAS


# envs/tpuquad.py Params() defaults (validated vs the geom derivation by
# tests/test_tpuquad_parity.py).
_MASS = 0.3
_IX = 0.0016787227432770446
_IY = 0.0017578105900562893
_IZ = 0.0033807
_G = -9.81
_DT = 0.01
_ARM = 0.1
_YAW_GEAR = 0.1
_MOTOR_X = (1.0, 1.0, -1.0, -1.0)
_MOTOR_Y = (1.0, -1.0, -1.0, 1.0)
_YAW_SIGN = (-1.0, 1.0, -1.0, 1.0)
_INIT = (0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0) + (0.0,) * 6  # hovering reset


def _substep(comp, ctrl):
    """One semi-implicit Euler physics substep on 13 component tiles."""
    px, py, pz, qw, qx, qy, qz, vx, vy, vz, ox, oy, oz = comp

    # Normalised-quat rotation third column (thrust direction).
    qn2 = qw * qw + qx * qx + qy * qy + qz * qz
    inv_qn2 = 1.0 / qn2
    bzx = 2.0 * (qx * qz + qw * qy) * inv_qn2
    bzy = 2.0 * (qy * qz - qw * qx) * inv_qn2
    bzz = 1.0 - 2.0 * (qx * qx + qy * qy) * inv_qn2

    total = float(sum(ctrl))
    mx = _ARM * float(sum(y * c for y, c in zip(_MOTOR_Y, ctrl)))
    my = -_ARM * float(sum(x * c for x, c in zip(_MOTOR_X, ctrl)))
    mz = _YAW_GEAR * float(sum(s * c for s, c in zip(_YAW_SIGN, ctrl)))

    accx = bzx * (total / _MASS)
    accy = bzy * (total / _MASS)
    accz = bzz * (total / _MASS) + _G

    # I ω̇ = τ − ω × (I ω)
    odx = (mx - (oy * (_IZ * oz) - oz * (_IY * oy))) / _IX
    ody = (my - (oz * (_IX * ox) - ox * (_IZ * oz))) / _IY
    odz = (mz - (ox * (_IY * oy) - oy * (_IX * ox))) / _IZ

    nvx, nvy, nvz = vx + accx * _DT, vy + accy * _DT, vz + accz * _DT
    nox, noy, noz = ox + odx * _DT, oy + ody * _DT, oz + odz * _DT
    npx = px + nvx * _DT            # positions from NEW velocities
    npy = py + nvy * _DT
    npz = pz + nvz * _DT

    # Exp-map quaternion update: q ⊗ exp(½ ω dt), renormalised.
    rx, ry, rz = nox * _DT, noy * _DT, noz * _DT
    ang2 = rx * rx + ry * ry + rz * rz
    ang = jnp.sqrt(ang2)
    half = 0.5 * ang
    safe = jnp.where(ang > 1e-9, ang, 1.0)
    sinc_half = jnp.where(ang > 1e-9, jnp.sin(half) / safe, 0.5)
    dw = jnp.cos(half)
    dx, dy, dz = rx * sinc_half, ry * sinc_half, rz * sinc_half
    mqw = qw * dw - qx * dx - qy * dy - qz * dz
    mqx = qw * dx + qx * dw + qy * dz - qz * dy
    mqy = qw * dy - qx * dz + qy * dw + qz * dx
    mqz = qw * dz + qx * dy - qy * dx + qz * dw
    inv_n = jax.lax.rsqrt(mqw * mqw + mqx * mqx + mqy * mqy + mqz * mqz)

    return [npx, npy, npz, mqw * inv_n, mqx * inv_n, mqy * inv_n, mqz * inv_n,
            nvx, nvy, nvz, nox, noy, noz]


def _hover_step_tiles(comp, raw_action):
    """One outer env step (frame_skip=2) + hovering reward/done.
    ``raw_action`` is the Python-constant 4-vector; dynamics use the
    clipped control, the reward uses the RAW values (reference quirk)."""
    ctrl = tuple(min(max(a, 0.0), 1.0) for a in raw_action)
    comp = _substep(comp, ctrl)
    comp = _substep(comp, ctrl)
    px, py, pz = comp[0], comp[1], comp[2]
    a_sq = float(sum(a * a for a in raw_action))
    a_sum = float(sum(raw_action))
    vel_sq = sum(c * c for c in comp[7:13])
    reward = (
        -10.0 * (px * px + py * py + (pz - 1.0) ** 2)
        - 0.1 * vel_sq
        - a_sq
        + 0.1 * a_sum
        + 100.0
    )
    # done = ~finite | z<=0.3 | |x|>=2 | |y|>=2.  The finite clause
    # matters for arbitrary caller-supplied init states (NaN comparisons
    # are all False, so without it a NaN lane would never reset —
    # breaking the kernel-equals-scan contract).
    finite = jnp.isfinite(sum(comp))
    done = ~finite | (pz <= 0.3) | (jnp.abs(px) >= 2.0) | (jnp.abs(py) >= 2.0)
    return comp, done, reward


def _kernel(horizon, action, s_ref, out_ref, rew_ref):
    ncomp = 13

    def rows(s, i):
        return s[8 * i : 8 * (i + 1)]

    init_rows = jnp.concatenate(
        [jnp.full((8,) + s_ref.shape[1:], v, s_ref.dtype) for v in _INIT], axis=0
    )

    def body(_, carry):
        s, rew_acc = carry
        comp, done, reward = _hover_step_tiles(
            [rows(s, i) for i in range(ncomp)], action
        )
        stacked = jnp.concatenate(comp, axis=0)
        stacked = jnp.where(jnp.tile(done, (ncomp, 1)), init_rows, stacked)
        return stacked, rew_acc + reward

    s0 = s_ref[:, :]
    rew0 = jnp.zeros((8,) + s0.shape[1:], s0.dtype)
    s_final, rew = jax.lax.fori_loop(0, horizon, body, (s0, rew0))
    out_ref[:, :] = s_final
    rew_ref[:, :] = rew


# --------------------------------------------------------------------------
# Contact-enabled kernels: MujocoQuadForce-v0 (ground model) and
# MujocoQuadQuat-v0 (thrust + rate servos), both starting ON the plane
# (deterministic reset z=0) — the compliant contact model runs in-kernel.

_CONTACT_PTS = (
    (0.1, 0.1, 0.0075),
    (0.1, -0.1, 0.0075),
    (-0.1, -0.1, 0.0075),
    (-0.1, 0.1, 0.0075),
    (0.0, 0.0, -0.025),
)
# solref-derived constants (envs/tpuquad.py Params/QuatParams)
_GROUND = dict(mass=0.3, ix=_IX, iy=_IY, iz=_IZ, k=150.0, b=6.0, mu=1.0,
               vs=0.5)
_QUATM = dict(mass=0.4, ix=0.0017412227432770442, iy=0.0018994772567229557,
              iz=0.0035415333333333335, k=200.0, b=8.0, mu=1.0, vs=0.5)
_INIT0 = (0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0) + (0.0,) * 6  # z=0 reset


def _substep_contact(comp, c, total_thrust, mx_c, my_c, mz_c, servo_kv,
                     servo_cmd):
    """Semi-implicit Euler substep with full rotation matrix, optional
    rate servos (``torque += kv (cmd - omega)``), and the 5-point
    compliant plane contact (envs/tpuquad.py:_contact_wrench)."""
    px, py, pz, qw, qx, qy, qz, vx, vy, vz, ox, oy, oz = comp
    m, ix, iy, iz = c["mass"], c["ix"], c["iy"], c["iz"]

    qn2 = qw * qw + qx * qx + qy * qy + qz * qz
    inv = 1.0 / qn2
    # Full normalised rotation matrix.
    r00 = 1.0 - 2.0 * (qy * qy + qz * qz) * inv
    r01 = 2.0 * (qx * qy - qz * qw) * inv
    r02 = 2.0 * (qx * qz + qy * qw) * inv
    r10 = 2.0 * (qx * qy + qz * qw) * inv
    r11 = 1.0 - 2.0 * (qx * qx + qz * qz) * inv
    r12 = 2.0 * (qy * qz - qx * qw) * inv
    r20 = 2.0 * (qx * qz - qy * qw) * inv
    r21 = 2.0 * (qy * qz + qx * qw) * inv
    r22 = 1.0 - 2.0 * (qx * qx + qy * qy) * inv

    fx = r02 * total_thrust
    fy = r12 * total_thrust
    fz = r22 * total_thrust + _G * m
    tx = mx_c + jnp.zeros_like(px)
    ty = my_c + jnp.zeros_like(px)
    tz = mz_c + jnp.zeros_like(px)
    if servo_kv is not None:
        tx = tx + servo_kv * (servo_cmd[0] - ox)
        ty = ty + servo_kv * (servo_cmd[1] - oy)
        tz = tz + servo_kv * (servo_cmd[2] - oz)

    for (bx, by, bz) in _CONTACT_PTS:
        # r_w = R r_b ; contact-point world pos/vel
        rwx = r00 * bx + r01 * by + r02 * bz
        rwy = r10 * bx + r11 * by + r12 * bz
        rwz = r20 * bx + r21 * by + r22 * bz
        # ω × r_b (body), then to world
        cbx = oy * bz - oz * by
        cby = oz * bx - ox * bz
        cbz = ox * by - oy * bx
        vwx = vx + r00 * cbx + r01 * cby + r02 * cbz
        vwy = vy + r10 * cbx + r11 * cby + r12 * cbz
        vwz = vz + r20 * cbx + r21 * cby + r22 * cbz
        pen = -(pz + rwz)
        fn = jnp.maximum(c["k"] * pen - c["b"] * vwz, 0.0)
        fn = jnp.where(pen > 0.0, fn, 0.0)
        speed = jnp.sqrt(vwx * vwx + vwy * vwy)
        scale = -c["mu"] * fn / jnp.maximum(speed, c["vs"])
        ftx = scale * vwx
        fty = scale * vwy
        fx = fx + ftx
        fy = fy + fty
        fz = fz + fn
        # torque_b += r_b × (Rᵀ f_w)
        fbx = r00 * ftx + r10 * fty + r20 * fn
        fby = r01 * ftx + r11 * fty + r21 * fn
        fbz = r02 * ftx + r12 * fty + r22 * fn
        tx = tx + by * fbz - bz * fby
        ty = ty + bz * fbx - bx * fbz
        tz = tz + bx * fby - by * fbx

    odx = (tx - (oy * (iz * oz) - oz * (iy * oy))) / ix
    ody = (ty - (oz * (ix * ox) - ox * (iz * oz))) / iy
    odz = (tz - (ox * (iy * oy) - oy * (ix * ox))) / iz
    accx, accy, accz = fx / m, fy / m, fz / m

    nvx, nvy, nvz = vx + accx * _DT, vy + accy * _DT, vz + accz * _DT
    nox, noy, noz = ox + odx * _DT, oy + ody * _DT, oz + odz * _DT
    npx = px + nvx * _DT
    npy = py + nvy * _DT
    npz = pz + nvz * _DT

    rx, ry, rz = nox * _DT, noy * _DT, noz * _DT
    ang = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    half = 0.5 * ang
    safe = jnp.where(ang > 1e-9, ang, 1.0)
    sinc_half = jnp.where(ang > 1e-9, jnp.sin(half) / safe, 0.5)
    dw = jnp.cos(half)
    dx, dy, dz = rx * sinc_half, ry * sinc_half, rz * sinc_half
    mqw = qw * dw - qx * dx - qy * dy - qz * dz
    mqx = qw * dx + qx * dw + qy * dz - qz * dy
    mqy = qw * dy - qx * dz + qy * dw + qz * dx
    mqz = qw * dz + qx * dy - qy * dx + qz * dw
    inv_n = jax.lax.rsqrt(mqw * mqw + mqx * mqx + mqy * mqy + mqz * mqz)

    return [npx, npy, npz, mqw * inv_n, mqx * inv_n, mqy * inv_n, mqz * inv_n,
            nvx, nvy, nvz, nox, noy, noz]


def _contact_kernel(horizon, model, action, s_ref, out_ref, rew_ref):
    """Force-v0 / Quat-v0 rollout: constant action, frame_skip=2,
    reward ≡ 0, done on non-finite only (auto-reset to the z=0 pose).
    The reward output carries Σ obs-z per env so consumers depend on the
    stepped physics (benchmark honesty — the true reward is identically
    zero, reference semantics)."""
    if model == "ground":
        c = _GROUND
        ctrl = tuple(min(max(a, 0.0), 1.0) for a in action)
        total = float(sum(ctrl))
        mx_c = _ARM * float(sum(y * u for y, u in zip(_MOTOR_Y, ctrl)))
        my_c = -_ARM * float(sum(x * u for x, u in zip(_MOTOR_X, ctrl)))
        mz_c = _YAW_GEAR * float(sum(s * u for s, u in zip(_YAW_SIGN, ctrl)))
        servo_kv, servo_cmd = None, None
    else:
        c = _QUATM
        total = float(min(max(action[0], 0.0), 4.0))
        mx_c = my_c = mz_c = 0.0
        servo_kv = 0.1
        servo_cmd = tuple(min(max(a, -1.0), 1.0) for a in action[1:4])

    def rows(s, i):
        return s[8 * i : 8 * (i + 1)]

    init_rows = jnp.concatenate(
        [jnp.full((8,) + s_ref.shape[1:], v, s_ref.dtype) for v in _INIT0], axis=0
    )

    def body(_, carry):
        s, z_acc = carry
        comp = [rows(s, i) for i in range(13)]
        comp = _substep_contact(comp, c, total, mx_c, my_c, mz_c, servo_kv, servo_cmd)
        comp = _substep_contact(comp, c, total, mx_c, my_c, mz_c, servo_kv, servo_cmd)
        stacked = jnp.concatenate(comp, axis=0)
        finite = jnp.isfinite(jnp.sum(stacked.reshape(13, 8, -1), axis=0))
        stacked = jnp.where(jnp.tile(~finite, (13, 1)), init_rows, stacked)
        return stacked, z_acc + comp[2]

    s0 = s_ref[:, :]
    z0 = jnp.zeros((8,) + s0.shape[1:], s0.dtype)
    s_final, z_sum = jax.lax.fori_loop(0, horizon, body, (s0, z0))
    out_ref[:, :] = s_final
    rew_ref[:, :] = z_sum


@functools.partial(jax.jit, static_argnames=("horizon", "tile8", "model", "action"))
def contact_rollout_pallas8(states_t: jnp.ndarray, horizon: int,
                            model: str = "ground", tile8: int = 256,
                            action: tuple = (0.0, 0.0, 0.0, 0.0)):
    """Fused MujocoQuadForce-v0 / MujocoQuadQuat-v0 rollout with the
    compliant ground contact in-kernel (constant action).

    Returns (final_states_t (13, B), z_sum (B,)) — the second output is
    Σ_t z (the reward is identically 0 in these envs, reference
    semantics; Σz ties consumers to the stepped physics)."""
    d, batch = states_t.shape
    assert d == 13 and batch % (8 * tile8) == 0, (d, batch, tile8)
    b8 = batch // 8
    s_rows = states_t.reshape(104, b8)
    grid = (b8 // tile8,)
    out, z = pl.pallas_call(
        functools.partial(_contact_kernel, horizon, model, action),
        grid=grid,
        in_specs=[
            pl.BlockSpec((104, tile8), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((104, tile8), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile8), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((104, b8), states_t.dtype),
            jax.ShapeDtypeStruct((8, b8), states_t.dtype),
        ],
    )(s_rows)
    return out.reshape(13, batch), z.reshape(batch)


@functools.partial(jax.jit, static_argnames=("horizon", "tile8", "action"))
def hover_rollout_pallas8(states_t: jnp.ndarray, horizon: int,
                          tile8: int = 256,
                          action: tuple = (0.0, 0.0, 0.0, 0.0)):
    """Fused MujocoQuadForce-v1 rollout with constant action + auto-reset.

    ``states_t``: (13, B) float32, B a multiple of ``8 * tile8``.
    ``action``: Python 4-tuple of per-motor controls (compile-time
    constant).  Returns (final_states_t (13, B), reward_sum (B,)).
    """
    d, batch = states_t.shape
    assert d == 13 and batch % (8 * tile8) == 0, (d, batch, tile8)
    b8 = batch // 8
    s_rows = states_t.reshape(104, b8)
    grid = (b8 // tile8,)
    out, rew = pl.pallas_call(
        functools.partial(_kernel, horizon, action),
        grid=grid,
        in_specs=[
            pl.BlockSpec((104, tile8), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((104, tile8), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile8), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((104, b8), states_t.dtype),
            jax.ShapeDtypeStruct((8, b8), states_t.dtype),
        ],
    )(s_rows)
    return out.reshape(13, batch), rew.reshape(batch)
