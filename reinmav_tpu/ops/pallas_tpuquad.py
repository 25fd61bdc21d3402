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
    # done = ~finite | z<=0.3 | |x|>=2 | |y|>=2 ; finite stays finite in
    # this contact-free dynamics for live states (reset long before blowup)
    done = (pz <= 0.3) | (jnp.abs(px) >= 2.0) | (jnp.abs(py) >= 2.0)
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
