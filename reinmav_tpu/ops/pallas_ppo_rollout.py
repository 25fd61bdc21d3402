"""Pallas TPU kernel: the ENTIRE PPO rollout phase fused — policy MLP,
Gaussian sampling, environment physics, auto-reset, reward/observation
normalisation accounting, and per-step trajectory writes — one kernel.

Replaces the ``lax.scan`` rollout of :func:`reinmav_tpu.rl.ppo.collect_rollout`
(the workload of reference ``gym_reinmav/run.py:63-68``: vec-env rollouts
feeding baselines ppo2) for every env ID with a trainable reward:

* ``MujocoQuadForce-v1`` (hovering — the reference's RL task,
  ``example/mujoco/train_hovering.py``), deterministic auto-reset;
* ``quadrotor3d-v0`` (native flagship), U(−1,1)^10 auto-reset from the
  on-core PRNG;
* ``quadrotor2d-v0``, ``quadrotor2d-slungload-v0`` and
  ``quadrotor3d-slungload-v0`` (the remaining native reward-bearing
  envs), U(−1,1)^D auto-reset.

``MujocoQuadForce-v0`` / ``MujocoQuadQuat-v0`` are deliberately absent:
their reference reward is identically zero (``mujoco_quad.py:60-63``),
so there is no PPO training workload to fuse — the scan rollout covers
them for API completeness and their plain throughput kernels live in
``pallas_tpuquad``.

Design (see docs/scaling.md):

* Grid ``(batch_tiles, time_chunks)`` — time chunks are sequential
  (scratch carries env state / discounted-return / moment accumulators
  across them); each chunk writes its trajectory block to HBM through
  the normal pallas output pipeline, so trajectories stream out while
  the next chunk computes.
* Env state lives sublane-dense ``(8·D, tile)`` (full VPU density for
  the physics); policy activations live lane-major ``(D, 8·tile)`` for
  the MXU matmuls.  The two views are exact reshapes
  (``(8n, t) ↔ (n, 8t)`` is comp-major flattening both ways).
* Gaussian sampling: Box–Muller over ``pltpu.prng_random_bits``.
  ``log_prob`` is computed from the ROUNDED realised action
  (``action − mean``), exactly what the learner's importance ratio
  recomputes — and what makes the σ→0 limit match the scan path
  bitwise (the differential-test leg).
* Normalisation semantics are ``collect_rollout``'s: raw-obs moment
  streams, VecNormalize-style discounted-return scale for rewards,
  clip(±10) on both.
* The LIVE env ``Params`` ride in as an SMEM f32 vector (the
  throughput-kernel mechanism, ops/pallas_rollout.flat_params_vec),
  unpacked ONCE per grid step outside the time loop — param sweeps
  keep the fused fast path; only wrapped/replaced step/reset FUNCTIONS
  fall back to the scan (``kernel_mismatch``).

The kernel's RNG stream differs from the scan path's (jax.random vs the
on-core PRNG): rollouts are statistically equivalent, not bitwise.  The
differential test (tests/test_pallas_ppo_rollout.py) pins the σ→0 limit
bitwise and the stochastic leg by moment/logp-consistency checks.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False

from . import pallas_tpuquad as ptq
from .pallas_rollout import _Q2_FIELDS, _Q3_FIELDS, _read_params


def available() -> bool:
    return _PALLAS


_LOG2PI = 1.8378770664093453
_HALF_PI = math.pi / 2
_NTRAJ = 24  # trajectory comps per step: obs(D) act(A) logp value reward done pad


def _unif01(shape):
    """U[0,1) from the on-core PRNG (mantissa fill)."""
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    return pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32) - 1.0


def _normal(shape):
    """N(0,1) via Box–Muller (cosine branch)."""
    u = _unif01(shape)
    v = _unif01(shape)
    r = jnp.sqrt(-2.0 * jnp.log(1.0 - u))  # 1-u in (0,1]
    return r * jnp.cos((2.0 * math.pi) * v)


def _uniform_pm1(shape):
    return 2.0 * _unif01(shape) - 1.0


def _mm(a, b, dims, cd):
    if cd is not None:
        a, b = a.astype(cd), b.astype(cd)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


# --- env steps on (8, t) component tiles, per-lane actions ----------------


def _hover_step_tiles(comp, act, pv):
    """MujocoQuadForce-v1 step (frame_skip=2) with per-lane raw actions
    ``act`` = 4 tiles; returns (new_comp, raw_reward, done).  Mirrors
    envs/tpuquad.py hovering_step (clip for dynamics, RAW action in the
    reward — the reference quirk).  ``pv``: the live-Params constants
    dict (:func:`pallas_tpuquad._hover_consts` over the SMEM vector)."""
    a0, a1, a2, a3 = act
    hi = pv["ctrl_high"]      # traced f32 SMEM scalar (x64-safe bounds:
    zero = jnp.float32(0.0)   # python floats would promote through f64)
    c0 = jnp.clip(a0, zero, hi)
    c1 = jnp.clip(a1, zero, hi)
    c2 = jnp.clip(a2, zero, hi)
    c3 = jnp.clip(a3, zero, hi)
    total = c0 + c1 + c2 + c3
    mx = pv["arm"] * (c0 - c1 - c2 + c3)        # motor_y = (+,-,-,+)
    my = -pv["arm"] * (c0 + c1 - c2 - c3)       # motor_x = (+,+,-,-)
    mz = pv["yaw_gear"] * (-c0 + c1 - c2 + c3)  # yaw sign = (-,+,-,+)
    comp = ptq._rigid_substep(comp, pv, total, mx, my, mz, None, None, False)
    comp = ptq._rigid_substep(comp, pv, total, mx, my, mz, None, None, False)
    px, py, pz = comp[0], comp[1], comp[2]
    a_sq = a0 * a0 + a1 * a1 + a2 * a2 + a3 * a3
    a_sum = a0 + a1 + a2 + a3
    vel_sq = sum(c * c for c in comp[7:13])
    reward = (
        -10.0 * (px * px + py * py + (pz - 1.0) ** 2)
        - 0.1 * vel_sq
        - a_sq
        + 0.1 * a_sum
        + 100.0
    )
    finite = jnp.isfinite(sum(comp))
    done = ~finite | (pz <= 0.3) | (jnp.abs(px) >= 2.0) | (jnp.abs(py) >= 2.0)
    return comp, reward, done


def _hover_reset_rows(shape, dtype, pv):
    """Deterministic reset pose: z = Params.init_z (traced), qw = 1."""
    row = (8,) + shape[1:]
    zero = jnp.zeros(row, dtype)
    return jnp.concatenate(
        [zero, zero, jnp.full(row, pv["init_z"], dtype),
         jnp.full(row, 1.0, dtype)] + [zero] * 9, axis=0
    )


def _quad3d_step_tiles(comp, act, pv):
    """quadrotor3d-v0 step with per-lane actions [thrust, wx, wy, wz]
    (envs/quadrotor3d.py:step — Q3/Q4 semantics: pos-first Euler with the
    old velocity, quat derivative of the normalised quat added to the
    raw stored quat).  ``pv``: live Params as SMEM scalars
    (:data:`pallas_rollout._Q3_FIELDS` order); ``thrust / mass`` keeps
    the scan path's op order (bitwise at mass = 1)."""
    px, py, pz, qw, qx, qy, qz, vx, vy, vz = comp
    thrust, wx, wy, wz = act
    dt, g, m = pv["dt"], pv["gravity"], pv["mass"]
    plim, vlim = pv["pos_limit"], pv["vel_limit"]

    qn2 = qw * qw + qx * qx + qy * qy + qz * qz
    inv_qn = jax.lax.rsqrt(qn2)
    inv = inv_qn * inv_qn
    bzx = 2.0 * (qx * qz + qw * qy) * inv
    bzy = 2.0 * (qy * qz - qw * qx) * inv
    bzz = 1.0 - 2.0 * (qx * qx + qy * qy) * inv

    tq = thrust / m
    accx = tq * bzx
    accy = tq * bzy
    accz = tq * bzz + g

    npx = px + vx * dt + 0.5 * accx * dt * dt
    npy = py + vy * dt + 0.5 * accy * dt * dt
    npz = pz + vz * dt + 0.5 * accz * dt * dt
    nvx, nvy, nvz = vx + accx * dt, vy + accy * dt, vz + accz * dt

    hw, hx, hy, hz = qw * inv_qn, qx * inv_qn, qy * inv_qn, qz * inv_qn
    half_dt = 0.5 * dt
    nqw = qw + half_dt * (-hx * wx - hy * wy - hz * wz)
    nqx = qx + half_dt * (hw * wx + hy * wz - hz * wy)
    nqy = qy + half_dt * (hw * wy - hx * wz + hz * wx)
    nqz = qz + half_dt * (hw * wz + hx * wy - hy * wx)

    pn2 = npx * npx + npy * npy + npz * npz
    vn2 = nvx * nvx + nvy * nvy + nvz * nvz
    done = (pn2 > plim * plim) | (vn2 > vlim * vlim)
    reward = jnp.where(done, jnp.float32(1.0), -jnp.sqrt(pn2))
    new = [npx, npy, npz, nqw, nqx, nqy, nqz, nvx, nvy, nvz]
    return new, reward, done


def _quad3d_reset_rows(shape, dtype, pv):
    return _uniform_pm1((80,) + shape[1:]).astype(dtype)


def _quad2d_step_tiles(comp, act, pv):
    """quadrotor2d-v0 step with per-lane actions [thrust_cmd, omega]
    (envs/quadrotor2d.py:41-64 — Q5 ``thrust_scale``× thrust floored at
    zero, Q3 pos-first Euler with the old velocity, Q1/Q2 folded done
    ``‖pos‖>3 ∨ ‖vel‖>2``, reward −‖pos‖ / +1 on done).  ``pv``: live
    Params (:data:`pallas_rollout._Q2_FIELDS` order)."""
    x, z, th, vx, vz = comp
    a0, a1 = act
    dt, g, m = pv["dt"], pv["gravity"], pv["mass"]
    thrust = jnp.maximum(pv["thrust_scale"] * a0, 0.0)
    tq = thrust / m
    hx = jnp.cos(th + _HALF_PI)
    hz = jnp.sin(th + _HALF_PI)
    ax = tq * hx
    az = tq * hz + g
    nx = x + vx * dt + 0.5 * ax * dt * dt
    nz = z + vz * dt + 0.5 * az * dt * dt
    nvx = vx + ax * dt
    nvz = vz + az * dt
    nth = th + a1 * dt
    pn = jnp.sqrt(nx * nx + nz * nz)
    vn = jnp.sqrt(nvx * nvx + nvz * nvz)
    # envs/quadrotor2d.py:62 done — the hardcoded ‖vel‖>10 clause (the
    # reference's folded Q1/Q2 predicate) must survive vel_limit sweeps.
    done = (pn > pv["pos_limit"]) | (vn > jnp.float32(10.0)) | (
        vn > pv["vel_limit"])
    reward = jnp.where(done, jnp.float32(1.0), -pn)
    return [nx, nz, nth, nvx, nvz], reward, done


def _quad2d_reset_rows(shape, dtype, pv):
    return _uniform_pm1((40,) + shape[1:]).astype(dtype)


def _slung2d_step_tiles(comp, act, pv):
    """quadrotor2d-slungload-v0 step, per-lane actions [thrust_N, omega]
    (envs/quadrotor2d_slungload.py:51-106): taut/slack tether selected
    per lane, velocity-FIRST Euler (Q3), the reference's scalar
    broadcast-subtraction inside the taut load-acceleration projection,
    kinematic re-projection of the load onto the tether circle.
    ``pv``: live Params (:data:`pallas_slungload._S2_FIELDS` order).
    Mass divisions mirror the env's op order (``thrust * heading`` in the
    load projection but ``thrust / m * heading`` and ``tension / m`` in
    the quad acceleration) — bitwise at the m = 1 default."""
    x, z, th, vx, vz, lx, lz, lvx, lvz = comp
    thrust, w = act
    dt, g, L = pv["dt"], pv["gravity"], pv["tether_length"]
    m, ml = pv["mass"], pv["load_mass"]
    hx = jnp.cos(th + _HALF_PI)
    hz = jnp.sin(th + _HALF_PI)
    tvx = thrust * hx                  # thrust_vec (load projection)
    tvz = thrust * hz
    tq = thrust / m                    # quad acceleration scale
    tqx = tq * hx
    tqz = tq * hz

    tx = lx - x
    tz = lz - z
    tn = jnp.sqrt(tx * tx + tz * tz)
    inv = 1.0 / jnp.where(tn > 0.0, tn, jnp.float32(1.0))
    ux = tx * inv
    uz = tz * inv
    taut = tn >= L

    # --- taut branch ------------------------------------------------------
    # la = ⟨u, thrust_vec − m·L·⟨lv,lv⟩⟩·u / (m+mₗ) + g  (the scalar is
    # broadcast-subtracted from the vector, exactly as the reference).
    s = m * L * (lvx * lvx + lvz * lvz)
    inv_mml = 1.0 / (m + ml)
    proj = ux * (tvx - s) + uz * (tvz - s)
    lax_t = inv_mml * (proj * ux)
    laz_t = inv_mml * (proj * uz) + g
    lvx_t = lvx + lax_t * dt           # velocity FIRST (Q3)
    lvz_t = lvz + laz_t * dt
    lpx_t = lx + lvx_t * dt + 0.5 * lax_t * dt * dt
    lpz_t = lz + lvz_t * dt + 0.5 * laz_t * dt * dt

    tmag = ml * jnp.sqrt(lax_t * lax_t + (laz_t - g) ** 2)
    accx_t = tqx + (tmag * ux) / m     # thrust/m·ĥ + g + T/m
    accz_t = tqz + g + (tmag * uz) / m
    vx_t = vx + accx_t * dt            # velocity FIRST
    vz_t = vz + accz_t * dt
    px_t = x + vx_t * dt + 0.5 * accx_t * dt * dt
    pz_t = z + vz_t * dt + 0.5 * accz_t * dt * dt

    dx = lpx_t - px_t
    dz = lpz_t - pz_t
    dn = jnp.sqrt(dx * dx + dz * dz)
    dinv = 1.0 / jnp.where(dn > 0.0, dn, jnp.float32(1.0))
    ddx = dx * dinv
    ddz = dz * dinv
    lpx_t = px_t + ddx * L
    lpz_t = pz_t + ddz * L
    rad = (lvx_t - vx_t) * ddx + (lvz_t - vz_t) * ddz
    lvx_t = lvx_t - rad * ddx
    lvz_t = lvz_t - rad * ddz

    # --- slack branch -----------------------------------------------------
    lvx_s = lvx
    lvz_s = lvz + g * dt
    lpx_s = lx + lvx_s * dt
    lpz_s = lz + lvz_s * dt + 0.5 * g * dt * dt
    accx_s = tqx
    accz_s = tqz + g
    vx_s = vx + accx_s * dt
    vz_s = vz + accz_s * dt
    px_s = x + vx_s * dt + 0.5 * accx_s * dt * dt
    pz_s = z + vz_s * dt + 0.5 * accz_s * dt * dt

    npx = jnp.where(taut, px_t, px_s)
    npz = jnp.where(taut, pz_t, pz_s)
    nvx = jnp.where(taut, vx_t, vx_s)
    nvz = jnp.where(taut, vz_t, vz_s)
    nlpx = jnp.where(taut, lpx_t, lpx_s)
    nlpz = jnp.where(taut, lpz_t, lpz_s)
    nlvx = jnp.where(taut, lvx_t, lvx_s)
    nlvz = jnp.where(taut, lvz_t, lvz_s)
    nth = th + w * dt

    lpn = jnp.sqrt(nlpx * nlpx + nlpz * nlpz)
    lvn = jnp.sqrt(nlvx * nlvx + nlvz * nlvz)
    done = (lpn > pv["pos_limit"]) | (lvn > pv["vel_limit"])
    reward = jnp.where(done, jnp.float32(1.0),
                       -jnp.sqrt(npx * npx + npz * npz))
    return [npx, npz, nth, nvx, nvz, nlpx, nlpz, nlvx, nlvz], reward, done


def _slung2d_reset_rows(shape, dtype, pv):
    return _uniform_pm1((72,) + shape[1:]).astype(dtype)


def _slung3d_step_tiles(comp, act, pv):
    """quadrotor3d-slungload-v0 step, per-lane actions
    [thrust, wx, wy, wz] (envs/quadrotor3d_slungload.py:47-104):
    POSITION-first Euler with the old velocity (Q3 — opposite of the 2D
    sibling), Q4 quaternion semantics shared with quadrotor3d (normalise
    for rotation/derivative, store raw), per-lane taut/slack branch.
    ``pv``: live Params (:data:`pallas_slungload._S3_FIELDS` order);
    mass divisions mirror the env's op order (see _slung2d_step_tiles)."""
    (px, py, pz, qw, qx, qy, qz, vx, vy, vz,
     lpx, lpy, lpz, lvx, lvy, lvz) = comp
    thrust, wx, wy, wz = act
    dt, g, L = pv["dt"], pv["gravity"], pv["tether_length"]
    m, ml = pv["mass"], pv["load_mass"]

    qn2 = qw * qw + qx * qx + qy * qy + qz * qz
    inv_qn = jax.lax.rsqrt(qn2)
    inv = inv_qn * inv_qn
    bzx = 2.0 * (qx * qz + qw * qy) * inv
    bzy = 2.0 * (qy * qz - qw * qx) * inv
    bzz = 1.0 - 2.0 * (qx * qx + qy * qy) * inv
    tvx = thrust * bzx                 # thrust_vec (load projection)
    tvy = thrust * bzy
    tvz = thrust * bzz
    tq = thrust / m                    # quad acceleration scale
    tqx = tq * bzx
    tqy = tq * bzy
    tqz = tq * bzz

    tx = lpx - px
    ty = lpy - py
    tz = lpz - pz
    tn = jnp.sqrt(tx * tx + ty * ty + tz * tz)
    tinv = 1.0 / jnp.where(tn > 0.0, tn, jnp.float32(1.0))
    ux = tx * tinv
    uy = ty * tinv
    uz = tz * tinv
    taut = tn >= L

    # --- taut branch (pos-first Euler) ------------------------------------
    s = m * L * (lvx * lvx + lvy * lvy + lvz * lvz)
    inv_mml = 1.0 / (m + ml)
    proj = ux * (tvx - s) + uy * (tvy - s) + uz * (tvz - s)
    lax_t = inv_mml * (proj * ux)
    lay_t = inv_mml * (proj * uy)
    laz_t = inv_mml * (proj * uz) + g
    lpx_t = lpx + lvx * dt + 0.5 * lax_t * dt * dt  # old vel
    lpy_t = lpy + lvy * dt + 0.5 * lay_t * dt * dt
    lpz_t = lpz + lvz * dt + 0.5 * laz_t * dt * dt
    lvx_t = lvx + lax_t * dt
    lvy_t = lvy + lay_t * dt
    lvz_t = lvz + laz_t * dt

    tmag = ml * jnp.sqrt(
        lax_t * lax_t + lay_t * lay_t + (laz_t - g) ** 2
    )
    accx_t = tqx + (tmag * ux) / m
    accy_t = tqy + (tmag * uy) / m
    accz_t = tqz + g + (tmag * uz) / m
    px_t = px + vx * dt + 0.5 * accx_t * dt * dt     # old vel
    py_t = py + vy * dt + 0.5 * accy_t * dt * dt
    pz_t = pz + vz * dt + 0.5 * accz_t * dt * dt
    vx_t = vx + accx_t * dt
    vy_t = vy + accy_t * dt
    vz_t = vz + accz_t * dt

    dx = lpx_t - px_t
    dy = lpy_t - py_t
    dz = lpz_t - pz_t
    dn = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    dinv = 1.0 / jnp.where(dn > 0.0, dn, jnp.float32(1.0))
    ddx = dx * dinv
    ddy = dy * dinv
    ddz = dz * dinv
    lpx_t = px_t + ddx * L
    lpy_t = py_t + ddy * L
    lpz_t = pz_t + ddz * L
    rad = (lvx_t - vx_t) * ddx + (lvy_t - vy_t) * ddy + (lvz_t - vz_t) * ddz
    lvx_t = lvx_t - rad * ddx
    lvy_t = lvy_t - rad * ddy
    lvz_t = lvz_t - rad * ddz

    # --- slack branch -----------------------------------------------------
    lpx_s = lpx + lvx * dt
    lpy_s = lpy + lvy * dt
    lpz_s = lpz + lvz * dt + 0.5 * g * dt * dt
    lvx_s = lvx
    lvy_s = lvy
    lvz_s = lvz + g * dt
    accx_s = tqx
    accy_s = tqy
    accz_s = tqz + g
    px_s = px + vx * dt + 0.5 * accx_s * dt * dt
    py_s = py + vy * dt + 0.5 * accy_s * dt * dt
    pz_s = pz + vz * dt + 0.5 * accz_s * dt * dt
    vx_s = vx + accx_s * dt
    vy_s = vy + accy_s * dt
    vz_s = vz + accz_s * dt

    npx = jnp.where(taut, px_t, px_s)
    npy = jnp.where(taut, py_t, py_s)
    npz = jnp.where(taut, pz_t, pz_s)
    nvx = jnp.where(taut, vx_t, vx_s)
    nvy = jnp.where(taut, vy_t, vy_s)
    nvz = jnp.where(taut, vz_t, vz_s)
    nlpx = jnp.where(taut, lpx_t, lpx_s)
    nlpy = jnp.where(taut, lpy_t, lpy_s)
    nlpz = jnp.where(taut, lpz_t, lpz_s)
    nlvx = jnp.where(taut, lvx_t, lvx_s)
    nlvy = jnp.where(taut, lvy_t, lvy_s)
    nlvz = jnp.where(taut, lvz_t, lvz_s)

    # Shared quaternion update (Q4: derivative of q̂ added to raw q).
    hw, hx, hy, hz = qw * inv_qn, qx * inv_qn, qy * inv_qn, qz * inv_qn
    half_dt = 0.5 * dt
    nqw = qw + half_dt * (-hx * wx - hy * wy - hz * wz)
    nqx = qx + half_dt * (hw * wx + hy * wz - hz * wy)
    nqy = qy + half_dt * (hw * wy - hx * wz + hz * wx)
    nqz = qz + half_dt * (hw * wz + hx * wy - hy * wx)

    lpn = jnp.sqrt(nlpx * nlpx + nlpy * nlpy + nlpz * nlpz)
    vn = jnp.sqrt(nvx * nvx + nvy * nvy + nvz * nvz)
    done = (lpn > pv["pos_limit"]) | (vn > pv["vel_limit"])
    reward = jnp.where(done, jnp.float32(1.0), -lpn)
    new = [npx, npy, npz, nqw, nqx, nqy, nqz, nvx, nvy, nvz,
           nlpx, nlpy, nlpz, nlvx, nlvy, nlvz]
    return new, reward, done


def _slung3d_reset_rows(shape, dtype, pv):
    return _uniform_pm1((128,) + shape[1:]).astype(dtype)


def _q3_read(p_ref):
    return _read_params(_Q3_FIELDS, p_ref)


def _q2_read(p_ref):
    return _read_params(_Q2_FIELDS, p_ref)


def _s2_read(p_ref):
    from .pallas_slungload import _S2_FIELDS

    return _read_params(_S2_FIELDS, p_ref)


def _s3_read(p_ref):
    from .pallas_slungload import _S3_FIELDS

    return _read_params(_S3_FIELDS, p_ref)


def _q3_pack(p):
    from .pallas_rollout import quad3d_params_vec

    return quad3d_params_vec(p)


def _q2_pack(p):
    from .pallas_rollout import quad2d_params_vec

    return quad2d_params_vec(p)


def _s2_pack(p):
    from .pallas_slungload import slung2d_params_vec

    return slung2d_params_vec(p)


def _s3_pack(p):
    from .pallas_slungload import slung3d_params_vec

    return slung3d_params_vec(p)


#: env id -> (state_dim, action_dim, step_tiles, reset_rows,
#:            pack: Params -> SMEM f32 vector, read: p_ref -> pv dict).
#: pack/read pairs are the THROUGHPUT kernels' (pallas_rollout /
#: pallas_slungload / pallas_tpuquad) — one field table per env.
_ENVS = {
    "MujocoQuadForce-v1": (13, 4, _hover_step_tiles, _hover_reset_rows,
                           ptq.hover_params_vec, ptq._hover_consts),
    "quadrotor3d-v0": (10, 4, _quad3d_step_tiles, _quad3d_reset_rows,
                       _q3_pack, _q3_read),
    "quadrotor2d-v0": (5, 2, _quad2d_step_tiles, _quad2d_reset_rows,
                       _q2_pack, _q2_read),
    "quadrotor2d-slungload-v0": (9, 2, _slung2d_step_tiles,
                                 _slung2d_reset_rows, _s2_pack, _s2_read),
    "quadrotor3d-slungload-v0": (16, 4, _slung3d_step_tiles,
                                 _slung3d_reset_rows, _s3_pack, _s3_read),
}


def env_params_vec(env) -> jnp.ndarray:
    """``env``'s LIVE Params -> the kernel's SMEM f32 vector."""
    _, _, _, _, pack, _ = _ENVS[env.name]
    return pack(env.params)


def kernel_mismatch(env):
    """Why the policy-driven kernels (fused PPO rollout / off-policy
    collection) would NOT reproduce ``env``'s semantics (None =
    eligible): the shared registry identity check with live packed
    params, plus the structural params the SMEM vector cannot carry
    (hover's ``frame_skip`` unroll count)."""
    from ..envs.core import fused_kernel_mismatch

    if env.name not in _ENVS:
        return f"no policy-driven kernel for {env.name}"
    reason = fused_kernel_mismatch(env, require_control=False,
                                   packed_params=True)
    if reason is not None:
        return reason
    if (env.name == "MujocoQuadForce-v1"
            and getattr(env.params, "frame_skip", 2) != 2):
        return "frame_skip != 2 (the kernel unrolls two substeps)"
    return None


def _kernel(env_kind, t_chunk, cd, normalize_obs, normalize_rewards,
            seed_ref, consts_ref, pvec_ref,
            s_in_ref, ret_in_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            wo_ref, bo_ref,
            traj_ref, fin_ref, rets_ref, stats_ref,
            s_scr, ret_scr, stats_scr):
    """One (batch-tile, time-chunk) grid step: ``t_chunk`` fused
    policy+env steps.

    consts layout (f32): [obs_mean(D), obs_invstd(D), exp_log_std(A),
    log_std_sum, inv_ret_std, gamma].  ``pvec_ref``: the live env
    Params SMEM vector (per-env pack — see _ENVS), unpacked ONCE here,
    outside the time loop.
    """
    d, adim, step_tiles, reset_rows, _, read_pv = _ENVS[env_kind]
    pv = read_pv(pvec_ref)
    b = pl.program_id(0)
    tc = pl.program_id(1)
    n_tc = pl.num_programs(1)
    # Decorrelated stream per grid step (int32 wraparound is fine).
    pltpu.prng_seed(seed_ref[0] + b * jnp.int32(131071) + tc)

    @pl.when(tc == 0)
    def _init():
        s_scr[:, :] = s_in_ref[:, :]
        ret_scr[:, :] = ret_in_ref[:, :]
        stats_scr[:, :] = jnp.zeros_like(stats_scr)

    mean_off, invstd_off = 0, d
    els_off = 2 * d
    ls_sum = consts_ref[2 * d + adim]
    inv_ret_std = consts_ref[2 * d + adim + 1]
    gamma = consts_ref[2 * d + adim + 2]

    def rows(s, i):
        return s[8 * i : 8 * (i + 1)]

    state = s_scr[:, :]
    ret = ret_scr[:, :]
    stats = stats_scr[:, :]
    tile = state.shape[1]
    w1, b1 = w1_ref[:, :], b1_ref[:, :]
    w2, b2 = w2_ref[:, :], b2_ref[:, :]
    wo, bo = wo_ref[:, :], bo_ref[:, :]

    for k in range(t_chunk):
        comp = [rows(state, i) for i in range(d)]

        # Raw-obs moment streams + normalisation (collect_rollout:203-213).
        norm_obs = []
        new_stats = []
        for i in range(d):
            if normalize_obs:
                new_stats.append(rows(stats, i) + comp[i])
                new_stats.append(rows(stats, d + i) + comp[i] * comp[i])
                no = (comp[i] - consts_ref[mean_off + i]) * consts_ref[invstd_off + i]
                norm_obs.append(jnp.clip(no, jnp.float32(-10.0),
                                         jnp.float32(10.0)))
            else:
                new_stats.append(rows(stats, i))
                new_stats.append(rows(stats, d + i))
                norm_obs.append(comp[i])
        # (8d, t) -> (d, 8t): comp-major flatten (exact reshape).
        x = jnp.concatenate(norm_obs, axis=0).reshape(d, 8 * tile)

        # Fused actor-critic MLP (networks.apply_t semantics).
        h1 = jnp.tanh(_mm(w1, x, ((0,), (0,)), cd) + b1.T)
        h2 = jnp.tanh(_mm(w2, h1, ((0,), (0,)), cd) + b2.T)
        out = _mm(wo, h2, ((0,), (0,)), cd) + bo.T          # (A+1, 8t)
        mean = out[:adim]
        value_flat = out[adim:adim + 1]

        # Sample; log-prob from the ROUNDED action (see module docs).
        noise = _normal((adim, 8 * tile))
        act_list = []
        z2_sum = jnp.zeros((1, 8 * tile), jnp.float32)
        for i in range(adim):
            std_i = consts_ref[els_off + i]
            a_i = mean[i : i + 1] + std_i * noise[i : i + 1]
            zi = (a_i - mean[i : i + 1]) * (1.0 / std_i)
            z2_sum = z2_sum + zi * zi
            act_list.append(a_i)
        logp_flat = -0.5 * z2_sum - ls_sum - 0.5 * adim * _LOG2PI

        # Back to sublane-dense for the physics / trajectory store.
        act8 = jnp.concatenate(act_list, axis=0).reshape(8 * adim, tile)
        act_comps = [rows(act8, i) for i in range(adim)]
        logp8 = logp_flat.reshape(8, tile)
        value8 = value_flat.reshape(8, tile)

        comp, raw_reward, done = step_tiles(comp, act_comps, pv)
        done_f = done.astype(jnp.float32)

        # VecNormalize-style reward scale (collect_rollout:225-234).
        if normalize_rewards:
            ret = ret * gamma + raw_reward
            ret_sum = rows(stats, 2 * d) + ret
            ret_sq = rows(stats, 2 * d + 1) + ret * ret
            reward = jnp.clip(raw_reward * inv_ret_std,
                              jnp.float32(-10.0), jnp.float32(10.0))
            ret = ret * (1.0 - done_f)
        else:
            ret_sum = rows(stats, 2 * d)
            ret_sq = rows(stats, 2 * d + 1)
            reward = raw_reward
        raw_sum = rows(stats, 2 * d + 2) + raw_reward
        new_stats.extend([ret_sum, ret_sq, raw_sum])

        # Auto-reset done lanes.
        stacked = jnp.concatenate(comp, axis=0)
        draw = reset_rows(stacked.shape, stacked.dtype, pv)
        stacked = jnp.where(jnp.tile(done, (d, 1)), draw, stacked)

        # Trajectory block rows for this step: obs(D) act(A) logp value
        # reward done pad -> _NTRAJ comps x 8 rows.
        parts = norm_obs + [act8, logp8, value8, reward, done_f]
        n_pad = _NTRAJ - d - adim - 4
        if n_pad:  # slung3d packs exactly 24 comps — no pad rows
            parts.append(jnp.zeros((8 * n_pad, tile), jnp.float32))
        step_rows = jnp.concatenate(parts, axis=0)
        traj_ref[k * 8 * _NTRAJ : (k + 1) * 8 * _NTRAJ, :] = step_rows

        state = stacked
        # Stats layout: obs_sum/obs_sq interleaved per comp then ret rows.
        stats = jnp.concatenate(
            [new_stats[2 * i] for i in range(d)]
            + [new_stats[2 * i + 1] for i in range(d)]
            + new_stats[2 * d :],
            axis=0,
        )

    s_scr[:, :] = state
    ret_scr[:, :] = ret
    stats_scr[:, :] = stats

    @pl.when(tc == n_tc - 1)
    def _finish():
        fin_ref[:, :] = state
        rets_ref[:, :] = ret
        stats_ref[:, :] = stats


@functools.partial(
    jax.jit,
    static_argnames=("env_kind", "horizon", "tile", "t_chunk",
                     "compute_dtype", "normalize_obs", "normalize_rewards"),
)
def ppo_rollout_pallas(env_kind: str, states_t, env_returns, seed,
                       w1, b1, w2, b2, wo, bo, consts, pvec,
                       horizon: int, tile: int = 128, t_chunk: int = 8,
                       compute_dtype: str = "float32",
                       normalize_obs: bool = True,
                       normalize_rewards: bool = True):
    """Fused PPO rollout.

    Args:
      states_t: (D, B) f32 env states (B % (8·tile) == 0).
      env_returns: (B,) running discounted returns.
      seed: int32 array (1,).
      w1..bo: fused MLP stacks (networks.fused_weights), 2H == 128.
      consts: f32 vector [obs_mean(D), obs_invstd(D), exp(log_std)(A),
        Σlog_std, 1/sqrt(ret_var+eps), gamma].
      pvec: the env's LIVE Params as the per-env SMEM f32 vector
        (:func:`env_params_vec`) — param sweeps keep this fast path.
      horizon: T (divisible by t_chunk).

    Returns (traj_rows, final_rows, env_returns, stats):
      traj_rows: (T·8·24, B/8) — reshape to (T, 24, 8, B/8); comp c rows:
        0:D norm obs, D:D+A action, then logp, value, reward, done.
      final_rows: (8·D, B/8); env_returns: (8, B/8);
      stats: ((2D+3)·8, B/8) — per-comp partial sums (reduce over
        sublanes+lanes on the host): obs_sum(D), obs_sq(D), ret_sum,
        ret_sq, raw_reward_sum.
    """
    d = _ENVS[env_kind][0]
    dd, batch = states_t.shape
    assert dd == d and batch % (8 * tile) == 0, (dd, d, batch, tile)
    assert horizon % t_chunk == 0, (horizon, t_chunk)
    assert w2.shape == (128, 128), w2.shape
    b8 = batch // 8
    n_tc = horizon // t_chunk
    grid = (b8 // tile, n_tc)
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    s_rows = states_t.reshape(8 * d, b8)
    ret_rows = env_returns.reshape(8, b8)
    stats_rows = (2 * d + 3) * 8

    kernel = functools.partial(
        _kernel, env_kind, t_chunk, cd, normalize_obs, normalize_rewards
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8 * d, tile), lambda b, tc, *_: (0, b)),
            pl.BlockSpec((8, tile), lambda b, tc, *_: (0, b)),
            pl.BlockSpec(w1.shape, lambda b, tc, *_: (0, 0)),
            pl.BlockSpec(b1.shape, lambda b, tc, *_: (0, 0)),
            pl.BlockSpec(w2.shape, lambda b, tc, *_: (0, 0)),
            pl.BlockSpec(b2.shape, lambda b, tc, *_: (0, 0)),
            pl.BlockSpec(wo.shape, lambda b, tc, *_: (0, 0)),
            pl.BlockSpec(bo.shape, lambda b, tc, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((t_chunk * 8 * _NTRAJ, tile), lambda b, tc, *_: (tc, b)),
            pl.BlockSpec((8 * d, tile), lambda b, tc, *_: (0, b)),
            pl.BlockSpec((8, tile), lambda b, tc, *_: (0, b)),
            pl.BlockSpec((stats_rows, tile), lambda b, tc, *_: (0, b)),
        ],
        scratch_shapes=[
            pltpu.VMEM((8 * d, tile), jnp.float32),
            pltpu.VMEM((8, tile), jnp.float32),
            pltpu.VMEM((stats_rows, tile), jnp.float32),
        ],
    )
    traj, fin, rets, stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((horizon * 8 * _NTRAJ, b8), jnp.float32),
            jax.ShapeDtypeStruct((8 * d, b8), jnp.float32),
            jax.ShapeDtypeStruct((8, b8), jnp.float32),
            jax.ShapeDtypeStruct((stats_rows, b8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(seed, consts, pvec.astype(jnp.float32),
      s_rows, ret_rows, w1, b1, w2, b2, wo, bo)
    return traj, fin, rets, stats
