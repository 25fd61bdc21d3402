"""TPU-native rigid-body quadrotor — serves the reference's three
MuJoCo-backed env IDs without the MuJoCo C engine.

The reference wraps MuJoCo 1.5 (``gym_reinmav/envs/mujoco/mujoco_quad.py``
C7-C9, ``assets/*.xml`` C10).  Per the north star, MuJoCo is out of scope
except as a CPU oracle; these envs are *behavioural analogues* built as a
pure-JAX free rigid body:

* Physical constants derived from the XML geoms (``inertiafromgeom``):
  total mass 0.3 kg (force model) / 0.4 kg (quat model), diagonal inertia
  computed from the box/cylinder geoms about the CoM (see values below),
  gravity (0,0,-9.81), physics dt=0.01, frame_skip=2
  (``mujoco_quad.py:46``, ``quadrotor_ground.xml:3``).
* Actuators (force models, ``quadrotor_ground.xml:34-39``): four motors at
  body positions (±0.1, ±0.1, 0.01) with gear ``[0 0 1 0 0 ∓0.1]`` —
  thrust along body z plus yaw torque ∓0.1 per unit control, control
  clamped to [0, 1].  Quat model (``quadrotor_quat.xml:34-39``): one thrust
  motor (ctrlrange [0,4]) and three body-rate velocity servos with kv=0.1
  (torque = kv·(ctrl − ω)).
* Integration: semi-implicit Euler (MuJoCo's default integrator):
  velocities first from forces at the current state, then positions from
  the *new* velocities; quaternion advanced by the exponential map of
  ``ω·dt`` (MuJoCo ``mj_integratePos`` semantics), renormalised.
* Ground plane: MuJoCo's soft-constraint contact model EXACTLY — the
  engine's plane-box / plane-cylinder contact points, pyramidal friction
  cone, impedance regularisation, and the coupled dual QP its Newton
  solver optimises, solved in-step by matrix-free projected Gauss-Seidel
  (see ``_contact_wrench``; measured ≤6.7e-6 m over 1-2 s vs ``mj_step``
  across drop/settle/tilt/pop-out scenarios, ≤5.3e-5 in the 40° tumble,
  at the shipped 120 solver sweeps — the table in
  ``oracle/tpuquad_ref.py``).  The 48-candidate set includes the four
  arm boxes' corners (r5): the arm-riding crawl scenario tracks full
  mj to 4.4e-9 m/3 s at converged sweeps.
* Observations: ``concat(qpos, qvel)`` = [pos(3), quat wxyz(4), vel(3),
  ω_body(3)] — 13-dim like the reference (``mujoco_quad.py:71-72``).
* Rewards / termination replicate C7-C9 exactly:
  - Force-v0 / Quat-v0: reward ≡ 0, done on non-finite obs.
  - Force-v1 (hovering): shaped reward
    ``−10‖pos−(0,0,1)‖² − 0.1‖qvel‖² − ‖a‖² + 0.1Σa + 100``, done if
    non-finite, z ≤ 0.3, or |x|,|y| ≥ 2 (``mujoco_quad_hovering.py:48-58``;
    note the reward uses the *raw* action while the dynamics use the
    clipped one, as the reference does).
* Reset: deterministic to the XML initial pose (``mujoco_quad.py:65-69``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import quadmath as qm
from .core import EnvDef, StepOut


# MuJoCo default constraint-solver constants (solref=(0.02,1) and
# solimp=(0.9,0.95,0.001,0.5,2) — the XML declares neither, so MuJoCo's
# defaults apply): K = 1/(dmax² τ² ζ²), B = 2/(dmax τ).  The coupled
# contact solve below is the engine's soft-constraint model exactly;
# validated against real mj_step by tests/test_mujoco_divergence.py
# (flight exact to round-off, contact scenarios ≤6.7e-6 m over 1-2 s at
# 120 solver sweeps — see oracle/tpuquad_ref.py for the measured table).
_CONTACT_K = 2770.083102493075
_CONTACT_B = 105.26315789473685
_IMP_D0, _IMP_DMAX, _IMP_WIDTH = 0.9, 0.95, 0.001


class Params(NamedTuple):
    mass: float = 0.3
    # Diagonal inertia about the CoM, from the XML geoms (computed
    # analytically from quadrotor_ground.xml's boxes/cylinders; the
    # derivation lives in oracle/tpuquad_ref.body_inertia and the values
    # are pinned to it by tests/test_tpuquad_parity.py).
    inertia_diag: tuple = (0.0016787227432770446, 0.0017578105900562893, 0.0033807)
    # CoM z-offset from the free-joint/body origin (thruster geoms sit at
    # z=+0.01): origin kinematics get the full α×c + ω×(ω×c) coupling.
    com_z: float = 0.003333333333333333
    gravity: float = -9.81
    dt: float = 0.01
    frame_skip: int = 2
    init_z: float = 0.0
    # Motor geometry: (±0.1, ±0.1) arms, yaw gear ∓0.1 in XML order
    # motor0(+x,+y,-yaw), motor1(+x,-y,+yaw), motor2(-x,-y,-yaw),
    # motor3(-x,+y,+yaw).
    arm_xy: float = 0.1
    yaw_gear: float = 0.1
    ctrl_high: float = 1.0
    contact_friction: float = 1.0  # Coulomb mu (XML floor default)
    contact_enabled: bool = True
    # Fluid drag (XML <option density="1" viscosity="1e-5">): MuJoCo's
    # inertia-equivalent-box model; full widths from
    # oracle/tpuquad_ref.box_dims(mass, inertia_diag).
    density: float = 1.0
    viscosity: float = 1e-5
    box_dims: tuple = (0.2630508637803436, 0.25696739688998504,
                       0.03341656275960588)


class QuatParams(NamedTuple):
    mass: float = 0.4
    inertia_diag: tuple = (0.0017412227432770442, 0.0018994772567229557,
                           0.0035415333333333335)
    com_z: float = 0.0025
    gravity: float = -9.81
    dt: float = 0.01
    frame_skip: int = 2
    init_z: float = 0.0
    thrust_high: float = 4.0
    rate_kv: float = 0.1
    rate_ctrl_high: float = 1.0
    contact_friction: float = 1.0
    contact_enabled: bool = True
    density: float = 1.0
    viscosity: float = 1e-5
    box_dims: tuple = (0.2355776256389572, 0.2252757916384078,
                       0.038568121551353786)


# Motor body-frame positions and yaw-torque signs (XML site/gear order).
_MOTOR_X = (1.0, 1.0, -1.0, -1.0)
_MOTOR_Y = (1.0, -1.0, -1.0, 1.0)
_YAW_SIGN = (-1.0, 1.0, -1.0, 1.0)

# Contact candidate geometry, mirroring MuJoCo's collision functions on
# the reference XML geoms (oracle/tpuquad_ref.py documents the set, the
# measured fidelity, and the probed mjc_PlaneBox/PlaneCylinder caveats):
# the core box's 8 corners (plane-box keeps the below-plane subset), the
# 4 thruster cylinders' two cap-rim deepest points each (the tilted
# plane-cylinder case), and — since r5 — the four arm boxes' 8 corners
# each (quadrotor_ground.xml:9-12; candidate order matches the oracle).
_CORE_CORNERS = tuple(
    (sx * 0.06, sy * 0.035, sz * 0.025)
    for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
)
_THRUSTER_CENTERS = ((0.1, 0.1, 0.01), (0.1, -0.1, 0.01),
                     (-0.1, -0.1, 0.01), (-0.1, 0.1, 0.01))
_THRUSTER_R, _THRUSTER_HH = 0.05, 0.0025


def _arm_corner_tuple():
    from ..oracle.tpuquad_ref import ARM_CORNERS

    return tuple(tuple(float(v) for v in row) for row in ARM_CORNERS)


#: (32, 3) arm-box corners in the body frame — the SAME derived values
#: as the oracle (one source of truth for the XML transcription).
_ARM_CORNERS = _arm_corner_tuple()
# Pyramid tangents for the z-plane floor (mju_makeFrame(0,0,1) order)
# and the shared solver sweep count (oracle/tpuquad_ref.PGS_ITERS
# documents the hybrid sweep and the measured convergence).
_PYRAMID_T = ((0.0, 1.0, 0.0), (-1.0, 0.0, 0.0))
_PGS_ITERS = 120


def _quat_integrate(quat: jnp.ndarray, omega_body: jnp.ndarray, dt) -> jnp.ndarray:
    """Exponential-map quaternion integration (MuJoCo mj_integratePos
    semantics): ``q' = q ⊗ exp(½ ω dt)``, renormalised.

    Uses a sinc-safe form so ω → 0 is exact (no 0/0 under jit/vmap).
    """
    rot_vec = omega_body * dt
    angle = jnp.linalg.norm(rot_vec)
    half = 0.5 * angle
    safe_angle = jnp.where(angle > 1e-9, angle, 1.0)
    # sin(θ/2)/θ → 1/2 as θ → 0
    sinc_half = jnp.where(angle > 1e-9, jnp.sin(half) / safe_angle, 0.5)
    dq = jnp.concatenate([jnp.cos(half)[None], rot_vec * sinc_half])
    return qm.quat_normalize(qm.quat_mul(quat, dq))


def _impedance(p, pen):
    """MuJoCo solimp spline d(pen): power-2 midpoint-0.5 ramp
    ``d0 → dmax`` over ``width`` of penetration."""
    x = jnp.clip(pen / _IMP_WIDTH, 0.0, 1.0)
    s = jnp.where(x <= 0.5, 2.0 * x * x, 1.0 - 2.0 * jnp.square(1.0 - x))
    return _IMP_D0 + s * (_IMP_DMAX - _IMP_D0)


def _fluid_wrench_body(p, vel_com_b, omega_b, dtype):
    """MuJoCo inertia-box fluid drag (body frame): per-axis quadratic
    density terms + Stokes equivalent-sphere viscous terms (the XML sets
    density=1, viscosity=1e-5; validated to float64 round-off against
    mj_step by tests/test_mujoco_divergence.py)."""
    D = p.box_dims
    diam = (D[0] + D[1] + D[2]) / 3.0
    f = -3.0 * jnp.pi * p.viscosity * diam * vel_com_b
    t = -jnp.pi * p.viscosity * diam**3 * omega_b
    fq = []
    tq = []
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        fq.append(-0.5 * p.density * D[j] * D[k] * jnp.abs(vel_com_b[i]) * vel_com_b[i])
        tq.append(-p.density * D[i] * (D[j] ** 4 + D[k] ** 4) / 64.0
                  * jnp.abs(omega_b[i]) * omega_b[i])
    return f + jnp.stack(fq), t + jnp.stack(tq)


def _contact_candidates(pos, rot):
    """World-frame contact candidate SURFACE points, (48, 3): the core
    box corners, the thruster cap-rim deepest points, and the arm-box
    corners (see the candidate-geometry comment above;
    ``oracle/tpuquad_ref.py`` validates the set against MuJoCo's
    collision functions; order mirrored there and in the kernel)."""
    dtype = pos.dtype
    corners = jnp.asarray(_CORE_CORNERS, dtype)
    pts_core = pos + corners @ rot.T
    axis = rot[:, 2]
    u = jnp.asarray([0.0, 0.0, -1.0], dtype) + axis[2] * axis
    nu = jnp.linalg.norm(u)
    u = jnp.where(nu > 1e-12, u / jnp.where(nu > 1e-12, nu, 1.0), 0.0)
    ctr = jnp.asarray(_THRUSTER_CENTERS, dtype)
    hh = jnp.asarray([0.0, 0.0, _THRUSTER_HH], dtype)
    caps = jnp.concatenate([ctr + hh, ctr - hh])
    pts_thr = pos + caps @ rot.T + _THRUSTER_R * u
    pts_arm = pos + jnp.asarray(_ARM_CORNERS, dtype) @ rot.T
    return jnp.concatenate([pts_core, pts_thr, pts_arm])


def _contact_wrench(p, pos, vel, omega_body, rot, acc0_com, alpha0):
    """Coupled plane-contact solve — MuJoCo's soft-constraint model
    exactly (``oracle/tpuquad_ref._contact_wrench`` documents the
    formulation; this is its jit/vmap mirror with static shapes):

        f* = argmin_{f≥0} ½ fᵀ(A+R)f + fᵀ(J·a_smooth − aref)

    over 48 candidates × 4 pyramid rows (``e = n ± μ·t``), inactive
    candidates masked.  A = J M⁻¹ Jᵀ couples all rows; the projected
    Gauss-Seidel solve is matrix-free (the aggregated 6-DoF wrench makes
    each row update O(1)).  Returns (world force, body torque about the
    CoM).

    The solve is gated on ``any(candidate below plane)`` with a REAL
    ``lax.cond`` even under vmap (``custom_vmap`` reduces the predicate
    across the batch; nested vmaps — the dense8 double-vmap layout —
    flatten recursively into one batch with one cond): airborne
    workloads — the hovering task, flight phases — pay only the
    candidate-z computation, while contact-riding batches run the full
    solve.  Forces are exactly zero when nothing penetrates, so the
    gate never changes a result."""
    dtype = pos.dtype

    def zeros(*_a):
        return jnp.zeros(3, dtype), jnp.zeros(3, dtype)

    @jax.custom_batching.custom_vmap
    def gated(pos, vel, omega_body, rot, acc0_com, alpha0):
        dists = _contact_candidates(pos, rot)[:, 2]
        # Two-tier (see _contact_solve): arm corners engage rarely, and
        # the 16-solve is bitwise-equal whenever they don't.
        arm_pen = jnp.any(dists[16:] < 0.0)
        return jax.lax.cond(
            jnp.any(dists < 0.0),
            lambda ap, *a: jax.lax.cond(
                ap,
                lambda *s: _contact_solve(p, *s, n_cand=48),
                lambda *s: _contact_solve(p, *s, n_cand=16),
                *a,
            ),
            lambda ap, *a: zeros(),
            arm_pen, pos, vel, omega_body, rot, acc0_com, alpha0,
        )

    @gated.def_vmap
    def _gated_batch(axis_size, in_batched, *args):
        args = tuple(
            a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
            for a, b in zip(args, in_batched)
        )
        return _gated_solve_batched(p, dtype, *args), (True, True)

    return gated(pos, vel, omega_body, rot, acc0_com, alpha0)


def _gated_solve_batched(p, dtype, pos, vel, omega_body, rot, acc0_com, alpha0):
    """Batched (leading-axis) gated solve: ONE ``lax.cond`` on
    ``any(penetration)`` over the whole batch.  Itself ``custom_vmap``'d
    with a flattening rule so nested vmaps collapse into one flat batch
    instead of degrading the cond into a compute-both select."""

    @jax.custom_batching.custom_vmap
    def run(pos, vel, omega_body, rot, acc0_com, alpha0):
        B = pos.shape[0]
        dists = jax.vmap(
            lambda pp, rr: _contact_candidates(pp, rr)[:, 2]
        )(pos, rot)
        # Two-tier over the whole batch (see _contact_solve): the full
        # 48-candidate sweep runs only when some sample's ARM corner
        # penetrates; otherwise the bitwise-equal 16-solve.
        arm_pen = jnp.any(dists[:, 16:] < 0.0)
        return jax.lax.cond(
            jnp.any(dists < 0.0),
            lambda ap, *a: jax.lax.cond(
                ap,
                lambda *s: jax.vmap(
                    lambda *x: _contact_solve(p, *x, n_cand=48))(*s),
                lambda *s: jax.vmap(
                    lambda *x: _contact_solve(p, *x, n_cand=16))(*s),
                *a,
            ),
            lambda ap, *a: (jnp.zeros((B, 3), dtype),
                            jnp.zeros((B, 3), dtype)),
            arm_pen, pos, vel, omega_body, rot, acc0_com, alpha0,
        )

    @run.def_vmap
    def _run_batch(axis_size, in_batched, *args):
        args = tuple(
            a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
            for a, b in zip(args, in_batched)
        )
        inner = args[0].shape[1]
        flat = tuple(a.reshape((axis_size * inner,) + a.shape[2:]) for a in args)
        F_w, T_b = _gated_solve_batched(p, dtype, *flat)
        return (F_w.reshape(axis_size, inner, 3),
                T_b.reshape(axis_size, inner, 3)), (True, True)

    return run(pos, vel, omega_body, rot, acc0_com, alpha0)


def _contact_solve(p, pos, vel, omega_body, rot, acc0_com, alpha0,
                   n_cand: int = 48):
    """The ungated coupled solve (see :func:`_contact_wrench`).

    ``n_cand``: static candidate-set prefix to solve over — 16 (core +
    thruster caps) or 48 (+ arm corners).  When no arm corner
    penetrates, the 16-solve is BITWISE the 48-solve (inactive
    candidates contribute exact zeros to every sweep stage and to the
    1/n_active damping), so the gate below picks the cheap tier for the
    common settle/ride regimes and the full set only when arms engage
    (the 48-wide sweep measured ~4.5× the 16-wide one on TPU)."""
    dtype = pos.dtype
    inertia = jnp.asarray(p.inertia_diag, dtype)
    c = jnp.asarray([0.0, 0.0, p.com_z], dtype)
    inv_m = 1.0 / p.mass
    mu = p.contact_friction

    pts = _contact_candidates(pos, rot)[:n_cand]            # (n_cand, 3)
    dist = pts[:, 2]
    active = dist < 0.0
    pen = -dist
    mid = pts.at[:, 2].set(0.5 * dist)                      # midpoint shift
    com_w = pos + rot @ c
    rho_b = (mid - com_w) @ rot                             # Rᵀx, row-wise
    r_b = (mid - pos) @ rot                                 # from the origin
    d = _impedance(p, pen)                                  # (48,)
    R_reg = (1.0 - d) / d * (2.0 * mu * mu * (1.0 + mu * mu) * inv_m)

    # Point velocities / smooth accelerations in ORIGIN coordinates
    # (a0 = J·qacc_smooth carries no centripetal term — engine exact).
    v_pt = vel + jnp.cross(jnp.broadcast_to(omega_body, r_b.shape), r_b) @ rot.T
    a_o0 = acc0_com - rot @ (
        jnp.cross(alpha0, c) + jnp.cross(omega_body, jnp.cross(omega_body, c))
    )
    a_pt0 = a_o0 + jnp.cross(jnp.broadcast_to(alpha0, r_b.shape), r_b) @ rot.T

    n = jnp.asarray([0.0, 0.0, 1.0], dtype)
    t = jnp.asarray(_PYRAMID_T, dtype)
    edges = jnp.stack([n + mu * t[0], n - mu * t[0],
                       n + mu * t[1], n - mu * t[1]])       # (4, 3)
    edges_b = edges @ rot                                   # Rᵀe, (4, 3)

    arm = jnp.cross(rho_b[:, None, :], edges_b[None, :, :])      # (48, 4, 3)
    diag = (jnp.sum(edges * edges, axis=1) * inv_m)[None, :] + \
        jnp.sum(arm * arm / inertia, axis=2) + R_reg[:, None]
    vel_rows = v_pt @ edges.T                                     # (48, 4)
    aref = (d * _CONTACT_K * pen)[:, None] - _CONTACT_B * vel_rows
    b_rows = a_pt0 @ edges.T - aref                               # (48, 4)

    # Hybrid sweep (oracle/tpuquad_ref.PGS_ITERS): GS across the 4 row
    # types, ω-damped Jacobi across candidates — each stage is one
    # vectorized pass over all 48 candidates, matrix-free via the
    # aggregate wrench.  ω = 1/n_active keeps Jacobi stable; the fixed
    # point is the QP optimum for any ω > 0.
    w = 1.0 / jnp.maximum(1.0, jnp.sum(active.astype(dtype)))
    nc = pts.shape[0]

    def sweep(_, carry):
        f = list(carry[0])
        F_w, T_b = carry[1], carry[2]
        for k in range(4):
            Af = arm[:, k] @ (T_b / inertia) + (edges[k] @ F_w) * inv_m
            new = jnp.maximum(
                0.0, f[k] - w * (Af + R_reg * f[k] + b_rows[:, k]) / diag[:, k]
            )
            df = jnp.where(active, new - f[k], 0.0)
            f[k] = f[k] + df
            F_w = F_w + edges[k] * jnp.sum(df)
            T_b = T_b + arm[:, k].T @ df
        return tuple(f), F_w, T_b

    _, F_w, T_b = jax.lax.fori_loop(
        0, _PGS_ITERS, sweep,
        ((jnp.zeros(nc, dtype),) * 4, jnp.zeros(3, dtype),
         jnp.zeros(3, dtype)), unroll=False
    )
    return F_w, T_b


def _physics_step(p, state, thrust_per_motor, yaw_torque, extra_torque_b, dt):
    """One semi-implicit Euler physics step of the free body.

    ``thrust_per_motor``: (4,) forces along body z at the motor positions.
    ``yaw_torque``: scalar body-z torque from the motor gears.
    ``extra_torque_b``: additional body torque (rate servos).

    Dynamics are computed about the CoM and mapped to the body-origin
    free joint with the full coupling ``a_o = a_c − R·(α×c + ω×(ω×c))``
    — MuJoCo-exact kinematics (the thrust/servo torques about the CoM
    equal those about the origin because the offset is pure body-z and
    the motor forces pure body-z).
    """
    pos, quat, vel, omega = state[0:3], state[3:7], state[7:10], state[10:13]
    dtype = state.dtype
    rot = qm.quat_to_rotmat(qm.quat_normalize(quat))
    inertia = jnp.asarray(p.inertia_diag, dtype)
    c = jnp.asarray([0.0, 0.0, p.com_z], dtype)

    total_thrust = jnp.sum(thrust_per_motor)
    force_w = rot[:, 2] * total_thrust + jnp.asarray([0.0, 0.0, p.gravity * p.mass], dtype)

    # τ = Σ rᵢ × (Fᵢ ẑ) = Σ Fᵢ·(yᵢ, −xᵢ, 0) in the body frame.
    mx = (jnp.asarray(_MOTOR_Y, dtype) * p.arm_xy) @ thrust_per_motor
    my = -(jnp.asarray(_MOTOR_X, dtype) * p.arm_xy) @ thrust_per_motor
    torque_b = jnp.stack([mx, my, yaw_torque]) + extra_torque_b

    # Fluid drag acts at the CoM (no torque about it from the force).
    vel_com_b = rot.T @ vel + jnp.cross(omega, c)
    df, dtq = _fluid_wrench_body(p, vel_com_b, omega, dtype)
    force_w = force_w + rot @ df
    torque_b = torque_b + dtq

    if p.contact_enabled:
        # Two-pass: unconstrained accelerations feed the contact law.
        alpha0 = (torque_b - jnp.cross(omega, inertia * omega)) / inertia
        acc0_com = force_w / p.mass
        cf_w, ct_b = _contact_wrench(p, pos, vel, omega, rot, acc0_com, alpha0)
        force_w = force_w + cf_w
        torque_b = torque_b + ct_b

    # Euler rigid-body: I ω̇ = τ − ω × (I ω)
    omega_dot = (torque_b - jnp.cross(omega, inertia * omega)) / inertia
    acc_com = force_w / p.mass
    acc = acc_com - rot @ (
        jnp.cross(omega_dot, c) + jnp.cross(omega, jnp.cross(omega, c))
    )

    vel_new = vel + acc * dt            # velocities first (semi-implicit)
    omega_new = omega + omega_dot * dt
    pos_new = pos + vel_new * dt        # positions from NEW velocities
    quat_new = _quat_integrate(quat, omega_new, dt)
    return jnp.concatenate([pos_new, quat_new, vel_new, omega_new])


def _force_env_step(p: Params, s, a, hovering: bool):
    raw_a = a
    ctrl = jnp.clip(a, 0.0, p.ctrl_high)  # clip_action + ctrlrange clamp
    dt = jnp.asarray(p.dt, s.dtype)

    state = s
    for _ in range(p.frame_skip):
        # Torque about x: Σ F_i·y_i ; about y: −Σ F_i·x_i (r × F ẑ).
        yaw = p.yaw_gear * (jnp.asarray(_YAW_SIGN, s.dtype) @ ctrl)
        state = _physics_step(p, state, ctrl, yaw, jnp.zeros(3, s.dtype), dt)

    obs = state
    finite = jnp.all(jnp.isfinite(obs))
    if hovering:
        pos_err = obs[0:3] - jnp.asarray([0.0, 0.0, 1.0], s.dtype)
        reward = (
            -10.0 * jnp.sum(jnp.square(pos_err))
            - 0.1 * jnp.sum(jnp.square(obs[7:13]))
            - jnp.sum(jnp.square(raw_a))
            + 0.1 * jnp.sum(raw_a)
            + 100.0
        )
        alive = finite & (obs[2] > 0.3) & (jnp.abs(obs[0]) < 2.0) & (jnp.abs(obs[1]) < 2.0)
        done = ~alive
    else:
        reward = jnp.asarray(0.0, s.dtype)
        done = ~finite
    return StepOut(state, obs, reward, done)


def _quat_env_step(p: QuatParams, s, a):
    thrust_cmd = jnp.clip(a[0], 0.0, p.thrust_high)
    rate_cmd = jnp.clip(a[1:4], -p.rate_ctrl_high, p.rate_ctrl_high)
    dt = jnp.asarray(p.dt, s.dtype)

    state = s
    for _ in range(p.frame_skip):
        omega = state[10:13]
        servo_torque = p.rate_kv * (rate_cmd - omega)
        # Single central thrust (site at body origin): no pitch/roll moment.
        thrusts = jnp.concatenate([thrust_cmd[None], jnp.zeros(3, s.dtype)])
        fp = Params(
            mass=p.mass,
            inertia_diag=p.inertia_diag,
            com_z=p.com_z,
            gravity=p.gravity,
            dt=p.dt,
            frame_skip=1,
            arm_xy=0.0,
            yaw_gear=0.0,
            contact_friction=p.contact_friction,
            contact_enabled=p.contact_enabled,
            density=p.density,
            viscosity=p.viscosity,
            box_dims=p.box_dims,
        )
        state = _physics_step(fp, state, thrusts, jnp.asarray(0.0, s.dtype), servo_torque, dt)

    obs = state
    done = ~jnp.all(jnp.isfinite(obs))
    return StepOut(state, obs, jnp.asarray(0.0, s.dtype), done)


def _deterministic_reset(init_z: float):
    def reset_fn(params, key):
        del params, key
        return jnp.asarray([0.0, 0.0, init_z, 1.0, 0.0, 0.0, 0.0] + [0.0] * 6)

    # Identity tag for the fused-kernel dispatch (envs/core.py
    # fused_kernel_mismatch): a non-default init_z produces a fresh
    # closure, but any _deterministic_reset product whose init_z matches
    # the env's Params is semantically the registry reset — the kernels
    # read init_z from the SMEM params vector.
    reset_fn.det_reset_init_z = float(init_z)
    return reset_fn


# Module-level step/reset identities (the fused-Pallas dispatch in
# ``core.throughput_rollout`` verifies these exact objects to refuse
# wrapped/customised envs).
def force_step(params, s, a):
    return _force_env_step(params, s, a, hovering=False)


def hovering_step(params, s, a):
    return _force_env_step(params, s, a, hovering=True)


force_reset = _deterministic_reset(0.0)
hovering_reset = _deterministic_reset(1.0)
quat_reset = _deterministic_reset(0.0)


def make_force_ground(params: Params | None = None) -> EnvDef:
    p = params or Params(init_z=0.0)
    return EnvDef(
        name="MujocoQuadForce-v0",
        state_dim=13,
        action_dim=4,
        obs_dim=13,
        params=p,
        step_fn=force_step,
        reset_fn=force_reset if p.init_z == 0.0 else _deterministic_reset(p.init_z),
        action_low=0.0,
        action_high=1.0,
        deterministic_reset=True,
    )


def make_hovering(params: Params | None = None) -> EnvDef:
    p = params or Params(init_z=1.0)
    return EnvDef(
        name="MujocoQuadForce-v1",
        state_dim=13,
        action_dim=4,
        obs_dim=13,
        params=p,
        step_fn=hovering_step,
        reset_fn=hovering_reset if p.init_z == 1.0 else _deterministic_reset(p.init_z),
        action_low=0.0,
        action_high=1.0,
        deterministic_reset=True,
    )


def make_quat(params: QuatParams | None = None) -> EnvDef:
    p = params or QuatParams()
    return EnvDef(
        name="MujocoQuadQuat-v0",
        state_dim=13,
        action_dim=4,
        obs_dim=13,
        params=p,
        step_fn=_quat_env_step,
        reset_fn=quat_reset if p.init_z == 0.0 else _deterministic_reset(p.init_z),
        action_low=-1.0,
        action_high=4.0,
        deterministic_reset=True,
    )
