"""Pallas TPU kernels: fused tpuquad-family rollouts.

The RL workhorse env (the reference trains on it,
``example/mujoco/train_hovering.py:37``) fused like
:mod:`ops.pallas_rollout`: grid over batch tiles, the whole horizon as a
``fori_loop`` in VMEM, sublane-dense 13-component layout
(pos3, quat4, vel3, omega3 → (104, bt) tiles).

Semantics: the float32 production path of ``envs/tpuquad.py`` with
default params and a CONSTANT per-motor control (the throughput
workload — policy-in-the-loop rollouts live in the PPO scan path and
the fused PPO rollout kernel): frame_skip=2 semi-implicit Euler
substeps, exp-map quaternion integration, rigid-body Euler equation
with the geom-derived inertia, MuJoCo's inertia-box fluid drag, the
CoM-offset origin coupling, and — for the ground/quat models — the
COUPLED contact solve (MuJoCo's dual QP by the matrix-free hybrid
relaxation sweep, candidate-stacked into (48·8, bt) tiles), all
in-kernel (see
``envs/tpuquad.py`` for the physics derivation and
``tests/test_mujoco_divergence.py`` for the measured fidelity vs real
``mj_step``).

The hovering kernel skips contact entirely: the env terminates at
z ≤ 0.3 while the lowest contact point sits 0.025 below the origin, so
no live state can touch the plane; resets restore z = 1.
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


def available() -> bool:
    return _PALLAS


# envs/tpuquad.py Params()/QuatParams() defaults (validated vs the geom
# derivation by tests/test_tpuquad_parity.py).
_G = -9.81
_DT = 0.01
_ARM = 0.1
_YAW_GEAR = 0.1
_MOTOR_X = (1.0, 1.0, -1.0, -1.0)
_MOTOR_Y = (1.0, -1.0, -1.0, 1.0)
_YAW_SIGN = (-1.0, 1.0, -1.0, 1.0)
_INIT = (0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0) + (0.0,) * 6  # hovering reset
_INIT0 = (0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0) + (0.0,) * 6  # z=0 reset

# MuJoCo soft-constraint contact constants + candidate geometry
# (envs/tpuquad.py; the coupled-solve derivation lives in
# oracle/tpuquad_ref._contact_wrench).
_CONTACT_K = 2770.083102493075
_CONTACT_B = 105.26315789473685
_IMP_D0, _IMP_DMAX, _IMP_WIDTH = 0.9, 0.95, 0.001

_CORE_CORNERS = tuple(
    (sx * 0.06, sy * 0.035, sz * 0.025)
    for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
)
_THRUSTER_CENTERS = ((0.1, 0.1, 0.01), (0.1, -0.1, 0.01),
                     (-0.1, -0.1, 0.01), (-0.1, 0.1, 0.01))
_THRUSTER_R, _THRUSTER_HH = 0.05, 0.0025
_PGS_ITERS = 120


def _arm_corners():
    # Same derived XML values as the env/oracle (single source of truth).
    from ..oracle.tpuquad_ref import ARM_CORNERS

    return tuple(tuple(float(v) for v in row) for row in ARM_CORNERS)


_ARM_CORNERS = _arm_corners()

_GROUND = dict(
    mass=0.3,
    ix=0.0016787227432770446, iy=0.0017578105900562893, iz=0.0033807,
    cz=0.003333333333333333,
    D=(0.2630508637803436, 0.25696739688998504, 0.03341656275960588),
    mu=1.0, density=1.0, viscosity=1e-5,
    g=_G, dt=_DT,
)
_QUATM = dict(
    mass=0.4,
    ix=0.0017412227432770442, iy=0.0018994772567229557, iz=0.0035415333333333335,
    cz=0.0025,
    D=(0.2355776256389572, 0.2252757916384078, 0.038568121551353786),
    mu=1.0, density=1.0, viscosity=1e-5,
    g=_G, dt=_DT,
)


def hover_params_vec(p=None) -> jnp.ndarray:
    """envs/tpuquad.Params -> the hover kernel's SMEM f32 vector (the
    derived drag box widths are a Params field, so no host derivation;
    explicit attribute access breaks loudly on a field rename)."""
    if p is None:
        from ..envs.tpuquad import Params

        p = Params(init_z=1.0)
    return jnp.asarray(
        [p.mass, *p.inertia_diag, p.com_z, p.gravity, p.dt, p.init_z,
         p.arm_xy, p.yaw_gear, p.ctrl_high, p.contact_friction,
         p.density, p.viscosity, *p.box_dims], jnp.float32)


def _hover_consts(p_ref):
    """SMEM vector -> the _rigid_substep constants dict (traced
    scalars), mirroring :func:`hover_params_vec`'s order."""
    return dict(
        mass=p_ref[0], ix=p_ref[1], iy=p_ref[2], iz=p_ref[3], cz=p_ref[4],
        g=p_ref[5], dt=p_ref[6], init_z=p_ref[7], arm=p_ref[8],
        yaw_gear=p_ref[9], ctrl_high=p_ref[10], mu=p_ref[11],
        density=p_ref[12], viscosity=p_ref[13],
        D=(p_ref[14], p_ref[15], p_ref[16]),
    )


def _impedance(pen):
    x = jnp.clip(pen * (1.0 / _IMP_WIDTH), 0.0, 1.0)
    s = jnp.where(x <= 0.5, 2.0 * x * x, 1.0 - 2.0 * (1.0 - x) * (1.0 - x))
    return _IMP_D0 + s * (_IMP_DMAX - _IMP_D0)


def _candidate_sum(x):
    """(N·8, bt) candidate-stacked tile → (8, bt) sum over the N
    candidate groups (pairwise halving with a power-of-two peel for
    non-power-of-two N, e.g. the 48-candidate set — every slice stays
    at a multiple of 8 sublanes, Mosaic-friendly)."""
    groups = x.shape[0] // 8
    p2 = 1 << (groups.bit_length() - 1)
    extra = None
    if p2 != groups:
        extra = _candidate_sum(x[p2 * 8:])
        x = x[: p2 * 8]
    while x.shape[0] > 8:
        h = x.shape[0] // 2
        x = x[:h] + x[h:]
    return x if extra is None else x + extra


def _coupled_contact(c, pos, rot, vel, omega, force, torque, gyro):
    """The coupled plane-contact solve of ``envs/tpuquad._contact_wrench``
    on component rows: MuJoCo's dual QP over 48 candidates × 4 pyramid
    row types, solved by the SAME hybrid sweep as the env (GS across row
    types, mass-split Jacobi across candidates) so kernel and scan agree
    to f32 reassociation.  Candidate quantities are stacked into
    (48·8, bt) tiles, making every sweep stage one vectorized pass over
    all candidates.  Takes the UNCONSTRAINED force/torque accumulators
    and returns them with the contact wrench added."""
    px, py, pz = pos
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = rot
    vx, vy, vz = vel
    ox, oy, oz = omega
    fx, fy, fz = force
    tx, ty, tz = torque
    gyx, gyy, gyz = gyro
    m, ix, iy, iz = c["mass"], c["ix"], c["iy"], c["iz"]
    cz, mu = c["cz"], c["mu"]
    inv_m = 1.0 / m
    inv_ix, inv_iy, inv_iz = 1.0 / ix, 1.0 / iy, 1.0 / iz
    kappa = 2.0 * mu * mu * (1.0 + mu * mu) * inv_m   # pyramidal diagApprox/m
    ee = 1.0 + mu * mu                                 # ‖n ± μt‖²

    # Unconstrained accelerations; a_o0 in ORIGIN coords (no centripetal
    # term — a0 = J·qacc_smooth, engine exact).
    a0x, a0y, a0z = fx * inv_m, fy * inv_m, fz * inv_m
    al0x = (tx - gyx) * inv_ix
    al0y = (ty - gyy) * inv_iy
    al0z = (tz - gyz) * inv_iz
    u0 = (al0y + oz * ox) * cz
    u1 = (-al0x + oz * oy) * cz
    u2 = -(ox * ox + oy * oy) * cz
    aox = a0x - (r00 * u0 + r01 * u1 + r02 * u2)
    aoy = a0y - (r10 * u0 + r11 * u1 + r12 * u2)
    aoz = a0z - (r20 * u0 + r21 * u1 + r22 * u2)

    # Thruster-cap rim direction u (radial steepest descent, guarded —
    # exactly-level axes leave the cap rims far above the floor anyway).
    uwx = r22 * r02
    uwy = r22 * r12
    uwz = r22 * r22 - 1.0
    nu2 = uwx * uwx + uwy * uwy + uwz * uwz
    inv_nu = jnp.where(nu2 > 1e-24, jax.lax.rsqrt(jnp.maximum(nu2, 1e-30)), 0.0)
    uwx, uwy, uwz = uwx * inv_nu, uwy * inv_nu, uwz * inv_nu

    # Candidate order MUST match envs/tpuquad._contact_candidates:
    # 8 core corners, 4 upper caps, 4 lower caps, 32 arm corners.
    cands = [(b, None) for b in _CORE_CORNERS]
    cands += [((cx, cy, czc + _THRUSTER_HH), True) for cx, cy, czc in _THRUSTER_CENTERS]
    cands += [((cx, cy, czc - _THRUSTER_HH), True) for cx, cy, czc in _THRUSTER_CENTERS]
    cands += [(b, None) for b in _ARM_CORNERS]

    per_cand = dict(active=[], Ri=[], P=[], Q1=[], Q2=[],
                    aN=([], [], []), aT1=([], [], []), aT2=([], [], []),
                    rd=([], [], [], []))
    for (bx, by, bz), is_cap in cands:
        rwx = r00 * bx + r01 * by + r02 * bz
        rwy = r10 * bx + r11 * by + r12 * bz
        rwz = r20 * bx + r21 * by + r22 * bz
        if is_cap:
            rwx = rwx + _THRUSTER_R * uwx
            rwy = rwy + _THRUSTER_R * uwy
            rwz = rwz + _THRUSTER_R * uwz
        zc = pz + rwz
        active = zc < 0.0
        pen = -zc
        # contact midpoint (rel. origin): (rwx, rwy, (rwz − pz)/2)
        mzz = 0.5 * (rwz - pz)
        rbx = r00 * rwx + r10 * rwy + r20 * mzz
        rby = r01 * rwx + r11 * rwy + r21 * mzz
        rbz = r02 * rwx + r12 * rwy + r22 * mzz
        rhx, rhy, rhz = rbx, rby, rbz - cz
        # v_pt = vel + R(ω×r_b)
        cbx = oy * rbz - oz * rby
        cby = oz * rbx - ox * rbz
        cbz = ox * rby - oy * rbx
        vpx = vx + r00 * cbx + r01 * cby + r02 * cbz
        vpy = vy + r10 * cbx + r11 * cby + r12 * cbz
        vpz = vz + r20 * cbx + r21 * cby + r22 * cbz
        # a_pt0 = a_o0 + R(α0×r_b)
        abx = al0y * rbz - al0z * rby
        aby = al0z * rbx - al0x * rbz
        abz = al0x * rby - al0y * rbx
        apx = aox + r00 * abx + r01 * aby + r02 * abz
        apy = aoy + r10 * abx + r11 * aby + r12 * abz
        apz = aoz + r20 * abx + r21 * aby + r22 * abz
        d = _impedance(pen)
        dKpen = d * _CONTACT_K * pen
        Ri = (1.0 - d) / d * kappa
        # arms ρ × (Rᵀe): nb/t1b = rows 2/1 of R, t2b = −row 0.
        aNx = rhy * r22 - rhz * r21
        aNy = rhz * r20 - rhx * r22
        aNz = rhx * r21 - rhy * r20
        aT1x = rhy * r12 - rhz * r11
        aT1y = rhz * r10 - rhx * r12
        aT1z = rhx * r11 - rhy * r10
        aT2x = rhz * r01 - rhy * r02
        aT2y = rhx * r02 - rhz * r00
        aT2z = rhy * r00 - rhx * r01
        # b rows decompose as P ± μ·Q_j (j = tangent index).
        P = apz - dKpen + _CONTACT_B * vpz
        Q1 = apy + _CONTACT_B * vpy
        Q2 = -(apx + _CONTACT_B * vpx)
        for tj, s in ((1, 1.0), (1, -1.0), (2, 1.0), (2, -1.0)):
            aTx, aTy, aTz = (aT1x, aT1y, aT1z) if tj == 1 else (aT2x, aT2y, aT2z)
            armx = aNx + s * mu * aTx
            army = aNy + s * mu * aTy
            armz = aNz + s * mu * aTz
            diag = (ee * inv_m + armx * armx * inv_ix + army * army * inv_iy
                    + armz * armz * inv_iz + Ri)
            per_cand["rd"][(0 if tj == 1 else 2) + (0 if s > 0 else 1)].append(
                1.0 / diag)
        zero = jnp.zeros_like(pz)
        per_cand["active"].append(jnp.where(active, 1.0, 0.0) + zero)
        per_cand["Ri"].append(Ri + zero)
        per_cand["P"].append(P + zero)
        per_cand["Q1"].append(Q1 + zero)
        per_cand["Q2"].append(Q2 + zero)
        for lst, v in zip(per_cand["aN"], (aNx, aNy, aNz)):
            lst.append(v + zero)
        for lst, v in zip(per_cand["aT1"], (aT1x, aT1y, aT1z)):
            lst.append(v + zero)
        for lst, v in zip(per_cand["aT2"], (aT2x, aT2y, aT2z)):
            lst.append(v + zero)

    # Stack per-candidate (8, bt) quantities into (48·8, bt) tiles.
    cat = lambda xs: jnp.concatenate(xs, axis=0)
    act_s = cat(per_cand["active"])
    Ri_s = cat(per_cand["Ri"])
    P_s, Q1_s, Q2_s = cat(per_cand["P"]), cat(per_cand["Q1"]), cat(per_cand["Q2"])
    aN_s = tuple(cat(l) for l in per_cand["aN"])
    aT1_s = tuple(cat(l) for l in per_cand["aT1"])
    aT2_s = tuple(cat(l) for l in per_cand["aT2"])
    # Loop-invariant per-stage data: pyramid arms, b rows, 1/diag.
    stages = []
    for k, (tj, s) in enumerate(((1, 1.0), (1, -1.0), (2, 1.0), (2, -1.0))):
        aT = aT1_s if tj == 1 else aT2_s
        arm_k = tuple(aN_s[i] + s * mu * aT[i] for i in range(3))
        b_k = P_s + s * mu * (Q1_s if tj == 1 else Q2_s)
        stages.append((tj, s, arm_k, b_k, cat(per_cand["rd"][k])))

    zero8 = jnp.zeros_like(pz)

    def run_sweep(nc):
        """The hybrid sweep over the first ``nc`` candidate groups.
        Two-tier (mirrors envs/tpuquad._contact_solve): when no ARM
        corner is active in this tile, the 16-group sweep is BITWISE
        the 48-group one (inactive candidates contribute exact zeros
        everywhere, incl. the 1/n_active damping) at ~1/4.5 the cost."""
        sl = nc * 8
        act_c = act_s[:sl]
        Ri_c = Ri_s[:sl]
        stages_c = [(tj, s, tuple(a[:sl] for a in arm_k), b_k[:sl],
                     rd_k[:sl]) for (tj, s, arm_k, b_k, rd_k) in stages]
        n_act = _candidate_sum(act_c)
        w = 1.0 / jnp.maximum(1.0, n_act)      # mass-split Jacobi damping
        w_t = jnp.tile(w, (nc, 1))
        zero_s = jnp.zeros_like(act_c)

        def sweep(_, carry):
            f = list(carry[0])
            Fx, Fy, Fz, Wx, Wy, Wz = carry[1:]
            for k, (tj, s, arm_k, b_k, rd_k) in enumerate(stages_c):
                eF = Fz + s * mu * (Fy if tj == 1 else -Fx)
                Af = (jnp.tile(eF * inv_m + jnp.zeros_like(Fz), (nc, 1))
                      + arm_k[0] * jnp.tile(Wx, (nc, 1))
                      + arm_k[1] * jnp.tile(Wy, (nc, 1))
                      + arm_k[2] * jnp.tile(Wz, (nc, 1)))
                new = jnp.maximum(
                    0.0, f[k] - w_t * (Af + Ri_c * f[k] + b_k) * rd_k)
                df = jnp.where(act_c > 0.0, new - f[k], zero_s)
                f[k] = f[k] + df
                sdf = _candidate_sum(df)
                Fz = Fz + sdf
                if tj == 1:
                    Fy = Fy + s * mu * sdf
                else:
                    Fx = Fx - s * mu * sdf
                Wx = Wx + _candidate_sum(arm_k[0] * df) * inv_ix
                Wy = Wy + _candidate_sum(arm_k[1] * df) * inv_iy
                Wz = Wz + _candidate_sum(arm_k[2] * df) * inv_iz
            return (tuple(f), Fx, Fy, Fz, Wx, Wy, Wz)

        carry = ((zero_s,) * 4, zero8, zero8, zero8, zero8, zero8, zero8)
        out = jax.lax.fori_loop(0, _PGS_ITERS, sweep, carry)
        return out[1:]

    has_arm = jnp.any(act_s[16 * 8:] > 0.0)
    Fx, Fy, Fz, Wx, Wy, Wz = jax.lax.cond(
        has_arm, lambda: run_sweep(48), lambda: run_sweep(16))
    return (fx + Fx, fy + Fy, fz + Fz,
            tx + Wx * ix, ty + Wy * iy, tz + Wz * iz)


def _rigid_substep(comp, c, total_thrust, mx_c, my_c, mz_c, servo_kv,
                   servo_cmd, contact: bool):
    """One semi-implicit Euler substep on 13 component tiles — the
    scalar-row mirror of ``envs/tpuquad.py:_physics_step``: thrust/servo
    wrenches, inertia-box fluid drag, optional impedance plane contact
    (two-pass with unconstrained accelerations), CoM-offset origin
    coupling, exp-map quaternion update."""
    px, py, pz, qw, qx, qy, qz, vx, vy, vz, ox, oy, oz = comp
    m, ix, iy, iz = c["mass"], c["ix"], c["iy"], c["iz"]
    cz = c["cz"]
    Dx, Dy, Dz = c["D"]

    qn2 = qw * qw + qx * qx + qy * qy + qz * qz
    inv = 1.0 / qn2
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
    fz = r22 * total_thrust + c["g"] * m
    tx = mx_c + jnp.zeros_like(px)
    ty = my_c + jnp.zeros_like(px)
    tz = mz_c + jnp.zeros_like(px)
    if servo_kv is not None:
        tx = tx + servo_kv * (servo_cmd[0] - ox)
        ty = ty + servo_kv * (servo_cmd[1] - oy)
        tz = tz + servo_kv * (servo_cmd[2] - oz)

    # Fluid drag (body frame): v_com_b = Rᵀ v + ω × c, c = (0,0,cz).
    vb0 = r00 * vx + r10 * vy + r20 * vz + oy * cz
    vb1 = r01 * vx + r11 * vy + r21 * vz - ox * cz
    vb2 = r02 * vx + r12 * vy + r22 * vz
    diam = (Dx + Dy + Dz) / 3.0
    kv_visc = 3.0 * math.pi * c["viscosity"] * diam
    kt_visc = math.pi * c["viscosity"] * diam**3
    rho_d = c["density"]
    fb0 = -kv_visc * vb0 - 0.5 * rho_d * Dy * Dz * jnp.abs(vb0) * vb0
    fb1 = -kv_visc * vb1 - 0.5 * rho_d * Dz * Dx * jnp.abs(vb1) * vb1
    fb2 = -kv_visc * vb2 - 0.5 * rho_d * Dx * Dy * jnp.abs(vb2) * vb2
    tx = tx - kt_visc * ox - rho_d * Dx * (Dy**4 + Dz**4) / 64.0 * jnp.abs(ox) * ox
    ty = ty - kt_visc * oy - rho_d * Dy * (Dz**4 + Dx**4) / 64.0 * jnp.abs(oy) * oy
    tz = tz - kt_visc * oz - rho_d * Dz * (Dx**4 + Dy**4) / 64.0 * jnp.abs(oz) * oz
    fx = fx + r00 * fb0 + r01 * fb1 + r02 * fb2
    fy = fy + r10 * fb0 + r11 * fb1 + r12 * fb2
    fz = fz + r20 * fb0 + r21 * fb1 + r22 * fb2

    # gyroscopic term ω × (I ω)
    gyx = oy * (iz * oz) - oz * (iy * oy)
    gyy = oz * (ix * ox) - ox * (iz * oz)
    gyz = ox * (iy * oy) - oy * (ix * ox)

    if contact:
        fx, fy, fz, tx, ty, tz = _coupled_contact(
            c, (px, py, pz),
            (r00, r01, r02, r10, r11, r12, r20, r21, r22),
            (vx, vy, vz), (ox, oy, oz),
            (fx, fy, fz), (tx, ty, tz), (gyx, gyy, gyz),
        )

    odx = (tx - gyx) / ix
    ody = (ty - gyy) / iy
    odz = (tz - gyz) / iz
    # Origin coupling: a_o = a_c − R·(α×c + ω×(ω×c)), c = (0,0,cz).
    uc0 = (ody + oz * ox) * cz
    uc1 = (-odx + oz * oy) * cz
    uc2 = -(ox * ox + oy * oy) * cz
    accx = fx / m - (r00 * uc0 + r01 * uc1 + r02 * uc2)
    accy = fy / m - (r10 * uc0 + r11 * uc1 + r12 * uc2)
    accz = fz / m - (r20 * uc0 + r21 * uc1 + r22 * uc2)

    nvx, nvy, nvz = vx + accx * c["dt"], vy + accy * c["dt"], vz + accz * c["dt"]
    nox, noy, noz = ox + odx * c["dt"], oy + ody * c["dt"], oz + odz * c["dt"]
    npx = px + nvx * c["dt"]            # positions from NEW velocities
    npy = py + nvy * c["dt"]
    npz = pz + nvz * c["dt"]

    # Exp-map quaternion update: q ⊗ exp(½ ω dt), renormalised.
    rx, ry, rz = nox * c["dt"], noy * c["dt"], noz * c["dt"]
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


def _hover_step_tiles(comp, raw_action, c=_GROUND, frame_skip: int = 2):
    """One outer env step (``frame_skip`` substeps) + hovering
    reward/done.  ``raw_action`` is the Python-constant 4-vector;
    dynamics use the clipped control, the reward uses the RAW values
    (reference quirk).  ``c``: physics constants — Python floats
    (:data:`_GROUND`) or traced SMEM scalars (:func:`_hover_consts`)."""
    ctrl_hi = c.get("ctrl_high", 1.0)
    arm = c.get("arm", _ARM)
    yaw_gear = c.get("yaw_gear", _YAW_GEAR)
    # jnp.clip keeps this valid for traced ctrl_high; with Python floats
    # it constant-folds to the same values as the old min/max.
    ctrl = tuple(jnp.clip(jnp.float32(a), jnp.float32(0.0), ctrl_hi)
                 for a in raw_action)
    total = sum(ctrl)
    mx_c = arm * sum(y * u for y, u in zip(_MOTOR_Y, ctrl))
    my_c = -arm * sum(x * u for x, u in zip(_MOTOR_X, ctrl))
    mz_c = yaw_gear * sum(s * u for s, u in zip(_YAW_SIGN, ctrl))
    for _ in range(frame_skip):
        comp = _rigid_substep(comp, c, total, mx_c, my_c, mz_c, None, None,
                              False)
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


#: Per-sub-call batch cap for the hover throughput kernel (the
#: tunnelled-runtime erratum worked around in hover_rollout_pallas8);
#: module-level so tests can shrink it to pin sliced ≡ unsliced.
_HOVER_MAX_DISPATCH_B = 262144

#: Baked-constant hover consts: MujocoQuadForce-v1's registry defaults
#: (envs/tpuquad.Params(init_z=1.0)) as compile-time Python floats — no
#: SMEM reads; selected when the env params ARE the defaults.
_HOVER_BAKED = dict(_GROUND, init_z=1.0, arm=_ARM, yaw_gear=_YAW_GEAR,
                    ctrl_high=1.0)


def _kernel(horizon, action, frame_skip, p_ref, s_ref, out_ref, rew_ref):
    _hover_kernel_body(_hover_consts(p_ref), horizon, action, frame_skip,
                       s_ref, out_ref, rew_ref)


def _kernel_baked(horizon, action, frame_skip, s_ref, out_ref, rew_ref):
    _hover_kernel_body(_HOVER_BAKED, horizon, action, frame_skip,
                       s_ref, out_ref, rew_ref)


def _hover_kernel_body(c, horizon, action, frame_skip, s_ref, out_ref,
                       rew_ref):
    ncomp = 13

    def rows(s, i):
        return s[8 * i : 8 * (i + 1)]

    # Deterministic reset pose: z = Params.init_z (traced or baked), qw = 1.
    shape = (8,) + s_ref.shape[1:]
    zero = jnp.zeros(shape, s_ref.dtype)
    init_rows = jnp.concatenate(
        [zero, zero, jnp.full(shape, c["init_z"], s_ref.dtype),
         jnp.full(shape, 1.0, s_ref.dtype)] + [zero] * (ncomp - 4), axis=0
    )

    def body(_, carry):
        s, rew_acc = carry
        comp, done, reward = _hover_step_tiles(
            [rows(s, i) for i in range(ncomp)], action, c, frame_skip
        )
        stacked = jnp.concatenate(comp, axis=0)
        stacked = jnp.where(jnp.tile(done, (ncomp, 1)), init_rows, stacked)
        return stacked, rew_acc + reward

    s0 = s_ref[:, :]
    rew0 = jnp.zeros((8,) + s0.shape[1:], s0.dtype)
    s_final, rew = jax.lax.fori_loop(0, horizon, body, (s0, rew0))
    out_ref[:, :] = s_final
    rew_ref[:, :] = rew


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
        comp = _rigid_substep(comp, c, total, mx_c, my_c, mz_c, servo_kv, servo_cmd, True)
        comp = _rigid_substep(comp, c, total, mx_c, my_c, mz_c, servo_kv, servo_cmd, True)
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
    impedance ground contact in-kernel (constant action).

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


@functools.partial(jax.jit, static_argnames=("horizon", "tile8", "action",
                                              "frame_skip"))
def hover_rollout_pallas8(states_t: jnp.ndarray, horizon: int,
                          tile8: int = 256,
                          action: tuple = (0.0, 0.0, 0.0, 0.0),
                          params_vec=None, frame_skip: int = 2):
    """Fused MujocoQuadForce-v1 rollout with constant action + auto-reset.

    ``states_t``: (13, B) float32, B a multiple of ``8 * tile8``.
    ``action``: Python 4-tuple of per-motor controls (compile-time
    constant).  ``params_vec``: :func:`hover_params_vec` output (live
    SMEM scalars — the fast path survives param sweeps), or None for
    the BAKED-constant variant (:data:`_HOVER_BAKED`, the registry
    default Params as compile-time floats — no SMEM reads);
    ``frame_skip`` is static (loop count).  Returns
    (final_states_t (13, B), reward_sum (B,)).
    """
    d, batch = states_t.shape
    assert d == 13 and batch % (8 * tile8) == 0, (d, batch, tile8)
    # Tunnelled-runtime erratum (observed 2026-08-20, v5e): a single
    # hover-kernel call at batch ≳ 450k, run in a process where a
    # SMALLER-batch hover executable ran earlier, returns garbage in the
    # final 128 lanes (reward AND state; tile8/SMEM-variant independent;
    # quad3d/contact kernels at identical shapes are unaffected, and a
    # fresh process running only the large batch is clean).  Slice big
    # batches into 262144-env sub-calls — that size never corrupted in
    # any ramp — inside this same jit; the grid is embarrassingly
    # parallel so semantics are unchanged (interpret differentials
    # cover it).
    max_b = _HOVER_MAX_DISPATCH_B
    if batch > max_b and max_b % (8 * tile8) == 0:
        outs, rews = [], []
        for lo in range(0, batch, max_b):
            chunk = states_t[:, lo:lo + max_b]
            o, r = hover_rollout_pallas8(chunk, horizon, tile8=tile8,
                                         action=action, params_vec=params_vec,
                                         frame_skip=frame_skip)
            outs.append(o)
            rews.append(r)
        return jnp.concatenate(outs, axis=1), jnp.concatenate(rews)
    b8 = batch // 8
    s_rows = states_t.reshape(104, b8)
    grid = (b8 // tile8,)
    vmem_in = pl.BlockSpec((104, tile8), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    if params_vec is None:
        kern = functools.partial(_kernel_baked, horizon, action, frame_skip)
        in_specs, args = [vmem_in], (s_rows,)
    else:
        kern = functools.partial(_kernel, horizon, action, frame_skip)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), vmem_in]
        args = (params_vec.astype(jnp.float32), s_rows)
    out, rew = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((104, tile8), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile8), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((104, b8), states_t.dtype),
            jax.ShapeDtypeStruct((8, b8), states_t.dtype),
        ],
    )(*args)
    return out.reshape(13, batch), rew.reshape(batch)
