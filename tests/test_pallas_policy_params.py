"""Live (non-default) env Params through the POLICY-driven fused kernels
(ops/pallas_ppo_rollout, ops/pallas_offpolicy) — r4 verdict item #1.

The r4 change routed the live Params SMEM vector into the fused PPO
rollout and off-policy collection kernels, but every existing
differential ran default params, where the plumbing is bitwise-neutral:
a swapped ``read_pv`` slot (or a dropped done clause — the quad2d
``‖vel‖>10`` regression this file pins) would silently train on wrong
physics.  Strategy (the test_pallas_params recipe, σ→0 so both paths
take action == mean):

* per-step resynchronised kernel-vs-scan differentials at SWEPT params
  for all five reward-bearing env IDs, masking lanes the scan reset
  (the two paths' reset streams differ by design — EXCEPT hover, whose
  deterministic reset makes post-reset lanes comparable and therefore
  covers the kernel's SMEM ``init_z`` reset directly);
* the quad2d case seeds velocities spanning the hardcoded ``‖vel‖>10``
  clause with ``vel_limit=15`` — the reference's folded Q1/Q2 predicate
  (envs/quadrotor2d.py:62) must terminate those lanes in BOTH paths;
* a sensitivity leg proving the differential actually bites: a
  deliberately-corrupted ``read_pv`` slot must FAIL it;
* gate legs: swept params keep ``kernel_mismatch(env) is None`` (the
  fast path survives param sweeps), structural params the vector cannot
  carry (hover ``frame_skip``) refuse, and a registry reset fn with
  REPLACED Params(init_z=...) refuses (envs/core.py reset_ok tag check
  — the r4 advisor's divergence hole);
* a train_step smoke on a swept env with the fused rollout forced on.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinmav_tpu.envs import (quadrotor2d, quadrotor2d_slungload, quadrotor3d,
                              quadrotor3d_slungload, tpuquad)
from reinmav_tpu.envs.core import fused_kernel_mismatch
from reinmav_tpu.ops import pallas_offpolicy, pallas_ppo_rollout
from reinmav_tpu.rl import networks, ppo, sac

pytestmark = pytest.mark.skipif(
    not pallas_ppo_rollout.available(), reason="pallas unavailable"
)

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

B = 64


def _quad2d_states(key):
    """quadrotor2d states whose velocity norms span the hardcoded
    ‖vel‖>10 done clause (8..14 m/s on the upper lanes) while positions
    stay inside pos_limit."""
    s = jax.random.uniform(key, (B, 5), jnp.float32, -1.0, 1.0) * 0.3
    speed = jnp.linspace(0.0, 14.0, B)
    ang = jnp.linspace(0.0, 2 * np.pi, B)
    return s.at[:, 3].set(speed * jnp.cos(ang)).at[:, 4].set(
        speed * jnp.sin(ang))


def _hover_states(key):
    """Hover states spread across the done boundaries (pz <= 0.3,
    |px|,|py| >= 2) so resets — and therefore the SMEM init_z — are
    exercised; quat = identity + small tilt, small velocities."""
    s = jnp.zeros((B, 13), jnp.float32)
    s = s.at[:, 0].set(jnp.linspace(-2.2, 2.2, B))
    s = s.at[:, 1].set(jnp.linspace(1.0, -1.0, B))
    s = s.at[:, 2].set(jnp.linspace(0.25, 2.5, B))
    s = s.at[:, 3].set(1.0)
    tilt = jax.random.uniform(key, (B, 3), jnp.float32, -0.05, 0.05)
    s = s.at[:, 4:7].set(tilt)
    s = s.at[:, 7:13].set(
        jax.random.uniform(jax.random.fold_in(key, 1), (B, 6), jnp.float32,
                           -0.5, 0.5))
    return s


def _spread_norm(s, lo, hi, max_norm):
    """Rescale states[:, lo:hi] so its per-lane norm sweeps
    linspace(0.1, max_norm, B) — spans the env's done boundary (reset
    states are U(-1,1), always inside pos_limit, so without this no lane
    ever terminates and the done legs are vacuous)."""
    seg = s[:, lo:hi]
    n = jnp.linalg.norm(seg, axis=1, keepdims=True)
    target = jnp.linspace(0.1, max_norm, B, dtype=jnp.float32)[:, None]
    return s.at[:, lo:hi].set(seg / jnp.maximum(n, 1e-3) * target)


def _translate(s, tether, max_shift):
    """Shift quad AND load positions by a common per-lane offset (sweeps
    0..max_shift along x̂): crosses the slungload done boundary (LOAD
    position norm) while preserving the tether distance exactly — the
    taut projection otherwise pins the load within tether_length of the
    quad and no spread of the load alone can terminate."""
    (q0, q1), (l0, l1), _ = tether
    shift = jnp.linspace(0.0, max_shift, B, dtype=jnp.float32)
    return (s.at[:, q0].add(shift).at[:, l0].add(shift))


#: (env, initial states, steps, deterministic_reset, tether (slices, L)).
def _cases():
    k = jax.random.PRNGKey(11)

    def vr(env, damp):
        return (env.vreset(jax.random.split(k, B)) * damp).astype(jnp.float32)

    q3 = quadrotor3d.make(quadrotor3d.Params(
        mass=1.3, dt=0.02, gravity=-9.0, pos_limit=2.5, vel_limit=8.0))
    q2 = quadrotor2d.make(quadrotor2d.Params(
        mass=1.2, vel_limit=15.0, thrust_scale=8.0))
    s2 = quadrotor2d_slungload.make(quadrotor2d_slungload.Params(
        tether_length=0.8, load_mass=0.2, mass=1.2))
    s3 = quadrotor3d_slungload.make(quadrotor3d_slungload.Params(
        tether_length=1.0, load_mass=0.25, mass=1.1))
    hv = tpuquad.make_hovering(tpuquad.Params(mass=0.35, init_z=2.0))
    return {
        # quad3d done: ‖pos‖ > 2.5 (swept) — sweep pos norms to 3.5.
        "quadrotor3d-v0": (
            q3, _spread_norm(vr(q3, 1.0), 0, 3, 3.5), 6, False, None),
        "quadrotor2d-v0": (q2, _quad2d_states(k), 4, False, None),
        # slungload done is on the LOAD position norm — translate quad
        # and load together past it (tether-distance preserving).
        "quadrotor2d-slungload-v0": (
            s2, _translate(vr(s2, 0.5), ((0, 2), (5, 7), 0.8), 3.0), 6,
            False, ((0, 2), (5, 7), 0.8)),
        "quadrotor3d-slungload-v0": (
            s3, _translate(vr(s3, 0.5), ((0, 3), (10, 13), 1.0), 4.5), 6,
            False, ((0, 3), (10, 13), 1.0)),
        "MujocoQuadForce-v1": (hv, _hover_states(k), 6, True, None),
    }


def _sigma_zero_setup(env):
    params = networks.init_params(
        jax.random.PRNGKey(0), networks.MlpConfig(env.obs_dim, env.action_dim))
    params["log_std"] = jnp.full_like(params["log_std"], -40.0)
    obs_norm = ppo.ObsNorm(
        jnp.linspace(-0.1, 0.1, env.obs_dim).astype(jnp.float32),
        jnp.linspace(0.5, 2.0, env.obs_dim).astype(jnp.float32),
        jnp.asarray(100.0, jnp.float32),
    )
    ret_norm = ppo.RetNorm(jnp.asarray(4.0, jnp.float32),
                           jnp.asarray(100.0, jnp.float32))
    return params, obs_norm, ret_norm


def _tether_safe(states, tether, eps=1e-4):
    if tether is None:
        return np.ones(B, bool)
    (q0, q1), (l0, l1), L = tether
    s = np.asarray(states)
    tn = np.linalg.norm(s[:, l0:l1] - s[:, q0:q1], axis=1)
    return np.abs(tn - L) > eps


@pytest.mark.parametrize("env_id", list(_cases()))
def test_swept_params_kernel_matches_scan(env_id):
    env, states, steps, det_reset, tether = _cases()[env_id]
    assert pallas_ppo_rollout.kernel_mismatch(env) is None
    params, obs_norm, ret_norm = _sigma_zero_setup(env)
    cfg = ppo.PpoConfig(num_envs=B, rollout_len=1, hidden=(64, 64),
                        fused_rollout="on")
    rets = jnp.linspace(-1.0, 1.0, B).astype(jnp.float32)
    scan_fn = jax.jit(lambda *a: ppo.collect_rollout(env, cfg, *a))

    done_seen = False
    for t in range(steps):
        k = jax.random.fold_in(jax.random.PRNGKey(7), t)
        f_s, r_s, _, traj_s, om_s, _, rr_s = scan_fn(
            params, obs_norm, ret_norm, states, rets, k)
        with pltpu.force_tpu_interpret_mode():
            f_p, r_p, _, traj_p, om_p, _, rr_p = ppo._collect_rollout_pallas(
                env, cfg, params, obs_norm, ret_norm, states, rets, k)

        safe = _tether_safe(states, tether)
        done = np.asarray(traj_s.done).reshape(B)
        done_seen |= bool(done[safe].any())
        # Pre-reset quantities: comparable on every non-knife-edge lane
        # (incl. done lanes — reward/done are computed before the reset).
        for a_, b_, name, tol in (
            (traj_p.obs, traj_s.obs, "obs", 1e-5),
            (traj_p.action, traj_s.action, "action", 1e-5),
            (traj_p.value, traj_s.value, "value", 1e-5),
            (traj_p.reward, traj_s.reward, "reward", 1e-4),
        ):
            np.testing.assert_allclose(
                np.asarray(a_, np.float32).reshape(-1, B)[:, safe],
                np.asarray(b_, np.float32).reshape(-1, B)[:, safe],
                rtol=tol, atol=tol, err_msg=f"{name} step {t}")
        np.testing.assert_array_equal(
            np.asarray(traj_p.done).reshape(B)[safe], done[safe],
            err_msg=f"done step {t}")
        # Post-reset states: hover's deterministic reset makes done lanes
        # comparable too (this is what pins the kernel's SMEM init_z).
        fmask = safe if det_reset else (safe & ~done)
        np.testing.assert_allclose(
            np.asarray(f_p, np.float32)[fmask],
            np.asarray(f_s, np.float32)[fmask], rtol=2e-4, atol=2e-4,
            err_msg=f"final step {t}")
        np.testing.assert_allclose(
            np.asarray(r_p, np.float32)[fmask],
            np.asarray(r_s, np.float32)[fmask], rtol=1e-4, atol=1e-4,
            err_msg=f"returns step {t}")
        if safe.all():
            np.testing.assert_allclose(
                np.asarray(om_p.total), np.asarray(om_s.total),
                rtol=1e-4, atol=1e-3, err_msg=f"obs moments step {t}")
            np.testing.assert_allclose(float(rr_p), float(rr_s), rtol=1e-4,
                                       atol=1e-5, err_msg=f"raw r step {t}")
        states, rets = f_s, r_s  # resynchronise on the scan state
    assert done_seen, "no lane ever terminated — the done legs are vacuous"


def test_quad2d_hardcoded_vel10_clause_fires():
    """vel_limit=15 with ‖vel‖ ∈ (10, 15) lanes: the reference's folded
    ‖vel‖>10 clause (Q1/Q2) must terminate them — the r4 advisor
    regression (the kernel dropped the clause once vel_limit became a
    live param)."""
    env, states, _, _, _ = _cases()["quadrotor2d-v0"]
    params, obs_norm, ret_norm = _sigma_zero_setup(env)
    cfg = ppo.PpoConfig(num_envs=B, rollout_len=1, hidden=(64, 64),
                        fused_rollout="on")
    rets = jnp.zeros((B,), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        _, _, _, traj, _, _, _ = ppo._collect_rollout_pallas(
            env, cfg, params, obs_norm, ret_norm, states, rets,
            jax.random.PRNGKey(3))
    vn = np.linalg.norm(np.asarray(states)[:, 3:5], axis=1)
    done = np.asarray(traj.done).reshape(B)
    mid = (vn > 10.5) & (vn < 14.0)  # margin for the one-step accel
    assert mid.sum() >= 8
    assert done[mid].all(), "‖vel‖>10 lanes did not terminate in-kernel"


def test_corrupted_param_slot_fails_the_differential(monkeypatch):
    """Sensitivity: swap the quad3d mass/gravity SMEM slots — the swept
    differential must FAIL (guards against the kernel silently ignoring
    or mis-unpacking the vector)."""
    entry = pallas_ppo_rollout._ENVS["quadrotor3d-v0"]
    real_read = entry[5]

    def bad_read(p_ref):
        pv = real_read(p_ref)
        pv["mass"], pv["gravity"] = pv["gravity"], pv["mass"]
        return pv

    monkeypatch.setitem(pallas_ppo_rollout._ENVS, "quadrotor3d-v0",
                        entry[:5] + (bad_read,))
    # env_kind is a STATIC jit arg: earlier tests leave a compiled trace
    # with the real read_pv baked in, so the monkeypatch only bites on a
    # fresh trace — and the corrupted trace must not leak onward either.
    pallas_ppo_rollout.ppo_rollout_pallas.clear_cache()
    try:
        with pytest.raises(AssertionError):
            test_swept_params_kernel_matches_scan("quadrotor3d-v0")
    finally:
        pallas_ppo_rollout.ppo_rollout_pallas.clear_cache()


@pytest.mark.parametrize("env_id", list(_cases()))
def test_offpolicy_swept_params_det_differential(env_id):
    """ε→0 fused collection at swept params: stored obs+action bitwise,
    reward/next_obs/done vs the scan block (knife-edge lanes masked)."""
    env, states, _, det_reset, tether = _cases()[env_id]
    d, a = env.obs_dim, env.action_dim
    actor = sac._mlp_init(jax.random.PRNGKey(0), (d, 64, 64, 2 * a))
    states_t = states.T
    mean, _ = sac.actor_dist_t(actor, states_t[:d], a)
    a_det = jnp.tanh(mean)
    out = sac._autoreset_dense8(env, states_t,
                                sac._scale_action_t(env, a_det),
                                jax.random.PRNGKey(5))
    blk_scan = jnp.concatenate([
        states_t[:d], a_det, out.reward[None], out.obs[:d],
        out.done[None].astype(jnp.float32),
    ])

    consts = sac._collect_consts(env, jnp.asarray(0.0, jnp.float32), 0.0)
    with pltpu.force_tpu_interpret_mode():
        new_rows, block_rows = pallas_offpolicy.collect_step_pallas(
            env.name, "sac_det", states_t.reshape(8 * d, B // 8),
            jnp.asarray([7], jnp.int32), consts,
            pallas_ppo_rollout.env_params_vec(env),
            *pallas_offpolicy.actor_kernel_args(actor),
            tile=sac._collect_tile(B))
    blk = np.asarray(block_rows.reshape(2 * d + a + 2, B), np.float32)
    ref = np.asarray(blk_scan, np.float32)
    safe = _tether_safe(states, tether)
    np.testing.assert_array_equal(blk[:d + a][:, safe], ref[:d + a][:, safe])
    np.testing.assert_allclose(blk[d + a:][:, safe], ref[d + a:][:, safe],
                               rtol=1e-4, atol=1e-4)
    done = blk[2 * d + a + 1] > 0.5
    smask = safe & (~done if not det_reset else np.ones(B, bool))
    np.testing.assert_allclose(
        np.asarray(new_rows.reshape(d, B), np.float32)[:, smask],
        np.asarray(out.state, np.float32)[:, smask], rtol=2e-4, atol=2e-4)


def test_structural_params_still_refuse():
    """Params the SMEM vector cannot carry keep refusing the fused tier
    rather than silently running wrong physics."""
    env = tpuquad.make_hovering(tpuquad.Params(init_z=1.0, frame_skip=3))
    reason = pallas_ppo_rollout.kernel_mismatch(env)
    assert reason is not None and "frame_skip" in reason


def test_replaced_params_without_reset_closure_refuse():
    """The r4 advisor's reset divergence hole: an env KEEPING the
    registry deterministic-reset fn but carrying replaced
    Params(init_z=...) must be refused — the kernel would reset to the
    SMEM init_z while the scan resets to the closure's baked value."""
    env = tpuquad.make_hovering()
    hacked = dataclasses.replace(
        env, params=env.params._replace(init_z=2.0))
    assert fused_kernel_mismatch(hacked, require_control=False,
                                 packed_params=True) is not None
    assert pallas_ppo_rollout.kernel_mismatch(hacked) is not None
    # The honest spelling (make_hovering with swept init_z) stays fast.
    assert pallas_ppo_rollout.kernel_mismatch(
        tpuquad.make_hovering(tpuquad.Params(init_z=2.0))) is None


def test_train_step_fused_gate_engaged_on_swept_env():
    """One PPO update on a swept-params env with the fused rollout ON:
    the gate accepts, metrics are finite, params move."""
    env, _, _, _, _ = _cases()["quadrotor3d-v0"]
    cfg = ppo.PpoConfig(num_envs=B, rollout_len=8, num_epochs=1,
                        num_minibatches=2, hidden=(64, 64),
                        fused_rollout="on")
    assert ppo._fused_rollout_enabled(cfg, env, B)
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0))
    with pltpu.force_tpu_interpret_mode():
        s2, metrics = jax.jit(
            lambda s: ppo.train_step(env, cfg, s, fused_rollout=True,
                                     fused_loss=False))(state)
    for name, v in metrics.items():
        assert np.isfinite(float(v)), name
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(s2.params)))
