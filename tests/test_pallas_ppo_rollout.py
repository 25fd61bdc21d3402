"""Fused policy+env Pallas rollout kernel vs ppo.collect_rollout
(interpret mode on the CPU test backend).

The kernel draws its Gaussian noise from the on-core PRNG, so stochastic
rollouts are statistically equivalent to the scan path, not bitwise.
The differential strategy:

1. σ→0 leg: with log_std = −40, f32 ``mean + σ·z`` rounds to ``mean``
   exactly, and the kernel computes log-prob from the ROUNDED realised
   action (like the scan path's gaussian_log_prob of the stored action)
   — so the ENTIRE rollout (trajectory, rewards, dones, resets,
   normalisation moments, final states, return carries) must match the
   scan path bitwise-for-f32.
2. Stochastic leg: per-sample invariants that hold for ANY noise —
   log_prob must equal the Gaussian log-density of the stored action
   under the policy recomputed from the stored obs, rewards/dones must
   be the env's response to the stored action, and the noise moments
   must match N(0, σ²).
3. train_step leg: a full PPO update with fused_rollout="on" learns on
   a trajectory whose statistics track the scan path's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.ops import pallas_ppo_rollout
from reinmav_tpu.rl import networks, ppo

pytestmark = pytest.mark.skipif(
    not pallas_ppo_rollout.available(), reason="pallas unavailable"
)

ENV_IDS = [
    "MujocoQuadForce-v1",
    "quadrotor3d-v0",
    "quadrotor2d-v0",
    "quadrotor2d-slungload-v0",
    "quadrotor3d-slungload-v0",
]
# The slung-load envs kinematically project the load ONTO the tether
# sphere every taut step, so the next step's taut/slack predicate is
# fp-degenerate: free-running kernel-vs-scan trajectories WILL flip
# branches on ulp-level differences (same knife-edge as
# tests/test_parity.py's resynchronised slung parity).  Their σ→0 leg
# resynchronises per step instead.
FREE_RUN_IDS = ["MujocoQuadForce-v1", "quadrotor3d-v0", "quadrotor2d-v0"]
RESYNC_IDS = ["quadrotor2d-slungload-v0", "quadrotor3d-slungload-v0"]


def _setup(env_id, batch, sigma_zero):
    env = reinmav_tpu.make(env_id)
    cfg = ppo.PpoConfig(num_envs=batch, rollout_len=16, hidden=(64, 64),
                        fused_rollout="on")
    params = networks.init_params(
        jax.random.PRNGKey(0), networks.MlpConfig(env.obs_dim, env.action_dim))
    if sigma_zero:
        params["log_std"] = jnp.full_like(params["log_std"], -40.0)
    states = env.vreset(jax.random.split(jax.random.PRNGKey(1), batch))
    states = states.astype(jnp.float32)
    if sigma_zero and env_id == "quadrotor2d-v0":
        # Damp the U(-1,1) initial velocities: gravity alone drives
        # ‖vel‖ past the 2 m/s done limit within 16 steps for fast
        # initial draws, and the two paths' RESET streams differ by
        # design (jax.random vs on-core PRNG) — the σ→0 bitwise leg
        # must stay done-free to compare trajectories.
        states = states * 0.3
    # Warm the normalisers so the normalisation path is non-trivial.
    obs_norm = ppo.ObsNorm(
        jnp.linspace(-0.1, 0.1, env.obs_dim).astype(jnp.float32),
        jnp.linspace(0.5, 2.0, env.obs_dim).astype(jnp.float32),
        jnp.asarray(100.0, jnp.float32),
    )
    ret_norm = ppo.RetNorm(jnp.asarray(4.0, jnp.float32),
                           jnp.asarray(100.0, jnp.float32))
    rets = jnp.linspace(-1.0, 1.0, batch).astype(jnp.float32)
    return env, cfg, params, states, obs_norm, ret_norm, rets


def _run_pallas(env, cfg, params, obs_norm, ret_norm, states, rets, key):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return ppo._collect_rollout_pallas(
            env, cfg, params, obs_norm, ret_norm, states, rets, key)


@pytest.mark.parametrize("env_id", FREE_RUN_IDS)
def test_sigma_zero_matches_scan_bitwise(env_id):
    """With σ→0 both paths take action == mean deterministically; every
    output of the rollout must agree at f32 tolerance."""
    env, cfg, params, states, obs_norm, ret_norm, rets = _setup(
        env_id, batch=64, sigma_zero=True)
    key = jax.random.PRNGKey(7)

    f_s, r_s, _, traj_s, om_s, rm_s, rr_s = jax.jit(
        lambda *a: ppo.collect_rollout(env, cfg, *a)
    )(params, obs_norm, ret_norm, states, rets, key)
    f_p, r_p, _, traj_p, om_p, rm_p, rr_p = _run_pallas(
        env, cfg, params, obs_norm, ret_norm, states, rets, key)

    def close(a, b, name, tol=1e-5):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=tol, atol=tol, err_msg=name)

    close(traj_p.obs, traj_s.obs, "obs")
    close(traj_p.action, traj_s.action, "action")
    close(traj_p.log_prob, traj_s.log_prob, "log_prob", 1e-4)
    close(traj_p.value, traj_s.value, "value")
    close(traj_p.reward, traj_s.reward, "reward")
    np.testing.assert_array_equal(np.asarray(traj_p.done),
                                  np.asarray(traj_s.done))
    close(f_p, f_s, "final_states")
    close(r_p, r_s, "env_returns")
    # Moments are large sums — relative tolerance.
    for a, b, name in ((om_p, om_s, "obs_moments"), (rm_p, rm_s, "ret_moments")):
        np.testing.assert_allclose(np.asarray(a.total), np.asarray(b.total),
                                   rtol=1e-4, atol=1e-3, err_msg=name)
        np.testing.assert_allclose(np.asarray(a.total_sq), np.asarray(b.total_sq),
                                   rtol=1e-4, atol=1e-3, err_msg=name)
        assert float(a.count) == float(b.count)
    np.testing.assert_allclose(float(rr_p), float(rr_s), rtol=1e-4)


def _tether_norm(env_id, states):
    if "3d" in env_id:
        return np.linalg.norm(
            np.asarray(states[:, 10:13] - states[:, 0:3]), axis=1), 1.5
    return np.linalg.norm(
        np.asarray(states[:, 5:7] - states[:, 0:2]), axis=1), 0.5


@pytest.mark.parametrize("env_id", RESYNC_IDS)
def test_sigma_zero_matches_scan_resynchronised(env_id):
    """Slung-load σ→0 leg: single-step kernel-vs-scan comparisons with
    the scan state fed to BOTH paths each step, skipping lanes within
    eps of the tether sphere (the test_pallas_slungload precedent —
    after a taut projection those lanes flip branches on ulp-level FMA
    differences between the two programs)."""
    env, cfg, params, states, obs_norm, ret_norm, rets = _setup(
        env_id, batch=64, sigma_zero=True)
    cfg = cfg._replace(rollout_len=1)
    key = jax.random.PRNGKey(7)
    B = 64

    scan_fn = jax.jit(lambda *a: ppo.collect_rollout(env, cfg, *a))
    taut_seen = slack_seen = False
    for t in range(8):
        k = jax.random.fold_in(key, t)
        f_s, r_s, _, traj_s, om_s, rm_s, rr_s = scan_fn(
            params, obs_norm, ret_norm, states, rets, k)
        f_p, r_p, _, traj_p, om_p, rm_p, rr_p = _run_pallas(
            env, cfg, params, obs_norm, ret_norm, states, rets, k)

        tn, L = _tether_norm(env_id, states)
        safe = np.abs(tn - L) > 1e-4
        taut_seen |= bool((tn >= L).any())
        slack_seen |= bool((tn < L).any())

        for a, b, name in (
            (traj_p.obs, traj_s.obs, "obs"),
            (traj_p.action, traj_s.action, "action"),
            (traj_p.value, traj_s.value, "value"),
            (traj_p.reward, traj_s.reward, "reward"),
            (f_p.T, f_s.T, "final_states"),
            (r_p[None], r_s[None], "env_returns"),
        ):
            a = np.asarray(a, np.float32).reshape(-1, B)[:, safe]
            b = np.asarray(b, np.float32).reshape(-1, B)[:, safe]
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5,
                                       err_msg=f"{name} step {t}")
        np.testing.assert_array_equal(
            np.asarray(traj_p.done).reshape(-1, B)[:, safe],
            np.asarray(traj_s.done).reshape(-1, B)[:, safe],
            err_msg=f"done step {t}")
        if safe.all():  # moments are whole-batch sums
            np.testing.assert_allclose(
                np.asarray(om_p.total), np.asarray(om_s.total),
                rtol=1e-4, atol=1e-3, err_msg=f"obs moments step {t}")
            np.testing.assert_allclose(float(rr_p), float(rr_s), rtol=1e-4,
                                       err_msg=f"raw reward step {t}")
        states, rets = f_s, r_s  # resynchronise on the scan state
    assert taut_seen and slack_seen  # both branches genuinely exercised


def _fake_normal(shape):
    """Deterministic N(0,1)-ish stand-in for interpret mode, where
    ``pltpu.prng_random_bits`` silently returns zeros on the CPU backend
    (the true PRNG path is validated on hardware —
    test_prng_moments_on_tpu)."""
    n = 1
    for s in shape:
        n *= s
    i = jnp.arange(n, dtype=jnp.float32).reshape(shape)
    return 1.7 * jnp.sin(12.9898 * i + 78.233) + 0.3 * jnp.sin(0.7 * i)


@pytest.mark.parametrize("env_id", ENV_IDS)
def test_stochastic_invariants(env_id, monkeypatch):
    """Per-sample invariants that hold for any noise realisation (noise
    injected deterministically — see _fake_normal)."""
    monkeypatch.setattr(pallas_ppo_rollout, "_normal", _fake_normal)
    env, cfg, params, states, obs_norm, ret_norm, rets = _setup(
        env_id, batch=256, sigma_zero=False)
    _, _, _, traj, _, _, _ = _run_pallas(
        env, cfg, params, obs_norm, ret_norm, states, rets,
        jax.random.PRNGKey(3))
    T = cfg.rollout_len
    d = env.obs_dim
    A = env.action_dim
    obs = np.asarray(traj.obs).reshape(T, d, -1)          # (T, D, B)
    act = np.asarray(traj.action).reshape(T, A, -1)
    logp = np.asarray(traj.log_prob).reshape(T, -1)
    value = np.asarray(traj.value).reshape(T, -1)

    # 1. log_prob/value consistency: recompute the policy from the
    # stored (normalised) obs.
    mean_t, log_std, value_t = networks.apply_t(
        params, jnp.asarray(obs.reshape(T * 1, d, -1).transpose(1, 0, 2)
                            .reshape(d, -1)))
    mean_np = np.asarray(mean_t).reshape(A, T, -1).transpose(1, 0, 2)
    ref_logp = np.asarray(networks.gaussian_log_prob_t(
        jnp.asarray(mean_np.transpose(1, 0, 2).reshape(A, -1)),
        params["log_std"],
        jnp.asarray(act.transpose(1, 0, 2).reshape(A, -1)),
    )).reshape(T, -1)
    np.testing.assert_allclose(logp, ref_logp, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        value, np.asarray(value_t).reshape(T, -1), rtol=1e-4, atol=1e-4)

    # 2. the injected noise actually reached the actions (non-trivial
    # exploration — guards against the sampling path silently zeroing).
    sigma = np.exp(np.asarray(params["log_std"]))
    z = (act - mean_np) / sigma.reshape(1, A, 1)
    assert z.std() > 0.5, z.std()
    assert np.isfinite(z).all()


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="true on-core PRNG needs hardware")
def test_prng_moments_on_tpu():
    """The Box–Muller sampler over the real on-core PRNG: N(0,1) moments
    and healthy tails (compiled path only — interpret mode's
    prng_random_bits is a zero stub)."""
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        o_ref[:, :] = pallas_ppo_rollout._normal((256, 512))

    out = pl.pallas_call(
        k, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((256, 512), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((256, 512), jnp.float32)],
    )(jnp.asarray([1234], jnp.int32))
    z = np.asarray(out[0]).ravel()
    n = z.size
    assert abs(z.mean()) < 5.0 / np.sqrt(n), z.mean()
    assert abs(z.std() - 1.0) < 5.0 / np.sqrt(n), z.std()
    assert 4.0 < np.abs(z).max() < 8.0  # 131k draws: healthy Gaussian tail
    assert np.isfinite(z).all()


@pytest.mark.parametrize("env_id", ["MujocoQuadForce-v1", "quadrotor2d-v0"])
def test_train_step_fused_rollout_learns_consistently(env_id):
    """A full train_step with fused_rollout='on': finite metrics, same
    scale as the scan path, and the TrainState advances (quadrotor2d
    exercises the action_dim=2 wiring end-to-end)."""
    from jax.experimental.pallas import tpu as pltpu

    env = reinmav_tpu.make(env_id)
    cfg = ppo.PpoConfig(num_envs=64, rollout_len=16, num_epochs=2,
                        num_minibatches=2, hidden=(64, 64),
                        fused_rollout="on")
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0))

    with pltpu.force_tpu_interpret_mode():
        s_fused, m_fused = jax.jit(
            lambda s: ppo.train_step(env, cfg, s, fused_rollout=True,
                                     fused_loss=False)
        )(state)
    s_scan, m_scan = jax.jit(
        lambda s: ppo.train_step(env, cfg, s, fused_rollout=False,
                                 fused_loss=False)
    )(state)

    for name, v in m_fused.items():
        assert np.isfinite(float(v)), name
    # Same reward scale (same policy, same env, different noise draws).
    np.testing.assert_allclose(float(m_fused["mean_reward"]),
                               float(m_scan["mean_reward"]), rtol=0.1)
    assert int(s_fused.update_step) == 1
    moved = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(s_fused.params))
    )
    assert moved
