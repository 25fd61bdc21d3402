"""Fused off-policy collection kernel (ops/pallas_offpolicy) vs the
scan collection of rl/sac.py (interpret mode on the CPU test backend).

Differential strategy (the PPO-rollout-kernel recipe):

1. ε→0 leg (``mode="sac_det"`` / ``"td3_det"``): the kernel's stored
   obs and policy-space ACTIONS must match the scan collection BITWISE
   (identical MLP→tanh→affine pipeline; same dense8 reshape family, env
   order preserved); reward/next_obs at f32 tolerance (the kernel's
   step_tiles physics and the env step are ulp-compatible
   reimplementations — the test_pallas_ppo_rollout precedent); done
   exactly equal; post-reset states match on non-done lanes (the two
   paths' reset streams differ by design).
2. Stochastic leg: the env step is deterministic given the action, so
   re-stepping the kernel's STORED actions through the scan path must
   reproduce the block's next_obs/reward/done rows (same tolerances)
   for ANY noise realisation (noise injected deterministically —
   interpret mode's ``prng_random_bits`` is a zero stub; the true PRNG
   is validated on hardware by test_pallas_ppo_rollout).
3. Warmup leg: gate=1 ignores the actor entirely and stores the uniform
   draws; same re-stepping invariant.
4. Integration leg: ``train_iters(fused_collect="on")`` runs end-to-end
   in interpret mode with finite losses and an advancing ring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.ops import pallas_offpolicy, pallas_ppo_rollout
from reinmav_tpu.rl import sac, td3

pytestmark = pytest.mark.skipif(
    not pallas_offpolicy.available(), reason="pallas unavailable"
)

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

ENV_IDS = [
    "MujocoQuadForce-v1",
    "quadrotor3d-v0",
    "quadrotor2d-v0",
    "quadrotor2d-slungload-v0",
    "quadrotor3d-slungload-v0",
]


def _setup(env_id, batch, key=0, sac_head=True):
    env = reinmav_tpu.make(env_id)
    d, a = env.obs_dim, env.action_dim
    head = 2 * a if sac_head else a
    actor = sac._mlp_init(jax.random.PRNGKey(key), (d, 64, 64, head))
    states = env.vreset(jax.random.split(jax.random.PRNGKey(key + 1), batch))
    return env, actor, states.astype(jnp.float32)


def _run_kernel(env, actor, states, mode, warm=0.0, noise=0.0):
    d, b = env.obs_dim, states.shape[0]
    consts = sac._collect_consts(env, jnp.asarray(warm, jnp.float32), noise)
    with pltpu.force_tpu_interpret_mode():
        new_rows, block_rows = pallas_offpolicy.collect_step_pallas(
            env.name, mode, states.T.reshape(8 * d, b // 8),
            jnp.asarray([7], jnp.int32), consts,
            pallas_ppo_rollout.env_params_vec(env),
            *pallas_offpolicy.actor_kernel_args(actor),
            tile=sac._collect_tile(b))
    r = 2 * d + env.action_dim + 2
    return new_rows.reshape(d, b), block_rows.reshape(r, b)


def _scan_block(env, states_t, a_t, key):
    d = env.obs_dim
    out = sac._autoreset_dense8(env, states_t,
                                sac._scale_action_t(env, a_t), key)
    block = jnp.concatenate([
        states_t[:d], a_t, out.reward[None], out.obs[:d],
        out.done[None].astype(jnp.float32),
    ])
    return out, block


def _assert_blocks(blk, blk_scan, d, a):
    """obs+action bitwise; reward/next_obs at f32 tolerance; done exact
    (see module docstring)."""
    blk = np.asarray(blk, np.float32)
    blk_scan = np.asarray(blk_scan, np.float32)
    np.testing.assert_array_equal(blk[:d + a], blk_scan[:d + a])
    np.testing.assert_allclose(blk[d + a:2 * d + a + 1],
                               blk_scan[d + a:2 * d + a + 1],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(blk[2 * d + a + 1], blk_scan[2 * d + a + 1])


@pytest.mark.parametrize("env_id", ENV_IDS)
def test_det_differential(env_id):
    """ε→0: kernel block ≡ scan block; states match off-reset lanes."""
    env, actor, states = _setup(env_id, batch=256)
    d, a = env.obs_dim, env.action_dim
    states_t = states.T
    mean, _ = sac.actor_dist_t(actor, states_t[:d], a)
    a_det = jnp.tanh(mean)
    out, blk_scan = _scan_block(env, states_t, a_det, jax.random.PRNGKey(5))

    new_state, blk = _run_kernel(env, actor, states, "sac_det")
    _assert_blocks(blk, blk_scan, d, a)
    done = np.asarray(blk[2 * d + a + 1]) > 0.5
    assert done.mean() < 0.9  # comparison below must be non-vacuous
    np.testing.assert_allclose(
        np.asarray(new_state, np.float32)[:, ~done],
        np.asarray(out.state, np.float32)[:, ~done], rtol=1e-5, atol=1e-5)


def test_det_differential_td3():
    """TD3 head (tanh MLP, noise=0) against the td3 scan collection."""
    env, actor, states = _setup("MujocoQuadForce-v1", 256, sac_head=False)
    d, a = env.obs_dim, env.action_dim
    states_t = states.T
    a_det = td3.actor_action_t(actor, states_t[:d])
    out, blk_scan = _scan_block(env, states_t, a_det, jax.random.PRNGKey(5))
    new_state, blk = _run_kernel(env, actor, states, "td3_det")
    _assert_blocks(blk, blk_scan, d, a)


def _fake_normal(shape):
    n = 1
    for s in shape:
        n *= s
    i = jnp.arange(n, dtype=jnp.float32).reshape(shape)
    return 1.7 * jnp.sin(12.9898 * i + 78.233) + 0.3 * jnp.sin(0.7 * i)


def _fake_uniform_pm1(shape):
    n = 1
    for s in shape:
        n *= s
    i = jnp.arange(n, dtype=jnp.float32).reshape(shape)
    return jnp.sin(3.33 * i + 1.0) * 0.999


@pytest.mark.parametrize("env_id", ["MujocoQuadForce-v1", "quadrotor3d-v0"])
def test_stochastic_restep(env_id, monkeypatch):
    """Any-noise invariant: re-stepping the stored actions through the
    scan path reproduces next_obs/reward/done bitwise."""
    monkeypatch.setattr(pallas_ppo_rollout, "_normal", _fake_normal)
    env, actor, states = _setup(env_id, batch=256)
    d, a = env.obs_dim, env.action_dim
    _, blk = _run_kernel(env, actor, states, "sac")
    stored = blk[d:d + a]
    assert float(jnp.max(jnp.abs(stored))) <= 1.0
    # Noise actually reached the actions.
    mean, _ = sac.actor_dist_t(actor, states.T[:d], a)
    assert float(jnp.mean(jnp.abs(stored - jnp.tanh(mean)))) > 1e-3
    _, blk_re = _scan_block(env, states.T, stored, jax.random.PRNGKey(5))
    _assert_blocks(blk, blk_re, d, a)


def test_warmup_uniform(monkeypatch):
    """gate=1: the stored actions are the uniform draws (actor ignored)
    and the step rows are their env response."""
    monkeypatch.setattr(pallas_ppo_rollout, "_uniform_pm1", _fake_uniform_pm1)
    env, actor, states = _setup("MujocoQuadForce-v1", 256)
    env2, actor2, _ = _setup("MujocoQuadForce-v1", 256, key=42)
    d, a = env.obs_dim, env.action_dim
    _, blk = _run_kernel(env, actor, states, "sac", warm=1.0)
    _, blk2 = _run_kernel(env2, actor2, states, "sac", warm=1.0)
    # Different actors, same stored actions — the gate bypasses the MLP.
    np.testing.assert_array_equal(np.asarray(blk[d:d + a]),
                                  np.asarray(blk2[d:d + a]))
    assert float(jnp.max(jnp.abs(blk[d:d + a]))) <= 1.0
    _, blk_re = _scan_block(env, states.T, blk[d:d + a],
                            jax.random.PRNGKey(5))
    _assert_blocks(blk, blk_re, d, a)


def test_train_iters_integration_td3():
    """TD3 train loop with fused_collect="on" in interpret mode."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = td3.Td3Config(num_envs=64, batch_size=64, buffer_capacity=1024,
                        warmup_steps=64, hidden=(32, 32), grad_steps=1,
                        fused_collect="on")
    state = td3.init_state(env, cfg, jax.random.PRNGKey(0))
    with pltpu.force_tpu_interpret_mode():
        state2, met = td3.train_iters(env, cfg, state, 4)
    assert int(state2.filled) == 4 * 64
    assert np.isfinite(float(met["q_loss"]))
    assert not np.array_equal(np.asarray(state.actor[0]["w"]),
                              np.asarray(state2.actor[0]["w"]))


def test_train_iters_integration():
    """Full SAC train loop with fused_collect="on" in interpret mode:
    finite losses, ring advances, params move once the gate opens."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = sac.SacConfig(num_envs=64, batch_size=64, buffer_capacity=1024,
                        warmup_steps=64, hidden=(32, 32), grad_steps=1,
                        fused_collect="on")
    state = sac.init_state(env, cfg, jax.random.PRNGKey(0))
    with pltpu.force_tpu_interpret_mode():
        state2, met = sac.train_iters(env, cfg, state, 4)
    assert int(state2.filled) == 4 * 64
    assert np.isfinite(float(met["q_loss"]))
    assert np.isfinite(float(met["mean_reward"]))
    # Gate opened on iterations 2-4 -> params moved.
    w0 = np.asarray(state.actor[0]["w"])
    w1 = np.asarray(state2.actor[0]["w"])
    assert not np.array_equal(w0, w1)
