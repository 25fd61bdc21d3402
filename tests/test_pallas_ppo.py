"""Fused PPO loss-gradient kernel vs jax.value_and_grad(ppo_loss)
(interpret mode on the CPU test backend, f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinmav_tpu.ops import pallas_ppo
from reinmav_tpu.rl import networks, ppo

pytestmark = pytest.mark.skipif(
    not pallas_ppo.available(), reason="pallas unavailable"
)


def _random_batch(key, d, a, n):
    ks = jax.random.split(key, 7)
    obs = jax.random.normal(ks[0], (d, n), jnp.float32)
    act = jax.random.normal(ks[1], (a, n), jnp.float32)
    old_logp = jax.random.normal(ks[2], (n,), jnp.float32) * 0.3 - 4.0
    old_value = jax.random.normal(ks[3], (n,), jnp.float32)
    adv = jax.random.normal(ks[4], (n,), jnp.float32)
    ret = old_value + jax.random.normal(ks[5], (n,), jnp.float32) * 0.5
    return obs, act, old_logp, old_value, adv, ret


@pytest.mark.parametrize("ent_coef", [0.0, 1e-2])
def test_fused_loss_grads_match_autodiff(ent_coef):
    from jax.experimental.pallas import tpu as pltpu

    d, a, n = 10, 4, 512
    cfgnet = networks.MlpConfig(d, a, hidden=(64, 64))
    params = networks.init_params(jax.random.PRNGKey(0), cfgnet)
    # Perturb so log_std and heads are not at init symmetry.
    params["log_std"] = params["log_std"] + 0.1
    cfg = ppo.PpoConfig(entropy_coef=ent_coef, normalize_advantages=False)

    obs, act, old_logp, old_value, adv, ret = _random_batch(
        jax.random.PRNGKey(1), d, a, n
    )
    batch = ppo.Transition(obs, act, old_logp, old_value, jnp.zeros(n),
                           jnp.zeros(n, bool))
    (loss, metrics), grads = jax.value_and_grad(ppo.ppo_loss, has_aux=True)(
        params, cfg, batch, adv, ret
    )

    layers, wo, bo = networks.fused_weights(params)
    (w1, b1), (w2, b2) = layers
    with pltpu.force_tpu_interpret_mode():
        g, m = pallas_ppo.ppo_loss_grads_pallas(
            obs, act, old_logp, old_value, adv, ret,
            w1, b1, w2, b2, wo, bo, params["log_std"],
            clip_eps=cfg.clip_eps, value_clip_eps=cfg.value_clip_eps,
            value_coef=cfg.value_coef, ent_coef=cfg.entropy_coef,
            tile=128, compute_dtype="float32",
        )

    # Metrics agree.
    for name in ("pg_loss", "v_loss", "approx_kl", "clip_frac"):
        np.testing.assert_allclose(
            float(m[name]), float(metrics[name]), rtol=2e-4, atol=1e-6,
            err_msg=name,
        )

    def close(x, y, name):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=2e-6, err_msg=name)

    # Fused grads sliced back to the tower params must equal autodiff.
    h = 64
    close(g["w1"][:, :h], grads["pi"][0]["w"], "pi w1")
    close(g["w1"][:, h:], grads["vf"][0]["w"], "vf w1")
    close(g["b1"][:h], grads["pi"][0]["b"], "pi b1")
    close(g["b1"][h:], grads["vf"][0]["b"], "vf b1")
    close(g["w2"][:h, :h], grads["pi"][1]["w"], "pi w2")
    close(g["w2"][h:, h:], grads["vf"][1]["w"], "vf w2")
    close(g["b2"][:h], grads["pi"][1]["b"], "pi b2")
    close(g["b2"][h:], grads["vf"][1]["b"], "vf b2")
    close(g["wo"][:h, :a], grads["pi_out"]["w"], "pi_out w")
    close(g["wo"][h:, a:], grads["vf_out"]["w"], "vf_out w")
    close(g["bo"][:a], grads["pi_out"]["b"], "pi_out b")
    close(g["bo"][a:], grads["vf_out"]["b"], "vf_out b")
    close(g["log_std"], grads["log_std"], "log_std")


def test_train_step_fused_matches_autodiff():
    """Full train_step with the fused kernel (interpret mode) must match
    the XLA autodiff path to float tolerance."""
    from jax.experimental.pallas import tpu as pltpu

    import reinmav_tpu

    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = ppo.PpoConfig(num_envs=32, rollout_len=8, num_epochs=2,
                        num_minibatches=2, hidden=(64, 64))
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0))

    s_ref, m_ref = jax.jit(
        lambda s: ppo.train_step(env, cfg, s, fused_loss=False)
    )(state)
    with pltpu.force_tpu_interpret_mode():
        s_fused, m_fused = jax.jit(
            lambda s: ppo.train_step(env, cfg, s, fused_loss=True)
        )(state)

    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for name in ("pg_loss", "v_loss", "approx_kl", "clip_frac", "entropy"):
        np.testing.assert_allclose(float(m_fused[name]), float(m_ref[name]),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_fused_loss_grads_bf16_mode():
    """bf16-mode kernel vs bf16-mode autodiff: NOT bitwise — autodiff
    backprops tanh through the bf16-stored residual while the kernel
    keeps the f32 activation in VMEM (see PpoConfig.fused_loss docs).
    This pins the divergence at bf16-rounding magnitude so a genuine
    kernel regression (orders-of-magnitude larger) stays detectable."""
    from jax.experimental.pallas import tpu as pltpu

    d, a, n = 10, 4, 512
    cfgnet = networks.MlpConfig(d, a, hidden=(64, 64))
    params = networks.init_params(jax.random.PRNGKey(0), cfgnet)
    params["log_std"] = params["log_std"] + 0.1
    cfg = ppo.PpoConfig(entropy_coef=1e-2, normalize_advantages=False,
                        compute_dtype="bfloat16")

    obs, act, old_logp, old_value, adv, ret = _random_batch(
        jax.random.PRNGKey(1), d, a, n
    )
    batch = ppo.Transition(obs, act, old_logp, old_value, jnp.zeros(n),
                           jnp.zeros(n, bool))
    (_, metrics), grads = jax.value_and_grad(ppo.ppo_loss, has_aux=True)(
        params, cfg, batch, adv, ret, jnp.bfloat16
    )

    layers, wo, bo = networks.fused_weights(params)
    (w1, b1), (w2, b2) = layers
    with pltpu.force_tpu_interpret_mode():
        g, m = pallas_ppo.ppo_loss_grads_pallas(
            obs, act, old_logp, old_value, adv, ret,
            w1, b1, w2, b2, wo, bo, params["log_std"],
            clip_eps=cfg.clip_eps, value_clip_eps=cfg.value_clip_eps,
            value_coef=cfg.value_coef, ent_coef=cfg.entropy_coef,
            tile=128, compute_dtype="bfloat16",
        )

    # Forward metrics see identical bf16 matmul inputs — tight-ish.
    for name in ("pg_loss", "v_loss", "approx_kl"):
        np.testing.assert_allclose(float(m[name]), float(metrics[name]),
                                   rtol=2e-2, atol=2e-3, err_msg=name)

    # Gradients: compare only the tower blocks _unfuse_grads keeps (the
    # fused matrices' off-diagonal blocks carry gradient the unfused
    # pytree discards).  bf16-residual vs f32-activation backward plus
    # bf16-flipped clip decisions bound the divergence well below O(1).
    h = 64
    pairs = [
        (g["w1"][:, :h], grads["pi"][0]["w"]),
        (g["w1"][:, h:], grads["vf"][0]["w"]),
        (g["w2"][:h, :h], grads["pi"][1]["w"]),
        (g["w2"][h:, h:], grads["vf"][1]["w"]),
        (g["wo"][:h, :a], grads["pi_out"]["w"]),
        (g["wo"][h:, a:], grads["vf_out"]["w"]),
        (g["log_std"], grads["log_std"]),
    ]
    total_err = 0.0
    for fused_blk, ref_blk in pairs:
        fused_blk = np.asarray(fused_blk, np.float32)
        ref_blk = np.asarray(ref_blk, np.float32)
        scale = max(np.abs(ref_blk).max(), 1e-3)
        err = np.abs(fused_blk - ref_blk).max()
        assert err < 0.15 * scale, (err, scale)
        total_err += float(err)
    assert total_err > 0.0  # the divergence is real — exact identity
    # would mean the bf16 residual path silently stopped being exercised


def test_fused_loss_grads_match_autodiff_kl_mode():
    """kl_mode: the fused kernel's adaptive-KL-penalty surrogate
    (-ratio*adv + beta*KL, no clipping) matches
    jax.value_and_grad(ppo_loss with cfg.kl_target set)."""
    from jax.experimental.pallas import tpu as pltpu

    d, a, n = 10, 4, 512
    cfgnet = networks.MlpConfig(d, a, hidden=(64, 64))
    params = networks.init_params(jax.random.PRNGKey(4), cfgnet)
    params["log_std"] = params["log_std"] + 0.1
    beta = 0.7
    cfg = ppo.PpoConfig(kl_target=0.01, normalize_advantages=False)

    obs, act, old_logp, old_value, adv, ret = _random_batch(
        jax.random.PRNGKey(5), d, a, n
    )
    batch = ppo.Transition(obs, act, old_logp, old_value, jnp.zeros(n),
                           jnp.zeros(n, bool))
    (loss, metrics), grads = jax.value_and_grad(ppo.ppo_loss, has_aux=True)(
        params, cfg, batch, adv, ret, None, beta
    )

    layers, wo, bo = networks.fused_weights(params)
    (w1, b1), (w2, b2) = layers
    with pltpu.force_tpu_interpret_mode():
        g, m = pallas_ppo.ppo_loss_grads_pallas(
            obs, act, old_logp, old_value, adv, ret,
            w1, b1, w2, b2, wo, bo, params["log_std"],
            clip_eps=cfg.clip_eps, value_clip_eps=cfg.value_clip_eps,
            value_coef=cfg.value_coef, ent_coef=cfg.entropy_coef,
            tile=128, compute_dtype="float32",
            kl_beta=jnp.asarray(beta, jnp.float32),
        )

    for name in ("pg_loss", "v_loss", "approx_kl", "clip_frac"):
        np.testing.assert_allclose(
            float(m[name]), float(metrics[name]), rtol=2e-4, atol=1e-6,
            err_msg=name)
    ref = ppo._unfuse_grads(
        {k: (v if k in ("log_std",) else v) for k, v in g.items()},
        64, a)
    for (path, rg), fg in zip(
            jax.tree_util.tree_flatten_with_path(grads)[0],
            jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(
            np.asarray(fg), np.asarray(rg), rtol=2e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(path))


def test_ppo_kl_train_step_fused_matches_xla():
    """Full ppo_kl train_step: fused kernel vs the XLA autodiff path —
    the KL-penalty alg now rides the fused loss too (kl_beta enters the
    kernel via the stats row)."""
    import reinmav_tpu
    from jax.experimental.pallas import tpu as pltpu

    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = ppo.PpoConfig(num_envs=512, rollout_len=64, kl_target=0.01,
                        hidden=(64, 64), fused_rollout="off",
                        shuffle_tile=128)
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0))
    with pltpu.force_tpu_interpret_mode():
        ref, mref = jax.jit(lambda s: ppo.train_step(
            env, cfg, s, fused_loss=False))(state)
        new, mnew = jax.jit(lambda s: ppo.train_step(
            env, cfg, s, fused_loss=True))(state)
    for (path, r), nv in zip(
            jax.tree_util.tree_flatten_with_path(ref.params)[0],
            jax.tree_util.tree_leaves(new.params)):
        np.testing.assert_allclose(
            np.asarray(nv), np.asarray(r), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
    # The adapted coefficient agrees (same measured last-epoch KL).
    np.testing.assert_allclose(float(new.kl_beta), float(ref.kl_beta))
