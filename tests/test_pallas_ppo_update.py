"""Full-update Pallas kernel (ops/pallas_ppo_update) vs the per-minibatch
XLA/fused-loss loop: identical rollout prefix, so any divergence is the
in-kernel gather/loss/clip/Adam.  (CPU backend via conftest — the kernel
runs in interpret mode; float32.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.ops import pallas_ppo_update as ppu
from reinmav_tpu.rl import networks, ppo


def _cfg(**kw):
    base = dict(
        num_envs=512, rollout_len=64, num_epochs=4, num_minibatches=4,
        hidden=(64, 64), fused_loss="on", fused_rollout="off",
        shuffle_tile=128, learning_rate=3e-3, max_grad_norm=0.5,
    )
    base.update(kw)
    return ppo.PpoConfig(**base)


def test_plane_pack_roundtrip():
    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = _cfg()
    params = ppo.init_train_state(env, cfg, jax.random.PRNGKey(3)).params
    d, a, h2 = env.obs_dim, env.action_dim, 2 * cfg.hidden[0]
    layers, wo, bo = networks.fused_weights(params)
    (w1, b1), (w2, b2) = layers
    pk = ppu.pack_plane(w1, b1, w2, b2, wo, bo, params["log_std"], d, a, h2)
    assert pk.shape == (ppu.plane_rows(d, h2), h2)
    t = ppu.unpack_plane(pk, d, a, h2)
    np.testing.assert_array_equal(t["w1"], w1)
    np.testing.assert_array_equal(t["w2"], w2)
    np.testing.assert_array_equal(t["wo"], wo)
    np.testing.assert_array_equal(t["b1"], b1)
    np.testing.assert_array_equal(t["bo"], bo)
    np.testing.assert_array_equal(t["log_std"], params["log_std"])
    # Structural-zero mask covers exactly the fused off-blocks.
    m, lsm = ppu._structure_masks(d, a, h2)
    m, lsm = np.asarray(m), np.asarray(lsm)
    h = h2 // 2
    s1 = -(-d // 8) * 8
    assert m[s1 + 3, h + 5] == 0.0 and m[s1 + 3, 5] == 1.0  # w2 blocks
    assert m[s1 + h + 3, 5] == 0.0 and m[s1 + h + 3, h + 5] == 1.0
    assert lsm.sum() == a and lsm[s1 + h2 + 8 + 3, a - 1] == 1.0


def _one_update(env, cfg, state, fused_update):
    from jax.experimental.pallas import tpu as pltpu

    step = jax.jit(lambda s: ppo.train_step(
        env, cfg, s, fused_loss=True, fused_update=fused_update))
    with pltpu.force_tpu_interpret_mode():
        return jax.tree.map(lambda x: np.asarray(x), step(state))


@pytest.mark.parametrize("env_id", [
    "quadrotor3d-v0", "quadrotor3d-slungload-v0", "MujocoQuadForce-v1"])
def test_full_update_matches_minibatch_loop(env_id):
    """Same TrainState through (a) the per-minibatch fused-loss loop with
    optax and (b) the one-launch full-update kernel: params, Adam
    moments, count, carried key, and metrics must agree (Adam's
    beta^t is the only non-shared arithmetic -> tight rtol).
    slung3d covers the d=16 zero-row-pad regression (the grad-plane
    packing crashed Mosaic lowering, fixed 2026-08-20 — this interpret
    differential pins the numerics; test_tpu_export pins the
    lowering)."""
    env = reinmav_tpu.make(env_id)
    cfg = _cfg()
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0))

    ref_state, ref_metrics = _one_update(env, cfg, state, False)
    new_state, new_metrics = _one_update(env, cfg, state, True)

    assert int(new_state.update_step) == int(ref_state.update_step)
    np.testing.assert_array_equal(np.asarray(new_state.key),
                                  np.asarray(ref_state.key))

    flat_r, tree_r = jax.tree_util.tree_flatten_with_path(ref_state.params)
    flat_n = jax.tree_util.tree_leaves(new_state.params)
    for (path, r), nv in zip(flat_r, flat_n):
        np.testing.assert_allclose(
            np.asarray(nv), np.asarray(r), rtol=2e-4, atol=1e-6,
            err_msg=f"params {jax.tree_util.keystr(path)}")

    adam_r = ref_state.opt_state[1][0]
    adam_n = new_state.opt_state[1][0]
    assert int(adam_n.count) == int(adam_r.count) == (
        cfg.num_epochs * cfg.num_minibatches)
    for name, tr, tn in (("mu", adam_r.mu, adam_n.mu),
                         ("nu", adam_r.nu, adam_n.nu)):
        for r, nv in zip(jax.tree_util.tree_leaves(tr),
                         jax.tree_util.tree_leaves(tn)):
            np.testing.assert_allclose(np.asarray(nv), np.asarray(r),
                                       rtol=2e-4, atol=5e-8, err_msg=name)

    for k in ("pg_loss", "v_loss", "approx_kl", "clip_frac", "entropy"):
        np.testing.assert_allclose(
            float(new_metrics[k]), float(ref_metrics[k]),
            rtol=1e-4, atol=1e-6, err_msg=k)


def test_full_update_log_std_floor_and_entropy():
    """The in-kernel log_std floor clamps after every minibatch like the
    XLA loop, and a nonzero entropy_coef feeds the same constant grad."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    # Few passes + modest lr: under the suite's x64 config the XLA loop
    # runs its glue (advantage stats, GAE rows) in f64 while the kernel
    # is f32, and the floor clamp + Adam's near-zero v-hat amplify the
    # per-pass 1e-7 gap ~exponentially (measured 4e-4 after 16 passes;
    # ONE pass is bitwise-identical) — chaos, not semantics.
    cfg = _cfg(log_std_floor=-0.05, entropy_coef=0.01, learning_rate=3e-3,
               num_epochs=2, num_minibatches=2)
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(1))

    ref_state, _ = _one_update(env, cfg, state, False)
    new_state, _ = _one_update(env, cfg, state, True)

    assert float(np.min(np.asarray(new_state.params["log_std"]))) >= -0.05
    np.testing.assert_allclose(
        np.asarray(new_state.params["log_std"]),
        np.asarray(ref_state.params["log_std"]), rtol=2e-4, atol=1e-6)


def test_full_update_bf16_matches_loop():
    """compute_dtype=bfloat16: both paths run the SAME bf16 tile math
    (shared _tile_loss_grads), so the one-launch kernel must track the
    per-minibatch loop as tightly as in f32 — the bf16 fused_loss-vs-
    autodiff gap (test_pallas_ppo) does not apply here."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = _cfg(compute_dtype="bfloat16", num_epochs=2, num_minibatches=2)
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(2))

    ref_state, _ = _one_update(env, cfg, state, False)
    new_state, _ = _one_update(env, cfg, state, True)

    for r, nv in zip(jax.tree_util.tree_leaves(ref_state.params),
                     jax.tree_util.tree_leaves(new_state.params)):
        # atol covers near-zero bias entries: bf16 grads are coarser, so
        # Adam's v-hat rescaling amplifies fp-order gaps to ~2e-6 there.
        np.testing.assert_allclose(np.asarray(nv), np.asarray(r),
                                   rtol=2e-4, atol=1e-5)


def test_full_update_kl_mode_matches_loop():
    """ppo_kl through the one-launch kernel: the KL-penalty surrogate
    runs in-kernel (beta via the hyper row) and the last-epoch KL metric
    (lane 5) drives the SAME beta adaptation as the per-minibatch loop."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = _cfg(kl_target=0.01, num_epochs=2, num_minibatches=2)
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(5))

    ref_state, ref_m = _one_update(env, cfg, state, False)
    new_state, new_m = _one_update(env, cfg, state, True)

    for (path, r), nv in zip(
            jax.tree_util.tree_flatten_with_path(ref_state.params)[0],
            jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_allclose(
            np.asarray(nv), np.asarray(r), rtol=2e-4, atol=1e-6,
            err_msg=f"params {jax.tree_util.keystr(path)}")
    np.testing.assert_allclose(float(new_state.kl_beta),
                               float(ref_state.kl_beta))
    np.testing.assert_allclose(float(new_m["approx_kl"]),
                               float(np.mean(ref_m["approx_kl"])),
                               rtol=1e-4, atol=1e-7)
