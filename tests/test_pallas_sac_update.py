"""One-launch SAC update kernel (ops/pallas_sac_update) vs the
``one_update`` scan: identical collection prefix and key streams, so any
divergence is the in-kernel losses/Adam/polyak.  (CPU backend via
conftest — interpret mode; float32.)"""

import jax
import jax.numpy as jnp
import numpy as np

import reinmav_tpu
from reinmav_tpu.ops import pallas_sac_update as psu
from reinmav_tpu.rl import sac


def _cfg(**kw):
    base = dict(num_envs=32, buffer_capacity=8192, batch_size=256,
                warmup_steps=256, hidden=(64, 64), grad_steps=2,
                learning_rate=1e-3, alpha_lr=1e-3)
    base.update(kw)
    return sac.SacConfig(**base)


def _run(env, cfg, state, iters, fused):
    from jax.experimental.pallas import tpu as pltpu

    cfg = cfg._replace(fused_update=("on" if fused else "off"))
    fn = jax.jit(lambda s: sac.train_iters(env, cfg, s, iters))
    with pltpu.force_tpu_interpret_mode():
        out = fn(state)
        return jax.tree.map(np.asarray, out)


def test_plane_roundtrip():
    env = reinmav_tpu.make("MujocoQuadForce-v1")
    cfg = _cfg()
    st = sac.init_state(env, cfg, jax.random.PRNGKey(0))
    adims = (env.obs_dim, *cfg.hidden, 2 * env.action_dim)
    block = psu.pack_mlp(st.actor, adims, cfg.hidden[0])
    assert block.shape == (psu.mlp_rows(adims), cfg.hidden[0])
    back = psu.unpack_mlp(block, adims, cfg.hidden[0])
    for orig, rt in zip(st.actor, back):
        np.testing.assert_array_equal(orig["w"], rt["w"])
        np.testing.assert_array_equal(orig["b"], rt["b"])


def test_fused_updates_match_scan():
    """Past warmup, K fused iterations == K scan iterations: params,
    targets, log_alpha, all three Adam states (count/mu/nu), and the
    weighted metrics, to fp order."""
    env = reinmav_tpu.make("MujocoQuadForce-v1")
    cfg = _cfg()
    state = sac.init_state(env, cfg, jax.random.PRNGKey(0))
    # 8 warmup iterations (32 envs * 8 = 256 steps = warmup) + 12 live.
    iters = 20

    ref_state, ref_m = _run(env, cfg, state, iters, fused=False)
    new_state, new_m = _run(env, cfg, state, iters, fused=True)

    assert int(new_state.total_steps) == int(ref_state.total_steps)
    np.testing.assert_array_equal(new_state.key, ref_state.key)
    # The ring holds states collected with fp-order-drifted actor params
    # (the two paths' updates agree to ~1e-7/step, which compounds into
    # the closed-loop trajectories) — close, not bitwise.
    np.testing.assert_allclose(new_state.buffer, ref_state.buffer,
                               rtol=2e-3, atol=1e-4)

    for name in ("actor", "q1", "q2", "q1_target", "q2_target"):
        for (path, r), nv in zip(
                jax.tree_util.tree_flatten_with_path(
                    getattr(ref_state, name))[0],
                jax.tree_util.tree_leaves(getattr(new_state, name))):
            np.testing.assert_allclose(
                nv, r, rtol=2e-4, atol=1e-6,
                err_msg=f"{name}{jax.tree_util.keystr(path)}")
    np.testing.assert_allclose(new_state.log_alpha, ref_state.log_alpha,
                               rtol=2e-4, atol=1e-6)

    for oname in ("opt_actor", "opt_q", "opt_alpha"):
        r_adam = getattr(ref_state, oname)[0]
        n_adam = getattr(new_state, oname)[0]
        assert int(n_adam.count) == int(r_adam.count) > 0, oname
        for r, nv in zip(jax.tree_util.tree_leaves((r_adam.mu, r_adam.nu)),
                         jax.tree_util.tree_leaves((n_adam.mu, n_adam.nu))):
            # Moments square the fp-order gradient drift; params above
            # are the tight check.
            np.testing.assert_allclose(nv, r, rtol=5e-3, atol=1e-5,
                                       err_msg=oname)

    for k in ref_m:
        np.testing.assert_allclose(float(new_m[k]), float(ref_m[k]),
                                   rtol=2e-3, atol=1e-5, err_msg=k)


def test_fused_warmup_freezes_everything():
    """Gate closed: params, targets, moments, and counts must come back
    bitwise-identical through the kernel."""
    env = reinmav_tpu.make("MujocoQuadForce-v1")
    cfg = _cfg(warmup_steps=100000)
    state = sac.init_state(env, cfg, jax.random.PRNGKey(1))
    new_state, _ = _run(env, cfg, state, 4, fused=True)
    for name in ("actor", "q1", "q2", "q1_target", "q2_target"):
        for r, nv in zip(jax.tree_util.tree_leaves(getattr(state, name)),
                         jax.tree_util.tree_leaves(getattr(new_state, name))):
            np.testing.assert_array_equal(np.asarray(r), nv, err_msg=name)
    np.testing.assert_array_equal(np.asarray(state.log_alpha),
                                  new_state.log_alpha)
    for oname in ("opt_actor", "opt_q", "opt_alpha"):
        r_adam = getattr(state, oname)[0]
        n_adam = getattr(new_state, oname)[0]
        assert int(n_adam.count) == 0
        for r, nv in zip(jax.tree_util.tree_leaves((r_adam.mu, r_adam.nu)),
                         jax.tree_util.tree_leaves((n_adam.mu, n_adam.nu))):
            np.testing.assert_array_equal(np.asarray(r), nv, err_msg=oname)
