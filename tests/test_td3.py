"""TD3 learner: Bellman-target math vs a NumPy hand-roll, warmup and
policy-delay gating, determinism, the shard_map path, and a learning
smoke test.  (CPU backend via conftest; float32.)  The replay ring
itself is covered in test_sac.py — TD3 shares the implementation."""

import jax
import jax.numpy as jnp
import numpy as np

import reinmav_tpu
from reinmav_tpu.rl import td3
from reinmav_tpu.rl.sac import _row_dims


def test_critic_target_matches_numpy():
    """The smoothed Bellman target inside critic_loss equals a NumPy
    hand-roll: r*scale + gamma*(1-d)*min(Q1',Q2')(s', clip(pi'(s')+eps))."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = td3.Td3Config(reward_scale=0.5, gamma=0.9, policy_noise=0.2,
                        noise_clip=0.5)
    d, a = env.obs_dim, env.action_dim
    state = td3.init_state(env, cfg._replace(num_envs=4, buffer_capacity=64,
                                             batch_size=4, hidden=(32, 32)),
                           jax.random.PRNGKey(3))
    n = 64
    rows = jax.random.normal(jax.random.PRNGKey(4), (_row_dims(env), n))
    rows = rows.at[2 * d + a + 1].set(
        (rows[2 * d + a + 1] > 0).astype(jnp.float32))  # done in {0,1}
    k_tgt = jax.random.PRNGKey(5)

    loss, (q_mean, tgt_mean) = td3.critic_loss(
        {"q1": state.q1, "q2": state.q2}, cfg, env, rows,
        (state.q1_target, state.q2_target), k_tgt, state.actor_target)

    nobs = rows[d + a + 1:2 * d + a + 1]
    na = td3.actor_action_t(state.actor_target, nobs)
    noise = jnp.clip(
        0.2 * jax.random.normal(k_tgt, na.shape, jnp.float32), -0.5, 0.5)
    na = jnp.clip(na + noise, -1.0, 1.0)
    tq = np.asarray(jnp.minimum(td3.q_value_t(state.q1_target, nobs, na),
                                td3.q_value_t(state.q2_target, nobs, na)))
    rew, done = np.asarray(rows[d + a]), np.asarray(rows[2 * d + a + 1])
    expect = rew * 0.5 + 0.9 * (1 - done) * tq
    np.testing.assert_allclose(float(tgt_mean), expect.mean(), rtol=1e-5)
    q1v = np.asarray(td3.q_value_t(state.q1, rows[:d], rows[d:d + a]))
    q2v = np.asarray(td3.q_value_t(state.q2, rows[:d], rows[d:d + a]))
    np.testing.assert_allclose(
        float(loss),
        np.mean((q1v - expect) ** 2 + (q2v - expect) ** 2), rtol=1e-5)


def test_train_iters_deterministic():
    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = td3.Td3Config(num_envs=16, buffer_capacity=1024, batch_size=64,
                        warmup_steps=32, hidden=(32, 32))
    fn = jax.jit(lambda s: td3.train_iters(env, cfg, s, 10))
    s1, m1 = fn(td3.init_state(env, cfg, jax.random.PRNGKey(7)))
    s2, m2 = fn(td3.init_state(env, cfg, jax.random.PRNGKey(7)))
    for a_, b_ in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))
    for a_, b_ in zip(jax.tree.leaves(m1), jax.tree.leaves(m2)):
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))


def test_warmup_freezes_params_and_counts_updates():
    """No parameter moves until warmup_steps have been collected, and
    the delayed-update counter only counts gate-open updates."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = td3.Td3Config(num_envs=16, buffer_capacity=1024, batch_size=64,
                        warmup_steps=10_000, hidden=(32, 32))
    state = td3.init_state(env, cfg, jax.random.PRNGKey(0))
    out, _ = jax.jit(lambda s: td3.train_iters(env, cfg, s, 5))(state)
    for a_, b_ in zip(jax.tree.leaves(state.actor), jax.tree.leaves(out.actor)):
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))
    for a_, b_ in zip(jax.tree.leaves(state.q1), jax.tree.leaves(out.q1)):
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))
    assert int(out.total_steps) == 80 and int(out.filled) == 80
    assert int(out.updates) == 0  # warmup updates never count


def test_policy_delay_gates_actor():
    """With policy_delay=2 the critics move every open update but the
    actor/targets only every second one: after ONE open update the
    critics have moved while the actor has not."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = td3.Td3Config(num_envs=16, buffer_capacity=1024, batch_size=16,
                        warmup_steps=0, hidden=(32, 32), policy_delay=2)
    state = td3.init_state(env, cfg, jax.random.PRNGKey(1))
    out, _ = jax.jit(lambda s: td3.train_iters(env, cfg, s, 1))(state)
    assert int(out.updates) == 1
    q_moved = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree.leaves(state.q1), jax.tree.leaves(out.q1))
    )
    assert q_moved
    for a_, b_ in zip(jax.tree.leaves(state.actor), jax.tree.leaves(out.actor)):
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))
    for a_, b_ in zip(jax.tree.leaves(state.q1_target),
                      jax.tree.leaves(out.q1_target)):
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))
    # Second update: now the actor and targets move.
    out2, _ = jax.jit(lambda s: td3.train_iters(env, cfg, s, 1))(out)
    assert int(out2.updates) == 2
    a_moved = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree.leaves(out.actor), jax.tree.leaves(out2.actor))
    )
    assert a_moved


def test_shardmap_train_iters():
    """Mesh TD3 on the 8-virtual-device CPU mesh (the SAC test's
    contract: deterministic, replicated params, per-device rings)."""
    from reinmav_tpu.parallel import make_mesh

    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = td3.Td3Config(num_envs=32, buffer_capacity=2048, batch_size=16,
                        warmup_steps=128, hidden=(32, 32))
    mesh = make_mesh()
    assert mesh.devices.size == 8
    fn = td3.make_train_iters(env, cfg, 12, mesh=mesh)

    def make_state():
        s = td3.init_state(env, cfg, jax.random.PRNGKey(5))
        return jax.device_put(s, td3.state_shardings(cfg, mesh))

    out, met = fn(make_state())
    out2, met2 = fn(make_state())
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(out2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    assert int(out.total_steps) == 32 * 12
    assert int(out.filled) == (32 // 8) * 12
    for v in jax.tree.leaves(met):
        assert np.isfinite(np.asarray(v)).all()
    init = td3.init_state(env, cfg, jax.random.PRNGKey(5))
    moved = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree.leaves(init.actor), jax.tree.leaves(out.actor))
    )
    assert moved
    assert out.actor[0]["w"].sharding.is_fully_replicated


def test_ddpg_single_critic_target_math():
    """single_critic: the Bellman target uses q1 alone (no min) and the
    loss carries only q1's MSE; q2 slots are None (empty pytree)."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = td3.Td3Config(num_envs=4, buffer_capacity=64, batch_size=4,
                        hidden=(32, 32), single_critic=True,
                        policy_noise=0.0, noise_clip=0.0, policy_delay=1,
                        gamma=0.9)
    state = td3.init_state(env, cfg, jax.random.PRNGKey(3))
    assert state.q2 is None and state.q2_target is None
    d, a = env.obs_dim, env.action_dim
    rows = jax.random.normal(jax.random.PRNGKey(4), (_row_dims(env), 64))
    rows = rows.at[2 * d + a + 1].set(
        (rows[2 * d + a + 1] > 0).astype(jnp.float32))
    loss, (q_mean, tgt_mean) = td3.critic_loss(
        {"q1": state.q1}, cfg, env, rows, (state.q1_target, None),
        jax.random.PRNGKey(5), state.actor_target)
    nobs = rows[d + a + 1:2 * d + a + 1]
    na = td3.actor_action_t(state.actor_target, nobs)  # noise=0 -> exact
    tq = np.asarray(td3.q_value_t(state.q1_target, nobs, na))
    rew, done = np.asarray(rows[d + a]), np.asarray(rows[2 * d + a + 1])
    expect = rew + 0.9 * (1 - done) * tq
    np.testing.assert_allclose(float(tgt_mean), expect.mean(), rtol=1e-5)
    q1v = np.asarray(td3.q_value_t(state.q1, rows[:d], rows[d:d + a]))
    np.testing.assert_allclose(float(loss), np.mean((q1v - expect) ** 2),
                               rtol=1e-5)


def test_ddpg_train_iters_runs_and_actor_moves_every_update():
    """The --alg=ddpg preset (single critic, delay 1): scan carries the
    None q2 slots, results are deterministic, and one open update moves
    actor, critic AND targets (no delay gating)."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = td3.Td3Config(num_envs=16, buffer_capacity=1024, batch_size=16,
                        warmup_steps=0, hidden=(32, 32), single_critic=True,
                        policy_noise=0.0, noise_clip=0.0, policy_delay=1)
    fn = jax.jit(lambda s: td3.train_iters(env, cfg, s, 1))
    state = td3.init_state(env, cfg, jax.random.PRNGKey(1))
    out, met = fn(state)
    out_b, _ = fn(td3.init_state(env, cfg, jax.random.PRNGKey(1)))
    for a_, b_ in zip(jax.tree.leaves(out), jax.tree.leaves(out_b)):
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))
    assert out.q2 is None and out.q2_target is None
    for group in ("actor", "q1", "actor_target", "q1_target"):
        moved = any(
            np.abs(np.asarray(a) - np.asarray(b)).max() > 0
            for a, b in zip(jax.tree.leaves(getattr(state, group)),
                            jax.tree.leaves(getattr(out, group)))
        )
        assert moved, group
    for v in jax.tree.leaves(met):
        assert np.isfinite(np.asarray(v)).all()


def test_ddpg_shardmap_smoke():
    """single_critic threads through the mesh path: the None q2 spec
    matches the None state slot on the 8-virtual-device mesh."""
    from reinmav_tpu.parallel import make_mesh

    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = td3.Td3Config(num_envs=32, buffer_capacity=2048, batch_size=16,
                        warmup_steps=64, hidden=(32, 32), single_critic=True,
                        policy_noise=0.0, noise_clip=0.0, policy_delay=1)
    mesh = make_mesh()
    fn = td3.make_train_iters(env, cfg, 6, mesh=mesh)
    s = jax.device_put(td3.init_state(env, cfg, jax.random.PRNGKey(5)),
                       td3.state_shardings(cfg, mesh))
    out, met = fn(s)
    assert int(out.total_steps) == 32 * 6
    for v in jax.tree.leaves(met):
        assert np.isfinite(np.asarray(v)).all()


def test_cli_ddpg_train_save_play(tmp_path, capsys):
    """--alg=ddpg end-to-end through the CLI: train a few iterations,
    checkpoint, then --play restores and runs the noise-free actor
    rollout (the off-policy play path)."""
    from reinmav_tpu.rl import run as rl_run

    save = str(tmp_path / "ddpg_ckpt")
    shape_flags = ["--env=quadrotor3d-v0", "--num_env=16", "--batch_size=32",
                   "--warmup_steps=64", "--buffer_capacity=1024",
                   "--num_hidden=16"]
    rl_run.main(["--alg=ddpg", "--num_timesteps=512", "--log_interval=1",
                 f"--save_path={save}", *shape_flags])
    rl_run.main(["--alg=ddpg", "--play", "--play_steps=50",
                 f"--load_path={save}", *shape_flags])
    out = capsys.readouterr().out
    assert '"play_steps": 50' in out


def test_td3_improves_hovering():
    """Learning smoke on MujocoQuadForce-v1 — same episode-length proxy
    as test_sac_improves_hovering (survival is the learnable signal)."""
    env = reinmav_tpu.make("MujocoQuadForce-v1")
    cfg = td3.Td3Config(num_envs=32, buffer_capacity=65536, batch_size=256,
                        warmup_steps=2048, hidden=(64, 64), grad_steps=4,
                        gamma=0.95, learning_rate=1e-3)
    state = td3.init_state(env, cfg, jax.random.PRNGKey(0))
    fn = jax.jit(lambda s: td3.train_iters(env, cfg, s, 250))

    def ep_ret(m):
        return float(m["mean_reward"]) / max(float(m["done_frac"]), 1e-4)

    state, m = fn(state)  # includes the 2048-step uniform-random warmup
    first = ep_ret(m)
    tail = []
    for _ in range(13):
        state, m = fn(state)
        tail.append(ep_ret(m))
    last = float(np.mean(tail[-3:]))
    assert np.isfinite(last)
    assert last > 1.8 * first, (first, tail)


def test_physical_action_bounds_quad3d():
    """Q11 remedy: quadrotor3d-v0 keeps the reference-faithful gym-space
    Box(0,10)^4 (quadrotor3d.py:70) but gives squashing learners the
    dynamically reachable per-dim box — thrust [0, 2*hover] (tanh-zero
    init = hover), body rates symmetric.  Without it a tanh actor can
    never command the negative rates the reference's own control()
    uses (quadrotor3d.py:173-178), and SAC/TD3 plateau at free-fall
    returns."""
    from reinmav_tpu.rl.sac import _scale_action_t

    env = reinmav_tpu.make("quadrotor3d-v0")
    lo, hi = env.physical_action_bounds()
    np.testing.assert_allclose(lo, [0.0, -10.0, -10.0, -10.0])
    np.testing.assert_allclose(hi, [19.6, 10.0, 10.0, 10.0])
    # Declared gym-space scalars untouched (adapter parity).
    assert env.action_low == 0.0 and env.action_high == 10.0

    # tanh extremes hit the physical box; tanh-zero thrust == hover.
    a = jnp.array([[-1.0, 1.0, 0.0]] * 4)              # (A=4, B=3)
    scaled = np.asarray(_scale_action_t(env, a))
    np.testing.assert_allclose(scaled[:, 0], lo, rtol=1e-6)
    np.testing.assert_allclose(scaled[:, 1], hi, rtol=1e-6)
    np.testing.assert_allclose(scaled[0, 2], 9.8, rtol=1e-6)

    # Envs without a physical box keep the scalar gym-space mapping.
    e2 = reinmav_tpu.make("quadrotor2d-v0")
    lo2, hi2 = e2.physical_action_bounds()
    assert np.ndim(lo2) == 0 and lo2 == e2.action_low and hi2 == e2.action_high
    np.testing.assert_allclose(
        np.asarray(_scale_action_t(e2, jnp.zeros((2, 3)))), 0.0, atol=0)
