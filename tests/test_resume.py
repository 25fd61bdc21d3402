"""Checkpoint/resume fault-tolerance: training interrupted and restored
from a checkpoint must continue bitwise-identically to an uninterrupted
run (the whole TrainState — params, optimiser, env states, PRNG key — is
one pytree, SURVEY.md §5 checkpoint/resume)."""

import jax
import numpy as np

import reinmav_tpu
from reinmav_tpu.rl import ppo
from reinmav_tpu.utils import checkpoint as ckpt


def test_bitwise_resume(tmp_path):
    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = ppo.PpoConfig(num_envs=32, rollout_len=8, num_epochs=1, num_minibatches=2, hidden=(16, 16))
    step = ppo.make_train_step(env, cfg)

    # Uninterrupted: 4 updates.
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(5))
    ref = state
    for _ in range(4):
        ref, _ = step(ref)

    # Interrupted: 2 updates, checkpoint, "crash", restore, 2 more.
    state2 = ppo.init_train_state(env, cfg, jax.random.PRNGKey(5))
    for _ in range(2):
        state2, _ = step(state2)
    path = str(tmp_path / "mid")
    ckpt.save(path, state2)
    del state2

    fresh = ppo.init_train_state(env, cfg, jax.random.PRNGKey(99))  # wrong seed
    restored = ckpt.restore(path, fresh)
    for _ in range(2):
        restored, _ = step(restored)

    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_structure_mismatch_is_clear(tmp_path):
    """VERDICT #9: restoring into a config with different hidden/num_envs
    must raise a clear CheckpointStructureError, not an opaque orbax one."""
    import pytest

    env = reinmav_tpu.make("quadrotor3d-v0")
    cfg = ppo.PpoConfig(num_envs=32, rollout_len=8, hidden=(16, 16))
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "ck")
    ckpt.save(path, state)

    # Different network width AND different env count.
    other_cfg = ppo.PpoConfig(num_envs=64, rollout_len=8, hidden=(32, 32))
    other = ppo.init_train_state(env, other_cfg, jax.random.PRNGKey(0))
    with pytest.raises(ckpt.CheckpointStructureError):
        ckpt.restore(path, other)


def test_gif_export(tmp_path):
    import os

    from reinmav_tpu.render import save_gif

    env = reinmav_tpu.make("quadrotor2d-v0")
    s = env.reset(jax.random.PRNGKey(0))
    states = [np.asarray(s)]
    for _ in range(20):
        s = env.step(s, env.control(s)).state
        states.append(np.asarray(s))
    path = save_gif("quadrotor2d-v0", np.stack(states), str(tmp_path / "flight.gif"), every=2)
    assert os.path.getsize(path) > 1000
