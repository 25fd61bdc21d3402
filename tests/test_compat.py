"""Gymnasium adapter tests: registration, the reference closed-loop test
pattern through the object API, render/plot surfaces."""

import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from reinmav_tpu.compat import gym_env


def test_register_all_ids():
    gym_env.register_all()
    import reinmav_tpu

    for env_id in reinmav_tpu.registered_ids():
        assert f"reinmav_tpu/{env_id}" in gymnasium.registry


def test_reference_test_pattern_quadrotor3d():
    """The reference smoke test (test_quadrotor3d.py:12-24) through the
    adapter: 400 steps of control()+step(), reset on done."""
    gym_env.register_all()
    env = gymnasium.make("reinmav_tpu/quadrotor3d-v0")
    obs, _ = env.reset(seed=0)
    resets = 0
    for _ in range(400):
        action = env.unwrapped.control()
        obs, reward, term, trunc, _ = env.step(action)
        assert np.isfinite(obs).all()
        if term:
            obs, _ = env.reset()
            resets += 1
    # Controller converges to (0,0,2) from a tame state.
    assert np.linalg.norm(obs[:3] - np.array([0, 0, 2.0])) < 1.0 or resets > 0


def test_reset_to_injected_state():
    e = gym_env.make("quadrotor2d-v0")
    s = np.array([0.1, -0.2, 0.05, 0.0, 0.0])
    obs, _ = e.reset(options={"state": s})
    np.testing.assert_allclose(obs, s, rtol=1e-6)


def test_deterministic_seeding():
    e1 = gym_env.make("quadrotor3d-v0")
    e2 = gym_env.make("quadrotor3d-v0")
    o1, _ = e1.reset(seed=42)
    o2, _ = e2.reset(seed=42)
    np.testing.assert_array_equal(o1, o2)


def test_render_and_plot(tmp_path):
    e = gym_env.make("quadrotor3d-slungload-v0", render_mode="rgb_array")
    e.reset(seed=1)
    for _ in range(3):
        e.step(e.control())
    frame = e.render()
    assert frame.shape[2] == 3 and frame.dtype == np.uint8
    paths = e.plot_state(str(tmp_path / "traj"))
    import os

    assert all(os.path.exists(p) for p in paths)


def test_reinmav_actionless_env():
    e = gym_env.make("reinmav-v0")
    obs, _ = e.reset()
    assert obs.shape == (13,)
    obs, reward, term, trunc, _ = e.step(np.zeros(1))
    assert reward == 90.0 and term  # Q9 semantics


def test_adapter_params_and_wrappers():
    import functools

    from reinmav_tpu.envs import quadrotor3d, wrappers

    e = gym_env.GymAdapter(
        "quadrotor3d-v0",
        params=quadrotor3d.Params(ref_z=5.0),
        wrappers=[functools.partial(wrappers.time_limit, max_steps=3)],
    )
    assert e.env.params.ref_z == 5.0
    obs, _ = e.reset(seed=0)
    for i in range(3):
        obs, r, term, trunc, _ = e.step(np.zeros(4, np.float32))
    # Horizon expiry is TRUNCATION, not termination (gymnasium semantics).
    assert trunc or term  # term only if the env died before the limit


def test_truncation_vs_termination_semantics():
    """VERDICT #6: a time-limited env must report ``truncated=True,
    terminated=False`` at the horizon (correct bootstrapping for external
    RL libraries), and termination must stay the inner env's verdict."""
    import functools

    import jax

    from reinmav_tpu.envs import wrappers

    e = gym_env.GymAdapter(
        "quadrotor3d-v0",
        wrappers=[functools.partial(wrappers.time_limit, max_steps=4)],
    )
    # Start from a benign state near the hover target: the env cannot
    # terminate on its own within 4 zero-action steps.
    benign = np.zeros(10, np.float32)
    benign[3] = 1.0  # identity quaternion
    benign[2] = 0.5
    e.reset(options={"state": np.concatenate([benign, [0.0]])})
    for i in range(4):
        obs, r, term, trunc, _ = e.step(e.control())
        if i < 3:
            assert not term and not trunc
    assert trunc and not term

    # Conversely: a state that terminates immediately reports term, not trunc.
    far = np.zeros(10, np.float32)
    far[3] = 1.0
    far[0] = 2.9
    far[7] = 50.0  # velocity blows past vel_limit in one step
    e.reset(options={"state": np.concatenate([far, [0.0]])})
    obs, r, term, trunc, _ = e.step(np.zeros(4, np.float32))
    assert term and not trunc

    # Batched engine: autoreset resets on the truncation boundary too.
    env = e.env
    states = np.tile(np.concatenate([benign, [3.0]]), (8, 1)).astype(np.float32)
    out = env.autoreset_step(states, np.zeros((8, 4), np.float32), jax.random.PRNGKey(0))
    assert bool(out.truncated.all()) and not bool(out.done.any())
    # states were re-drawn (counter column reset to 0)
    assert np.asarray(out.state)[:, -1].max() == 0.0
