"""Differential tests: C++ fast oracle vs NumPy oracle vs JAX kernels.

Three independent implementations of the quadrotor3d semantics must agree
at float64 tolerance — on single steps, controller outputs, and full
closed-loop trajectories over large random state sweeps (far more states
than the per-step Python-oracle tests can afford)."""

import numpy as np
import pytest

from reinmav_tpu import native
from reinmav_tpu.oracle import Quadrotor3DOracle

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native oracle"
)


def test_step_differential_sweep(rng):
    batch = 2000
    states = rng.uniform(-1.0, 1.0, size=(batch, 10))
    actions = rng.uniform(-3.0, 3.0, size=(batch, 4))

    ns_cpp, rew_cpp, done_cpp = native.quad3d_step(states, actions)

    # vs NumPy oracle on a subsample
    oracle = Quadrotor3DOracle()
    for i in range(0, batch, 97):
        oracle.reset_to(states[i])
        ref, rew, done, _ = oracle.step(actions[i])
        np.testing.assert_allclose(ns_cpp[i], ref, rtol=1e-13, atol=1e-14)
        assert done_cpp[i] == done

    # vs JAX kernel on the whole sweep
    import jax.numpy as jnp

    import reinmav_tpu

    env = reinmav_tpu.make("quadrotor3d-v0")
    out = env.vstep(jnp.asarray(states), jnp.asarray(actions))
    np.testing.assert_allclose(np.asarray(out.state), ns_cpp, rtol=1e-12, atol=1e-13)
    np.testing.assert_array_equal(np.asarray(out.done), done_cpp)
    np.testing.assert_allclose(np.asarray(out.reward), rew_cpp, rtol=1e-12, atol=1e-13)


def test_control_differential_sweep(rng):
    batch = 2000
    states = rng.uniform(-1.0, 1.0, size=(batch, 10))
    a_cpp = native.quad3d_control(states)

    import jax.numpy as jnp

    import reinmav_tpu

    env = reinmav_tpu.make("quadrotor3d-v0")
    a_jax = np.asarray(env.vcontrol(jnp.asarray(states)))
    np.testing.assert_allclose(a_jax, a_cpp, rtol=1e-10, atol=1e-12)


def test_closed_loop_trajectory_differential(rng):
    batch, horizon = 32, 400
    states = rng.uniform(-0.5, 0.5, size=(batch, 10))
    traj_cpp, rew_cpp, done_cpp = native.quad3d_rollout(states, horizon)

    import jax
    import jax.numpy as jnp

    import reinmav_tpu
    from reinmav_tpu.envs.core import control_rollout

    env = reinmav_tpu.make("quadrotor3d-v0")
    _, traj = jax.jit(
        lambda s, k: control_rollout(env, s, k, horizon, auto_reset=False)
    )(jnp.asarray(states), jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(traj.state), traj_cpp, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(traj.reward), rew_cpp, rtol=1e-8, atol=1e-9)
