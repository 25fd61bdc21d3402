"""Trajectory parity: JAX env kernels vs the float64 NumPy oracle.

The oracle (reinmav_tpu.oracle) is a bug-for-bug transcription of the
reference native envs (SURVEY.md §4: the reference ships no golden values,
so the oracle *is* the ground truth).  Parity is checked on closed-loop
rollouts flown by each env's own classical controller from shared injected
initial states — the reference test pattern (``test/test_quadrotor3d.py``)
— at float64 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.oracle import (
    Quadrotor2DOracle,
    Quadrotor2DSlungloadOracle,
    Quadrotor3DOracle,
    Quadrotor3DSlungloadOracle,
    Reinmav13Oracle,
)

ENV_ORACLE = [
    ("quadrotor2d-v0", Quadrotor2DOracle),
    ("quadrotor2d-slungload-v0", Quadrotor2DSlungloadOracle),
    ("quadrotor3d-v0", Quadrotor3DOracle),
    ("quadrotor3d-slungload-v0", Quadrotor3DSlungloadOracle),
]


def _moderate_init(rng, oracle_cls):
    """Initial states like the reference reset: U(-1,1) over all components
    (including unnormalised quaternions)."""
    return rng.uniform(-1.0, 1.0, size=(oracle_cls.state_dim,))


@pytest.mark.parametrize("env_id,oracle_cls", ENV_ORACLE)
def test_step_parity_random_actions(env_id, oracle_cls, rng):
    """Single-step parity over many random (state, action) pairs."""
    env = reinmav_tpu.make(env_id)
    step = jax.jit(lambda s, a: env.step(s, a))
    for _ in range(50):
        s0 = _moderate_init(rng, oracle_cls)
        a = rng.uniform(-2.0, 2.0, size=(oracle_cls.action_dim,))
        oracle = oracle_cls()
        oracle.reset_to(s0)
        ref_state, ref_rew, ref_done, _ = oracle.step(a)
        out = step(jnp.asarray(s0), jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(out.state), ref_state, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(float(out.reward), ref_rew, rtol=1e-12, atol=1e-12)
        assert bool(out.done) == ref_done


@pytest.mark.parametrize("env_id,oracle_cls", ENV_ORACLE)
def test_control_parity(env_id, oracle_cls, rng):
    """Controller-output parity on random states."""
    env = reinmav_tpu.make(env_id)
    control = jax.jit(lambda s: env.control(s))
    for _ in range(50):
        s0 = _moderate_init(rng, oracle_cls)
        oracle = oracle_cls()
        oracle.reset_to(s0)
        ref_action = oracle.control()
        got = np.asarray(control(jnp.asarray(s0)))
        np.testing.assert_allclose(got, ref_action, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize(
    "env_id,oracle_cls",
    [("quadrotor2d-v0", Quadrotor2DOracle), ("quadrotor3d-v0", Quadrotor3DOracle)],
)
def test_closed_loop_trajectory_parity(env_id, oracle_cls, rng):
    """400-step closed-loop rollout parity (the reference test pattern,
    ``test_quadrotor3d.py:12-24``), without auto-reset so trajectories stay
    comparable step-for-step after done.  Branchless envs only — fp error
    accumulates smoothly and stays within f64 tolerance."""
    horizon = 400
    env = reinmav_tpu.make(env_id)

    s0 = _moderate_init(rng, oracle_cls) * 0.5  # keep the controller stable
    oracle = oracle_cls()
    oracle.reset_to(s0)
    ref_traj = []
    for _ in range(horizon):
        a = oracle.control()
        state, _, done, _ = oracle.step(a)
        ref_traj.append(state.copy())
    ref_traj = np.stack(ref_traj)

    def body(s, _):
        a = env.control(s)
        out = env.step(s, a)
        return out.state, out.state

    _, jax_traj = jax.lax.scan(body, jnp.asarray(s0), None, length=horizon)
    np.testing.assert_allclose(np.asarray(jax_traj), ref_traj, rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize(
    "env_id,oracle_cls",
    [
        ("quadrotor2d-slungload-v0", Quadrotor2DSlungloadOracle),
        ("quadrotor3d-slungload-v0", Quadrotor3DSlungloadOracle),
    ],
)
def test_slungload_resynchronised_parity(env_id, oracle_cls, rng):
    """Slung-load envs: step parity along the oracle's closed-loop
    trajectory, re-synchronising the JAX state to the oracle each step.

    Accumulating comparison is ill-posed here: the taut-branch kinematic
    projection leaves ‖load−quad‖ within 1 ulp of the tether length, so the
    next step's ``>= L`` branch decision is fp-degenerate — the reference
    itself is not reproducible across fp implementations at that point.
    We therefore check each on-trajectory transition from the oracle's
    state (exercising realistic boundary states) and skip comparison only
    when the pre-step tether norm is within 4 ulp of L with implementations
    disagreeing on the branch.
    """
    horizon = 400
    env = reinmav_tpu.make(env_id)
    step = jax.jit(lambda s, a: env.step(s, a))
    d = 2 if env.state_dim == 9 else 3

    oracle = oracle_cls()
    s = _moderate_init(rng, oracle_cls) * 0.5
    oracle.reset_to(s)
    skipped = 0
    for _ in range(horizon):
        pre = oracle.state.copy()
        a = oracle.control()
        ref_state, ref_rew, ref_done, _ = oracle.step(a)
        out = step(jnp.asarray(pre), jnp.asarray(a))
        tnorm = np.linalg.norm(pre[-2 * d:-d] - pre[0:d])
        boundary = abs(tnorm - oracle.tether_length) < 4 * np.finfo(np.float64).eps
        got = np.asarray(out.state)
        if boundary and not np.allclose(got, ref_state, rtol=1e-10, atol=1e-12):
            skipped += 1
            continue
        np.testing.assert_allclose(got, ref_state, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(float(out.reward), ref_rew, rtol=1e-10, atol=1e-12)
        assert bool(out.done) == ref_done
    # The fp-degenerate boundary must be rare.
    assert skipped < horizon // 10, f"too many fp-degenerate steps: {skipped}"


def test_reinmav13_parity():
    """reinmav-v0: 400 outer steps (4 s, ≈20k substeps with the controller
    re-evaluated at each) vs the oracle, including the fluctuating 50/51
    substep count (SURVEY.md §3.2)."""
    horizon = 400
    oracle = Reinmav13Oracle()
    ref_traj = []
    for _ in range(horizon):
        state, reward, done, _ = oracle.step()
        ref_traj.append(state.copy())
        assert reward == 90.0 and done
    ref_traj = np.stack(ref_traj)

    env = reinmav_tpu.make("reinmav-v0")
    s = env.reset(jax.random.PRNGKey(0))
    assert s.dtype == jnp.float64

    def body(s, _):
        out = env.step(s, jnp.zeros((0,)))
        return out.state, out.obs

    _, jax_traj = jax.lax.scan(body, s, None, length=horizon)
    np.testing.assert_allclose(np.asarray(jax_traj), ref_traj, rtol=1e-8, atol=1e-9)


def test_vmap_batch_consistency(rng):
    """Batched step must agree with per-env stepping (no cross-batch
    leakage; taut/slack branch divergence within a batch)."""
    env = reinmav_tpu.make("quadrotor3d-slungload-v0")
    states = jnp.asarray(rng.uniform(-1.0, 1.0, size=(32, 16)))
    actions = jnp.asarray(rng.uniform(-2.0, 2.0, size=(32, 4)))
    batched = env.vstep(states, actions)
    for i in range(32):
        single = env.step(states[i], actions[i])
        np.testing.assert_allclose(np.asarray(batched.state[i]), np.asarray(single.state), rtol=1e-12)
        assert bool(batched.done[i]) == bool(single.done)
