"""Slung-load Pallas fused-rollout kernels vs the XLA scan path
(interpret mode on the CPU test backend; real-TPU numbers live in
benchmarks/results.json).  Pattern of test_pallas_rollout.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.ops import pallas_slungload

pytestmark = pytest.mark.skipif(
    not pallas_slungload.available(), reason="pallas unavailable"
)


def _tether_norm(env_id, states):
    if "3d" in env_id:
        return np.linalg.norm(
            np.asarray(states[:, 10:13] - states[:, 0:3]), axis=1
        ), 1.5
    return np.linalg.norm(np.asarray(states[:, 5:7] - states[:, 0:2]), axis=1), 0.5


def _compare(env_id, kernel, dim, B=512, T=30, tile8=16):
    """Lockstep kernel-vs-scan with per-step resynchronisation.

    The taut/slack branch is knife-edge on the tether sphere (CLAUDE.md):
    free-running trajectories diverge exponentially from f32 rounding
    once any lane flips branches, so — like tests/test_parity.py — each
    step restarts both paths from the SAME state and compares one
    transition, skipping lanes within eps of the branch boundary."""
    from jax.experimental.pallas import tpu as pltpu

    env = reinmav_tpu.make(env_id)
    key = jax.random.PRNGKey(0)
    states = (env.vreset(jax.random.split(key, B)) * 0.5).astype(jnp.float32)
    if "3d" in env_id:
        # Spread the load positions so tether norms straddle L=1.5 and
        # both branches stay populated throughout the sweep.
        states = states.at[:, 10:13].multiply(4.0)

    step_scan = jax.jit(lambda s: env.vstep(s, env.vcontrol(s)))
    both_branches = 0
    for t in range(T):
        out = step_scan(states)
        with pltpu.force_tpu_interpret_mode():
            f_pal, rew = kernel(states.T, 0, 1, tile8=tile8, autoreset=False)
        assert f_pal.shape == (dim, B)
        tn, L = _tether_norm(env_id, states)
        safe = np.abs(tn - L) > 1e-4  # skip knife-edge lanes
        both_branches += int((tn >= L).any() and (tn < L).any())
        np.testing.assert_allclose(
            np.asarray(f_pal.T)[safe], np.asarray(out.state)[safe],
            rtol=3e-4, atol=3e-5, err_msg=f"step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(rew)[safe], np.asarray(out.reward)[safe],
            rtol=1e-3, atol=1e-4,
        )
        states = out.state.astype(jnp.float32)
    # The sweep genuinely exercised both tether branches.
    assert both_branches > T // 2


def test_slung3d_pallas_matches_scan():
    _compare("quadrotor3d-slungload-v0", pallas_slungload.slung3d_rollout_pallas8, 16)


def test_slung2d_pallas_matches_scan():
    _compare("quadrotor2d-slungload-v0", pallas_slungload.slung2d_rollout_pallas8, 9)


def test_slung3d_autoreset_deterministic():
    from jax.experimental.pallas import tpu as pltpu

    env = reinmav_tpu.make("quadrotor3d-slungload-v0")
    states = (env.vreset(jax.random.split(jax.random.PRNGKey(1), 512)) * 2.0).astype(
        jnp.float32
    )
    with pltpu.force_tpu_interpret_mode():
        f1, r1 = pallas_slungload.slung3d_rollout_pallas8(states.T, 7, 30, tile8=64)
        f2, r2 = pallas_slungload.slung3d_rollout_pallas8(states.T, 7, 30, tile8=64)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert np.isfinite(np.asarray(f1)).all()
