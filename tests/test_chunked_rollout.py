"""Watchdog-safe dispatch chunking (r4 verdict #3).

The tunnelled TPU runtime kills the worker on any single dispatch of
~200 s device time, so long rollouts must split into host-level
dispatches.  `chunked_throughput_rollout` carries (states, reward sums,
PRNG key) between dispatches; for the scan backends the carried key
makes the chunked run EXACTLY the unchunked stream.  The reference bar:
`mj_step` loops of any length just work
(gym_reinmav/example/mujoco/control_rpy.py:58-79).

CPU backend (conftest); chunk boundaries are forced by a tiny device
time budget, and the in-contact MujocoQuadForce-v0 case exercises the
coupled contact solve across boundaries — the exact workload that
motivated the feature.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.envs.core import (chunked_throughput_rollout,
                                   throughput_rollout)

B = 64


def _states(env, key, n=B):
    return env.vreset(jax.random.split(key, n))


#: The slungloads are deliberately absent: their taut/slack branch
#: amplifies the <4e-15 per-program reassociation noise into divergent
#: trajectories (the same knife edge that makes their kernel
#: differentials resynchronise per step, CLAUDE.md) — chunking is no
#: different from any other recompile there.
@pytest.mark.parametrize("env_id", [
    "quadrotor3d-v0",            # controller scan path
    "quadrotor2d-v0",            # controller path, 2D predicate
    "MujocoQuadForce-v0",        # contact-riding zero-action path
    "reinmav-v0",                # plain (non-autoreset) stepping
])
def test_chunked_equals_unchunked_scan(env_id):
    env = reinmav_tpu.make(env_id)
    key = jax.random.PRNGKey(2)
    states = _states(env, key)
    horizon = 25  # not a multiple of the probe/chunk sizes on purpose

    f_ref, r_ref = jax.jit(
        lambda s, k: throughput_rollout(env, s, k, horizon, backend="scan")
    )(states, key)

    # A zero budget forces per_step-based chunks of 1-8 steps: the 25
    # steps cross several dispatch boundaries.
    f_chunk, r_chunk = chunked_throughput_rollout(
        env, states, key, horizon, backend="scan",
        device_time_budget_s=1e-9, probe_steps=4)

    # Same PRNG stream; float tolerance only for XLA's per-program
    # reassociation (different scan lengths fuse differently; measured
    # <4e-15 rel on CPU f64).
    np.testing.assert_allclose(np.asarray(f_chunk), np.asarray(f_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_chunk), np.asarray(r_ref),
                               rtol=1e-12, atol=1e-12)


def test_chunked_force_v0_in_contact_long_horizon():
    """The motivating workload: Force-v0 lanes resting ON the plane for
    a 120-step horizon, chunked — the coupled contact solve must agree
    across dispatch boundaries."""
    env = reinmav_tpu.make("MujocoQuadForce-v0")
    key = jax.random.PRNGKey(7)
    states = _states(env, key, 16)
    # Park half the lanes at the keyframe (on the ground, in contact).
    states = states.at[8:].set(states[8:].at[:, 2].set(0.08))
    horizon = 120

    f_ref, r_ref = jax.jit(
        lambda s, k: throughput_rollout(env, s, k, horizon, backend="scan")
    )(states, key)
    f_chunk, r_chunk = chunked_throughput_rollout(
        env, states, key, horizon, backend="scan",
        device_time_budget_s=1e-9, probe_steps=16)
    np.testing.assert_allclose(np.asarray(f_chunk), np.asarray(f_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_chunk), np.asarray(r_ref),
                               rtol=1e-12, atol=1e-12)
    assert np.isfinite(np.asarray(f_chunk)).all()


def test_chunked_single_dispatch_when_budget_allows():
    """A generous budget must not split at all beyond the probe —
    chunking exists for the watchdog, not as a tax on short rollouts."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    key = jax.random.PRNGKey(3)
    states = _states(env, key)
    f_ref, r_ref = jax.jit(
        lambda s, k: throughput_rollout(env, s, k,40, backend="scan")
    )(states, key)
    f, r = chunked_throughput_rollout(env, states, key, 40, backend="scan",
                                      device_time_budget_s=1e6,
                                      probe_steps=8)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=1e-12, atol=1e-12)


def test_chunked_refuses_under_jit():
    env = reinmav_tpu.make("quadrotor3d-v0")
    key = jax.random.PRNGKey(0)
    states = _states(env, key, 8)

    @jax.jit
    def bad(s, k):
        return chunked_throughput_rollout(env, s, k, 16)

    with pytest.raises(ValueError, match="cannot run under jit"):
        bad(states, key)


def test_return_key_continues_stream():
    """The primitive the chunker builds on: (final, key) from a k-step
    rollout fed into an (n-k)-step rollout equals the n-step rollout."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    key = jax.random.PRNGKey(9)
    states = _states(env, key)
    f_ref, r_ref = throughput_rollout(env, states, key, 20, backend="scan")
    f1, r1, k1 = throughput_rollout(env, states, key, 12, backend="scan",
                                    return_key=True)
    f2, r2 = throughput_rollout(env, f1, k1, 8, backend="scan")
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r1 + r2), np.asarray(r_ref),
                               rtol=1e-12, atol=1e-12)
