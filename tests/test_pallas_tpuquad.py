"""Fused MujocoQuadForce-v1 Pallas kernel vs the scan path (interpret
mode on CPU; real-TPU numbers in benchmarks/results.json).

Unlike the slung-load envs the hovering dynamics have no knife-edge
branch, and the reset is deterministic — so kernel and scan can be
compared FREE-RUNNING across auto-resets, not just per-step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.ops import pallas_tpuquad

pytestmark = pytest.mark.skipif(
    not pallas_tpuquad.available(), reason="pallas unavailable"
)


def _scan_rollout(env, states, horizon, action):
    a = jnp.tile(jnp.asarray(action, jnp.float32), (states.shape[0], 1))

    def body(carry, _):
        s, k = carry
        k, k_reset = jax.random.split(k)
        out = env.autoreset_step(s, a, k_reset)
        return (out.state, k), out.reward

    (final, _), rewards = jax.lax.scan(
        body, (states, jax.random.PRNGKey(0)), None, length=horizon
    )
    return final, rewards.sum(axis=0)


@pytest.mark.parametrize("action", [(0.0, 0.0, 0.0, 0.0), (0.75, 0.73, 0.74, 0.76)])
def test_hover_pallas_matches_scan_through_resets(action):
    from jax.experimental.pallas import tpu as pltpu

    env = reinmav_tpu.make("MujocoQuadForce-v1")
    B, T = 512, 80  # zero-action envs crash (z<=0.3) at ~t=37: resets covered
    base = np.tile(np.asarray(pallas_tpuquad._INIT, np.float32), (B, 1))
    rng = np.random.default_rng(0)
    base[:, :3] += rng.uniform(-0.3, 0.3, (B, 3)).astype(np.float32)
    base[:, 7:13] = rng.uniform(-0.5, 0.5, (B, 6)).astype(np.float32)
    states = jnp.asarray(base)

    f_scan, rew_scan = jax.jit(
        lambda s: _scan_rollout(env, s, T, action)
    )(states)

    with pltpu.force_tpu_interpret_mode():
        f_pal, rew_pal = pallas_tpuquad.hover_rollout_pallas8(
            states.T, T, tile8=8, action=action
        )

    np.testing.assert_allclose(
        np.asarray(f_pal.T), np.asarray(f_scan), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(rew_pal), np.asarray(rew_scan), rtol=1e-4, atol=1e-2
    )
    # Resets actually happened (zero-action case crashes within the horizon).
    if sum(action) == 0.0:
        assert np.asarray(f_pal.T)[:, 2].max() > 0.3
