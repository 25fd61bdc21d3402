"""Policy evaluation: batched deterministic (greedy-mean) rollouts with
episode accounting.

The reference's only evaluation is the ``--play`` render loop
(``run.py:190-213``).  Here: a jitted batched evaluator that tracks
per-episode returns/lengths across auto-resets and reports aggregate
statistics — usable standalone or on a training cadence.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..envs.core import EnvDef, episode_boundary
from . import networks, ppo


class EvalStats(NamedTuple):
    mean_return: jnp.ndarray
    mean_length: jnp.ndarray
    num_episodes: jnp.ndarray
    mean_reward: jnp.ndarray  # per-step average
    mean_running_return: jnp.ndarray  # avg return of episodes still alive
    survival_frac: jnp.ndarray  # fraction of envs alive the whole horizon


def evaluate(
    env: EnvDef,
    params,
    obs_norm: ppo.ObsNorm | None,
    key: jax.Array,
    num_envs: int = 256,
    horizon: int = 1000,
) -> EvalStats:
    """Greedy-mean PPO-policy rollout with episode statistics (see
    :func:`evaluate_policy` for the generic version)."""

    def policy(obs):
        if obs_norm is not None:
            obs = ppo._normalize(obs, obs_norm)
        mean, _, _ = networks.apply(params, obs)
        return mean

    return evaluate_policy(env, policy, key, num_envs, horizon)


def evaluate_policy(
    env: EnvDef,
    policy,
    key: jax.Array,
    num_envs: int = 256,
    horizon: int = 1000,
) -> EvalStats:
    """Deterministic-policy rollout with episode statistics.

    ``policy``: (B, obs_dim) raw observations -> (B, action_dim) actions
    (any normalisation is the policy's own business).  Episodes still
    running at the horizon are excluded from return/length means (only
    completed episodes count).
    """
    k_reset, k_run = jax.random.split(key)
    states = env.vreset(jax.random.split(k_reset, num_envs))

    def body(carry, _):
        s, k, ep_ret, ep_len, tot_ret, tot_len, n_eps = carry
        k, k_reset2 = jax.random.split(k)
        obs = s[:, : env.obs_dim]
        out = env.autoreset_step(s, policy(obs), k_reset2)
        # Episode accounting must follow the same boundary auto-reset
        # uses (done | truncated) — a time_limit-wrapped env resets at
        # the horizon with done=False, truncated=True.
        ended = episode_boundary(out)
        ep_ret = ep_ret + out.reward
        ep_len = ep_len + 1
        done_f = ended.astype(ep_ret.dtype)
        tot_ret = tot_ret + jnp.sum(ep_ret * done_f)
        tot_len = tot_len + jnp.sum(ep_len * done_f)
        n_eps = n_eps + jnp.sum(ended).astype(n_eps.dtype)
        ep_ret = ep_ret * (1.0 - done_f)
        ep_len = ep_len * (1 - ended.astype(ep_len.dtype))
        return (out.state, k, ep_ret, ep_len, tot_ret, tot_len, n_eps), out.reward

    dtype = states.dtype
    zero_f = jnp.zeros(num_envs, dtype)
    zero_i = jnp.zeros(num_envs, jnp.int32)
    init = (
        states, k_run, zero_f, zero_i,
        jnp.asarray(0.0, dtype), jnp.asarray(0, dtype), jnp.asarray(0, jnp.int32),
    )
    (_, _, running_ret, running_len, tot_ret, tot_len, n_eps), rewards = jax.lax.scan(
        body, init, None, length=horizon
    )
    # Zero completed episodes means "no data", not "return 0.0" — report
    # NaN so a survives-the-whole-horizon policy is not logged as if it
    # scored zero (VERDICT r2: the 500M-step artifact logged
    # eval_mean_return 0.0 at full survival).
    safe_n = jnp.maximum(n_eps, 1)
    no_eps = n_eps == 0
    nan = jnp.asarray(jnp.nan, dtype)
    return EvalStats(
        mean_return=jnp.where(no_eps, nan, tot_ret / safe_n),
        mean_length=jnp.where(no_eps, nan, tot_len / safe_n),
        num_episodes=n_eps,
        mean_reward=rewards.mean(),
        mean_running_return=running_ret.mean(),
        survival_frac=jnp.mean((running_len == horizon).astype(jnp.float32)),
    )
