"""Functional env wrappers.

The reference ships an **empty** ``gym_reinmav/wrapper/`` package whose
intended occupant was an ``ActionClipWrapper`` (commented-out call at
``example/mujoco/train_hovering.py:142``) — C19 in SURVEY.md §2.  Here the
wrapper concept is a pure ``EnvDef -> EnvDef`` transform, composable and
jit-transparent:

* :func:`clip_action` — the intended ActionClipWrapper (clip to the action
  space or given bounds before stepping).
* :func:`time_limit` — bounded-horizon truncation (gym's TimeLimit role),
  step counter carried as one extra state component.
* :func:`scale_reward` — baselines' ``reward_scale`` knob
  (``run.py:89``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .core import EnvDef, StepOut


def clip_action(env: EnvDef, low: float | None = None, high: float | None = None) -> EnvDef:
    """Clip actions into [low, high] (defaults: the env's action space)."""
    lo = env.action_low if low is None else low
    hi = env.action_high if high is None else high
    inner = env.step_fn

    def step_fn(params, state, action):
        return inner(params, state, jnp.clip(action, lo, hi))

    return dataclasses.replace(env, step_fn=step_fn)


def scale_reward(env: EnvDef, scale: float) -> EnvDef:
    inner = env.step_fn

    def step_fn(params, state, action):
        out = inner(params, state, action)
        return out._replace(reward=out.reward * scale)

    return dataclasses.replace(env, step_fn=step_fn)


def time_limit(env: EnvDef, max_steps: int) -> EnvDef:
    """Truncate after ``max_steps`` steps.  Appends a step counter to the
    state vector (state_dim + 1); obs_dim is unchanged.

    Horizon expiry is reported via ``StepOut.truncated`` (gymnasium's
    second flag), NOT folded into ``done`` — termination stays the inner
    env's verdict, so value bootstrapping and the compat adapter can
    distinguish the two.  Auto-reset (``EnvDef.autoreset_step*``) resets
    on ``done | truncated`` via :func:`~reinmav_tpu.envs.core.episode_boundary`.
    """
    inner_step = env.step_fn
    inner_reset = env.reset_fn

    def step_fn(params, state, action):
        count = state[-1]
        out = inner_step(params, state[:-1], action)
        count = count + 1.0
        expired = count >= max_steps
        truncated = expired & ~out.done
        if out.truncated is not None:  # compose with an inner truncator
            truncated = truncated | out.truncated
        new_state = jnp.concatenate([out.state, count[None].astype(out.state.dtype)])
        return StepOut(new_state, out.obs, out.reward, out.done, truncated)

    def reset_fn(params, key):
        s = inner_reset(params, key)
        return jnp.concatenate([s, jnp.zeros(1, s.dtype)])

    return dataclasses.replace(
        env, state_dim=env.state_dim + 1, step_fn=step_fn, reset_fn=reset_fn
    )
