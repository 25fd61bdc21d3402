"""Functional environment engine: the TPU-native replacement for the
reference's object-oriented ``gym.Env`` step loop.

Design (SURVEY.md §7): an environment is a set of *pure functions* over a
flat float state vector

    ``step(params, state, action) -> (next_state, obs, reward, done)``
    ``reset(params, key) -> state``
    ``control(params, state) -> action``       (classical controller)

The engine lifts these to batched, jitted, auto-resetting kernels:

* ``vstep``       — ``vmap`` over a leading batch axis (replaces the
  reference's subprocess vec-envs, ``run.py:73-94``).
* ``autoreset``   — fused ``where(done, reset(key), next_state)`` inside the
  same kernel (the reference resets in the Python test loop,
  ``test_quadrotor3d.py:21-22``).
* ``rollout``     — a ``lax.scan`` over the horizon, the whole closed loop
  compiled into one XLA program (replaces the Python ``for`` loop of the
  reference tests).

States are flat ``(D,)`` float vectors (batched: ``(B, D)``); everything is
dtype-polymorphic — float32 for TPU throughput, float64 (under
``jax.config.enable_x64``) for oracle parity.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class StepOut(NamedTuple):
    """Result of one environment transition."""

    state: jnp.ndarray
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class EnvDef:
    """Static definition of a functional environment.

    ``params`` is a pytree of physical constants (NamedTuple); the callables
    are pure and unbatched.  ``state_dim`` may exceed ``obs_dim`` when the
    state carries auxiliary scalars (e.g. simulation time for
    ``reinmav-v0``).
    """

    name: str
    state_dim: int
    action_dim: int
    obs_dim: int
    params: Any
    step_fn: Callable[[Any, jnp.ndarray, jnp.ndarray], StepOut]
    reset_fn: Callable[[Any, jax.Array], jnp.ndarray]
    control_fn: Optional[Callable[[Any, jnp.ndarray], jnp.ndarray]] = None
    # Bounds mirroring the reference's gym spaces (low, high) scalars.
    action_low: float = -10.0
    action_high: float = 10.0
    obs_low: float = -10.0
    obs_high: float = 10.0

    # -- single-env conveniences ------------------------------------------
    def step(self, state, action) -> StepOut:
        return self.step_fn(self.params, state, action)

    def reset(self, key) -> jnp.ndarray:
        return self.reset_fn(self.params, key)

    def control(self, state) -> jnp.ndarray:
        if self.control_fn is None:
            raise NotImplementedError(f"{self.name} has no classical controller")
        return self.control_fn(self.params, state)

    # -- batched kernels ---------------------------------------------------
    def vstep(self, states, actions) -> StepOut:
        """Batched step over leading axis."""
        return jax.vmap(self.step_fn, in_axes=(None, 0, 0))(self.params, states, actions)

    def vreset(self, keys) -> jnp.ndarray:
        return jax.vmap(self.reset_fn, in_axes=(None, 0))(self.params, keys)

    def vcontrol(self, states) -> jnp.ndarray:
        return jax.vmap(self.control_fn, in_axes=(None, 0))(self.params, states)

    def autoreset_step(self, states, actions, key) -> StepOut:
        """Batched step with fused auto-reset.

        Done sub-envs are re-initialised from fresh PRNG draws in the same
        kernel; their returned obs/reward/done describe the *terminal*
        transition (standard fused auto-reset; divergence from the
        reference's ``steps_beyond_done`` tail is documented in
        SURVEY.md §7).
        """
        out = self.vstep(states, actions)
        batch = states.shape[0]
        reset_states = self.vreset(jax.random.split(key, batch))
        next_states = jnp.where(out.done[:, None], reset_states.astype(out.state.dtype), out.state)
        return StepOut(next_states, out.obs, out.reward, out.done)


def rollout(
    env: EnvDef,
    policy_fn: Callable[[jnp.ndarray, jax.Array], jnp.ndarray],
    init_states: jnp.ndarray,
    key: jax.Array,
    horizon: int,
    auto_reset: bool = True,
):
    """Closed-loop batched rollout as a single ``lax.scan``.

    ``policy_fn(obs_batch, key) -> action_batch`` may be a classical
    controller (ignore the key) or a stochastic policy.  Returns the final
    states and the stacked trajectory ``StepOut`` with leading time axis
    ``(T, B, ...)``.
    """

    def body(carry, _):
        states, k = carry
        k, k_act, k_reset = jax.random.split(k, 3)
        # Policy observes the pre-step state (observation == state slice).
        obs = states[:, : env.obs_dim]
        actions = policy_fn(obs, k_act)
        if auto_reset:
            out = env.autoreset_step(states, actions, k_reset)
        else:
            out = env.vstep(states, actions)
        return (out.state, k), StepOut(out.state, out.obs, out.reward, out.done)

    (final_states, _), traj = jax.lax.scan(body, (init_states, key), None, length=horizon)
    return final_states, traj


def controller_policy(env: EnvDef):
    """Wrap the env's classical controller as a rollout policy.

    The controllers read the full state (matching the reference's
    ``env.control()`` which uses internal state, ``quadrotor3d.py:126``),
    so this closes over ``vcontrol`` on states rather than observations.
    """

    def policy(states, key):
        del key
        return env.vcontrol(states)

    return policy


def control_rollout(env: EnvDef, init_states, key, horizon: int, auto_reset: bool = True):
    """Rollout flown by the env's own classical controller — the canonical
    reference test pattern (``test_quadrotor3d.py:12-24``), fully fused."""

    def body(carry, _):
        states, k = carry
        k, k_reset = jax.random.split(k)
        actions = env.vcontrol(states)
        if auto_reset:
            out = env.autoreset_step(states, actions, k_reset)
        else:
            out = env.vstep(states, actions)
        return (out.state, k), StepOut(out.state, out.obs, out.reward, out.done)

    (final_states, _), traj = jax.lax.scan(body, (init_states, key), None, length=horizon)
    return final_states, traj


def uniform_reset(dim: int, low: float = -1.0, high: float = 1.0):
    """Reference-style reset: every state component ~ U(low, high)
    (``quadrotor3d.py:182-185`` — including unnormalised quaternions)."""

    def reset_fn(params, key):
        del params
        return jax.random.uniform(key, (dim,), minval=low, maxval=high)

    return reset_fn
