"""Gymnasium ``VectorEnv`` adapter over the batched TPU fast path.

The reference trained through baselines' ``make_vec_env`` subprocess
vector envs (``gym_reinmav/run.py:73-94``).  This adapter exposes the
same *interface contract* — one object stepping N sub-envs with
auto-reset — but the N sub-envs are one batched, jitted, on-device
program (``EnvDef.autoreset_step``), so third-party RL libraries get the
throughput this framework is built for instead of N processes and pipe
IPC.

Semantics: gymnasium 1.x ``AutoresetMode.SAME_STEP`` — when a sub-env's
episode ends, the returned observation is the NEW episode's first
observation and the terminal observation is delivered in
``infos["final_obs"]`` (masked by ``infos["_final_obs"]``), matching
``gymnasium.vector`` conventions.

Performance notes:
* the whole step (dynamics + termination + reset draws + PRNG advance)
  is ONE compiled dispatch; the numpy in/out conversion at the API
  boundary is the unavoidable cost of the ecosystem interface (a
  device->host transfer per step).  For maximum throughput use the
  functional API (`rl/ppo.py` folds entire updates into one dispatch).
* batch-size the adapter like the TPU path (thousands of envs); tiny
  ``num_envs`` is dispatch-latency-bound (see docs/scaling.md).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium
    from gymnasium import spaces
    from gymnasium.vector import AutoresetMode, VectorEnv
    from gymnasium.vector.utils import batch_space
except ImportError:  # pragma: no cover - gymnasium is an optional extra
    gymnasium = None
    VectorEnv = object

from ..envs.core import episode_boundary
from ..envs.registry import make as make_funcenv

_PREFIX = "reinmav_tpu/"


class VectorGymAdapter(VectorEnv):
    """N batched sub-envs as one ``gymnasium.vector.VectorEnv``."""

    def __init__(self, env_id: str, num_envs: int, params=None, wrappers=(),
                 device: Optional[str] = None):
        if gymnasium is None:
            raise ImportError("gymnasium is required for the compat adapter")
        self.metadata = {"autoreset_mode": AutoresetMode.SAME_STEP,
                         "render_modes": []}
        self.env = make_funcenv(
            env_id.removeprefix(_PREFIX),
            **({"params": params} if params is not None else {}),
        )
        for wrap in wrappers:
            self.env = wrap(self.env)
        self.num_envs = int(num_envs)
        self.spec = None
        self.render_mode = None

        self.single_action_space = spaces.Box(
            low=self.env.action_low, high=self.env.action_high,
            shape=(max(self.env.action_dim, 1),), dtype=np.float32,
        )
        self.single_observation_space = spaces.Box(
            low=self.env.obs_low, high=self.env.obs_high,
            shape=(self.env.obs_dim,), dtype=np.float32,
        )
        self.action_space = batch_space(self.single_action_space, self.num_envs)
        self.observation_space = batch_space(
            self.single_observation_space, self.num_envs)

        env = self.env
        obs_dim = env.obs_dim

        # ONE dispatch per step: dynamics, episode boundary, reset draws,
        # and the PRNG advance all inside a single jitted program.
        @jax.jit
        def _step(states, actions, key):
            key, k_reset = jax.random.split(key)
            out = env.autoreset_step(states, actions, k_reset)
            boundary = episode_boundary(out)
            next_obs = out.state[:, :obs_dim]       # SAME_STEP: post-reset
            truncated = (
                jnp.zeros_like(out.done) if out.truncated is None
                else out.truncated
            )
            return (out.state, next_obs, out.obs, out.reward,
                    out.done, truncated, boundary, key)

        @jax.jit
        def _reset(key):
            key, k = jax.random.split(key)
            states = env.vreset(jax.random.split(k, self.num_envs))
            return states, states[:, :obs_dim], key

        self._step_fn = _step
        self._reset_fn = _reset
        self._key = jax.random.PRNGKey(0)
        self._states = None

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._states, obs, self._key = self._reset_fn(self._key)
        return np.asarray(obs, np.float32), {}

    def step(self, actions):
        if self._states is None:
            raise RuntimeError("call reset() before step()")
        actions = jnp.asarray(np.asarray(actions, np.float32))
        (self._states, next_obs, final_obs, reward, terminated, truncated,
         boundary, self._key) = self._step_fn(self._states, actions, self._key)
        # One bulk fetch of everything the API must return.
        next_obs, final_obs, reward, terminated, truncated, boundary = (
            jax.device_get(
                (next_obs, final_obs, reward, terminated, truncated, boundary)
            )
        )
        infos = {}
        if boundary.any():
            # gymnasium SAME_STEP convention: terminal observations where
            # an episode ended this step, with the boolean mask.
            infos["final_obs"] = np.where(
                boundary[:, None], final_obs, np.nan
            ).astype(np.float32)
            infos["_final_obs"] = np.asarray(boundary)
        return (np.asarray(next_obs, np.float32),
                np.asarray(reward, np.float64),
                np.asarray(terminated, bool),
                np.asarray(truncated, bool),
                infos)

    def close_extras(self, **kwargs):
        pass

    @property
    def unwrapped(self):
        return self


def make_vec(env_id: str, num_envs: int, **kwargs) -> "VectorGymAdapter":
    return VectorGymAdapter(env_id, num_envs, **kwargs)
