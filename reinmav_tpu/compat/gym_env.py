"""Gymnasium-compatible single-env adapter.

Ecosystem interop layer: wraps a functional :class:`reinmav_tpu.EnvDef`
as a ``gymnasium.Env`` with the classic ``reset()/step()`` object API,
mirroring the reference's gym registration surface
(``gym_reinmav/__init__.py:3-41``).  The adapter keeps a jitted step on
device and moves one state in/out per call — convenient for debugging and
third-party tooling, NOT the performance path (use batched rollouts).

API notes vs the reference (which used legacy gym):
* gymnasium 5-tuple ``(obs, reward, terminated, truncated, info)``.
* Adds the reference's non-standard ``control()`` method (classical
  controller action from internal state, ``quadrotor3d.py:126``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium
    from gymnasium import spaces
except ImportError:  # pragma: no cover - gymnasium is an optional extra
    gymnasium = None
    spaces = None

from ..envs.registry import make as make_funcenv

_PREFIX = "reinmav_tpu/"


class GymAdapter(gymnasium.Env if gymnasium else object):
    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, env_id: str, render_mode: Optional[str] = None,
                 params=None, wrappers=()):
        """``params``: frozen-param override for the underlying env;
        ``wrappers``: EnvDef->EnvDef transforms (see envs.wrappers)
        applied in order."""
        if gymnasium is None:
            raise ImportError("gymnasium is required for the compat adapter")
        # `is not None` — a params NamedTuple whose fields are all falsy
        # (zeros) is still a real override.
        self.env = make_funcenv(env_id, **({"params": params} if params is not None else {}))
        for wrap in wrappers:
            self.env = wrap(self.env)
        self.render_mode = render_mode
        # Interactive single-env stepping is dispatch-latency-bound, so pin
        # everything to the host CPU backend (µs per call); batched
        # throughput work belongs on the TPU via the functional API, not
        # this adapter.  jit follows the committed placement of the state.
        self._cpu = jax.devices("cpu")[0]
        self._step = jax.jit(lambda s, a: self.env.step(s, a))
        self._control = jax.jit(lambda s: self.env.control(s)) if self.env.control_fn else None
        self._state = None
        with jax.default_device(self._cpu):
            self._key = jax.random.PRNGKey(0)
        self._history = []

        self.action_space = spaces.Box(
            low=self.env.action_low,
            high=self.env.action_high,
            shape=(max(self.env.action_dim, 1),),
            dtype=np.float32,
        )
        self.observation_space = spaces.Box(
            low=self.env.obs_low, high=self.env.obs_high,
            shape=(self.env.obs_dim,), dtype=np.float32,
        )

    def reset(self, *, seed: Optional[int] = None, options=None):
        # Gymnasium protocol: seeding must also initialise the Env's
        # np_random (env_checker asserts `_np_random is not None` after a
        # seeded reset).  The actual randomness below is JAX-keyed — the
        # np_random stream exists for API conformance and user access.
        super().reset(seed=seed)
        # Key ops also pinned to CPU — on a tunnelled TPU even PRNGKey
        # costs a remote compile+dispatch.
        with jax.default_device(self._cpu):
            if seed is not None:
                self._key = jax.random.PRNGKey(seed)
            self._key, k = jax.random.split(self._key)
        if options and "state" in options:
            self._state = jax.device_put(np.asarray(options["state"], np.float32), self._cpu)
        else:
            self._state = jax.device_put(self.env.reset(jax.device_put(k, self._cpu)), self._cpu)
        obs = np.asarray(self._state[: self.env.obs_dim], np.float32)
        self._history = [obs.copy()]
        return obs, {}

    def step(self, action):
        # np first: jnp.asarray would allocate on the default (TPU) device
        # and force a device->host transfer per step.
        action = jax.device_put(np.asarray(action, np.float32), self._cpu)
        out = self._step(self._state, action)
        self._state = out.state
        obs = np.asarray(out.obs, np.float32)
        self._history.append(obs.copy())
        truncated = bool(out.truncated) if out.truncated is not None else False
        return obs, float(out.reward), bool(out.done), truncated, {}

    def control(self):
        """Classical-controller action from the current internal state
        (the reference's non-standard env method)."""
        if self._control is None:
            raise NotImplementedError(f"{self.env.name} has no classical controller")
        return np.asarray(self._control(self._state))

    def render(self):
        if self.render_mode == "rgb_array":
            from ..render.plot import render_frame

            return render_frame(self.env.name, np.asarray(self._state))
        return None

    def plot_state(self, path_prefix: str = "trajectory"):
        """Offline trajectory plots (the reference ``plot_state``,
        ``reinmav_env.py:138-185``)."""
        from ..render.plot import plot_trajectory

        return plot_trajectory(self.env.name, np.stack(self._history), path_prefix)

    def render_html(self, path: str = "trajectory.html", **kwargs) -> str:
        """Interactive browser animation of the episode so far (the
        vpython-live-canvas role, ``quadrotor3d.py:187-307`` — recorded
        rather than live; self-contained HTML, no server)."""
        from ..render.html_view import save_html

        return save_html(self.env.name, np.stack(self._history), path, **kwargs)


def register_all() -> None:
    """Register every env id with gymnasium under ``reinmav_tpu/``
    (mirror of the reference's 8 registrations)."""
    if gymnasium is None:
        return
    from ..envs.registry import registered_ids

    for env_id in registered_ids():
        full = _PREFIX + env_id
        if full not in gymnasium.registry:
            gymnasium.register(id=full, entry_point=GymAdapter, kwargs={"env_id": env_id})


def make(env_id: str, **kwargs) -> "GymAdapter":
    return GymAdapter(env_id.removeprefix(_PREFIX), **kwargs)
