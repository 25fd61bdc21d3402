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
import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class StepOut(NamedTuple):
    """Result of one environment transition.

    ``done`` is *termination* (the MDP ended); ``truncated`` — set only by
    wrappers such as :func:`~reinmav_tpu.envs.wrappers.time_limit` — is
    horizon truncation (gymnasium's second flag).  ``truncated=None``
    means "this env never truncates"; use :func:`episode_boundary` for
    the combined reset/episode-end mask.
    """

    state: jnp.ndarray
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    truncated: Optional[jnp.ndarray] = None


def episode_boundary(out: StepOut) -> jnp.ndarray:
    """Episode-end mask: terminated OR truncated (what auto-reset and
    baselines-style GAE masking use)."""
    return out.done if out.truncated is None else out.done | out.truncated


@functools.partial(jax.jit, static_argnums=(0, 1))
def _jitted_env_call(fn, params, *args):
    """Function-keyed jit behind the single-env ``step``/``control``
    conveniences: one compile per (fn, params, shapes).  Params must be
    STATIC — step fns use structural fields in Python control flow
    (``range(p.frame_skip)``, the contact_enabled gate).  Under an
    outer jit this inlines at trace time (jit-in-jit), so
    batched/rollout paths are unchanged."""
    return fn(params, *args)


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
    # Q11 remedy: the reference's declared spaces can contradict its own
    # dynamics — ``quadrotor3d.py:70`` declares Box(0,10)^4 while its
    # ``control()`` (``:173-178``) commands NEGATIVE body rates, so a
    # tanh-squashed actor confined to the declared box physically cannot
    # rotate both ways and never stabilises (measured: SAC/TD3 plateau at
    # free-fall returns on quadrotor3d-v0).  These optional per-dimension
    # tuples give bound-respecting (squashing) learners the DYNAMICALLY
    # REACHABLE action box; ``None`` broadcasts the declared scalars.
    # The declared scalars above stay reference-faithful — they are what
    # the gym adapter exposes as ``action_space``.
    action_low_phys: Optional[tuple] = None
    action_high_phys: Optional[tuple] = None
    # True when reset_fn ignores its PRNG key (the tpuquad family resets
    # to the XML keyframe, ``mujoco_quad.py:65-69``).  Consumers: replay
    # samplers must NOT use same-iteration tile sampling on these envs —
    # deterministic resets keep reset cohorts near-identical, and a
    # measured 20M-step hover run at grad_steps=16 collapses with
    # 128-wide tiles (eval 18526 -> 5617) even after every env has
    # terminated once (rl/sac.py resolve_sample_tile).
    deterministic_reset: bool = False

    def physical_action_bounds(self):
        """(low, high) the squashing learners map tanh outputs onto:
        per-dim ``(A,)`` float32 arrays when declared, else the scalar
        gym-space bounds."""
        if self.action_low_phys is None:
            return self.action_low, self.action_high
        import numpy as np

        return (np.asarray(self.action_low_phys, np.float32),
                np.asarray(self.action_high_phys, np.float32))

    # -- single-env conveniences ------------------------------------------
    # step/control run through a function-keyed jit with params STATIC
    # (one compile per distinct Params — structural fields like
    # frame_skip need Python control flow, see _jitted_env_call):
    # op-by-op eager dispatch of the contact envs costs seconds/step AND
    # eagerly compiling their custom_vmap jaxpr has segfaulted XLA:CPU
    # late in long sessions (reproducible at tests/test_utils.py::
    # test_save_html_animation inside the full suite, 2026-08-20).
    # Python-loop stepping — the reference's idiom
    # (example/mujoco/control_rpy.py:58-79) — must just work.
    def step(self, state, action) -> StepOut:
        return _jitted_env_call(self.step_fn, self.params, state, action)

    def reset(self, key) -> jnp.ndarray:
        return self.reset_fn(self.params, key)

    def control(self, state) -> jnp.ndarray:
        if self.control_fn is None:
            raise NotImplementedError(f"{self.name} has no classical controller")
        return _jitted_env_call(self.control_fn, self.params, state)

    # -- batched kernels ---------------------------------------------------
    # Two batch layouts:
    #   * (B, D) "row" layout — the public API convention.
    #   * (D, B) "transposed" layout — the TPU hot-loop convention: a state
    #     of D≈5-16 floats in the minor dimension gets lane-padded to 128
    #     on TPU (≈13x wasted HBM bandwidth on every scan carry), whereas
    #     (D, B) keeps the batch in dense lanes.  Rollouts transpose once
    #     at entry/exit and step in (D, B) throughout.

    def vstep(self, states, actions) -> StepOut:
        """Batched step over leading axis, (B, D) layout."""
        return jax.vmap(self.step_fn, in_axes=(None, 0, 0))(self.params, states, actions)

    def vreset(self, keys) -> jnp.ndarray:
        return jax.vmap(self.reset_fn, in_axes=(None, 0))(self.params, keys)

    def _require_control(self):
        if self.control_fn is None:
            raise NotImplementedError(f"{self.name} has no classical controller")

    def vcontrol(self, states) -> jnp.ndarray:
        self._require_control()
        return jax.vmap(self.control_fn, in_axes=(None, 0))(self.params, states)

    def vstep_t(self, states_t, actions_t) -> StepOut:
        """Batched step in transposed (D, B) layout (states/obs/actions
        batch-minor; reward/done stay (B,))."""
        return jax.vmap(
            self.step_fn, in_axes=(None, 1, 1), out_axes=StepOut(1, 1, 0, 0, 0)
        )(self.params, states_t, actions_t)

    def vreset_t(self, keys) -> jnp.ndarray:
        return jax.vmap(self.reset_fn, in_axes=(None, 0), out_axes=1)(self.params, keys)

    def vcontrol_t(self, states_t) -> jnp.ndarray:
        self._require_control()
        return jax.vmap(self.control_fn, in_axes=(None, 1), out_axes=1)(self.params, states_t)

    def autoreset_step(self, states, actions, key) -> StepOut:
        """Batched step with fused auto-reset, (B, D) layout.

        Done sub-envs are re-initialised from fresh PRNG draws in the same
        kernel; their returned obs/reward/done describe the *terminal*
        transition (standard fused auto-reset; divergence from the
        reference's ``steps_beyond_done`` tail is documented in
        SURVEY.md §7).
        """
        out = self.vstep(states, actions)
        batch = states.shape[0]
        reset_states = self.vreset(jax.random.split(key, batch))
        boundary = episode_boundary(out)
        next_states = jnp.where(boundary[:, None], reset_states.astype(out.state.dtype), out.state)
        return out._replace(state=next_states)

    def autoreset_step_t(self, states_t, actions_t, key) -> StepOut:
        """Transposed-layout autoreset step ((D, B) states)."""
        out = self.vstep_t(states_t, actions_t)
        batch = states_t.shape[1]
        reset_states = self.vreset_t(jax.random.split(key, batch))
        boundary = episode_boundary(out)
        next_states = jnp.where(boundary[None, :], reset_states.astype(out.state.dtype), out.state)
        return out._replace(state=next_states)

    # -- sublane-dense (D, 8, B/8) kernels ---------------------------------
    # A (D, B) carry gives the VPU (d_slice, B)-shaped ops whose sublane
    # dimension is the tiny d_slice (1-4 of 8 sublanes busy).  Viewing the
    # batch as (8, B/8) makes every elementwise op (8, B/8)-shaped — all
    # sublanes busy.  Generic over every env via a double vmap; measured
    # ~5x on the scan rollout.  Single-device only (the reshape crosses
    # shard boundaries; multi-chip uses the flat path per shard).

    def vstep_t8(self, states8, actions8) -> StepOut:
        ax = StepOut(1, 1, 0, 0, 0)
        inner = jax.vmap(self.step_fn, in_axes=(None, 1, 1), out_axes=ax)
        return jax.vmap(inner, in_axes=(None, 1, 1), out_axes=ax)(
            self.params, states8, actions8
        )

    def vcontrol_t8(self, states8) -> jnp.ndarray:
        self._require_control()
        inner = jax.vmap(self.control_fn, in_axes=(None, 1), out_axes=1)
        return jax.vmap(inner, in_axes=(None, 1), out_axes=1)(self.params, states8)

    def vreset_t8(self, keys8) -> jnp.ndarray:
        inner = jax.vmap(self.reset_fn, in_axes=(None, 0), out_axes=1)
        return jax.vmap(inner, in_axes=(None, 0), out_axes=1)(self.params, keys8)

    def autoreset_step_t8(self, states8, actions8, key) -> StepOut:
        out = self.vstep_t8(states8, actions8)
        _, eight, b8 = states8.shape
        keys = jax.random.split(key, eight * b8)
        keys8 = keys.reshape((eight, b8) + keys.shape[1:])
        reset_states = self.vreset_t8(keys8)
        boundary = episode_boundary(out)
        next_states = jnp.where(
            boundary[None, :, :], reset_states.astype(out.state.dtype), out.state
        )
        return out._replace(state=next_states)


def rollout(
    env: EnvDef,
    policy_fn: Callable[[jnp.ndarray, jax.Array], jnp.ndarray],
    init_states: jnp.ndarray,
    key: jax.Array,
    horizon: int,
    auto_reset: bool = True,
):
    """Closed-loop batched rollout as a single ``lax.scan``.

    ``policy_fn(states_batch, key) -> action_batch`` receives the FULL
    state in row layout (B, state_dim) — classical controllers read state
    beyond the observation (the reference's ``env.control()`` uses
    internal state, ``quadrotor3d.py:126``); an observation-based policy
    should slice ``states[:, :env.obs_dim]`` itself (see
    ``rl.ppo.collect_rollout`` for the obs-normalised RL version).
    Returns the final states and the stacked trajectory ``StepOut`` with
    leading time axis ``(T, B, ...)``.

    The scan carry runs in transposed (D, B) layout for TPU lane density;
    policy calls and stacked outputs are transposed back to row layout.
    """

    def body(carry, _):
        states_t, k = carry
        k, k_act, k_reset = jax.random.split(k, 3)
        actions_t = policy_fn(states_t.T, k_act).T
        if auto_reset:
            out = env.autoreset_step_t(states_t, actions_t, k_reset)
        else:
            out = env.vstep_t(states_t, actions_t)
        return (out.state, k), out

    init_t = init_states.T
    (final_t, _), traj = jax.lax.scan(body, (init_t, key), None, length=horizon)
    traj = traj._replace(
        state=jnp.swapaxes(traj.state, 1, 2), obs=jnp.swapaxes(traj.obs, 1, 2)
    )
    return final_t.T, traj


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


def control_rollout(env: EnvDef, init_states, key, horizon: int, auto_reset: bool = True,
                    collect_trajectory: bool = True, dense8: bool = False,
                    return_key: bool = False):
    """Rollout flown by the env's own classical controller — the canonical
    reference test pattern (``test_quadrotor3d.py:12-24``), fully fused in
    transposed (D, B) layout.  With ``collect_trajectory=False`` only
    rewards/dones are stacked (pure stepping-throughput mode — no
    trajectory HBM traffic).

    ``dense8=True`` runs the scan in the sublane-dense (D, 8, B/8) view
    (~5x on TPU; requires ``B % 8 == 0``).  Leave False for
    device-sharded batches — the dense reshape crosses shard boundaries.

    ``return_key=True`` additionally returns the scan's CARRIED key
    after ``horizon`` steps: feeding (final, key) into another
    control_rollout continues the exact unchunked stream — the
    contract :func:`chunked_throughput_rollout` builds on.
    """
    batch = init_states.shape[0]
    if dense8 and batch % 8 != 0:
        raise ValueError(f"dense8 requires batch % 8 == 0, got {batch}")

    def body(carry, _):
        states_t, k = carry
        k, k_reset = jax.random.split(k)
        if dense8:
            actions_t = env.vcontrol_t8(states_t)
            if auto_reset:
                out = env.autoreset_step_t8(states_t, actions_t, k_reset)
            else:
                out = env.vstep_t8(states_t, actions_t)
        else:
            actions_t = env.vcontrol_t(states_t)
            if auto_reset:
                out = env.autoreset_step_t(states_t, actions_t, k_reset)
            else:
                out = env.vstep_t(states_t, actions_t)
        if collect_trajectory:
            y = out
        else:
            y = (out.reward, out.done)
        return (out.state, k), y

    init_t = init_states.T
    if dense8:
        init_t = init_t.reshape(env.state_dim, 8, batch // 8)
    (final_t, key_out), traj = jax.lax.scan(body, (init_t, key), None,
                                            length=horizon)
    if dense8:
        final_t = final_t.reshape(env.state_dim, batch)
    if collect_trajectory:
        state_traj, obs_traj = traj.state, traj.obs
        reward_traj, done_traj, trunc_traj = traj.reward, traj.done, traj.truncated
        if dense8:
            t_len = state_traj.shape[0]
            state_traj = state_traj.reshape(t_len, env.state_dim, batch)
            obs_traj = obs_traj.reshape(t_len, obs_traj.shape[1], batch)
            reward_traj = reward_traj.reshape(t_len, batch)
            done_traj = done_traj.reshape(t_len, batch)
            if trunc_traj is not None:
                trunc_traj = trunc_traj.reshape(t_len, batch)
        traj = StepOut(
            jnp.swapaxes(state_traj, 1, 2), jnp.swapaxes(obs_traj, 1, 2),
            reward_traj, done_traj, trunc_traj,
        )
    else:
        reward_traj, done_traj = traj
        if dense8:
            t_len = reward_traj.shape[0]
            reward_traj = reward_traj.reshape(t_len, batch)
            done_traj = done_traj.reshape(t_len, batch)
        traj = StepOut(None, None, reward_traj, done_traj)
    if return_key:
        return final_t.T, traj, key_out
    return final_t.T, traj


def _fused_kernel_registry():
    """name -> (ops module, step_fn, control_fn|None, reset_fn,
    default Params, params_pack|None): the SINGLE source of truth for
    which module functions each fused Pallas kernel bakes in, and how
    its live Params travel.  Consulted by BOTH
    :func:`throughput_rollout`'s refusal dispatch and
    ``rl/ppo._fused_rollout_enabled`` so the two gates cannot drift
    (previously two hand-maintained elif chains).  ``control_fn`` is
    None where the kernel does not embed the classical controller
    (reinmav-v0 bakes its own in-kernel controller; the tpuquad kernels
    step fixed/zero actions).  ``params_pack`` maps env Params to the
    kernel's SMEM f32 vector (r3 verdict #2: param sweeps keep the fast
    path); None = the kernel still bakes defaults and non-default
    params are refused."""
    from ..ops import (pallas_reinmav, pallas_rollout, pallas_slungload,
                       pallas_tpuquad)
    from . import (quadrotor2d, quadrotor2d_slungload, quadrotor3d,
                   quadrotor3d_slungload, reinmav13, tpuquad)

    return {
        "quadrotor3d-v0": (pallas_rollout, quadrotor3d.step,
                           quadrotor3d.control, quadrotor3d.reset,
                           quadrotor3d.Params(),
                           pallas_rollout.quad3d_params_vec),
        "reinmav-v0": (pallas_reinmav, reinmav13.step, None,
                       reinmav13.reset, reinmav13.Params(), None),
        "quadrotor3d-slungload-v0": (
            pallas_slungload, quadrotor3d_slungload.step,
            quadrotor3d_slungload.control, quadrotor3d_slungload.reset,
            quadrotor3d_slungload.Params(),
            pallas_slungload.slung3d_params_vec),
        "quadrotor2d-slungload-v0": (
            pallas_slungload, quadrotor2d_slungload.step,
            quadrotor2d_slungload.control, quadrotor2d_slungload.reset,
            quadrotor2d_slungload.Params(),
            pallas_slungload.slung2d_params_vec),
        "quadrotor2d-v0": (pallas_rollout, quadrotor2d.step,
                           quadrotor2d.control, quadrotor2d.reset,
                           quadrotor2d.Params(),
                           pallas_rollout.quad2d_params_vec),
        "MujocoQuadForce-v1": (pallas_tpuquad, tpuquad.hovering_step, None,
                               tpuquad.hovering_reset,
                               tpuquad.Params(init_z=1.0),
                               pallas_tpuquad.hover_params_vec),
        "MujocoQuadForce-v0": (pallas_tpuquad, tpuquad.force_step, None,
                               tpuquad.force_reset, tpuquad.Params(), None),
        "MujocoQuadQuat-v0": (pallas_tpuquad, tpuquad._quat_env_step, None,
                              tpuquad.quat_reset, tpuquad.QuatParams(),
                              None),
    }


def fused_kernel_mismatch(env: EnvDef, require_control: bool = True,
                          packed_params: bool = False):
    """Why a fused Pallas kernel would NOT reproduce ``env``'s semantics
    (None = eligible).  The kernels bake in the registry's module
    FUNCTIONS, so a wrapped env (same name, replaced fns) is refused by
    identity.  Params: with ``packed_params=True`` (the THROUGHPUT
    kernels AND the policy-driven kernels — PPO fused rollout,
    off-policy fused collection — all take the live Params as an SMEM
    vector) any param values are accepted when the registry entry has a
    ``params_pack``; otherwise (the non-parameterised kernels: reinmav,
    Force-v0, Quat-v0) any non-default params are refused rather than
    silently running default physics.  ``require_control=False`` skips
    the classical-controller identity check (policy-driven kernels
    replace the controller)."""
    entry = _fused_kernel_registry().get(env.name)
    if entry is None:
        return f"no fused kernel for {env.name}"
    ops, step_fn, control_fn, reset_fn, default_params, pack = entry
    # tpuquad's deterministic resets: a non-default init_z is a fresh
    # _deterministic_reset closure (envs/tpuquad.py), not the registry
    # object — accept a reset fn iff its baked init_z matches the env's
    # Params (the parameterised kernels reset to the SMEM init_z).  The
    # identity branch must apply the SAME tag check: an env keeping the
    # registry reset fn but carrying replaced Params(init_z=...) would
    # otherwise reset differently in kernel (SMEM init_z) vs scan (the
    # closure's baked value).
    if getattr(reset_fn, "det_reset_init_z", None) is not None:
        reset_ok = (
            getattr(env.reset_fn, "det_reset_init_z", None)
            == float(getattr(env.params, "init_z", float("nan")))
        )
    else:
        reset_ok = env.reset_fn is reset_fn
    fns_ok = env.step_fn is step_fn and reset_ok
    if require_control and control_fn is not None:
        fns_ok = fns_ok and env.control_fn is control_fn
    if not fns_ok:
        return "env step/control/reset fns are wrapped or replaced"
    if ((pack is None or not packed_params)
            and env.params != default_params):
        return "non-default params (kernel bakes in defaults)"
    if not ops.available():
        return "pallas unavailable on this platform"
    return None


def _live_params_vec(env: EnvDef):
    """SMEM params vector for ``env``'s throughput kernel, or None for
    the baked-constant kernel variant when ``env.params`` IS the
    registry default (Python-float equality at trace time — the live
    SMEM reads cost a measured ~3.4% on quad3d, ``pallas_params_cost``,
    so defaults shouldn't pay for the sweeps' flexibility)."""
    _, _, _, _, default_params, pack = _fused_kernel_registry()[env.name]
    try:
        baked = bool(env.params == default_params)
    except Exception:  # traced params can't be compared concretely
        baked = False
    return None if baked else pack(env.params)


def throughput_rollout(env: EnvDef, init_states, key, horizon: int, backend: str = "auto",
                       dense8: bool | None = None, return_key: bool = False):
    """Maximum-rate closed-loop rollout: returns only (final_states,
    per-env reward sums) — no trajectory materialisation.

    ``return_key=True`` additionally returns a continuation key: for the
    scan backends, the scan's carried key (continuing the EXACT
    unchunked stream); for the pallas backends,
    ``fold_in(key, horizon)`` (the kernels' on-core PRNG is seeded per
    invocation — distinct per chunk, not stream-continuing).  Used by
    :func:`chunked_throughput_rollout`.

    ``backend``: "pallas" (fused VMEM-resident kernel, quadrotor3d with
    default params on TPU only), "scan" (any env), or "auto" (pallas when
    eligible, else scan).  Pallas auto-reset uses the on-core PRNG — a
    different stream than ``jax.random`` but deterministic per seed.

    Envs without a classical controller are stepped with zero actions
    (reinmav-v0 ignores actions entirely).

    ``dense8``: sublane-dense scan view; default (None) enables it when
    the batch is divisible by 8 AND the input is not sharded across
    multiple devices (the (8, B/8) reshape would cross shard boundaries —
    use :func:`reinmav_tpu.parallel.sharded_dense_rollout` on a mesh).
    Pass an explicit bool when calling from inside jit with sharded
    inputs, where placement cannot be inspected.
    """
    single_device = (
        not hasattr(init_states, "sharding")
        or len(getattr(init_states.sharding, "device_set", [None])) <= 1
    )

    def _ret(final, reward_sum):
        """Pallas-branch return shim: the kernels' on-core PRNG is
        seeded per invocation, so the continuation key is a fold, not a
        carried stream."""
        if return_key:
            return final, reward_sum, jax.random.fold_in(key, horizon)
        return final, reward_sum

    def pallas_mismatch() -> str | None:
        """Why the fused kernel would NOT reproduce this env's semantics
        (None = eligible) — the shared registry check plus the batch
        constraint local to this entry point.  ``packed_params``: the
        throughput kernels take the live Params through SMEM, so any
        param values keep the fast path (parameterised entries)."""
        reason = fused_kernel_mismatch(env, packed_params=True)
        if reason is not None:
            return reason
        if init_states.shape[0] % 4096 != 0:
            return f"batch % 4096 != 0 (got {init_states.shape[0]})"
        return None

    _PALLAS_NAMES = tuple(_fused_kernel_registry())
    if backend == "auto":
        backend = "scan"
        if (
            jax.devices()[0].platform == "tpu"
            and single_device
            and env.name in _PALLAS_NAMES
            and pallas_mismatch() is None
        ):
            backend = "pallas"
    if backend == "pallas":
        reason = pallas_mismatch()
        if reason is not None:
            raise ValueError(f"pallas backend refused for {env.name}: {reason}")
        if env.name == "reinmav-v0":
            from ..ops import pallas_reinmav

            final_t = pallas_reinmav.reinmav_rollout_pallas8(
                init_states.T.astype(jnp.float32), horizon,
                tile8=min(512, init_states.shape[0] // 8),
            )
            # reward ≡ 90 every step (Q9 semantics) — exact by
            # construction, but tie it to the kernel output so consumers
            # that only use the reward cannot let XLA dead-code-eliminate
            # the rollout (see CLAUDE.md benchmark-honesty note).
            anchor = 0.0 * final_t[0]
            reward_sum = 90.0 * horizon + anchor
            return _ret(final_t.T, reward_sum)
        if env.name == "MujocoQuadForce-v1":
            from ..ops import pallas_tpuquad

            # Zero-action stepping with deterministic auto-reset — the
            # same semantics as the scan fallback (_zero_action_rollout).
            # Live env Params ride in through the SMEM vector; exactly
            # default params take the baked-constant variant.
            final_t, reward_sum = pallas_tpuquad.hover_rollout_pallas8(
                init_states.T.astype(jnp.float32), horizon,
                tile8=min(256, init_states.shape[0] // 8),
                params_vec=_live_params_vec(env),
                frame_skip=env.params.frame_skip,
            )
            return _ret(final_t.T, reward_sum)
        if env.name in ("MujocoQuadForce-v0", "MujocoQuadQuat-v0"):
            from ..ops import pallas_tpuquad

            model = "ground" if env.name == "MujocoQuadForce-v0" else "quat"
            # tile8=128 measured fastest for the coupled-contact solve
            # (12.1M vs 9.5M at 256 / 6.5M at 512 — tools/tpu_contact_smoke).
            final_t, z_sum = pallas_tpuquad.contact_rollout_pallas8(
                init_states.T.astype(jnp.float32), horizon, model=model,
                tile8=min(128, init_states.shape[0] // 8),
            )
            # These envs' reward is identically 0 (reference semantics);
            # anchor on the stepped Σz so XLA cannot DCE the physics.
            return _ret(final_t.T, 0.0 * z_sum)
        if env.name == "quadrotor2d-v0":
            from ..ops import pallas_rollout

            seed = jax.random.randint(key, (), 0, 2**31 - 1)
            final_t, reward_sum = pallas_rollout.quad2d_rollout_autoreset_pallas8(
                init_states.T.astype(jnp.float32), seed, horizon,
                tile8=min(512, init_states.shape[0] // 8),
                params_vec=_live_params_vec(env),
            )
            return _ret(final_t.T, reward_sum)
        if env.name.endswith("slungload-v0"):
            from ..ops import pallas_slungload

            kern = (pallas_slungload.slung3d_rollout_pallas8 if "3d" in env.name
                    else pallas_slungload.slung2d_rollout_pallas8)
            seed = jax.random.randint(key, (), 0, 2**31 - 1)
            final_t, reward_sum = kern(
                init_states.T.astype(jnp.float32), seed, horizon,
                tile8=min(256, init_states.shape[0] // 8),
                params_vec=_live_params_vec(env),
            )
            return _ret(final_t.T, reward_sum)
        from ..ops import pallas_rollout

        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        final_t, reward_sum = pallas_rollout.quad3d_rollout_autoreset_pallas8(
            init_states.T.astype(jnp.float32), seed, horizon,
            tile8=min(512, init_states.shape[0] // 8),
            params_vec=_live_params_vec(env),
        )
        return _ret(final_t.T, reward_sum)
    if dense8 is None:
        dense8 = init_states.shape[0] % 8 == 0 and single_device
    if env.control_fn is not None:
        final, traj, key_out = control_rollout(
            env, init_states, key, horizon, collect_trajectory=False,
            dense8=dense8, return_key=True,
        )
        if return_key:
            return final, traj.reward.sum(axis=0), key_out
        return final, traj.reward.sum(axis=0)
    # Controller-less envs (reinmav-v0 ignores actions; tpuquad): step
    # with zero actions.
    return _zero_action_rollout(env, init_states, key, horizon, dense8,
                                return_key=return_key)


def _zero_action_rollout(env: EnvDef, init_states, key, horizon: int, dense8: bool,
                         return_key: bool = False):
    batch = init_states.shape[0]
    dtype = init_states.dtype
    # reinmav-v0 is a continuous simulator whose done is always True (Q9);
    # auto-resetting it would re-init every step and measure nothing.
    # Step it plainly (matching the Pallas backend); the RL-style envs
    # keep fused auto-reset.
    plain = env.name == "reinmav-v0"
    if dense8:
        actions = jnp.zeros((env.action_dim, 8, batch // 8), dtype)
        init = init_states.T.reshape(env.state_dim, 8, batch // 8)
        step_fn, reward_reshape = (
            (lambda s, a, k: env.vstep_t8(s, a)) if plain else env.autoreset_step_t8,
            (horizon, batch),
        )
    else:
        actions = jnp.zeros((env.action_dim, batch), dtype)
        init = init_states.T
        step_fn, reward_reshape = (
            (lambda s, a, k: env.vstep_t(s, a)) if plain else env.autoreset_step_t,
            None,
        )

    def body(carry, _):
        s, k = carry
        k, k_reset = jax.random.split(k)
        out = step_fn(s, actions, k_reset)
        return (out.state, k), out.reward

    (final, key_out), rewards = jax.lax.scan(body, (init, key), None,
                                             length=horizon)
    if dense8:
        final = final.reshape(env.state_dim, batch)
        rewards = rewards.reshape(reward_reshape)
    if return_key:
        return final.T, rewards.sum(axis=0), key_out
    return final.T, rewards.sum(axis=0)


def chunked_throughput_rollout(env: EnvDef, init_states, key, horizon: int,
                               backend: str = "auto",
                               dense8: bool | None = None,
                               device_time_budget_s: float = 30.0,
                               probe_steps: int = 8):
    """Watchdog-safe :func:`throughput_rollout`: splits ``horizon`` into
    HOST-level dispatches sized so each stays under an estimated device
    -time budget, carrying (states, reward sums, PRNG key) between them.

    Why: the tunnelled TPU runtime kills the worker on any single
    dispatch of ~200 s device time (observed 2026-08-20 on a 500-step
    in-contact MujocoQuadForce-v0 scan at B=131072 — the coupled
    contact solve runs ~0.6M steps/s on the scan path).  The reference
    just loops ``mj_step`` on the host
    (``gym_reinmav/example/mujoco/control_rpy.py:58-79``) so ANY horizon
    works there; this is the equivalent contract for fused rollouts.

    Mechanics: a ``probe_steps`` dispatch is compiled and re-run once to
    time the warm per-step cost, then chunks are sized to
    ``device_time_budget_s`` (quantised to powers of two to bound
    recompiles; timings from freshly-compiled chunk lengths are not
    used for estimation).  For the scan backends the carried key makes
    the chunked run EXACTLY the unchunked stream
    (``tests/test_chunked_rollout.py``); the pallas backends re-seed
    per chunk (distinct, deterministic streams).

    Host-dispatching by construction — calling it inside ``jit`` is an
    error (use :func:`throughput_rollout` there and size the horizon
    yourself).

    Returns ``(final_states, per-env reward sums)``.
    """
    import time

    if isinstance(init_states, jax.core.Tracer) or isinstance(key, jax.core.Tracer):
        raise ValueError(
            "chunked_throughput_rollout dispatches from the host and "
            "cannot run under jit — call it un-jitted, or use "
            "throughput_rollout inside jit with a watchdog-safe horizon")
    horizon = int(horizon)
    if horizon <= 0:
        raise ValueError(f"horizon must be positive, got {horizon}")
    if probe_steps <= 0:
        raise ValueError(f"probe_steps must be positive, got {probe_steps}")

    compiled: dict = {}

    def run(states, k, h):
        fn = compiled.get(h)
        fresh = fn is None
        if fresh:
            fn = jax.jit(
                lambda s, kk: throughput_rollout(
                    env, s, kk, h, backend=backend, dense8=dense8,
                    return_key=True),
            )
            compiled[h] = fn
        t0 = time.perf_counter()
        f, r, k2 = fn(states, k)
        jax.block_until_ready(f)
        # Force one host transfer: block_until_ready alone under-reports
        # on the tunnelled runtime (CLAUDE.md timing rule).
        float(jnp.max(r))
        return f, r, k2, time.perf_counter() - t0, fresh

    states = init_states
    reward_sum = None
    remaining = horizon
    per_step = None

    # Probe: compile pass (untimed estimate), then a warm timed pass if
    # the horizon has room — the first dispatch's wall time includes the
    # compile and would massively over-estimate per-step cost.
    p = min(probe_steps, remaining)
    states, r, key, _, _ = run(states, key, p)
    reward_sum = r
    remaining -= p
    if remaining > 0:
        p2 = min(p, remaining)
        states, r, key, dt, fresh = run(states, key, p2)
        reward_sum = reward_sum + r
        remaining -= p2
        if not fresh:
            per_step = dt / p2

    while remaining > 0:
        if per_step is None or per_step <= 0:
            h = min(remaining, probe_steps)
        else:
            target = max(1, int(device_time_budget_s / per_step))
            # Power-of-two quantisation: bounds distinct compiled chunk
            # lengths to O(log horizon).
            h = 1 << (target.bit_length() - 1)
            h = min(remaining, max(h, 1))
        # A remainder shorter than the quantised chunk just runs as its
        # own length (one extra compile at most, at the very end).
        states, r, key, dt, fresh = run(states, key, h)
        reward_sum = reward_sum + r
        remaining -= h
        if not fresh and h > 0:
            per_step = dt / h
    return states, reward_sum


def uniform_reset(dim: int, low: float = -1.0, high: float = 1.0):
    """Reference-style reset: every state component ~ U(low, high)
    (``quadrotor3d.py:182-185`` — including unnormalised quaternions)."""

    def reset_fn(params, key):
        del params
        return jax.random.uniform(key, (dim,), minval=low, maxval=high)

    return reset_fn
