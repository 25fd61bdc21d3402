"""Recurrent (GRU) PPO — the ``network='lstm'`` capability of the
reference's training stack, TPU-first.

The reference CLI passed ``network='mlp'`` into baselines ``learn()``
(``gym_reinmav/run.py:63-68``) where recurrent policies were one flag
away; this module supplies that option for the native learner
(``--network=gru`` in ``rl/run.py``).  Design points:

* **Transposed everywhere**: observations, hiddens, and actions run
  feature-major ``(features, batch)`` like the rest of the framework —
  the GRU state is ``(H, B)`` so every gate matmul is MXU-dense.
* **Collection** is a ``lax.scan`` over the horizon carrying
  ``(env_state, h)``; the hidden is zeroed on episode boundaries
  (``h ← h·(1−done_prev)``) so memory never leaks across episodes.
* **Learner** follows the baselines-ppo2-lstm recipe: store the
  rollout's INITIAL hidden per env, minibatch over the ENV axis
  (sequences stay whole — recurrent credit assignment needs the time
  axis intact), and recompute the forward pass through the stored
  trajectory with the same done masking (truncated BPTT over the
  rollout window).
* GAE / clipped surrogate / entropy bonus are the standard PPO pieces
  (mirroring ``rl/ppo.py``; kept local so the dense fast-path module
  stays free of recurrent plumbing).

Scope: a deliberately small, correct recurrent option for the 5-16-dim
proprioceptive tasks — not a throughput path (no fused kernels; the
rollout is the plain transposed scan).  ``tests/test_recurrent.py``
pins the mechanics and a learning run on quadrotor2d-v0.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..envs.core import EnvDef


class RecurrentPpoConfig(NamedTuple):
    num_envs: int = 256
    rollout_len: int = 64
    hidden: int = 64          # GRU state size
    embed: int = 64           # obs embedding width (tanh dense)
    learning_rate: float = 3e-4
    gamma: float = 0.99
    lam: float = 0.95
    clip_eps: float = 0.2
    epochs: int = 4
    num_minibatches: int = 4  # over the ENV axis (sequences stay whole)
    vf_coef: float = 0.5
    entropy_coef: float = 0.0
    max_grad_norm: float = 0.5
    init_log_std: float = 0.0


class RecurrentTrainState(NamedTuple):
    params: Any
    opt_state: Any
    env_states: jnp.ndarray   # (B, state_dim) row layout at the API edge
    h: jnp.ndarray            # (H, B) GRU state
    prev_done: jnp.ndarray    # (B,) f32 — masks h at the next step
    key: jax.Array
    update_step: jnp.ndarray


def init_params(key, obs_dim: int, action_dim: int, cfg: RecurrentPpoConfig):
    ke, ki, kh, kp, kv = jax.random.split(key, 5)
    ortho = jax.nn.initializers.orthogonal
    h, e = cfg.hidden, cfg.embed
    return {
        "embed": {"w": ortho(jnp.sqrt(2.0))(ke, (obs_dim, e)),
                  "b": jnp.zeros((e,))},
        "gru": {
            "wi": ortho(1.0)(ki, (e, 3 * h)),
            "wh": ortho(1.0)(kh, (h, 3 * h)),
            "bi": jnp.zeros((3 * h,)),
            "bh": jnp.zeros((3 * h,)),
        },
        "pi_out": {"w": ortho(0.01)(kp, (h, action_dim)),
                   "b": jnp.zeros((action_dim,))},
        "vf_out": {"w": ortho(1.0)(kv, (h, 1)), "b": jnp.zeros((1,))},
        "log_std": jnp.full((action_dim,), cfg.init_log_std),
    }


def _dot_t(w, x_t):
    """(din, dout)ᵀ·(din, B) -> (dout, B)."""
    return jax.lax.dot_general(w, x_t, (((0,), (0,)), ((), ())))


def gru_cell(params, h, x_t):
    """One GRU step in transposed layout: ``h`` (H, B), ``x_t`` (E, B).

    Standard GRU (Cho et al. 2014): r/z gates sigmoid, candidate n uses
    the reset-gated recurrent term, h' = (1−z)·n + z·h.
    """
    g = params["gru"]
    hd = h.shape[0]
    gi = _dot_t(g["wi"], x_t) + g["bi"][:, None]    # (3H, B)
    gh = _dot_t(g["wh"], h) + g["bh"][:, None]
    r = jax.nn.sigmoid(gi[:hd] + gh[:hd])
    z = jax.nn.sigmoid(gi[hd:2 * hd] + gh[hd:2 * hd])
    n = jnp.tanh(gi[2 * hd:] + r * gh[2 * hd:])
    return (1.0 - z) * n + z * h


def policy_step(params, h, obs_t, done_prev):
    """One policy step: mask the carried hidden on episode boundaries,
    embed, recurse, head out.  Returns (h', mean_t, log_std, value)."""
    h = h * (1.0 - done_prev)[None, :]
    e = jnp.tanh(_dot_t(params["embed"]["w"], obs_t)
                 + params["embed"]["b"][:, None])
    h = gru_cell(params, h, e)
    mean = _dot_t(params["pi_out"]["w"], h) + params["pi_out"]["b"][:, None]
    value = (_dot_t(params["vf_out"]["w"], h)
             + params["vf_out"]["b"][:, None])[0]
    return h, mean, params["log_std"], value


def _logp_t(mean_t, log_std, action_t):
    var = jnp.exp(2.0 * log_std)[:, None]
    return jnp.sum(
        -0.5 * jnp.square(action_t - mean_t) / var
        - log_std[:, None] - 0.5 * jnp.log(2.0 * jnp.pi), axis=0)


class RecurrentTraj(NamedTuple):
    obs: jnp.ndarray      # (T, D, B)
    action: jnp.ndarray   # (T, A, B)
    log_prob: jnp.ndarray  # (T, B)
    value: jnp.ndarray    # (T, B)
    reward: jnp.ndarray   # (T, B)
    done: jnp.ndarray     # (T, B) f32 — done AFTER this step
    done_prev: jnp.ndarray  # (T, B) f32 — boundary BEFORE this step


def collect(env: EnvDef, cfg: RecurrentPpoConfig, params, state):
    """One rollout window; returns (new TrainState fields, traj, h0)."""
    d = env.obs_dim

    def body(carry, _):
        s_t, h, dprev, k = carry
        k, k_act, k_reset = jax.random.split(k, 3)
        obs_t = s_t[:d]
        h_new, mean, log_std, value = policy_step(params, h, obs_t, dprev)
        noise = jax.random.normal(k_act, mean.shape, jnp.float32)
        action = mean + jnp.exp(log_std)[:, None] * noise
        logp = _logp_t(mean, log_std, action)
        out = env.autoreset_step_t(s_t, action, k_reset)
        done = out.done.astype(dprev.dtype)  # carry dtype (f64 on the
        #                                      x64 CPU test backend)
        step = RecurrentTraj(obs_t, action, logp, value, out.reward,
                             done, dprev)
        return (out.state, h_new, done, k), step

    carry0 = (state.env_states.T, state.h, state.prev_done, state.key)
    (s_t, h, dprev, key), traj = jax.lax.scan(
        body, carry0, None, length=cfg.rollout_len)
    return (s_t, h, dprev, key), traj


def compute_gae(cfg: RecurrentPpoConfig, traj: RecurrentTraj, last_value):
    """Standard GAE over the window (terminal bootstrap masked by done)."""
    def body(carry, inp):
        gae, next_value = carry
        value, reward, done = inp
        nd = 1.0 - done
        delta = reward + cfg.gamma * next_value * nd - value
        gae = delta + cfg.gamma * cfg.lam * nd * gae
        return (gae, value), gae

    (_, _), adv = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value),
        (traj.value, traj.reward, traj.done), reverse=True)
    return adv, adv + traj.value


def _loss(params, cfg, mb, h0):
    """Clipped PPO loss on one env-axis minibatch, forward recomputed
    through time with the stored boundary masking (truncated BPTT)."""
    obs, action, logp_old, adv, ret, done_prev = mb

    def step(h, inp):
        o_t, dprev = inp
        h, mean, log_std, value = policy_step(params, h, o_t, dprev)
        return h, (mean, value)

    _, (means, values) = jax.lax.scan(step, h0, (obs, done_prev))
    logp = jax.vmap(_logp_t, in_axes=(0, None, 0))(
        means, params["log_std"], action)

    ratio = jnp.exp(logp - logp_old)
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg = -jnp.minimum(
        ratio * adv_n,
        jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * adv_n,
    ).mean()
    v_loss = 0.5 * jnp.mean(jnp.square(values - ret))
    entropy = jnp.sum(params["log_std"]
                      + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e))
    loss = pg + cfg.vf_coef * v_loss - cfg.entropy_coef * entropy
    return loss, (pg, v_loss, jnp.mean(jnp.abs(ratio - 1.0)))


def make_optimizer(cfg: RecurrentPpoConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.learning_rate),
    )


def init_train_state(env: EnvDef, cfg: RecurrentPpoConfig,
                     key) -> RecurrentTrainState:
    k_p, k_env, k_loop = jax.random.split(key, 3)
    params = init_params(k_p, env.obs_dim, env.action_dim, cfg)
    return RecurrentTrainState(
        params=params,
        opt_state=make_optimizer(cfg).init(params),
        env_states=env.vreset(jax.random.split(k_env, cfg.num_envs)),
        h=jnp.zeros((cfg.hidden, cfg.num_envs)),
        prev_done=jnp.zeros((cfg.num_envs,)),
        key=k_loop,
        update_step=jnp.zeros((), jnp.int32),
    )


def train_step(env: EnvDef, cfg: RecurrentPpoConfig,
               state: RecurrentTrainState):
    """One PPO update: collect a window, GAE, ``epochs`` passes of
    env-axis minibatch SGD with whole sequences."""
    if cfg.num_envs % cfg.num_minibatches:
        raise ValueError("num_envs must divide into num_minibatches")
    opt = make_optimizer(cfg)
    d = env.obs_dim

    h0 = state.h * (1.0 - state.prev_done)[None, :]  # learner's start state
    (s_t, h, dprev, key), traj = collect(env, cfg, state.params, state)
    _, _, _, last_value = policy_step(state.params, h, s_t[:d], dprev)
    adv, ret = compute_gae(cfg, traj, last_value)

    mb_envs = cfg.num_envs // cfg.num_minibatches

    def epoch(carry, k_perm):
        params, opt_state = carry
        perm = jax.random.permutation(k_perm, cfg.num_envs)

        def minibatch(carry, idx):
            params, opt_state = carry
            take_b = lambda x: jnp.take(x, idx, axis=-1)  # noqa: E731
            mb = (take_b(traj.obs), take_b(traj.action),
                  take_b(traj.log_prob), take_b(adv), take_b(ret),
                  take_b(traj.done_prev))
            (loss, aux), grads = jax.value_and_grad(_loss, has_aux=True)(
                params, cfg, mb, take_b(h0))
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss,) + aux

        idxs = perm.reshape(cfg.num_minibatches, mb_envs)
        (params, opt_state), metrics = jax.lax.scan(
            minibatch, (params, opt_state), idxs)
        return (params, opt_state), metrics

    key, k_epochs = jax.random.split(key)
    (params, opt_state), metrics = jax.lax.scan(
        epoch, (state.params, state.opt_state),
        jax.random.split(k_epochs, cfg.epochs))

    loss, pg, v_loss, ratio_dev = (jnp.mean(m) for m in metrics)
    new = RecurrentTrainState(
        params=params, opt_state=opt_state, env_states=s_t.T, h=h,
        prev_done=dprev, key=key, update_step=state.update_step + 1,
    )
    met = {
        "loss": loss, "pg_loss": pg, "v_loss": v_loss,
        "ratio_dev": ratio_dev,
        "mean_reward": jnp.mean(traj.reward),
        "mean_episode_done_frac": jnp.mean(traj.done),
    }
    return new, met


def make_train_step(env: EnvDef, cfg: RecurrentPpoConfig):
    return jax.jit(lambda s: train_step(env, cfg, s), donate_argnums=(0,))


def make_train_many(env: EnvDef, cfg: RecurrentPpoConfig, num_updates: int):
    """K updates per dispatch (tunnel-floor amortisation, like
    ppo.make_train_many)."""
    def many(s):
        def body(s, _):
            return train_step(env, cfg, s)
        s, m = jax.lax.scan(body, s, None, length=num_updates)
        return s, jax.tree.map(jnp.mean, m)

    return jax.jit(many, donate_argnums=(0,))


def greedy_action(env: EnvDef, params, h, obs, done_prev):
    """Deterministic (mean) action for evaluation; row-layout obs.
    Returns (action, h')."""
    obs_t = obs.T if obs.ndim == 2 else obs[:, None]
    h, mean, _, _ = policy_step(params, h, obs_t, done_prev)
    a = mean.T if obs.ndim == 2 else mean[:, 0]
    return a, h
