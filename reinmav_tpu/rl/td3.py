"""Twin Delayed DDPG (TD3) — deterministic-policy off-policy learner.

The reference's ``run.py`` resolved ANY baselines algorithm module,
DDPG included (``gym_reinmav/run.py:125-138``); this module is the
deterministic-policy representative, built on the same TPU-resident
machinery as :mod:`sac` (whose docstring explains the design): the
feature-major replay ring, the transposed ``(features, batch)`` MLPs,
and the one-``lax.scan`` collect+update loop with in-graph warmup
masks.  TD3-specific pieces (Fujimoto et al. 2018):

* deterministic tanh actor + Gaussian **exploration noise** at collect
  time (clipped to [-1, 1]);
* **target policy smoothing**: the Bellman target's action gets
  clipped Gaussian noise;
* twin critics with min-clipping (shared with SAC);
* **delayed policy updates**: the actor and the polyak target blends
  advance every ``policy_delay``-th critic update — inside the compiled
  scan this is an in-graph gate on the update counter, exactly like the
  warmup gate (both branches traced once, no Python control flow).

Classic **DDPG** (Lillicrap et al. 2016) is the degenerate with all
three tricks off: ``single_critic=True`` (no twin, no min-clipping),
``policy_noise=0`` (no target smoothing), ``policy_delay=1`` (actor and
targets move every update) — the ``--alg=ddpg`` preset in ``rl/run.py``.
With ``single_critic`` the ``q2``/``q2_target`` slots hold ``None``
(an empty pytree: scan carries, optimizers, and shard specs all skip
it), so DDPG pays for exactly one critic.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..envs.core import EnvDef, StepOut
# Shared off-policy primitives (see sac.py for the layout rationale).
from .sac import (
    _autoreset_dense8,
    _capacity,
    _collect_consts,
    _collect_tile,
    _fused_collect_enabled,
    _mlp_init,
    _mlp_t,
    _row_dims,
    _scale_action_t,
    buffer_insert,
    buffer_sample,
    make_sampler,
    resolve_sample_tile,
    twin_q_value_t,
)


class Td3Config(NamedTuple):
    num_envs: int = 256
    buffer_capacity: int = 1 << 20
    batch_size: int = 2048
    learning_rate: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005               # polyak blend (actor + critic targets)
    hidden: tuple = (256, 256)
    grad_steps: int = 1              # gradient updates per env step
    warmup_steps: int = 10_000       # total uniform-random env steps
    reward_scale: float = 1.0
    max_grad_norm: float | None = None
    explore_noise: float = 0.1       # std of collect-time action noise
    policy_noise: float = 0.2        # std of target-smoothing noise
    noise_clip: float = 0.5          # clip on the smoothing noise
    policy_delay: int = 2            # critic updates per actor update
    fused_collect: str = "auto"      # one-launch collection kernel (see
                                     # SacConfig.fused_collect; TD3 mode
                                     # = tanh actor + clipped noise)
    sample_tile: int | str = "auto"  # replay gather granularity (see
                                     # SacConfig.sample_tile; "auto" =
                                     # exact uniform tile=1)
    single_critic: bool = False      # True = classic DDPG (q2 is None,
                                     # Bellman target uses q1 alone)
    compute_dtype: str = "float32"   # "bfloat16": reduced-precision matmul
                                     # inputs + bf16 ReLU residuals (see
                                     # SacConfig.compute_dtype)


class Td3State(NamedTuple):
    actor: Any
    actor_target: Any
    q1: Any
    q2: Any
    q1_target: Any
    q2_target: Any
    opt_actor: Any
    opt_q: Any
    buffer: jnp.ndarray      # (R, C) feature-major ring (see sac.py)
    ptr: jnp.ndarray
    filled: jnp.ndarray
    env_states: jnp.ndarray  # (B, state_dim) row layout at the API edge
    key: jax.Array
    total_steps: jnp.ndarray
    updates: jnp.ndarray     # int32 critic-update counter (delay gating)
    ever_done: jnp.ndarray   # (B,) f32: 1 once the env has terminated
    #                          at least once (the desync_frac metric)


def actor_action_t(actor, obs_t, cd=None):
    """Deterministic policy: tanh(MLP(obs)) in [-1, 1], (A, batch)."""
    return jnp.tanh(_mlp_t(actor, obs_t, cd))


def q_value_t(q, obs_t, act_t, cd=None):
    return _mlp_t(q, jnp.concatenate([obs_t, act_t], axis=0), cd)[0]


def make_optimizers(cfg: Td3Config):
    def maybe_clip(tx):
        if cfg.max_grad_norm is not None:
            return optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
        return tx

    return (
        maybe_clip(optax.adam(cfg.learning_rate)),   # actor
        maybe_clip(optax.adam(cfg.learning_rate)),   # twin critics
    )


def _qdict(cfg: Td3Config, q1, q2):
    """Critic param dict: ``q2`` is omitted (not a None entry) under
    ``single_critic`` so optimizer states and grads never see it."""
    return {"q1": q1} if cfg.single_critic else {"q1": q1, "q2": q2}


def init_state(env: EnvDef, cfg: Td3Config, key: jax.Array) -> Td3State:
    k_a, k_1, k_2, k_env, k_loop = jax.random.split(key, 5)
    actor = _mlp_init(k_a, (env.obs_dim, *cfg.hidden, env.action_dim))
    q1 = _mlp_init(k_1, (env.obs_dim + env.action_dim, *cfg.hidden, 1))
    q2 = (None if cfg.single_critic else
          _mlp_init(k_2, (env.obs_dim + env.action_dim, *cfg.hidden, 1)))
    opt_a, opt_q = make_optimizers(cfg)
    cap = _capacity(cfg, env)
    return Td3State(
        actor=actor, actor_target=jax.tree.map(jnp.copy, actor),
        q1=q1, q2=q2,
        q1_target=jax.tree.map(jnp.copy, q1),
        q2_target=jax.tree.map(jnp.copy, q2),
        opt_actor=opt_a.init(actor),
        opt_q=opt_q.init(_qdict(cfg, q1, q2)),
        buffer=jnp.zeros((_row_dims(env), cap), jnp.float32),
        ptr=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
        env_states=env.vreset(jax.random.split(k_env, cfg.num_envs)),
        key=k_loop,
        total_steps=jnp.zeros((), jnp.int32),
        updates=jnp.zeros((), jnp.int32),
        ever_done=jnp.zeros((cfg.num_envs,), jnp.float32),
    )


def critic_loss(q_params, cfg: Td3Config, env: EnvDef, batch_rows,
                targets, key, actor_target, cd=None):
    """MSE of both critics against the smoothed Bellman target."""
    d, a = env.obs_dim, env.action_dim
    obs = batch_rows[:d]
    act = batch_rows[d:d + a]
    rew = batch_rows[d + a]
    nobs = batch_rows[d + a + 1:2 * d + a + 1]
    done = batch_rows[2 * d + a + 1]

    q1t, q2t = targets
    na = actor_action_t(actor_target, nobs, cd)
    noise = jnp.clip(
        cfg.policy_noise * jax.random.normal(key, na.shape, jnp.float32),
        -cfg.noise_clip, cfg.noise_clip,
    )
    na = jnp.clip(na + noise, -1.0, 1.0)
    if cfg.single_critic:
        tq = q_value_t(q1t, nobs, na, cd)
        target = jax.lax.stop_gradient(
            rew * cfg.reward_scale + cfg.gamma * (1.0 - done) * tq
        )
        q1v = q_value_t(q_params["q1"], obs, act, cd)
        loss = jnp.mean(jnp.square(q1v - target))
    else:
        # Twin critics ride the stacked batched-matmul pass (sac.twin_mlp_t).
        tq = jnp.minimum(*twin_q_value_t(q1t, q2t, nobs, na, cd))
        target = jax.lax.stop_gradient(
            rew * cfg.reward_scale + cfg.gamma * (1.0 - done) * tq
        )
        q1v, q2v = twin_q_value_t(q_params["q1"], q_params["q2"],
                                  obs, act, cd)
        loss = jnp.mean(jnp.square(q1v - target)) + jnp.mean(
            jnp.square(q2v - target)
        )
    return loss, (jnp.mean(q1v), jnp.mean(target))


def actor_loss(actor, env: EnvDef, batch_rows, q1, cd=None):
    """Deterministic policy gradient: maximise q1 along the actor."""
    obs = batch_rows[:env.obs_dim]
    return -jnp.mean(q_value_t(q1, obs, actor_action_t(actor, obs, cd), cd))


def train_iters(env: EnvDef, cfg: Td3Config, state: Td3State,
                num_iters: int, axis_name: str | None = None):
    """``num_iters`` TD3 iterations (each: one batched env step +
    ``cfg.grad_steps`` updates) as ONE compiled scan; metrics averaged
    in-jit (single host fetch).  ``axis_name`` as in
    :func:`sac.train_iters`: per-device collection/replay inside
    ``shard_map``, gradients/metrics ``pmean``-ed."""
    opt_a, opt_q = make_optimizers(cfg)
    d, a = env.obs_dim, env.action_dim
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    b_local = state.env_states.shape[0]
    dense8 = b_local % 8 == 0
    # Composes with shard_map exactly as in sac.train_iters: per-device
    # kernel launch on the local shard, device-decorrelated seed.
    fused_col = _fused_collect_enabled(cfg, env, b_local)
    tile, auto_tile = resolve_sample_tile(cfg, b_local)
    if tile > 1 and (cfg.batch_size % tile or b_local % tile):
        raise ValueError(
            f"sample_tile {tile} must divide batch_size {cfg.batch_size} "
            f"and the (per-device) env batch {b_local}"
        )

    def iteration(s: Td3State, _):
        if axis_name is None:
            key, k_noise, k_rand, k_reset, k_loop = jax.random.split(s.key, 5)
        else:
            base = jax.random.fold_in(s.key, jax.lax.axis_index(axis_name))
            _, k_noise, k_rand, k_reset, k_loop = jax.random.split(base, 5)
            key = jax.random.fold_in(s.key, jnp.uint32(0x9E3779B9))

        # ---- collect: deterministic policy + exploration noise ---------
        states_t = s.env_states.T
        warm = s.total_steps < cfg.warmup_steps
        if fused_col:
            # One Pallas launch (ops/pallas_offpolicy, mode="td3"): tanh
            # actor + clipped exploration noise + warmup gate + scale +
            # env step + auto-reset + replay block.
            from ..ops import pallas_offpolicy as pop

            seed = jax.random.randint(k_noise, (1,), 0, 2**31 - 1, jnp.int32)
            consts = _collect_consts(env, warm, cfg.explore_noise)
            from ..ops import pallas_ppo_rollout as ppr

            new_rows, block_rows = pop.collect_step_pallas(
                env.name, "td3",
                states_t.reshape(8 * d, b_local // 8), seed, consts,
                ppr.env_params_vec(env),
                *pop.actor_kernel_args(s.actor),
                tile=_collect_tile(b_local), compute_dtype=cfg.compute_dtype)
            block = block_rows.reshape(2 * d + a + 2, b_local)
            out = StepOut(
                new_rows.reshape(d, b_local).astype(states_t.dtype),
                block[d + a + 1:2 * d + a + 1], block[d + a],
                block[2 * d + a + 1], None)
        else:
            obs_t = states_t[:d]
            a_pol = jnp.clip(
                actor_action_t(s.actor, obs_t, cd)
                + cfg.explore_noise
                * jax.random.normal(k_noise, (a, obs_t.shape[1]), jnp.float32),
                -1.0, 1.0,
            )
            a_rand = jax.random.uniform(k_rand, a_pol.shape, jnp.float32,
                                        -1.0, 1.0)
            a_t = jnp.where(warm, a_rand, a_pol)
            step8 = _autoreset_dense8 if dense8 else EnvDef.autoreset_step_t
            out = step8(env, states_t, _scale_action_t(env, a_t), k_reset)
            block = jnp.concatenate([
                obs_t, a_t,
                out.reward[None], out.obs[:d],
                out.done[None].astype(jnp.float32),
            ])
        buffer, ptr, filled = buffer_insert(s.buffer, s.ptr, s.filled, block)
        total = s.total_steps + cfg.num_envs
        ready = (filled >= cfg.batch_size) & (total >= cfg.warmup_steps)
        gate = ready.astype(jnp.float32)
        ever_done = jnp.maximum(s.ever_done, out.done.astype(jnp.float32))
        desync = jnp.mean(ever_done)
        sample_rows = make_sampler(cfg, buffer, filled, tile, auto_tile,
                                   desync)

        # ---- update(s) --------------------------------------------------
        def one_update(carry, k):
            actor, at, q1, q2, q1t, q2t, oa, oq, upd = carry
            k_s, k_tgt = jax.random.split(k)
            rows = sample_rows(k_s)
            (qloss, (q_mean, tgt_mean)), qg = jax.value_and_grad(
                critic_loss, has_aux=True
            )(_qdict(cfg, q1, q2), cfg, env, rows, (q1t, q2t), k_tgt, at, cd)
            if axis_name is not None:
                qg = jax.lax.pmean(qg, axis_name)
            # Gating must freeze the OPTIMISER state too, not just zero
            # the grads — otherwise Adam's count/EMA advance during
            # warmup (stale bias correction on the first real update)
            # and, for the delayed actor below, the moments DECAY by
            # beta^(policy_delay-1) between real actor steps, which
            # standard TD3 does not do (its actor optimiser only steps
            # when the actor does).
            qg = jax.tree.map(lambda g: g * gate, qg)
            qu, oq_new = opt_q.update(qg, oq, _qdict(cfg, q1, q2))
            oq = jax.tree.map(lambda n, o: jnp.where(ready, n, o), oq_new, oq)
            qp = optax.apply_updates(_qdict(cfg, q1, q2), qu)
            q1, q2 = qp["q1"], qp.get("q2")
            upd = upd + ready.astype(jnp.int32)

            # Delayed actor + target updates: only on every
            # policy_delay-th REAL (gate-open) critic update.  upd was
            # already incremented, so the first open update has upd=1
            # and the actor moves when upd % delay == 0.
            slow = gate * (upd % cfg.policy_delay == 0).astype(jnp.float32)
            ploss, ag = jax.value_and_grad(actor_loss)(actor, env, rows,
                                                       q1, cd)
            if axis_name is not None:
                ag = jax.lax.pmean(ag, axis_name)
            ag = jax.tree.map(lambda g: g * slow, ag)
            au, oa_new = opt_a.update(ag, oa, actor)
            oa = jax.tree.map(lambda n, o: jnp.where(slow > 0.5, n, o),
                              oa_new, oa)
            actor = optax.apply_updates(actor, au)

            blend = cfg.tau * slow
            polyak = lambda t, o: jax.tree.map(
                lambda x, y: (1 - blend) * x + blend * y, t, o
            )
            at = polyak(at, actor)
            q1t = polyak(q1t, q1)
            q2t = polyak(q2t, q2)
            met = {"q_loss": qloss, "pi_loss": ploss, "q_mean": q_mean,
                   "target_mean": tgt_mean}
            return (actor, at, q1, q2, q1t, q2t, oa, oq, upd), met

        carry0 = (s.actor, s.actor_target, s.q1, s.q2, s.q1_target,
                  s.q2_target, s.opt_actor, s.opt_q, s.updates)
        carry, met = jax.lax.scan(
            one_update, carry0, jax.random.split(k_loop, cfg.grad_steps)
        )
        actor, at, q1, q2, q1t, q2t, oa, oq, upd = carry
        # Update-phase metrics masked by the warmup gate; weighted-mean
        # over gate-open iterations in sac._finish_metrics.
        met = jax.tree.map(lambda v: jnp.mean(v) * gate, met)
        met["update_gate"] = gate
        met["mean_reward"] = jnp.mean(out.reward)
        met["done_frac"] = jnp.mean(out.done.astype(jnp.float32))
        met["buffer_filled"] = filled.astype(jnp.float32)
        met["desync_frac"] = desync
        if axis_name is not None:
            met = jax.lax.pmean(met, axis_name)

        new = Td3State(
            actor=actor, actor_target=at, q1=q1, q2=q2,
            q1_target=q1t, q2_target=q2t, opt_actor=oa, opt_q=oq,
            buffer=buffer, ptr=ptr, filled=filled,
            env_states=out.state.T, key=key, total_steps=total,
            updates=upd, ever_done=ever_done,
        )
        return new, met

    state, metrics = jax.lax.scan(iteration, state, None, length=num_iters)
    from .sac import _finish_metrics

    return state, _finish_metrics(metrics)


def _shard_specs(cfg: Td3Config):
    """PartitionSpecs mirroring :func:`sac._shard_specs`: params and
    scalars replicated, env batch + replay columns sharded."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import BATCH_AXIS

    rep = P()
    q2_spec = None if cfg.single_critic else rep  # None = empty pytree,
    # mirrors the q2=None state slot so in_specs trees line up.
    return Td3State(
        actor=rep, actor_target=rep, q1=rep, q2=q2_spec, q1_target=rep,
        q2_target=q2_spec, opt_actor=rep, opt_q=rep,
        buffer=P(None, BATCH_AXIS), ptr=rep, filled=rep,
        env_states=P(BATCH_AXIS), key=rep, total_steps=rep, updates=rep,
        ever_done=P(BATCH_AXIS),
    )


def state_shardings(cfg: Td3Config, mesh) -> Td3State:
    from jax.sharding import NamedSharding

    return jax.tree.map(
        # None = the empty q2 slots under single_critic; stays None.
        lambda spec: None if spec is None else NamedSharding(mesh, spec),
        _shard_specs(cfg),
        is_leaf=lambda x: not isinstance(x, (Td3State,)),
    )


def make_train_iters(env: EnvDef, cfg: Td3Config, num_iters: int, mesh=None):
    """Jitted K-iteration TD3 train function; with ``mesh`` the
    shard_map path (semantics of :func:`sac.make_train_iters`)."""
    if mesh is None:
        return jax.jit(lambda s: train_iters(env, cfg, s, num_iters),
                       donate_argnums=(0,))

    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import BATCH_AXIS
    from .ppo import _shard_map_fn

    n_dev = mesh.devices.size
    if cfg.num_envs % n_dev != 0:
        raise ValueError(
            f"num_envs {cfg.num_envs} not divisible by mesh size {n_dev}"
        )
    specs = _shard_specs(cfg)
    fn = _shard_map_fn()(
        lambda s: train_iters(env, cfg, s, num_iters, axis_name=BATCH_AXIS),
        mesh=mesh, in_specs=(specs,), out_specs=(specs, P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


def greedy_action(env: EnvDef, actor, obs):
    """Deterministic (noise-free) action for evaluation, row layout."""
    a_t = actor_action_t(actor, obs.T if obs.ndim == 2 else obs[:, None])
    scaled = _scale_action_t(env, a_t)
    return scaled.T if obs.ndim == 2 else scaled[:, 0]
