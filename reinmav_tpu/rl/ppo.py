"""PPO learner — fully jitted, mesh-sharded, TPU-native.

Re-designs the training capability the reference delegates to
openai/baselines ppo2 (invoked via ``gym_reinmav/run.py:63-68`` and
``example/mujoco/train_hovering.py:83-119``): clipped surrogate objective,
GAE(λ), minibatch epochs, value clipping, entropy bonus — with the
reference's defaults (ppo2's: lr 3e-4, γ 0.99, λ 0.95, clip 0.2,
4 epochs, 4 minibatches).

Architecture differences from the reference stack (by design, SURVEY.md
§2.2): rollouts are a ``lax.scan`` over the jitted batched env (no
subprocess vec-envs, no pipe IPC); the whole train step — rollout
collection, GAE, and all epoch/minibatch updates — is ONE compiled XLA
program.  Data parallelism comes from sharding the env-batch axis over the
mesh; XLA inserts the gradient ``psum`` (the MPI allreduce equivalent)
automatically because minibatches are batch-sharded while params are
replicated.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..envs.core import EnvDef, episode_boundary
from . import networks


class PpoConfig(NamedTuple):
    num_envs: int = 1024
    rollout_len: int = 128
    learning_rate: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    value_clip_eps: float = 0.2
    # Adaptive-KL penalty mode (the other PPO variant from the paper,
    # baselines ppo1 / TRPO-flavoured): when set, the policy loss is
    # -E[ratio*adv] + beta*KL(old||new) with NO ratio clipping, and beta
    # adapts between updates (x2 when the measured KL exceeds
    # 1.5*kl_target, /2 when below target/1.5).  None = clipped PPO.
    kl_target: float | None = None
    entropy_coef: float = 0.0
    # Optional lower clamp on the policy log-std, applied after every
    # optimiser step.  With entropy_coef=0 (the reference recipe) long
    # runs drive log_std steadily down (the 500M-step hover artifact ends
    # at entropy -1.96, i.e. log_std ~ -1.9 per dim) — exploration
    # collapses and learning freezes; a floor (e.g. -2.0) keeps a minimum
    # exploration noise without the gradient bias of an entropy bonus.
    # None = unclamped (reference-faithful).
    log_std_floor: float | None = None
    value_coef: float = 0.5
    max_grad_norm: float = 0.5
    num_epochs: int = 4
    num_minibatches: int = 4
    hidden: tuple = (64, 64)
    normalize_obs: bool = True
    normalize_rewards: bool = True
    normalize_advantages: bool = True
    # "bfloat16" casts the policy/value matmul INPUTS (activations +
    # weights); accumulation, nonlinearities and the distribution math
    # stay float32.  Master params and optimiser state stay float32.
    compute_dtype: str = "float32"
    # Minibatch shuffle granularity (samples per shuffled block).  The
    # flattened sample axis is env-major (adjacent samples = different
    # i.i.d. envs at one timestep), so block-granular shuffling is
    # statistically equivalent to ppo2's element shuffle while replacing
    # a 1M-element random gather with a lane-aligned tile gather.
    # Auto-halved until it divides the batch; 1 = exact element shuffle.
    # Caveat: the i.i.d.-envs argument is weakest for deterministic-reset
    # envs (the tpuquad family), where all envs start phase-locked and a
    # 128-sample tile is highly correlated for the first episodes; resets
    # desynchronise the batch quickly, but for short runs on those envs
    # prefer a smaller tile (or 1 for ppo2's exact element shuffle).
    shuffle_tile: int = 128
    # Fused Pallas loss fwd+bwd kernel (ops/pallas_ppo): "auto" uses it
    # on TPU for 2-equal-hidden-layer nets, "on" forces (tests/interpret),
    # "off" keeps the XLA autodiff path.
    # bf16 caveat: under compute_dtype="bfloat16" the two paths are NOT
    # gradient-identical — XLA autodiff backprops tanh through the
    # bf16-stored residual (networks._tanh_bf16_residual) while the fused
    # kernel keeps the f32 activation in VMEM; toggling fused_loss in
    # bf16 mode shifts gradients at bf16 rounding magnitude (pinned by
    # tests/test_pallas_ppo.py::test_fused_loss_grads_bf16_mode).
    fused_loss: str = "auto"
    # Fused Pallas full-UPDATE kernel (ops/pallas_ppo_update): the whole
    # epochs x minibatches loop — in-kernel gather, loss fwd/bwd,
    # clip-by-global-norm and Adam — as ONE launch with the fused MLP
    # params and Adam moments resident in VMEM throughout.  Rides the
    # fused-loss path's preconditions (same data layout + tile rules);
    # "auto" uses it on TPU whenever the fused loss is active and the
    # update runs single-device (the shard_map path must pmean grads
    # BETWEEN minibatches, so it keeps the per-minibatch loop).
    fused_update: str = "auto"
    # Fused Pallas policy+env ROLLOUT kernel (ops/pallas_ppo_rollout):
    # the entire rollout phase — MLP, Gaussian sampling, env physics,
    # auto-reset, normalisation accounting, trajectory writes — as one
    # kernel.  "auto" uses it on TPU for the supported envs
    # (MujocoQuadForce-v1, quadrotor3d-v0) with 2x64 hidden and batch
    # divisible by 8·128; "on" forces (tests/interpret), "off" keeps the
    # lax.scan rollout.  RNG caveat: the kernel draws from the on-core
    # PRNG, so rollouts are statistically equivalent to the scan path,
    # not bitwise (the σ→0 limit IS bitwise; see the differential test).
    fused_rollout: str = "auto"


class ObsNorm(NamedTuple):
    """Running observation normalisation (the VecNormalize role,
    ``run.py:91-92``) — updated inside the train step, replicated."""

    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray


class RetNorm(NamedTuple):
    """Running discounted-return scale for reward normalisation — the
    other half of the reference stack's VecNormalize (baselines scales
    rewards by the RMS of the discounted return; ``run.py:91-92``)."""

    var: jnp.ndarray  # scalar
    count: jnp.ndarray  # scalar


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    env_states: jnp.ndarray
    obs_norm: ObsNorm
    ret_norm: RetNorm
    env_returns: jnp.ndarray  # (B,) running discounted returns
    key: jax.Array
    update_step: jnp.ndarray
    # Adaptive-KL penalty coefficient (used only when cfg.kl_target is
    # set; carried so the adaptation persists across checkpoints).  The
    # default is a plain float, NOT jnp.asarray: a jnp default would run
    # at import time and initialise the XLA backend, which breaks
    # multi-process workers that must call jax.distributed.initialize
    # before any backend-touching call (tests/_mp_worker.py).
    kl_beta: jnp.ndarray | float = 1.0


class Transition(NamedTuple):
    """One (batched) policy transition in TRANSPOSED layout: ``obs`` and
    ``action`` carry the feature axis first — (D|A, *batch) per step,
    (T, D|A, *batch) stacked, (D|A, n) flattened — scalars are
    (*batch)/(T, *batch)/(n,).  See CLAUDE.md: batch-minor arrays are
    lane-dense on TPU; a (n, 13) float32 array would pad 13 -> 128."""

    obs: jnp.ndarray
    action: jnp.ndarray
    log_prob: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


def _normalize(obs, norm: ObsNorm):
    return jnp.clip((obs - norm.mean) / jnp.sqrt(norm.var + 1e-8), -10.0, 10.0)


def _normalize_t(obs_t, norm: ObsNorm):
    """Transposed normalisation: ``obs_t`` is (D, *batch)."""
    shape = norm.mean.shape + (1,) * (obs_t.ndim - 1)
    mean = norm.mean.reshape(shape)
    std = jnp.sqrt(norm.var + 1e-8).reshape(shape)
    return jnp.clip((obs_t - mean) / std, -10.0, 10.0)


def _update_obs_norm(norm: ObsNorm, moments) -> ObsNorm:
    """Welford-style parallel update from streaming RAW-obs moments
    (sum, sum-of-squares, count) gathered during the rollout."""
    b_count = moments.count
    b_mean = moments.total / b_count
    # E[x^2] - mean^2 can round negative in float32 for near-constant obs,
    # which would drive var negative and NaN the normaliser — clamp like
    # np.var's non-negativity.
    b_var = jnp.maximum(moments.total_sq / b_count - jnp.square(b_mean), 0.0)
    delta = b_mean - norm.mean
    tot = norm.count + b_count
    new_mean = norm.mean + delta * (b_count / tot)
    m_a = norm.var * norm.count
    m_b = b_var * b_count
    m2 = jnp.maximum(m_a + m_b + jnp.square(delta) * norm.count * b_count / tot, 0.0)
    return ObsNorm(new_mean, m2 / tot, tot)


def make_optimizer(cfg: PpoConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(cfg.learning_rate, eps=1e-5),
    )


def init_train_state(env: EnvDef, cfg: PpoConfig, key: jax.Array) -> TrainState:
    k_params, k_env, k_loop = jax.random.split(key, 3)
    net_cfg = networks.MlpConfig(env.obs_dim, env.action_dim, cfg.hidden)
    params = networks.init_params(k_params, net_cfg)
    opt_state = make_optimizer(cfg).init(params)
    env_states = env.vreset(jax.random.split(k_env, cfg.num_envs))
    obs_norm = ObsNorm(
        jnp.zeros(env.obs_dim), jnp.ones(env.obs_dim), jnp.asarray(1e-4)
    )
    ret_norm = RetNorm(jnp.asarray(1.0), jnp.asarray(1e-4))
    env_returns = jnp.zeros(cfg.num_envs)
    return TrainState(
        params, opt_state, env_states, obs_norm, ret_norm, env_returns,
        k_loop, jnp.asarray(0), jnp.asarray(1.0),
    )


class RawObsMoments(NamedTuple):
    """Streaming raw-observation moments accumulated during a rollout
    (sums, not normalised obs — the normalisation statistics must track
    the RAW distribution, not their own output)."""

    total: jnp.ndarray  # (D,)
    total_sq: jnp.ndarray  # (D,)
    count: jnp.ndarray  # scalar


def collect_rollout(env: EnvDef, cfg: PpoConfig, params, obs_norm, ret_norm,
                    env_states, env_returns, key, dense8: bool | None = None):
    """T-step batched rollout under the current policy as a lax.scan.

    TPU layout: the scan carries states in transposed ``(D, *batch)``
    form — ``(D, B)``, or the sublane-dense ``(D, 8, B/8)`` view when
    ``dense8`` (default on for ``B % 8 == 0``; pass ``False`` for
    mesh-sharded batches, where the (8, B/8) reshape would cross shard
    boundaries).  Policy inference runs on the fused transposed MLP
    (:func:`networks.sample_action_t`) directly on the carry layout — no
    per-step transposes anywhere.

    Returns (final_states, env_returns, key, traj, obs_moments,
    ret_moments, raw_reward_mean): ``final_states`` is (B, D) row layout;
    ``traj`` fields keep the transposed batch shape — ``obs``/``action``
    are (T, D|A, *batch), scalars are (T, *batch).  ``traj.obs`` holds
    the *normalised* observations the policy consumed and ``traj.reward``
    the *scaled* rewards (what the learner needs); the moment
    accumulators stream RAW statistics for the running-normalisation
    updates.  ``env_returns`` carries the per-env discounted return
    across rollouts (reset to 0 at episode ends), used as the reward
    scale — baselines' VecNormalize semantics."""
    batch = env_states.shape[0]
    if dense8 is None:
        dense8 = batch % 8 == 0
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    red_axes = (1, 2) if dense8 else (1,)

    def body(carry, _):
        states_t, ret, k, omom, rmom, raw_rew_sum = carry
        k, k_act, k_reset = jax.random.split(k, 3)
        obs_t = states_t[: env.obs_dim]
        if cfg.normalize_obs:  # static at trace time
            omom = RawObsMoments(
                omom.total + obs_t.sum(axis=red_axes),
                omom.total_sq + jnp.square(obs_t).sum(axis=red_axes),
                omom.count + batch,
            )
        norm_obs = _normalize_t(obs_t, obs_norm) if cfg.normalize_obs else obs_t
        action, log_prob, value = networks.sample_action_t(params, norm_obs, k_act, cd)
        if dense8:
            out = env.autoreset_step_t8(states_t, action, k_reset)
        else:
            out = env.autoreset_step_t(states_t, action, k_reset)
        # Episode boundary = terminated | truncated (time_limit-wrapped
        # envs): baselines' VecEnv semantics treat both as `done` for GAE
        # masking and return-scale resets.
        done = episode_boundary(out)

        reward = out.reward
        if cfg.normalize_rewards:  # static at trace time
            ret = ret * cfg.gamma + reward
            rmom = RawObsMoments(
                rmom.total + ret.sum(),
                rmom.total_sq + jnp.square(ret).sum(),
                rmom.count + batch,
            )
            reward = jnp.clip(reward / jnp.sqrt(ret_norm.var + 1e-8), -10.0, 10.0)
            ret = ret * (1.0 - done.astype(ret.dtype))
        raw_rew_sum = raw_rew_sum + out.reward.sum()

        trans = Transition(norm_obs, action, log_prob, value, reward, done)
        return (out.state, ret, k, omom, rmom, raw_rew_sum), trans

    dtype = env_states.dtype
    omom0 = RawObsMoments(
        jnp.zeros(env.obs_dim, dtype), jnp.zeros(env.obs_dim, dtype),
        jnp.asarray(0.0, dtype),
    )
    rmom0 = RawObsMoments(
        jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype)
    )
    init_t = env_states.T
    ret0 = env_returns
    if dense8:
        init_t = init_t.reshape(env.state_dim, 8, batch // 8)
        ret0 = ret0.reshape(8, batch // 8)
    (final_t, env_returns, key, obs_moments, ret_moments, raw_rew_sum), traj = (
        jax.lax.scan(
            body,
            (init_t, ret0, key, omom0, rmom0, jnp.asarray(0.0, dtype)),
            None,
            length=cfg.rollout_len,
        )
    )
    final_states = final_t.reshape(env.state_dim, batch).T
    env_returns = env_returns.reshape(batch)
    raw_reward_mean = raw_rew_sum / (cfg.rollout_len * batch)
    return final_states, env_returns, key, traj, obs_moments, ret_moments, raw_reward_mean


def _update_ret_norm(norm: RetNorm, moments) -> RetNorm:
    """Running variance of the discounted return (mean NOT subtracted —
    baselines scales by return RMS)."""
    b_count = moments.count
    b_var = moments.total_sq / b_count  # second moment about zero
    tot = norm.count + b_count
    new_var = (norm.var * norm.count + b_var * b_count) / tot
    return RetNorm(new_var, tot)


def compute_gae(cfg: PpoConfig, traj: Transition, last_value):
    """GAE(λ) with done-masked bootstrapping, reverse scan."""

    # Accumulate in the promoted dtype (under x64 tests the rewards are
    # f64 while bf16-mode values are f32 — the carry must be stable).
    acc_dtype = jnp.result_type(traj.value.dtype, traj.reward.dtype)

    def body(carry, inp):
        gae, next_value = carry
        value, reward, done = inp
        not_done = 1.0 - done.astype(acc_dtype)
        delta = reward + cfg.gamma * next_value * not_done - value
        gae = delta + cfg.gamma * cfg.gae_lambda * not_done * gae
        return (gae, value.astype(acc_dtype)), gae

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value, acc_dtype), last_value.astype(acc_dtype)),
        (traj.value, traj.reward, traj.done),
        reverse=True,
    )
    returns = advantages + traj.value
    return advantages, returns


def ppo_loss(params, cfg: PpoConfig, batch, advantages, returns,
             compute_dtype=None, kl_beta=None):
    """PPO loss on a TRANSPOSED minibatch: ``batch.obs``/``batch.action``
    are (D|A, n); scalars are (n,).  Clipped surrogate by default;
    adaptive-KL penalty when ``cfg.kl_target`` is set (``kl_beta`` is the
    carried coefficient)."""
    mean, log_std, value = networks.apply_t(params, batch.obs, compute_dtype)
    log_prob = networks.gaussian_log_prob_t(mean, log_std, batch.action)
    ratio = jnp.exp(log_prob - batch.log_prob)

    if cfg.kl_target is not None:  # static at trace time
        kl = jnp.mean(batch.log_prob - log_prob)
        pg_loss = -jnp.mean(ratio * advantages) + kl_beta * kl
    else:
        pg1 = ratio * advantages
        pg2 = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * advantages
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))

    v_clipped = batch.value + jnp.clip(
        value - batch.value, -cfg.value_clip_eps, cfg.value_clip_eps
    )
    v_loss = 0.5 * jnp.mean(
        jnp.maximum(jnp.square(value - returns), jnp.square(v_clipped - returns))
    )
    ent = networks.entropy(log_std)
    total = pg_loss + cfg.value_coef * v_loss - cfg.entropy_coef * ent
    metrics = {
        "pg_loss": pg_loss,
        "v_loss": v_loss,
        "entropy": ent,
        "approx_kl": jnp.mean(batch.log_prob - log_prob),
        "clip_frac": jnp.mean((jnp.abs(ratio - 1.0) > cfg.clip_eps).astype(jnp.float32)),
    }
    return total, metrics


def _shuffle_indices(k_perm, n: int):
    """Random permutation of [0, n).  For power-of-two n (the usual
    case), a composed mul-odd/add/xor bijection mod 2^k is an exact
    permutation and avoids jax.random.permutation's full sort — which
    costs ~250 ms per MILLION elements on TPU and dominated the whole
    update phase before this change."""
    if n & (n - 1) == 0 and n > 1:
        ks = jax.random.split(k_perm, 5)
        mask = jnp.uint32(n - 1)
        a1 = jax.random.randint(ks[0], (), 0, n // 2, jnp.uint32) * 2 + 1
        b1 = jax.random.randint(ks[1], (), 0, n, jnp.uint32)
        a2 = jax.random.randint(ks[2], (), 0, n // 2, jnp.uint32) * 2 + 1
        b2 = jax.random.randint(ks[3], (), 0, n, jnp.uint32)
        m = jax.random.randint(ks[4], (), 0, n, jnp.uint32)
        i = jnp.arange(n, dtype=jnp.uint32)
        # Compose bijections mod 2^k (mul-by-odd, add, xor): a single
        # affine map would make every minibatch one arithmetic
        # progression; the xor round breaks that structure.
        j = ((i * a1 + b1) & mask) ^ m
        return (j * a2 + b2) & mask
    return jax.random.permutation(k_perm, n)


def _fused_rollout_enabled(cfg: PpoConfig, env: EnvDef, batch: int) -> bool:
    """Static dispatch for the fused policy+env rollout kernel.  Strict
    like the throughput_rollout dispatch (envs/core.py) on step/reset
    FUNCTION identity; the live Params ride in through the kernel's SMEM
    vector, so param sweeps keep this fast path."""
    if cfg.fused_rollout == "off":
        return False
    if tuple(cfg.hidden) != (64, 64):
        return False
    from ..ops import pallas_ppo_rollout

    if not pallas_ppo_rollout.available():
        return False
    # Env eligibility via the SHARED kernel registry (envs/core.py):
    # step/reset identity with packed live params, controller identity
    # skipped (the fused rollout replaces the controller with the
    # policy).  The reward-free ids (Force-v0/Quat-v0, reinmav-v0) have
    # throughput kernels but no training workload — not covered here
    # (kernel_mismatch refuses them by name).
    if pallas_ppo_rollout.kernel_mismatch(env) is not None:
        return False
    if batch % 8 != 0 or cfg.rollout_len % 2 != 0:
        return False
    b8 = batch // 8
    if cfg.fused_rollout == "on":
        return True  # tests pick their own tile via _rollout_tile
    return jax.devices()[0].platform == "tpu" and b8 % 128 == 0


def _rollout_tile(batch: int) -> int:
    tile = min(128, batch // 8)
    while (batch // 8) % tile:
        tile //= 2
    return tile


def _collect_rollout_pallas(env: EnvDef, cfg: PpoConfig, params, obs_norm,
                            ret_norm, env_states, env_returns, key):
    """Drop-in replacement for :func:`collect_rollout` (dense8 layout)
    backed by the fused Pallas rollout kernel.  Same return contract;
    the RNG stream is the on-core PRNG seeded from ``key`` (statistically
    equivalent sampling, not bitwise — see ops/pallas_ppo_rollout)."""
    from ..ops import pallas_ppo_rollout as pr

    batch = env_states.shape[0]
    d = env.state_dim
    dtype = jnp.float32
    layers, wo, bo = networks.fused_weights(params)
    (w1, b1), (w2, b2) = layers
    ls = params["log_std"].astype(dtype)
    invstd = 1.0 / jnp.sqrt(obs_norm.var.astype(dtype) + 1e-8)
    inv_ret_std = 1.0 / jnp.sqrt(ret_norm.var.astype(dtype) + 1e-8)
    consts = jnp.concatenate([
        obs_norm.mean.astype(dtype), invstd, jnp.exp(ls), jnp.sum(ls)[None],
        inv_ret_std[None], jnp.asarray([cfg.gamma], dtype),
    ])
    seed = jax.random.randint(key, (1,), 0, 2**31 - 1, jnp.int32)
    t_chunk = 8
    while cfg.rollout_len % t_chunk:
        t_chunk //= 2
    traj_rows, fin, rets8, stats = pr.ppo_rollout_pallas(
        env.name, env_states.T.astype(dtype), env_returns.astype(dtype),
        seed,
        w1.astype(dtype), b1.reshape(1, -1).astype(dtype),
        w2.astype(dtype), b2.reshape(1, -1).astype(dtype),
        wo.astype(dtype), bo.reshape(1, -1).astype(dtype),
        consts, pr.env_params_vec(env),
        cfg.rollout_len, tile=_rollout_tile(batch), t_chunk=t_chunk,
        compute_dtype=cfg.compute_dtype,
        normalize_obs=cfg.normalize_obs,
        normalize_rewards=cfg.normalize_rewards,
    )
    T = cfg.rollout_len
    b8 = batch // 8
    a = env.action_dim
    tr = traj_rows.reshape(T, pr._NTRAJ, 8, b8)
    traj = Transition(
        obs=tr[:, :d], action=tr[:, d:d + a], log_prob=tr[:, d + a],
        value=tr[:, d + a + 1], reward=tr[:, d + a + 2],
        done=tr[:, d + a + 3] > 0.5,
    )
    final_states = fin.reshape(d, batch).T
    env_returns = rets8.reshape(batch)
    s = stats.reshape(2 * d + 3, 8, b8).sum(axis=(1, 2))
    n = jnp.asarray(T * batch, dtype)
    obs_moments = RawObsMoments(s[:d], s[d:2 * d], n)
    ret_moments = RawObsMoments(s[2 * d], s[2 * d + 1], n)
    raw_reward_mean = s[2 * d + 2] / n
    return (final_states, env_returns, jax.random.fold_in(key, T), traj,
            obs_moments, ret_moments, raw_reward_mean)


def _fused_loss_enabled(cfg: PpoConfig) -> bool:
    """Static dispatch for the Pallas fused loss kernel (never inside
    jit: checks platform + config shape support)."""
    if cfg.fused_loss == "off":
        return False
    if len(cfg.hidden) != 2 or cfg.hidden[0] != cfg.hidden[1]:
        return False
    from ..ops import pallas_ppo

    if not pallas_ppo.available():
        return False
    if cfg.fused_loss == "on":
        return True
    return jax.devices()[0].platform == "tpu"


def _fused_update_enabled(cfg: PpoConfig) -> bool:
    """Static dispatch for the one-launch full-update kernel
    (ops/pallas_ppo_update).  Requires the fused-loss preconditions;
    train_step additionally requires a single-device update (no
    axis_name) and a lane-aligned shuffle tile."""
    if cfg.fused_update == "off":
        return False
    if not _fused_loss_enabled(cfg):
        return False
    from ..ops import pallas_ppo_update

    if not pallas_ppo_update.available():
        return False
    if cfg.fused_update == "on":
        return True
    return jax.devices()[0].platform == "tpu"


def _unfuse_grads(g, hidden: int, adim: int):
    """Slice fused-stack gradients back into the tower param pytree
    (exact: each tower param IS a block of the fused matrix)."""
    h = hidden
    return {
        "pi": [
            {"w": g["w1"][:, :h], "b": g["b1"][:h]},
            {"w": g["w2"][:h, :h], "b": g["b2"][:h]},
        ],
        "vf": [
            {"w": g["w1"][:, h:], "b": g["b1"][h:]},
            {"w": g["w2"][h:, h:], "b": g["b2"][h:]},
        ],
        "pi_out": {"w": g["wo"][:h, :adim], "b": g["bo"][:adim]},
        "vf_out": {"w": g["wo"][h:, adim:], "b": g["bo"][adim:]},
        "log_std": g["log_std"],
    }


def _update_fused(cfg: PpoConfig, d: int, adim: int, params, opt_state,
                  key, data_full, flat_adv, n_tiles: int, tile: int,
                  kl_beta=None):
    """One-launch full update (ops/pallas_ppo_update).

    Precomputes every epoch's tile permutation with the SAME key stream
    as the XLA epoch scan (so the carried key advances identically),
    the per-minibatch advantage [shift, inv_scale] from the raw adv
    row, packs the fused params + Adam moments into the (R, 2H) plane,
    runs the kernel, and unpacks back into the tower pytree + optax
    state (count advanced by epochs x minibatches)."""
    from ..ops import pallas_ppo_update as ppu

    h2 = 2 * cfg.hidden[0]
    n_passes = cfg.num_epochs * cfg.num_minibatches
    perms = []
    k = key
    for _ in range(cfg.num_epochs):
        k, k_perm = jax.random.split(k)
        perms.append(_shuffle_indices(k_perm, n_tiles))
    perm_all = jnp.concatenate(perms).astype(jnp.int32)
    if cfg.normalize_advantages:
        adv_t = flat_adv.reshape(n_tiles, tile)
        tpm = n_tiles // cfg.num_minibatches
        rows = []
        for p in perms:
            a = adv_t[p.reshape(cfg.num_minibatches, tpm)]
            rows.append(jnp.stack(
                [jnp.mean(a, axis=(1, 2)),
                 1.0 / (jnp.std(a, axis=(1, 2)) + 1e-8)], axis=1))
        adv_stats = jnp.concatenate(rows)
    else:
        adv_stats = jnp.tile(jnp.asarray([[0.0, 1.0]], jnp.float32),
                             (n_passes, 1))

    def pack(tree):
        layers, wo, bo = networks.fused_weights(tree)
        (w1f, b1f), (w2f, b2f) = layers
        return ppu.pack_plane(w1f, b1f, w2f, b2f, wo, bo,
                              tree["log_std"], d, adim, h2)

    # optax.chain(clip, adam) state: (EmptyState, (ScaleByAdamState, ...)).
    adam = opt_state[1][0]
    pk, mu, nu, metrics = ppu.ppo_update_pallas(
        data_full, adv_stats, perm_all, adam.count,
        pack(params), pack(adam.mu), pack(adam.nu),
        d=d, adim=adim, h2dim=h2, tile=tile,
        n_minibatches=cfg.num_minibatches, n_epochs=cfg.num_epochs,
        clip_eps=cfg.clip_eps, value_clip_eps=cfg.value_clip_eps,
        value_coef=cfg.value_coef, ent_coef=cfg.entropy_coef,
        lr=cfg.learning_rate, max_grad_norm=cfg.max_grad_norm,
        log_std_floor=cfg.log_std_floor, compute_dtype=cfg.compute_dtype,
        kl_beta=kl_beta,
    )

    def unpack(plane):
        return _unfuse_grads(ppu.unpack_plane(plane, d, adim, h2),
                             cfg.hidden[0], adim)

    new_adam = adam._replace(count=adam.count + n_passes,
                             mu=unpack(mu), nu=unpack(nu))
    new_opt = (opt_state[0], (new_adam, opt_state[1][1]))
    return unpack(pk), new_opt, k, metrics


def train_step(env: EnvDef, cfg: PpoConfig, state: TrainState,
               dense8: bool | None = None, fused_loss: bool | None = None,
               axis_name: str | None = None,
               fused_rollout: bool | None = None,
               fused_update: bool | None = None):
    """One PPO update: rollout → GAE → epochs × minibatches of SGD.
    Pure function of TrainState; jit (optionally with the env-state batch
    sharded over a mesh) at the call site or via :func:`make_train_step`.

    ``dense8``: rollout in the sublane-dense (D, 8, B/8) view (single
    device only — :func:`make_train_step` sets it from the mesh).
    ``fused_loss``: use the Pallas fused loss-gradient kernel (None =
    :func:`_fused_loss_enabled`).
    ``axis_name``: set when running INSIDE ``shard_map`` (see
    :func:`make_train_step_shardmap`): ``state.env_states`` is the local
    shard, rollouts draw device-decorrelated streams, normalisation
    moments are ``psum``-ed, gradients/metrics ``pmean``-ed (the MPI
    data-parallel recipe), and params stay replicated.  Minibatch
    partitions and advantage normalisation are per-device, like
    baselines' PPO2 under mpirun."""
    optimizer = make_optimizer(cfg)
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    fused_loss_auto = fused_loss is None and cfg.fused_loss != "on"
    if fused_loss is None:
        fused_loss = _fused_loss_enabled(cfg)

    if axis_name is None:
        rollout_key = state.key
    else:
        rollout_key = jax.random.fold_in(
            state.key, jax.lax.axis_index(axis_name)
        )

    if fused_rollout is None:
        fused_rollout = _fused_rollout_enabled(
            cfg, env, state.env_states.shape[0]
        )
    if fused_rollout:
        (env_states, env_returns, key, traj, obs_moments, ret_moments,
         raw_reward_mean) = _collect_rollout_pallas(
            env, cfg, state.params, state.obs_norm, state.ret_norm,
            state.env_states, state.env_returns, rollout_key,
        )
    else:
        env_states, env_returns, key, traj, obs_moments, ret_moments, raw_reward_mean = collect_rollout(
            env, cfg, state.params, state.obs_norm, state.ret_norm,
            state.env_states, state.env_returns, rollout_key, dense8=dense8,
        )
    if axis_name is not None:
        # The rollout-advanced key is device-local; keep the carried key
        # replicated by advancing the master key instead, and make the
        # normalisation statistics global.
        key = jax.random.fold_in(state.key, jnp.uint32(0x9E3779B9))
        obs_moments = jax.tree.map(
            lambda x: jax.lax.psum(x, axis_name), obs_moments
        )
        ret_moments = jax.tree.map(
            lambda x: jax.lax.psum(x, axis_name), ret_moments
        )
        raw_reward_mean = jax.lax.pmean(raw_reward_mean, axis_name)
    last_obs_t = env_states.T[: env.obs_dim]
    last_norm = (
        _normalize_t(last_obs_t, state.obs_norm) if cfg.normalize_obs else last_obs_t
    )
    _, _, last_value = networks.apply_t(state.params, last_norm, cd)
    # traj scalars are (T, *batch_shape); shape last_value to match.
    batch_shape = traj.value.shape[1:]
    advantages, returns = compute_gae(cfg, traj, last_value.reshape(batch_shape))

    # Flatten to the transposed sample axis: vectors (D, n), scalars (n,).
    # Sample order is env-major (t*B + b) in both, so adjacent samples are
    # i.i.d. envs at the same timestep — the basis for tile shuffling.
    # Batch from the ARRAY shape, not cfg.num_envs: under shard_map the
    # state holds only this device's shard.
    n = cfg.rollout_len * state.env_states.shape[0]

    def flat_d(x):  # (T, D, *bs) -> (D, n)
        return jnp.moveaxis(x, 1, 0).reshape(x.shape[1], n)

    def flat_s(x):  # (T, *bs) -> (n,)
        return x.reshape(n)

    flat = Transition(
        flat_d(traj.obs), flat_d(traj.action), flat_s(traj.log_prob),
        flat_s(traj.value), flat_s(traj.reward), flat_s(traj.done),
    )
    flat_adv = flat_s(advantages)
    flat_ret = flat_s(returns)

    # Tile-granular shuffle: permute lane-aligned blocks of samples, not
    # elements (see PpoConfig.shuffle_tile).  Auto-halved until the tile
    # divides the batch AND each minibatch draws from >= 64 tiles (coarse
    # tiles at small scale make minibatches a handful of whole timesteps,
    # which measurably hurts learning).
    tile = max(1, cfg.shuffle_tile)
    while tile > 1 and (
        n % (cfg.num_minibatches * tile) != 0
        or n // tile < 64 * cfg.num_minibatches
    ):
        tile //= 2
    n_tiles = n // tile
    mb_size = n // cfg.num_minibatches

    def take_d(x, tidx):  # (D, n) -> (D, mb)
        xt = x.reshape(x.shape[0], n_tiles, tile)
        return xt[:, tidx].reshape(x.shape[0], mb_size)

    def take_s(x, tidx):  # (n,) -> (mb,)
        return x.reshape(n_tiles, tile)[tidx].reshape(mb_size)

    # Fused-loss path: the minibatch gather happens INSIDE the Pallas
    # kernel (each grid step DMAs shuffle-tile perm[i] straight from the
    # full batch — ops/pallas_ppo.ppo_loss_grads_pallas_gather), so the
    # minibatch is never materialised.  The XLA take-gathers above cost
    # ~5.5 ms/update (profiled, 1M-sample updates) because a 128-lane x
    # 1-sublane granule defeats the copy pipeline; only the (n,) adv row
    # is still gathered, for the per-minibatch normalisation moments.
    if fused_loss and fused_loss_auto and tile % 128:
        # The in-kernel gather DMAs (R8, tile) HBM slices; Mosaic needs the
        # column slice lane-aligned.  Auto-halved tiles below 128 only occur
        # at toy scales where the XLA path is equally fast — fall back.
        # (An EXPLICIT fused_loss=True is honoured: tests run the kernel in
        # interpret mode, where unaligned slices are legal.)
        fused_loss = False
    if fused_loss:
        from ..ops import pallas_ppo

        data_full = pallas_ppo.stack_batch(
            flat.obs, flat.action, flat.log_prob, flat.value,
            flat_adv, flat_ret,
        )  # (R8, n), raw advantage row — normalisation happens in-kernel

    def epoch(carry, _):
        params, opt_state, k = carry
        k, k_perm = jax.random.split(k)
        perm = _shuffle_indices(k_perm, n_tiles)

        def minibatch(carry_in, tidx):
            params_, opt_state_ = carry_in
            if fused_loss:
                from ..ops import pallas_ppo

                if cfg.normalize_advantages:
                    adv_mb = take_s(flat_adv, tidx)
                    shift = jnp.mean(adv_mb)
                    inv = 1.0 / (jnp.std(adv_mb) + 1e-8)
                else:
                    shift, inv = 0.0, 1.0
                adv_stats = jnp.stack(
                    [jnp.asarray(shift, jnp.float32),
                     jnp.asarray(inv, jnp.float32),
                     jnp.asarray(
                         0.0 if cfg.kl_target is None else state.kl_beta,
                         jnp.float32),
                     jnp.asarray(0.0, jnp.float32)]
                ).reshape(1, 4)
                fl, wo_f, bo_f = networks.fused_weights(params_)
                (w1f, b1f), (w2f, b2f) = fl
                g, pmet = pallas_ppo.ppo_loss_grads_pallas_gather(
                    data_full, adv_stats, tidx.astype(jnp.int32),
                    w1f, b1f, w2f, b2f, wo_f, bo_f, params_["log_std"],
                    d=flat.obs.shape[0], adim=env.action_dim,
                    clip_eps=cfg.clip_eps, value_clip_eps=cfg.value_clip_eps,
                    value_coef=cfg.value_coef, ent_coef=cfg.entropy_coef,
                    tile=tile, compute_dtype=cfg.compute_dtype,
                    kl_mode=cfg.kl_target is not None,
                )
                grads = _unfuse_grads(g, cfg.hidden[0], env.action_dim)
                metrics = {**pmet, "entropy": networks.entropy(params_["log_std"])}
            else:
                mb = Transition(
                    take_d(flat.obs, tidx), take_d(flat.action, tidx),
                    take_s(flat.log_prob, tidx), take_s(flat.value, tidx),
                    take_s(flat.reward, tidx), take_s(flat.done, tidx),
                )
                adv = take_s(flat_adv, tidx)
                if cfg.normalize_advantages:
                    adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
                ret = take_s(flat_ret, tidx)
                (_, metrics), grads = jax.value_and_grad(ppo_loss, has_aux=True)(
                    params_, cfg, mb, adv, ret, cd, state.kl_beta
                )
            if axis_name is not None:
                # Cross-device gradient average (the MPI allreduce role);
                # params stay bitwise-replicated because every device
                # applies the identical averaged update.
                grads = jax.lax.pmean(grads, axis_name)
                metrics = jax.lax.pmean(metrics, axis_name)
            updates, opt_state_ = optimizer.update(grads, opt_state_, params_)
            params_ = optax.apply_updates(params_, updates)
            if cfg.log_std_floor is not None:  # static at trace time
                params_ = {**params_, "log_std": jnp.maximum(
                    params_["log_std"], cfg.log_std_floor)}
            return (params_, opt_state_), metrics

        idxs = perm.reshape(cfg.num_minibatches, n_tiles // cfg.num_minibatches)
        (params, opt_state), metrics = jax.lax.scan(minibatch, (params, opt_state), idxs)
        return (params, opt_state, k), metrics

    if fused_update is None:
        fused_update = _fused_update_enabled(cfg)
    fused_update = fused_update and fused_loss and axis_name is None
    if fused_update:
        params, opt_state, key, metrics = _update_fused(
            cfg, flat.obs.shape[0], env.action_dim, state.params,
            state.opt_state, key, data_full, flat_adv, n_tiles, tile,
            kl_beta=(None if cfg.kl_target is None else state.kl_beta),
        )
    else:
        (params, opt_state, key), metrics = jax.lax.scan(
            epoch, (state.params, state.opt_state, key), None,
            length=cfg.num_epochs,
        )

    obs_norm = (
        _update_obs_norm(state.obs_norm, obs_moments)
        if cfg.normalize_obs
        else state.obs_norm
    )
    ret_norm = (
        _update_ret_norm(state.ret_norm, ret_moments)
        if cfg.normalize_rewards
        else state.ret_norm
    )
    kl_beta = state.kl_beta
    if cfg.kl_target is not None:
        # Adapt on the LAST epoch's measured KL (baselines ppo1 recipe).
        # The one-launch kernel reports it directly (scalar metrics);
        # the per-minibatch loop stacks metrics (epochs, minibatches).
        if fused_update:
            measured = metrics.pop("approx_kl_last")
        else:
            measured = jnp.mean(metrics["approx_kl"][-1])
        kl_beta = jnp.where(measured > 1.5 * cfg.kl_target, kl_beta * 2.0,
                            jnp.where(measured < cfg.kl_target / 1.5,
                                      kl_beta * 0.5, kl_beta))
        kl_beta = jnp.clip(kl_beta, 1e-4, 64.0)
    new_state = TrainState(
        params, opt_state, env_states, obs_norm, ret_norm, env_returns,
        key, state.update_step + 1, kl_beta,
    )
    done_frac = jnp.mean(traj.done.astype(jnp.float32))
    if axis_name is not None:
        done_frac = jax.lax.pmean(done_frac, axis_name)
    summary = {
        "mean_reward": raw_reward_mean,  # RAW reward (traj.reward is scaled)
        "mean_episode_done_frac": done_frac,
        **{name: jnp.mean(val) for name, val in metrics.items()},
    }
    return new_state, summary


def train_many(env: EnvDef, cfg: PpoConfig, state: TrainState, num_updates: int,
               dense8: bool | None = None, fused_loss: bool | None = None,
               fused_rollout: bool | None = None):
    """Run ``num_updates`` PPO updates inside one compiled program
    (``lax.scan`` over :func:`train_step`).

    On a remote/tunnelled TPU runtime each dispatch costs milliseconds;
    folding updates amortises that and lets XLA overlap host transfers.
    Returns the final state and stacked per-update metric means.
    """

    def body(s, _):
        s, metrics = train_step(env, cfg, s, dense8=dense8,
                                fused_loss=fused_loss,
                                fused_rollout=fused_rollout)
        return s, metrics

    state, stacked = jax.lax.scan(body, state, None, length=num_updates)
    # Average the per-update metrics INSIDE the compiled program: on a
    # tunnelled runtime every tiny post-hoc `.mean()` dispatch costs a
    # round trip (~0.5 s for the full dict, measured) — the driver loop
    # must only transfer ready scalars.
    return state, {name: val.mean(axis=0) for name, val in stacked.items()}


def state_shardings(mesh) -> TrainState:
    """The TrainState sharding contract on a mesh: env batch sharded,
    everything else replicated.  Also the ``out_shardings`` to use when
    building a *global* TrainState in a multi-process run::

        make_state = jax.jit(partial(ppo.init_train_state, env, cfg),
                             out_shardings=ppo.state_shardings(mesh))
    """
    from ..parallel.mesh import batch_sharding, replicated

    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return TrainState(
        params=rep, opt_state=rep, env_states=bs,
        obs_norm=ObsNorm(rep, rep, rep), ret_norm=RetNorm(rep, rep),
        env_returns=bs, key=rep, update_step=rep, kl_beta=rep,
    )


def make_train_many(env: EnvDef, cfg: PpoConfig, num_updates: int, mesh=None):
    """Jitted multi-update train function (see :func:`make_train_step` for
    the sharding contract)."""
    fn = partial(train_many, env, cfg, num_updates=num_updates,
                 dense8=(None if mesh is None else False),
                 fused_loss=(None if mesh is None else False),
                 fused_rollout=(None if mesh is None else False))
    if mesh is None:
        return jax.jit(fn)

    from ..parallel.mesh import replicated

    ss = state_shardings(mesh)
    rep = replicated(mesh)
    return jax.jit(fn, in_shardings=(ss,), out_shardings=(ss, rep))


def _shard_map_fn():
    try:
        from jax import shard_map  # jax >= 0.8 (takes check_vma=)

        return shard_map
    except ImportError:  # pragma: no cover
        # The experimental module's kwarg is check_rep; translate so the
        # compatibility branch actually runs instead of TypeError-ing.
        from jax.experimental.shard_map import shard_map as _sm_experimental

        def shard_map(f, *, mesh, in_specs, out_specs, check_vma):
            return _sm_experimental(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_rep=check_vma,
            )

        return shard_map


def _make_shardmap(env: EnvDef, cfg: PpoConfig, mesh, num_updates: int | None):
    """Shared builder for the shard_map train step / train_many."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import BATCH_AXIS

    n_dev = mesh.devices.size
    if cfg.num_envs % n_dev != 0:
        raise ValueError(
            f"num_envs {cfg.num_envs} not divisible by mesh size {n_dev}"
        )

    bs = P(BATCH_AXIS)
    rep = P()
    state_specs = TrainState(
        params=rep, opt_state=rep, env_states=bs,
        obs_norm=ObsNorm(rep, rep, rep), ret_norm=RetNorm(rep, rep),
        env_returns=bs, key=rep, update_step=rep, kl_beta=rep,
    )
    step = partial(train_step, env, cfg, axis_name=BATCH_AXIS)
    if num_updates is None:
        body = step
    else:
        def body(state):
            def one(s, _):
                return step(s)

            state, stacked = jax.lax.scan(one, state, None, length=num_updates)
            # Metric means computed in-program (device-local values are
            # already pmean'd identical across devices).
            return state, {k: v.mean(axis=0) for k, v in stacked.items()}

    fn = _shard_map_fn()(
        body, mesh=mesh, in_specs=(state_specs,),
        out_specs=(state_specs, rep), check_vma=False,
    )
    return jax.jit(fn)


def make_train_step_shardmap(env: EnvDef, cfg: PpoConfig, mesh):
    """Multi-chip train step via ``shard_map`` — the FAST mesh path.

    Unlike :func:`make_train_step`'s jit-sharding mode (which must
    disable the sublane-dense rollout view and the fused Pallas loss
    because both are single-device constructs), shard_map makes every
    array device-local: each chip rolls out its env shard in the
    (D, 8, B_local/8) view, runs the fused loss kernel on its local
    minibatches, and only the gradient ``pmean`` crosses ICI.

    Semantics are the MPI data-parallel recipe (baselines PPO2 under
    mpirun): per-device rollout streams/minibatch partitions/advantage
    normalisation, globally-averaged gradients and normalisation
    statistics — NOT bitwise-identical to a single-device run, but the
    same algorithm at N× the batch.  Requires ``cfg.num_envs`` divisible
    by the mesh size (and by 8× mesh size for the dense view).
    """
    return _make_shardmap(env, cfg, mesh, None)


def make_train_many_shardmap(env: EnvDef, cfg: PpoConfig, num_updates: int, mesh):
    """K shard_map train updates folded into ONE compiled dispatch (a
    ``lax.scan`` over the shard_map body) — on tunnelled/remote runtimes
    the per-dispatch floor (~25 ms here) would otherwise cost the fast
    mesh path what the single-chip path amortises away.  Returns
    ``(state, per-update-averaged metrics)`` like :func:`train_many`."""
    return _make_shardmap(env, cfg, mesh, num_updates)


def make_train_step(env: EnvDef, cfg: PpoConfig, mesh=None):
    """Jitted train step; when ``mesh`` is given, the env-state batch is
    sharded over it and params/optimizer are replicated — XLA then emits
    the gradient all-reduce over ICI (the MPI-allreduce replacement).
    The sublane-dense rollout view is disabled on a mesh (its (8, B/8)
    reshape crosses shard boundaries)."""
    # On a mesh the dense8 view, the fused Pallas loss, and the fused
    # rollout kernel are disabled: the (8, B/8) reshape and the
    # pallas_calls would cross shard boundaries (multi-chip jit-sharding
    # keeps the XLA paths; shard_map keeps the fast ones per device).
    step = partial(train_step, env, cfg, dense8=(None if mesh is None else False),
                   fused_loss=(None if mesh is None else False),
                   fused_rollout=(None if mesh is None else False))
    if mesh is None:
        return jax.jit(step)

    from ..parallel.mesh import replicated

    ss = state_shardings(mesh)
    rep = replicated(mesh)
    return jax.jit(step, in_shardings=(ss,), out_shardings=(ss, rep))
