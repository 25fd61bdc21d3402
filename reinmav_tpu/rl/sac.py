"""Soft Actor-Critic — off-policy learner, fully jitted, TPU-native.

Generalises the learner layer beyond on-policy PPO: the reference's
``run.py`` could resolve ANY baselines algorithm module (off-policy ddpg
included, ``gym_reinmav/run.py:125-138``); this module is the off-policy
representative, re-designed TPU-first rather than transcribed:

* **Replay buffer lives on the TPU** as ONE feature-major ``(R, C)``
  float32 array (rows: obs, action, reward, next_obs, done) — the
  transposed layout the whole framework uses.  Inserts are
  ``lax.dynamic_update_slice`` column blocks; ``C`` is rounded to a
  multiple of the per-iteration insert width so a write NEVER
  straddles the ring edge (static shapes, no modular two-piece
  writes).  Sampling gathers one COLUMN per transition via a vmapped
  ``dynamic_slice`` — measured ~3.5× faster than XLA's fancy-index
  gather at 8192 samples (benchmarks/sac_gather_probe.py; the gather
  op pays a high per-index cost that dominates regardless of ring
  layout — a sample-major (capacity, R) ring measured the same gather
  time while tripling ring memory and insert traffic, so feature-major
  stays).  Nothing ever crosses the host boundary.
* **The entire train loop is one compiled program**: a ``lax.scan`` over
  iterations, each = one batched env step (auto-reset, transposed
  layout) + buffer insert + ``grad_steps`` gradient updates + polyak
  target blend.  No per-transition Python, no host replay memory.
* Warmup (uniform-random actions, no updates) is handled INSIDE the
  compiled loop with masks — both branches are traced once; the mask
  flips as the iteration counter passes the thresholds.

Algorithm: twin Q networks with min-clipping, tanh-squashed
state-dependent Gaussian policy, entropy temperature alpha auto-tuned to
``target_entropy`` (default -action_dim).  Actions are stored and fed to
the critics in policy space [-1, 1]; the env boundary applies the affine
map to ``[env.action_low, env.action_high]``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import math

import jax
import jax.numpy as jnp
import optax

from ..envs.core import EnvDef, StepOut
from . import networks

LOG_STD_MIN = -20.0
LOG_STD_MAX = 2.0


class SacConfig(NamedTuple):
    num_envs: int = 256
    buffer_capacity: int = 1 << 20
    batch_size: int = 2048
    learning_rate: float = 3e-4
    alpha_lr: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005               # polyak blend for target critics
    target_entropy: float | None = None  # None -> -action_dim
    init_log_alpha: float = 0.0
    hidden: tuple = (256, 256)
    grad_steps: int = 1              # gradient updates per env step
    warmup_steps: int = 10_000       # total uniform-random env steps
    reward_scale: float = 1.0
    max_grad_norm: float | None = None
    # "bfloat16": matmul INPUTS cast to bf16 (f32 accumulation, params and
    # optimizer state stay f32) and the ReLU autodiff residual stored bf16
    # — the (H, batch) hidden tensors are the update phase's HBM cost,
    # exactly the PPO recipe (networks.apply_t / _tanh_bf16_residual).
    compute_dtype: str = "float32"
    # NOTE: a one-launch fused UPDATE kernel (ops/pallas_sac_update)
    # existed in r3-r4 and was DELETED after losing its on-chip A/B
    # twice (0.95x r3, 0.88x r4 — results.json keeps both measurements;
    # docs/scaling.md records the dated negative result and why the
    # "launch glue" it targeted was really the per-dispatch floor).
    # One-launch fused COLLECTION phase (ops/pallas_offpolicy): actor
    # MLP + tanh-Gaussian sampling + warmup gating + action scaling +
    # env step + auto-reset + replay-block assembly as ONE Pallas
    # kernel per iteration; the ring insert stays a single in-place
    # dynamic_update_slice on the donated buffer.  "auto" = on for the
    # five reward-bearing env IDs on a single TPU device with default
    # params and 2-layer hidden; "on" forces (tests/interpret).  The
    # kernel samples from the on-core PRNG — statistically equivalent
    # to the scan path, not bitwise (differential test pins the ε→0
    # limit bitwise; tests/test_pallas_offpolicy.py).
    fused_collect: str = "auto"
    # Replay-sampling granularity.  "auto" (default) = exact uniform
    # tile=1 — the r4 vmapped-dynamic-slice gather made scattered
    # sampling ~3.5x cheaper (see buffer_sample), so correlated tiles
    # no longer buy a worthwhile speedup, and they measurably HURT:
    # tile>1 gathers contiguous column blocks = same-iteration env
    # cohorts, NOT i.i.d. — on the deterministic-reset hover env a
    # 60M-step tile=128 run never reached survival (r3), and at
    # grad_steps=16 tile=128 AND tile=8 drop a solving 20M-step run
    # from survival 1.0 (r4, two seeds, results.json
    # sac_tile_learning_ab) even gated on every env having terminated
    # once — reset cohorts stay correlated.  The int knob remains for
    # experiments on stochastic-reset envs only.
    sample_tile: int | str = "auto"


class SacState(NamedTuple):
    actor: Any
    q1: Any
    q2: Any
    q1_target: Any
    q2_target: Any
    log_alpha: jnp.ndarray
    opt_actor: Any
    opt_q: Any
    opt_alpha: Any
    buffer: jnp.ndarray      # (R, C) feature-major ring
    ptr: jnp.ndarray         # int32: next insert column
    filled: jnp.ndarray      # int32: valid columns (<= C)
    env_states: jnp.ndarray  # (B, state_dim) row layout at the API edge
    key: jax.Array
    total_steps: jnp.ndarray  # int64-safe int32 env-step counter
    ever_done: jnp.ndarray   # (B,) f32: 1 once the env has terminated at
    #                          least once (the desync_frac metric)


# ---------------------------------------------------------------------------
# networks (transposed: features leading, batch trailing — matmul-dense)
# ---------------------------------------------------------------------------


def _mlp_init(key, dims, dtype=jnp.float32):
    layers = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        k = jax.random.fold_in(key, i)
        scale = 1e-2 if i == len(dims) - 2 else jnp.sqrt(2.0)
        w = jax.nn.initializers.orthogonal(scale)(k, (din, dout), dtype)
        layers.append({"w": w, "b": jnp.zeros((dout,), dtype)})
    return layers


@jax.custom_vjp
def _relu_bf16_residual(x):
    """ReLU whose saved backward residual is bf16 — the (H, batch) hidden
    tensors are the update phase's HBM cost, and the residual is what
    autodiff materialises between forward and backward (the SAC/TD3
    analogue of networks._tanh_bf16_residual; ReLU only needs the sign
    of the activation, which bf16 preserves exactly for normals)."""
    return jax.nn.relu(x)


def _relu_bf16_fwd(x):
    h = jax.nn.relu(x)
    return h, h.astype(jnp.bfloat16)


def _relu_bf16_bwd(h16, g):
    return (g * (h16 > 0).astype(g.dtype),)


_relu_bf16_residual.defvjp(_relu_bf16_fwd, _relu_bf16_bwd)


def _dot_t(w, x_t, cd):
    """(din, dout)ᵀ·(din, batch) with optional reduced-precision inputs
    (f32 accumulation either way)."""
    if cd is not None:
        return jax.lax.dot_general(
            w.astype(cd), x_t.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        w, x_t, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mlp_t(layers, x_t, cd=None):
    """ReLU MLP on (features, batch); linear final layer.

    ``cd``: optional compute dtype (e.g. ``jnp.bfloat16``) for matmul
    inputs; accumulation, bias add, and the nonlinearity stay f32."""
    for i, layer in enumerate(layers):
        x_t = _dot_t(layer["w"], x_t, cd) + layer["b"][:, None]
        if i < len(layers) - 1:
            x_t = (_relu_bf16_residual(x_t) if cd is not None
                   else jax.nn.relu(x_t))
    return x_t


def twin_mlp_t(la, lb, x_t, cd=None):
    """BOTH critics on one shared input in one stacked pass -> (ya, yb).

    Two 256-wide MLP chains run back-to-back leave the MXU half-scheduled
    and double the kernel count inside the update scan; stacking makes
    layer 0 ONE (din, 2H) matmul and every later layer a (2, H, H)
    batched matmul — same contractions element-for-element, so the
    parameter pytrees (and checkpoints) stay the separate q1/q2 trees.
    """
    # layer 0: concat output dims — one wide matmul on the shared input.
    w0 = jnp.concatenate([la[0]["w"], lb[0]["w"]], axis=1)       # (din, 2H)
    b0 = jnp.concatenate([la[0]["b"], lb[0]["b"]])               # (2H,)
    h = la[0]["b"].shape[0]
    x = _dot_t(w0, x_t, cd) + b0[:, None]                        # (2H, B)
    x = _relu_bf16_residual(x) if cd is not None else jax.nn.relu(x)
    x = x.reshape(2, h, x.shape[-1])                             # (2, H, B)
    for i in range(1, len(la)):
        w = jnp.stack([la[i]["w"], lb[i]["w"]])                  # (2, din, dout)
        b = jnp.stack([la[i]["b"], lb[i]["b"]])                  # (2, dout)
        if cd is not None:
            x = jax.lax.dot_general(
                w.astype(cd), x.astype(cd), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) + b[:, :, None]
        else:
            x = jax.lax.dot_general(
                w, x, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) + b[:, :, None]
        if i < len(la) - 1:
            x = _relu_bf16_residual(x) if cd is not None else jax.nn.relu(x)
    return x[0, 0], x[1, 0]                                      # (B,), (B,)


def twin_q_value_t(qa, qb, obs_t, act_t, cd=None):
    """Stacked twin-critic values -> ((batch,), (batch,))."""
    x = jnp.concatenate([obs_t, act_t], axis=0)
    return twin_mlp_t(qa, qb, x, cd)


def init_sac_params(key, obs_dim: int, action_dim: int, hidden):
    ka, k1, k2 = jax.random.split(key, 3)
    actor = _mlp_init(ka, (obs_dim, *hidden, 2 * action_dim))
    q1 = _mlp_init(k1, (obs_dim + action_dim, *hidden, 1))
    q2 = _mlp_init(k2, (obs_dim + action_dim, *hidden, 1))
    return actor, q1, q2


def actor_dist_t(actor, obs_t, action_dim: int, cd=None):
    """-> (mean_t, log_std_t), each (A, batch); log_std clamped to the
    standard SAC range."""
    out = _mlp_t(actor, obs_t, cd)
    mean = out[:action_dim]
    # f32 clip bounds: python-float bounds promote through f64 under an
    # x64 config, which Mosaic cannot cast when this runs inside the
    # fused-update kernel (tests/test_tpu_export.py).
    log_std = jnp.clip(out[action_dim:], jnp.float32(LOG_STD_MIN),
                       jnp.float32(LOG_STD_MAX))
    return mean, log_std


def sample_squashed_eps_t(actor, obs_t, eps, action_dim: int, cd=None):
    """Reparameterised tanh-Gaussian sample from PRECOMPUTED standard-
    normal draws ``eps`` (A, batch) -> (action_t in [-1,1], log_prob
    (batch,)).  The squash correction uses the numerically stable
    identity log(1 - tanh(u)^2) = 2(log 2 - u - softplus(-2u)).
    Separated from the key-based wrapper so tests (and fused kernels)
    can inject exact draws; the wrapper draws with the same
    shape/key, keeping the key stream bitwise-identical."""
    mean, log_std = actor_dist_t(actor, obs_t, action_dim, cd)
    std = jnp.exp(log_std)
    u = mean + std * eps
    a = jnp.tanh(u)
    logp_u = jnp.sum(
        -0.5 * jnp.square((u - mean) / std) - log_std
        - 0.5 * math.log(2.0 * math.pi),
        axis=0,
    )
    squash = jnp.sum(
        2.0 * (math.log(2.0) - u - jax.nn.softplus(-2.0 * u)), axis=0)
    return a, logp_u - squash


def sample_squashed_t(actor, obs_t, key, action_dim: int, cd=None):
    """Key-based wrapper of :func:`sample_squashed_eps_t`."""
    shape = (action_dim,) + obs_t.shape[1:]
    eps = jax.random.normal(key, shape, jnp.float32)
    return sample_squashed_eps_t(actor, obs_t, eps, action_dim, cd)


def q_value_t(q, obs_t, act_t, cd=None):
    """Single-critic helper: -> (batch,) values."""
    return _mlp_t(q, jnp.concatenate([obs_t, act_t], axis=0), cd)[0]


# ---------------------------------------------------------------------------
# replay buffer
# ---------------------------------------------------------------------------


def _row_dims(env: EnvDef):
    d, a = env.obs_dim, env.action_dim
    return d + a + 1 + d + 1  # obs, action, reward, next_obs, done


def _capacity(cfg: SacConfig, env: EnvDef) -> int:
    """Ring capacity rounded DOWN to a multiple of the insert width so a
    block write never straddles the edge."""
    c = (cfg.buffer_capacity // cfg.num_envs) * cfg.num_envs
    if c < max(cfg.batch_size, cfg.num_envs):
        raise ValueError(
            f"buffer_capacity {cfg.buffer_capacity} too small for "
            f"num_envs {cfg.num_envs} / batch {cfg.batch_size}"
        )
    return c


def buffer_insert(buffer, ptr, filled, block):
    """Insert a (R, n) column block at ``ptr`` (never straddles: capacity
    is a multiple of n).  Returns (buffer, ptr, filled)."""
    n = block.shape[1]
    cap = buffer.shape[1]
    # The ring is float32 by design (HBM footprint); on the float64 CPU
    # test backend the env block arrives wider — cast at the boundary.
    buffer = jax.lax.dynamic_update_slice(
        buffer, block.astype(buffer.dtype), (jnp.zeros((), ptr.dtype), ptr)
    )
    ptr = jnp.where(ptr + n >= cap, 0, ptr + n).astype(jnp.int32)
    filled = jnp.minimum(filled + n, cap).astype(jnp.int32)
    return buffer, ptr, filled


def buffer_sample(buffer, filled, key, batch: int, tile: int = 1):
    """Uniform (R, batch) column sample from the filled prefix, gathered
    as one vmapped single-column ``dynamic_slice`` per transition —
    identical samples to a fancy-index gather, ~3.5× faster lowering on
    TPU (measured 0.12 vs 0.43 ms per 8192-sample gather,
    benchmarks/sac_gather_probe.py: XLA's gather op pays a high
    per-index cost that the slice loop avoids).

    ``tile > 1``: gather ``batch/tile`` random contiguous (R, tile)
    blocks instead — same-iteration env cohorts, NOT i.i.d.: measured
    collapses on the deterministic-reset hover env (r3: a 60M-step
    tile=128 run never reached survival; r4: at grad_steps=16 tile=128
    AND tile=8 drop a solving run from survival 1.0, seeds committed in
    results.json).  Kept for experiments on stochastic-reset envs only.
    """
    # uniform * filled (floor) instead of randint: dynamic maxval without
    # host involvement; the modulo bias at 2^-24 granularity is nil.
    if tile <= 1:
        u = jax.random.uniform(key, (batch,), jnp.float32)
        idx = jnp.minimum((u * filled.astype(jnp.float32)).astype(jnp.int32),
                          filled - 1)
        cols = jax.vmap(
            lambda i: jax.lax.dynamic_slice(
                buffer, (jnp.zeros((), idx.dtype), i),
                (buffer.shape[0], 1))
        )(idx)                               # (batch, R, 1)
        return jnp.moveaxis(cols[:, :, 0], 0, 1)
    n = batch // tile
    n_filled = jnp.maximum(filled // tile, 1)  # pre-warmup: gate is closed
    u = jax.random.uniform(key, (n,), jnp.float32)
    idx = jnp.minimum((u * n_filled.astype(jnp.float32)).astype(jnp.int32),
                      n_filled - 1)
    # vmapped dynamic_slice lowers to a (R, tile)-slice gather — no
    # relayout of the big ring.
    blocks = jax.vmap(
        lambda i: jax.lax.dynamic_slice(
            buffer, (jnp.zeros((), idx.dtype), i * tile),
            (buffer.shape[0], tile),
        )
    )(idx)                                   # (n, R, tile)
    return jnp.moveaxis(blocks, 0, 1).reshape(buffer.shape[0], batch)


# ---------------------------------------------------------------------------
# losses / update
# ---------------------------------------------------------------------------


def _critic_loss_eps(q_params, cfg, env, batch_rows, target_q, eps, actor,
                     log_alpha, cd=None):
    """MSE of both critics against the soft Bellman target, with the
    target-action Gaussian draw passed in as ``eps`` (A, batch) —
    key-free so tests (and future fused paths) can inject exact draws.

    ``batch_rows`` is the sampled (R, batch) block (see _row_dims).
    """
    d, a = env.obs_dim, env.action_dim
    obs = batch_rows[:d]
    act = batch_rows[d:d + a]
    rew = batch_rows[d + a]
    nobs = batch_rows[d + a + 1:2 * d + a + 1]
    done = batch_rows[2 * d + a + 1]

    twin_fn = twin_q_value_t
    q1t, q2t = target_q
    na, nlogp = sample_squashed_eps_t(actor, nobs, eps, a, cd)
    tq = jnp.minimum(*twin_fn(q1t, q2t, nobs, na, cd))
    alpha = jnp.exp(log_alpha)
    target = rew * cfg.reward_scale + cfg.gamma * (1.0 - done) * (
        tq - alpha * nlogp
    )
    target = jax.lax.stop_gradient(target)
    q1v, q2v = twin_fn(q_params["q1"], q_params["q2"], obs, act, cd)
    loss = jnp.mean(jnp.square(q1v - target) + jnp.square(q2v - target))
    return loss, (jnp.mean(q1v), jnp.mean(target))


def critic_loss(q_params, cfg, env, batch_rows, target_q, key, actor,
                log_alpha, cd=None):
    """Key-based wrapper of :func:`_critic_loss_eps` (same draw shape
    and key as ``sample_squashed_t`` would use)."""
    a = env.action_dim
    eps = jax.random.normal(key, (a,) + batch_rows.shape[1:], jnp.float32)
    return _critic_loss_eps(q_params, cfg, env, batch_rows, target_q, eps,
                            actor, log_alpha, cd)


def _actor_alpha_loss_eps(aa_params, cfg, env, batch_rows, q1, q2, eps,
                          target_entropy, cd=None):
    """Actor + temperature loss with the resample draw passed in as
    ``eps`` (A, batch) — the key-free core (see _critic_loss_eps)."""
    d, a = env.obs_dim, env.action_dim
    twin_fn = twin_q_value_t
    obs = batch_rows[:d]
    act_s, logp = sample_squashed_eps_t(aa_params["actor"], obs, eps, a, cd)
    qmin = jnp.minimum(*twin_fn(q1, q2, obs, act_s, cd))
    alpha = jnp.exp(jax.lax.stop_gradient(aa_params["log_alpha"]))
    pi_loss = jnp.mean(alpha * logp - qmin)
    # alpha gradient: d/d log_alpha of -log_alpha*(logp + H*) with logp
    # detached (standard auto-temperature objective).
    a_loss = -aa_params["log_alpha"] * jnp.mean(
        jax.lax.stop_gradient(logp) + target_entropy
    )
    return pi_loss + a_loss, (pi_loss, -jnp.mean(logp), alpha)


def actor_alpha_loss(aa_params, cfg, env, batch_rows, q1, q2, key,
                     target_entropy, cd=None):
    """Key-based wrapper of :func:`_actor_alpha_loss_eps`."""
    a = env.action_dim
    eps = jax.random.normal(key, (a,) + batch_rows.shape[1:], jnp.float32)
    return _actor_alpha_loss_eps(aa_params, cfg, env, batch_rows, q1, q2,
                                 eps, target_entropy, cd)


def _scale_action_t(env: EnvDef, a_t):
    """[-1,1] policy space -> env action range, transposed ``(A, B)``
    layout.  Uses the env's PHYSICAL per-dim bounds when declared
    (``EnvDef.action_low_phys`` — the Q11 remedy: quadrotor3d-v0's
    gym-space box [0,10]^4 forbids the negative body rates its own
    dynamics/controller require), else the scalar gym-space bounds."""
    lo, hi = env.physical_action_bounds()
    if getattr(lo, "ndim", 0):  # per-dim (A,) -> broadcast over columns
        lo, hi = lo[:, None], hi[:, None]
    return lo + (a_t + 1.0) * (0.5 * (hi - lo))


def _autoreset_dense8(env: EnvDef, states_t, actions_t, key) -> StepOut:
    """Autoreset env step in the sublane-dense (D, 8, B/8) view,
    flattened back to (D, B).

    A (D, B) elementwise op keeps only D of every 8 sublanes busy
    (D≈13-23 pads to 16/24); the (D, 8, B/8) view fills all 8 — the
    same trick as the rollout scans (envs/core.py vstep_t8, measured
    ~5x there).  The reshapes relayout only the (D, B) state/action
    planes (~10 MB at B=65536), far cheaper than the win on the env
    math.  Column b maps to (b // (B/8), b % (B/8)) and back — the
    surrounding (D, B) tensors stay aligned."""
    dd, b = states_t.shape
    out = env.autoreset_step_t8(
        states_t.reshape(dd, 8, b // 8),
        actions_t.reshape(actions_t.shape[0], 8, b // 8),
        key,
    )
    tr = None if out.truncated is None else out.truncated.reshape(b)
    return StepOut(out.state.reshape(dd, b), out.obs.reshape(-1, b),
                   out.reward.reshape(b), out.done.reshape(b), tr)


def make_optimizers(cfg: SacConfig):
    def maybe_clip(tx):
        if cfg.max_grad_norm is not None:
            return optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
        return tx

    return (
        maybe_clip(optax.adam(cfg.learning_rate)),   # actor (+alpha piggybacks)
        maybe_clip(optax.adam(cfg.learning_rate)),   # critics
        optax.adam(cfg.alpha_lr),                    # alpha
    )


def _fused_collect_enabled(cfg, env: EnvDef, b_local: int) -> bool:
    """Static dispatch for the one-launch collection kernel (shared by
    SAC and TD3/DDPG configs — both carry ``fused_collect``/``hidden``)."""
    if cfg.fused_collect == "off":
        return False
    if len(cfg.hidden) != 2 or b_local % 8:
        return False
    from ..ops import pallas_offpolicy as pop

    if not pop.available() or not pop.supported(env):
        return False
    from ..ops import pallas_ppo_rollout as ppr

    # The kernel bakes in the registry step/reset FNS; the live Params
    # ride in through the SMEM vector (the classical controller is
    # irrelevant here — the policy acts).
    if ppr.kernel_mismatch(env) is not None:
        return False
    if cfg.fused_collect == "on":
        return True
    return jax.devices()[0].platform == "tpu"


def _collect_tile(b_local: int) -> int:
    """Largest lane tile (≤128) dividing the dense8 column count."""
    import math

    return math.gcd(b_local // 8, 128)


def _collect_consts(env: EnvDef, warm_gate, explore_noise: float):
    """The kernel's f32 consts vector [warm_gate, explore_noise, lo(A),
    hi(A)] (see ops/pallas_offpolicy)."""
    a = env.action_dim
    lo, hi = env.physical_action_bounds()
    lo = jnp.broadcast_to(jnp.asarray(lo, jnp.float32), (a,))
    hi = jnp.broadcast_to(jnp.asarray(hi, jnp.float32), (a,))
    return jnp.concatenate([
        warm_gate.astype(jnp.float32)[None],
        jnp.full((1,), explore_noise, jnp.float32), lo, hi,
    ])


def init_state(env: EnvDef, cfg: SacConfig, key: jax.Array) -> SacState:
    k_params, k_env, k_loop = jax.random.split(key, 3)
    actor, q1, q2 = init_sac_params(k_params, env.obs_dim, env.action_dim,
                                    cfg.hidden)
    opt_a, opt_q, opt_al = make_optimizers(cfg)
    log_alpha = jnp.asarray(cfg.init_log_alpha, jnp.float32)
    cap = _capacity(cfg, env)
    return SacState(
        actor=actor, q1=q1, q2=q2,
        q1_target=jax.tree.map(jnp.copy, q1),
        q2_target=jax.tree.map(jnp.copy, q2),
        log_alpha=log_alpha,
        opt_actor=opt_a.init(actor),
        opt_q=opt_q.init({"q1": q1, "q2": q2}),
        opt_alpha=opt_al.init(log_alpha),
        buffer=jnp.zeros((_row_dims(env), cap), jnp.float32),
        ptr=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
        env_states=env.vreset(jax.random.split(k_env, cfg.num_envs)),
        key=k_loop,
        total_steps=jnp.zeros((), jnp.int32),
        ever_done=jnp.zeros((cfg.num_envs,), jnp.float32),
    )


def resolve_sample_tile(cfg, b_local: int):
    """``sample_tile`` -> (static tile width, auto flag).  "auto" IS
    exact uniform tile=1 (the vmapped-slice gather already made
    scattered sampling cheap — nothing left for tiles to buy except the
    measured learning-collapsing cohort correlation; see
    SacConfig.sample_tile)."""
    tile = cfg.sample_tile
    if tile == "auto":
        return 1, False
    if not isinstance(tile, int):
        raise ValueError(f"sample_tile must be an int or 'auto', got {tile}")
    return tile, False


def make_sampler(cfg, buffer, filled, tile: int, auto_tile: bool, desync):
    """The per-update replay sampler closure.  ``auto_tile``/``desync``
    are retained for signature stability; auto now always resolves to
    tile=1 (see resolve_sample_tile)."""
    del auto_tile, desync
    fil = jnp.maximum(filled, 1)

    def sample_rows(k_s):
        return buffer_sample(buffer, fil, k_s, cfg.batch_size, tile=tile)

    return sample_rows


def train_iters(env: EnvDef, cfg: SacConfig, state: SacState,
                num_iters: int, axis_name: str | None = None):
    """Run ``num_iters`` SAC iterations (each: one batched env step +
    ``cfg.grad_steps`` updates) as ONE compiled scan.  Returns
    ``(state, metrics)`` with metrics averaged over the scan in-jit
    (single host fetch — tunnel rule, CLAUDE.md).

    ``axis_name``: set when running INSIDE ``shard_map``
    (:func:`make_train_iters` with a mesh): ``env_states`` and the
    replay ring are the device-local shards, the action/reset/sample
    streams are device-decorrelated, and gradients/metrics are
    ``pmean``-ed so the replicated params see the MPI data-parallel
    recipe (per-device replay batches, globally-averaged gradients —
    effective batch = ``batch_size × n_devices``, mirroring the PPO
    shard_map semantics, ppo.make_train_step_shardmap)."""
    opt_a, opt_q, opt_al = make_optimizers(cfg)
    target_entropy = (
        -float(env.action_dim)
        if cfg.target_entropy is None else cfg.target_entropy
    )
    d, a = env.obs_dim, env.action_dim
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    # Local (per-device under shard_map) env batch, from the ARRAY shape.
    b_local = state.env_states.shape[0]
    dense8 = b_local % 8 == 0
    # The fused collection kernel composes with shard_map the same way
    # the fused PPO rollout does: each device runs collect_step_pallas
    # on its local shard (seed already device-decorrelated via k_act).
    fused_col = _fused_collect_enabled(cfg, env, b_local)
    tile, auto_tile = resolve_sample_tile(cfg, b_local)
    if tile > 1 and (cfg.batch_size % tile or b_local % tile):
        raise ValueError(
            f"sample_tile {tile} must divide batch_size {cfg.batch_size} "
            f"and the (per-device) env batch {b_local}"
        )

    def iteration(s: SacState, _):
        if axis_name is None:
            key, k_act, k_rand, k_reset, k_loop = jax.random.split(s.key, 5)
        else:
            # Device-local streams from the replicated master key; the
            # carried key advances replicated (the PPO shard_map rule,
            # ppo.train_step:598-602).
            base = jax.random.fold_in(s.key, jax.lax.axis_index(axis_name))
            _, k_act, k_rand, k_reset, k_loop = jax.random.split(base, 5)
            key = jax.random.fold_in(s.key, jnp.uint32(0x9E3779B9))

        # ---- collect: one auto-reset env step across the batch --------
        states_t = s.env_states.T                      # (D, B)
        warm = s.total_steps < cfg.warmup_steps
        if fused_col:
            # One Pallas launch: actor + sample + warmup gate + scale +
            # env step + auto-reset + replay block (ops/pallas_offpolicy).
            from ..ops import pallas_offpolicy as pop

            seed = jax.random.randint(k_act, (1,), 0, 2**31 - 1, jnp.int32)
            consts = _collect_consts(env, warm, 0.0)
            from ..ops import pallas_ppo_rollout as ppr

            new_rows, block_rows = pop.collect_step_pallas(
                env.name, "sac",
                states_t.reshape(8 * d, b_local // 8), seed, consts,
                ppr.env_params_vec(env),
                *pop.actor_kernel_args(s.actor),
                tile=_collect_tile(b_local), compute_dtype=cfg.compute_dtype)
            block = block_rows.reshape(2 * d + a + 2, b_local)
            # The kernel is float32-only (like every fused kernel); keep
            # the scan carry's dtype (f64 on the x64 CPU test backend).
            out = StepOut(
                new_rows.reshape(d, b_local).astype(states_t.dtype),
                block[d + a + 1:2 * d + a + 1], block[d + a],
                block[2 * d + a + 1], None)
        else:
            obs_t = states_t[:d]
            a_pol, _ = sample_squashed_t(s.actor, obs_t, k_act, a, cd)
            a_rand = jax.random.uniform(k_rand, a_pol.shape, jnp.float32,
                                        -1.0, 1.0)
            a_t = jnp.where(warm, a_rand, a_pol)       # [-1, 1]
            step8 = _autoreset_dense8 if dense8 else EnvDef.autoreset_step_t
            out = step8(env, states_t, _scale_action_t(env, a_t), k_reset)
            # autoreset_step_t replaces only .state; out.obs is the
            # TERMINAL observation (envs/core.py contract), so the stored
            # next_obs row is always the true successor.  This is
            # load-bearing for truncated columns (done=0): the Bellman
            # target bootstraps from this slot, which is only correct
            # because it holds the terminal obs, not a post-reset one.
            block = jnp.concatenate([
                obs_t, a_t, out.reward[None], out.obs[:d],
                out.done[None].astype(jnp.float32),
            ])
        buffer, ptr, filled = buffer_insert(s.buffer, s.ptr, s.filled, block)
        total = s.total_steps + cfg.num_envs
        ready = (filled >= cfg.batch_size) & (total >= cfg.warmup_steps)
        gate = ready.astype(jnp.float32)
        ever_done = jnp.maximum(s.ever_done,
                                out.done.astype(jnp.float32))
        desync = jnp.mean(ever_done)
        sample_rows = make_sampler(cfg, buffer, filled, tile, auto_tile,
                                   desync)

        # ---- update(s) -------------------------------------------------
        def one_update(carry, k):
            (actor, q1, q2, q1t, q2t, log_alpha,
             oa, oq, oal) = carry
            k_s, k_tgt, k_pi = jax.random.split(k, 3)
            rows = sample_rows(k_s)
            (qloss, (q_mean, tgt_mean)), qg = jax.value_and_grad(
                critic_loss, has_aux=True
            )({"q1": q1, "q2": q2}, cfg, env, rows, (q1t, q2t), k_tgt,
              actor, log_alpha, cd)
            if axis_name is not None:
                qg = jax.lax.pmean(qg, axis_name)
            # Warmup gating: zero the grads (params stay put) AND keep
            # the optimiser state un-advanced — otherwise Adam's count
            # and EMA decay run on zero gradients for every gated
            # iteration and the first REAL update arrives with a stale
            # bias correction (count ~40 -> c1 ~ 1 instead of 1-b1, a
            # ~10x under-scaled first step).  Standard SAC takes no
            # optimiser steps during warmup.
            sel = lambda n, o: jax.tree.map(  # noqa: E731
                lambda a, b: jnp.where(ready, a, b), n, o)
            qg = jax.tree.map(lambda g: g * gate, qg)
            qu, oq_new = opt_q.update(qg, oq, {"q1": q1, "q2": q2})
            oq = sel(oq_new, oq)
            qp = optax.apply_updates({"q1": q1, "q2": q2}, qu)
            q1, q2 = qp["q1"], qp["q2"]

            (ploss, (pi_loss, ent, alpha)), ag = jax.value_and_grad(
                actor_alpha_loss, has_aux=True
            )({"actor": actor, "log_alpha": log_alpha}, cfg, env, rows,
              q1, q2, k_pi, target_entropy, cd)
            if axis_name is not None:
                ag = jax.lax.pmean(ag, axis_name)
            agrads = jax.tree.map(lambda g: g * gate, ag["actor"])
            au, oa_new = opt_a.update(agrads, oa, actor)
            oa = sel(oa_new, oa)
            actor = optax.apply_updates(actor, au)
            alu, oal_new = opt_al.update(ag["log_alpha"] * gate, oal, log_alpha)
            oal = sel(oal_new, oal)
            log_alpha = optax.apply_updates(log_alpha, alu)

            blend = cfg.tau * gate
            q1t = jax.tree.map(lambda t, o: (1 - blend) * t + blend * o,
                               q1t, q1)
            q2t = jax.tree.map(lambda t, o: (1 - blend) * t + blend * o,
                               q2t, q2)
            met = {"q_loss": qloss, "pi_loss": pi_loss, "entropy": ent,
                   "alpha": alpha, "q_mean": q_mean, "target_mean": tgt_mean}
            return (actor, q1, q2, q1t, q2t, log_alpha, oa, oq, oal), met

        carry0 = (s.actor, s.q1, s.q2, s.q1_target, s.q2_target,
                  s.log_alpha, s.opt_actor, s.opt_q, s.opt_alpha)
        carry, met = jax.lax.scan(
            one_update, carry0, jax.random.split(k_loop, cfg.grad_steps)
        )
        (actor, q1, q2, q1t, q2t, log_alpha, oa, oq, oal) = carry
        # Update-phase metrics are meaningful only when the gate is open
        # (gated iterations evaluate losses on the zero-filled ring);
        # mask here, weighted-average across iterations below.
        met = jax.tree.map(lambda v: jnp.mean(v) * gate, met)
        met["update_gate"] = gate
        met["mean_reward"] = jnp.mean(out.reward)
        met["done_frac"] = jnp.mean(out.done.astype(jnp.float32))
        met["buffer_filled"] = filled.astype(jnp.float32)
        met["desync_frac"] = desync
        if axis_name is not None:  # replicated metrics out of shard_map
            met = jax.lax.pmean(met, axis_name)

        new = SacState(
            actor=actor, q1=q1, q2=q2, q1_target=q1t, q2_target=q2t,
            log_alpha=log_alpha, opt_actor=oa, opt_q=oq, opt_alpha=oal,
            buffer=buffer, ptr=ptr, filled=filled,
            env_states=out.state.T, key=key, total_steps=total,
            ever_done=ever_done,
        )
        return new, met

    state, metrics = jax.lax.scan(iteration, state, None, length=num_iters)
    return state, _finish_metrics(metrics)


def _finish_metrics(metrics):
    """Per-iteration stacked metrics -> scalars: update-phase metrics
    (masked by their iteration's warmup gate) average over gate-OPEN
    iterations only; env/collection metrics average over all."""
    gate = metrics.pop("update_gate")
    denom = jnp.maximum(jnp.sum(gate), 1.0)
    ungated = ("mean_reward", "done_frac", "buffer_filled", "desync_frac")
    return {
        k: (jnp.mean(v) if k in ungated else jnp.sum(v) / denom)
        for k, v in metrics.items()
    }


def _shard_specs(cfg: SacConfig):
    """shard_map PartitionSpecs for a SacState: params/opt/scalars
    replicated, env batch and the replay ring's COLUMN axis sharded
    (each device owns an independent ring fed by its env shard; ptr and
    filled evolve identically everywhere because inserts are symmetric,
    so they stay replicated)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import BATCH_AXIS

    rep = P()
    return SacState(
        actor=rep, q1=rep, q2=rep, q1_target=rep, q2_target=rep,
        log_alpha=rep, opt_actor=rep, opt_q=rep, opt_alpha=rep,
        buffer=P(None, BATCH_AXIS), ptr=rep, filled=rep,
        env_states=P(BATCH_AXIS), key=rep, total_steps=rep,
        ever_done=P(BATCH_AXIS),
    )


def state_shardings(cfg: SacConfig, mesh) -> SacState:
    """NamedShardings matching :func:`_shard_specs` — ``device_put`` a
    host-built SacState onto the mesh with these before calling the
    mesh :func:`make_train_iters`."""
    from jax.sharding import NamedSharding

    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), _shard_specs(cfg),
        is_leaf=lambda x: not isinstance(x, (SacState,)),
    )


def make_train_iters(env: EnvDef, cfg: SacConfig, num_iters: int, mesh=None):
    """Jitted K-iteration SAC train function.  With ``mesh``: a
    ``shard_map`` over the batch axis — per-device env collection and
    replay sampling, gradient ``pmean`` over ICI (see
    :func:`train_iters` ``axis_name``).  ``cfg.num_envs`` must divide by
    the mesh size; ``cfg.batch_size`` is PER DEVICE (effective global
    batch = ``batch_size × n_devices``)."""
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


def greedy_action(env: EnvDef, actor, obs, hidden=None):
    """Deterministic (tanh-mean) action for evaluation, row layout."""
    mean, _ = actor_dist_t(actor, obs.T if obs.ndim == 2 else obs[:, None],
                           env.action_dim)
    a_t = jnp.tanh(mean)
    scaled = _scale_action_t(env, a_t)
    return scaled.T if obs.ndim == 2 else scaled[:, 0]
