"""Pallas TPU kernel: the off-policy COLLECTION phase — actor MLP,
action sampling (tanh-Gaussian for SAC, tanh+clipped-noise for
TD3/DDPG), warmup-uniform gating, action scaling, environment step,
auto-reset, and replay-transition assembly — fused into ONE launch per
train iteration.

Replaces the XLA-op swarm of ``rl/sac.py`` / ``rl/td3.py``'s collection
phase (the workload of reference ``gym_reinmav/run.py:125-138``: vec-env
stepping feeding the off-policy baselines algorithms): actor forward
(three matmuls with HBM-materialised (H, B) hiddens), two
``jax.random`` draws, the warmup select, the action affine, the dense8
env step, and the transition-block concatenate — each separately
launched per iteration — become one kernel whose activations never
leave VMEM.

The kernel emits the finished replay block in the ring's own
``(rows, cols)`` feature-major layout (rows: obs, action[-1,1], reward,
next_obs, done — ``sac._row_dims``); the caller's ring insert is then a
single in-place ``dynamic_update_slice`` on the donated buffer.  The
dense8 ``(8·D, B/8)`` rows-view used throughout is the SAME row-major
reshape family as the scan path's ``_autoreset_dense8``, so the block
reshapes back to ``(R, B)`` with columns in exact env order — the
deterministic leg of the differential test matches the scan collection
BITWISE on the obs/action rows (identical MLP→tanh→affine pipeline) and
at f32 tolerance on the step rows (the step_tiles physics is an
ulp-compatible reimplementation — the PPO-rollout-kernel precedent).

RNG: the on-core PRNG (Box–Muller normals, mantissa-fill uniforms) —
a different stream than ``jax.random``, statistically equivalent; the
differential test pins the ε→0 limit as above and the stochastic leg by
re-stepping the stored actions through the scan path (the env step is
deterministic given the action, so next_obs/reward/done must match
even on the stochastic leg).

Env coverage: the five reward-bearing IDs (the same table as the fused
PPO rollout kernel, whose per-env ``step_tiles`` physics this module
reuses verbatim).  Force-v0/Quat-v0 are excluded by design: reference
reward ≡ 0 (``mujoco_quad.py:60-63``), nothing to train.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False

from . import pallas_ppo_rollout as ppr

_LOG_STD_MIN = -20.0
_LOG_STD_MAX = 2.0


def available() -> bool:
    return _PALLAS


#: Sampling modes.  "det" legs exist for the bitwise differential tests
#: (ε = 0 / noise = 0); production uses "sac" / "td3".
_MODES = ("sac", "sac_det", "td3", "td3_det")


def _kernel(env_kind, mode, cd, seed_ref, consts_ref, pvec_ref,
            s_in_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            s_out_ref, block_ref):
    """One batch-tile: policy -> sample -> scale -> env step -> autoreset
    -> replay block.

    consts layout (f32): [warm_gate, explore_noise, lo(A), hi(A)].
    ``pvec_ref``: the live env Params SMEM vector (per-env pack —
    ppr._ENVS), so param sweeps keep the fused collection.
    """
    d, adim, step_tiles, reset_rows, _, read_pv = ppr._ENVS[env_kind]
    pv = read_pv(pvec_ref)
    b = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + b * jnp.int32(2654435761 & 0x7FFFFFFF))

    state = s_in_ref[:, :]
    tile = state.shape[1]

    def rows(s, i):
        return s[8 * i: 8 * (i + 1)]

    comp = [rows(state, i) for i in range(d)]
    # (8d, t) -> (d, 8t): comp-major flatten (exact reshape).
    x = jnp.concatenate(comp, axis=0).reshape(d, 8 * tile)

    # Actor MLP (sac._mlp_t semantics: ReLU hiddens, linear head).
    h1 = jnp.maximum(ppr._mm(w1_ref[:, :], x, ((0,), (0,)), cd)
                     + b1_ref[:, :], jnp.float32(0.0))
    h2 = jnp.maximum(ppr._mm(w2_ref[:, :], h1, ((0,), (0,)), cd)
                     + b2_ref[:, :], jnp.float32(0.0))
    out = ppr._mm(w3_ref[:, :], h2, ((0,), (0,)), cd) + b3_ref[:, :]

    if mode in ("sac", "sac_det"):
        mean = out[:adim]
        log_std = jnp.clip(out[adim:2 * adim], jnp.float32(_LOG_STD_MIN),
                           jnp.float32(_LOG_STD_MAX))
        if mode == "sac":
            eps = ppr._normal((adim, 8 * tile))
            u = mean + jnp.exp(log_std) * eps
        else:
            u = mean
        a_pol = jnp.tanh(u)
    else:
        a_pol = jnp.tanh(out[:adim])
        if mode == "td3":
            noise = consts_ref[1] * ppr._normal((adim, 8 * tile))
            a_pol = jnp.clip(a_pol + noise, jnp.float32(-1.0),
                             jnp.float32(1.0))

    # Warmup: uniform random actions in [-1, 1], selected by the gate.
    warm = consts_ref[0] > jnp.float32(0.5)
    a_rand = ppr._uniform_pm1((adim, 8 * tile))
    a_t = jnp.where(warm, a_rand, a_pol)

    # Scale to the env's physical action box, per dim (sac._scale_action_t).
    act_scaled = []
    for i in range(adim):
        lo = consts_ref[2 + i]
        hi = consts_ref[2 + adim + i]
        act_scaled.append(lo + (a_t[i:i + 1] + 1.0) * (0.5 * (hi - lo)))

    # Back to sublane-dense tiles for the physics.
    act8 = jnp.concatenate(act_scaled, axis=0).reshape(8 * adim, tile)
    act_comps = [rows(act8, i) for i in range(adim)]
    pol8 = a_t.reshape(8 * adim, tile)          # stored policy-space action

    new_comp, raw_reward, done = step_tiles(comp, act_comps, pv)
    done8 = done.astype(jnp.float32)

    # Replay block in ring row order (sac._row_dims): obs, action[-1,1],
    # reward, next_obs (the TERMINAL observation — pre-reset), done.
    block_ref[:, :] = jnp.concatenate(
        comp[:d] + [pol8, raw_reward] + new_comp[:d] + [done8], axis=0)

    # Auto-reset done lanes (post-block: the block keeps terminal obs).
    stacked = jnp.concatenate(new_comp, axis=0)
    draw = reset_rows(stacked.shape, stacked.dtype, pv)
    s_out_ref[:, :] = jnp.where(jnp.tile(done, (d, 1)), draw, stacked)


@functools.partial(
    jax.jit,
    static_argnames=("env_kind", "mode", "tile", "compute_dtype"),
)
def collect_step_pallas(env_kind: str, mode: str, states_rows, seed, consts,
                        pvec, w1, b1, w2, b2, w3, b3,
                        tile: int = 128, compute_dtype: str = "float32"):
    """Fused off-policy collection step.

    Args:
      states_rows: (8·D, B/8) f32 — the dense8 rows view of the (D, B)
        transposed env states (``states_t.reshape(8*D, B//8)``).
      seed: (1,) int32 for the on-core PRNG.
      consts: f32 vector [warm_gate, explore_noise, lo(A), hi(A)].
      pvec: the env's LIVE Params as the per-env SMEM f32 vector
        (:func:`pallas_ppo_rollout.env_params_vec`).
      w1..b3: actor MLP params — w (din, dout) as in ``sac._mlp_init``,
        biases reshaped (dout, 1).  SAC heads emit 2A rows (mean ‖
        log_std), TD3/DDPG A rows.
      mode: "sac" | "td3" (production) or "sac_det" | "td3_det"
        (ε = 0 / noise = 0 — the bitwise differential leg).

    Returns ``(new_states_rows (8·D, B/8), block_rows (8·R, B/8))`` with
    R = 2·D + A + 2; ``block_rows.reshape(R, B)`` is exactly the scan
    path's insert block (same row-major reshape family, env order
    preserved).
    """
    assert mode in _MODES, mode
    d, adim = ppr._ENVS[env_kind][:2]
    dd8, b8 = states_rows.shape
    assert dd8 == 8 * d and b8 % tile == 0, (dd8, d, b8, tile)
    out_dim = 2 * adim if mode.startswith("sac") else adim
    assert w3.shape[1] == out_dim, (w3.shape, out_dim)
    assert consts.shape == (2 + 2 * adim,), consts.shape
    r_rows = 2 * d + adim + 2
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else None

    kernel = functools.partial(_kernel, env_kind, mode, cd)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b8 // tile,),
        in_specs=[
            pl.BlockSpec((8 * d, tile), lambda b, *_: (0, b)),
            pl.BlockSpec(w1.shape, lambda b, *_: (0, 0)),
            pl.BlockSpec(b1.shape, lambda b, *_: (0, 0)),
            pl.BlockSpec(w2.shape, lambda b, *_: (0, 0)),
            pl.BlockSpec(b2.shape, lambda b, *_: (0, 0)),
            pl.BlockSpec(w3.shape, lambda b, *_: (0, 0)),
            pl.BlockSpec(b3.shape, lambda b, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((8 * d, tile), lambda b, *_: (0, b)),
            pl.BlockSpec((8 * r_rows, tile), lambda b, *_: (0, b)),
        ],
    )
    new_rows, block_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8 * d, b8), jnp.float32),
            jax.ShapeDtypeStruct((8 * r_rows, b8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(seed, consts, pvec.astype(jnp.float32),
      states_rows.astype(jnp.float32),
      w1.astype(jnp.float32), b1.astype(jnp.float32),
      w2.astype(jnp.float32), b2.astype(jnp.float32),
      w3.astype(jnp.float32), b3.astype(jnp.float32))
    return new_rows, block_rows


def actor_kernel_args(actor):
    """A 2-hidden-layer ``sac._mlp_init`` actor -> the kernel's six
    weight arguments (biases reshaped to (dout, 1) columns)."""
    if len(actor) != 3:
        raise ValueError(
            f"fused collection needs a 2-hidden-layer actor, got "
            f"{len(actor) - 1} hidden layers")
    (l1, l2, l3) = actor
    return (l1["w"], l1["b"].reshape(-1, 1),
            l2["w"], l2["b"].reshape(-1, 1),
            l3["w"], l3["b"].reshape(-1, 1))


def supported(env) -> bool:
    """Whether the fused collection kernel covers ``env`` (name in the
    table and the flat state IS the observation — the collection block
    stores obs = state rows)."""
    return (env.name in ppr._ENVS and env.state_dim == env.obs_dim)
