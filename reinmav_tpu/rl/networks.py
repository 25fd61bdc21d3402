"""Actor-critic MLP as plain pytrees (no framework dependency on the hot
path — params are dicts of arrays, apply is pure jnp, MXU-friendly batched
matmuls).

Mirrors the reference recipe's policy: baselines' default 2x64 tanh MLP
with a diagonal-Gaussian continuous head and a linear value head
(``train_hovering.py:51-52`` — ``--num_layers 2 --num_hidden 64``;
baselines ppo2 uses a state-independent log-std, replicated here).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class MlpConfig(NamedTuple):
    obs_dim: int
    action_dim: int
    hidden: Sequence[int] = (64, 64)
    init_log_std: float = 0.0


def _dense_init(key, in_dim, out_dim, scale, dtype):
    w_key, _ = jax.random.split(key)
    # Orthogonal init, the PPO-standard choice (baselines' fc layers).
    w = jax.nn.initializers.orthogonal(scale)(w_key, (in_dim, out_dim), dtype)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def init_params(key: jax.Array, cfg: MlpConfig, dtype=jnp.float32):
    keys = jax.random.split(key, len(cfg.hidden) * 2 + 3)
    params = {"pi": [], "vf": []}
    in_dim = cfg.obs_dim
    for i, h in enumerate(cfg.hidden):
        params["pi"].append(_dense_init(keys[2 * i], in_dim, h, jnp.sqrt(2.0), dtype))
        params["vf"].append(_dense_init(keys[2 * i + 1], in_dim, h, jnp.sqrt(2.0), dtype))
        in_dim = h
    params["pi_out"] = _dense_init(keys[-3], in_dim, cfg.action_dim, 0.01, dtype)
    params["vf_out"] = _dense_init(keys[-2], in_dim, 1, 1.0, dtype)
    params["log_std"] = jnp.full((cfg.action_dim,), cfg.init_log_std, dtype)
    return params


def _mlp(layers, x):
    for layer in layers:
        x = jnp.tanh(x @ layer["w"] + layer["b"])
    return x


def apply(params, obs: jnp.ndarray):
    """→ (mean, log_std, value); obs is (..., obs_dim)."""
    pi_h = _mlp(params["pi"], obs)
    vf_h = _mlp(params["vf"], obs)
    mean = pi_h @ params["pi_out"]["w"] + params["pi_out"]["b"]
    value = (vf_h @ params["vf_out"]["w"] + params["vf_out"]["b"])[..., 0]
    return mean, params["log_std"], value


# -- fused transposed path -------------------------------------------------
# TPU hot-loop convention (CLAUDE.md): activations batch-minor.  A row
# (N, 13) f32 array lane-pads 13 -> 128 (~10x HBM waste) and yields
# K=13-wide matmuls; transposed (13, N) is dense and MXU-native.  The pi
# and vf towers are additionally fused into ONE stack of width 2H
# (concat first layer, block-diagonal hidden layers, block head): for
# H=64 every matmul is exactly 128 wide — MXU tile width — and the
# matmul count halves.  Gradients flow through the concat/pad exactly,
# so the parameter pytree (and checkpoints) stay identical to the
# unfused path.


@jax.custom_vjp
def _tanh_bf16_residual(x):
    """tanh computed in the INPUT precision (f32) whose saved backward
    residual is bf16 — the (2H, n) hidden tensors are the update phase's
    HBM cost, and the residual is what autodiff materialises between
    forward and backward.  Plain ``jnp.tanh(x).astype(bf16)`` would save
    the f32 output (no bandwidth win); ``jnp.tanh(x.astype(bf16))``
    rounds the accumulation BEFORE the nonlinearity (diverging from the
    fused Pallas loss kernel, which applies tanh to the f32 accumulation).
    """
    return jnp.tanh(x)


def _tanh_bf16_fwd(x):
    h = jnp.tanh(x)
    return h, h.astype(jnp.bfloat16)


def _tanh_bf16_bwd(h16, g):
    h = h16.astype(g.dtype)
    return (g * (1.0 - h * h),)


_tanh_bf16_residual.defvjp(_tanh_bf16_fwd, _tanh_bf16_bwd)


def _block_diag2(a, b):
    """[[a, 0], [0, b]] for 2-D blocks."""
    za = jnp.zeros((a.shape[0], b.shape[1]), a.dtype)
    zb = jnp.zeros((b.shape[0], a.shape[1]), b.dtype)
    return jnp.concatenate(
        [jnp.concatenate([a, za], axis=1), jnp.concatenate([zb, b], axis=1)], axis=0
    )


def fused_weights(params):
    """Fuse pi/vf tower params into single wide layers.

    Returns ``(layers, w_out, b_out)`` where ``layers`` is a list of
    ``(w, b)`` with ``w`` of shape (in, 2H) for layer 0 and (2H, 2H)
    block-diagonal after; ``w_out`` is (2H, A+1) mapping the last hidden
    to ``[action_mean..., value]``.
    """
    pi, vf = params["pi"], params["vf"]
    layers = [
        (
            jnp.concatenate([pi[0]["w"], vf[0]["w"]], axis=1),
            jnp.concatenate([pi[0]["b"], vf[0]["b"]]),
        )
    ]
    for lp, lv in zip(pi[1:], vf[1:]):
        layers.append(
            (_block_diag2(lp["w"], lv["w"]), jnp.concatenate([lp["b"], lv["b"]]))
        )
    w_out = _block_diag2(params["pi_out"]["w"], params["vf_out"]["w"])
    b_out = jnp.concatenate([params["pi_out"]["b"], params["vf_out"]["b"]])
    return layers, w_out, b_out


def apply_t(params, obs_t, compute_dtype=None):
    """Transposed fused forward: ``obs_t`` is (obs_dim, *batch) —
    typically (D, B) or sublane-dense (D, 8, B/8).  Returns
    ``(mean_t, log_std, value)`` with ``mean_t`` (action_dim, *batch) and
    ``value`` (*batch).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) casts matmul inputs; the
    accumulation and nonlinearity stay float32.
    """
    layers, w_out, b_out = fused_weights(params)
    x = obs_t
    cd = compute_dtype

    def mm(w, x):
        if cd is not None:
            # bf16 (or other reduced) inputs, float32 accumulation.
            return jax.lax.dot_general(
                w.astype(cd), x.astype(cd), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        # Full precision: let promotion follow the inputs (f64 under x64).
        return jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())))

    for w, b in layers:
        pre = mm(w, x) + b.reshape(b.shape + (1,) * (x.ndim - 1))
        # Under reduced precision the nonlinearity still sees the f32
        # accumulation; only the autodiff residual is stored bf16 (see
        # _tanh_bf16_residual) — halving the (2H, n) hidden-tensor HBM
        # traffic without changing forward numerics beyond bf16 matmuls.
        x = _tanh_bf16_residual(pre) if cd is not None else jnp.tanh(pre)
    out = mm(w_out, x) + b_out.reshape(b_out.shape + (1,) * (x.ndim - 1))
    mean = out[:-1]
    value = out[-1]
    return mean, params["log_std"], value


def sample_action_t(params, obs_t, key, compute_dtype=None):
    """Transposed diagonal-Gaussian sample → (action_t, log_prob, value)
    with ``action_t`` (A, *batch), ``log_prob``/``value`` (*batch)."""
    mean, log_std, value = apply_t(params, obs_t, compute_dtype)
    std = jnp.exp(log_std).reshape(log_std.shape + (1,) * (mean.ndim - 1))
    noise = jax.random.normal(key, mean.shape, jnp.float32)
    action = mean + std * noise
    logp = gaussian_log_prob_t(mean, log_std, action)
    return action, logp, value


def gaussian_log_prob_t(mean_t, log_std, action_t):
    """Log-prob with the action axis LEADING (axis 0)."""
    shape = log_std.shape + (1,) * (mean_t.ndim - 1)
    var = jnp.exp(2.0 * log_std).reshape(shape)
    return jnp.sum(
        -0.5 * jnp.square(action_t - mean_t) / var
        - log_std.reshape(shape)
        - 0.5 * jnp.log(2.0 * jnp.pi),
        axis=0,
    )


def sample_action(params, obs, key):
    """Diagonal-Gaussian sample → (action, log_prob, value)."""
    mean, log_std, value = apply(params, obs)
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mean.shape, mean.dtype)
    action = mean + std * noise
    logp = gaussian_log_prob(mean, log_std, action)
    return action, logp, value


def gaussian_log_prob(mean, log_std, action):
    var = jnp.exp(2.0 * log_std)
    return jnp.sum(
        -0.5 * jnp.square(action - mean) / var - log_std - 0.5 * jnp.log(2.0 * jnp.pi),
        axis=-1,
    )


def entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e))
