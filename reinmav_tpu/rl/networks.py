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
