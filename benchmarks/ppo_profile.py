"""Phase-level PPO timing on the real TPU (honest transfers, CLAUDE.md).

Times, separately jitted:
  * rollout-only (collect_rollout)
  * full-batch fwd+bwd (one epoch, one minibatch equivalent)
  * full train_step
for a grid of (num_envs, rollout_len) at ~1M samples/update.

Usage: python benchmarks/ppo_profile.py [--envs 8192] [--len 128]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import reinmav_tpu
from reinmav_tpu.rl import networks, ppo


def timeit(fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        r = fn(*args)
        float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])  # force transfer
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=8192)
    ap.add_argument("--len", type=int, default=128)
    ap.add_argument("--env_id", default="quadrotor3d-v0")
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    env = reinmav_tpu.make(args.env_id)
    cfg = ppo.PpoConfig(
        num_envs=args.envs, rollout_len=args.len,
        compute_dtype="bfloat16" if args.bf16 else "float32",
    )
    n = cfg.num_envs * cfg.rollout_len
    key = jax.random.PRNGKey(0)
    state = ppo.init_train_state(env, cfg, key)
    print(f"device={jax.devices()[0]} envs={cfg.num_envs} len={cfg.rollout_len} n={n}")

    # --- rollout only ---
    @jax.jit
    def rollout_only(state):
        out = ppo.collect_rollout(
            env, cfg, state.params, state.obs_norm, state.ret_norm,
            state.env_states, state.env_returns, state.key,
        )
        return out[3].reward.sum()  # traj dependency

    t = timeit(rollout_only, state)
    print(f"rollout_only       {t*1e3:8.2f} ms   {n/t/1e6:8.1f} M steps/s")

    # --- full-batch fwd+bwd (1 pass over all samples), transposed ---
    cd = None if cfg.compute_dtype == "float32" else jnp.bfloat16
    obs = jax.random.normal(jax.random.PRNGKey(1), (env.obs_dim, n), jnp.float32)
    act = jax.random.normal(jax.random.PRNGKey(2), (env.action_dim, n), jnp.float32)
    batch = ppo.Transition(obs, act, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
                           jnp.zeros(n, bool))
    adv = jnp.ones(n)
    ret = jnp.ones(n)

    @jax.jit
    def fwd_bwd(params):
        (_, m), grads = jax.value_and_grad(ppo.ppo_loss, has_aux=True)(
            params, cfg, batch, adv, ret, cd
        )
        return jax.tree.leaves(grads)[0].sum()

    t = timeit(fwd_bwd, state.params)
    print(f"fwdbwd_fullbatch   {t*1e3:8.2f} ms   {n/t/1e6:8.1f} M samples/s")

    # --- fwd only (policy inference cost shape) ---
    @jax.jit
    def fwd(params):
        mean, log_std, value = networks.apply_t(params, obs, cd)
        return mean.sum() + value.sum()

    t = timeit(fwd, state.params)
    print(f"fwd_fullbatch      {t*1e3:8.2f} ms   {n/t/1e6:8.1f} M samples/s")

    # --- full train step ---
    step = ppo.make_train_step(env, cfg)

    def full(state):
        s, m = step(state)
        return s

    t = timeit(full, state)
    print(f"train_step_full    {t*1e3:8.2f} ms   {n/t/1e6:8.1f} M env-steps/s")


if __name__ == "__main__":
    main()
