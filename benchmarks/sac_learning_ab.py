"""Learning-quality A/B for the r4 SAC collection/sampling changes on
the real TPU: 20M-step hover runs isolating (a) the fused collection
kernel and (b) the desync-gated auto sample_tile, against the r3
baseline path (scan collection, tile=1).  Prints one summary line per
arm.  (Run solo; ~1 min/arm.)

Usage: python benchmarks/sac_learning_ab.py [arm ...]
Arms: base (scan+tile1), fcol (kernel+tile1), tile (scan+auto),
      both (kernel+auto)
"""
import sys
import time

import jax
import numpy as np

import reinmav_tpu
from reinmav_tpu.rl import evaluate, sac

STEPS = int(2e7)
K = 32


def run(name, fused_collect, sample_tile, seed=0):
    env = reinmav_tpu.make("MujocoQuadForce-v1")
    cfg = sac.SacConfig(num_envs=8192, batch_size=2048,
                        buffer_capacity=1 << 20, warmup_steps=10000,
                        hidden=(64, 64), grad_steps=1,
                        fused_collect=fused_collect,
                        sample_tile=sample_tile)
    state = sac.init_state(env, cfg, jax.random.PRNGKey(seed))
    fn = sac.make_train_iters(env, cfg, K)
    calls = STEPS // (cfg.num_envs * K)
    t0 = time.perf_counter()
    for c in range(calls):
        state, m = fn(state)
    float(np.asarray(state.total_steps))
    wall = time.perf_counter() - t0
    stats = evaluate.evaluate_policy(
        env, lambda obs: sac.greedy_action(env, state.actor, obs),
        jax.random.PRNGKey(123), num_envs=256, horizon=1000)
    m = jax.device_get(m)
    print(f"{name:6s}: eval_return {stats.mean_return:9.1f}  "
          f"survival {stats.survival_frac:.3f}  "
          f"alpha {float(m['alpha']):7.3f}  "
          f"mean_rew {float(m['mean_reward']):7.2f}  "
          f"done_frac {float(m['done_frac']):.4f}  "
          f"({wall:.0f}s)", flush=True)


ARMS = {
    "base": dict(fused_collect="off", sample_tile=1),
    "fcol": dict(fused_collect="auto", sample_tile=1),
    "tile": dict(fused_collect="off", sample_tile="auto"),
    "both": dict(fused_collect="auto", sample_tile="auto"),
}

if __name__ == "__main__":
    for name in (sys.argv[1:] or list(ARMS)):
        run(name, **ARMS[name])


def run_hidden(name, hidden, fused_collect="auto", sample_tile="auto",
               seed=0):
    env = reinmav_tpu.make("MujocoQuadForce-v1")
    cfg = sac.SacConfig(num_envs=8192, batch_size=2048,
                        buffer_capacity=1 << 20, warmup_steps=10000,
                        hidden=hidden, grad_steps=1,
                        fused_collect=fused_collect,
                        sample_tile=sample_tile)
    state = sac.init_state(env, cfg, jax.random.PRNGKey(seed))
    fn = sac.make_train_iters(env, cfg, K)
    calls = STEPS // (cfg.num_envs * K)
    t0 = time.perf_counter()
    for c in range(calls):
        state, m = fn(state)
    float(np.asarray(state.total_steps))
    wall = time.perf_counter() - t0
    stats = evaluate.evaluate_policy(
        env, lambda obs: sac.greedy_action(env, state.actor, obs),
        jax.random.PRNGKey(123), num_envs=256, horizon=1000)
    m = jax.device_get(m)
    print(f"{name:12s}: eval_return {stats.mean_return:9.1f}  "
          f"survival {stats.survival_frac:.3f}  "
          f"alpha {float(m['alpha']):7.3f}  "
          f"mean_rew {float(m['mean_reward']):7.2f}  "
          f"done_frac {float(m['done_frac']):.4f}  ({wall:.0f}s)",
          flush=True)


def run_gs(name, grad_steps, fused_collect="auto", sample_tile="auto",
           seed=0, steps=STEPS, hidden=(64, 64)):
    env = reinmav_tpu.make("MujocoQuadForce-v1")
    cfg = sac.SacConfig(num_envs=8192, batch_size=2048,
                        buffer_capacity=1 << 20, warmup_steps=10000,
                        hidden=hidden, grad_steps=grad_steps,
                        fused_collect=fused_collect,
                        sample_tile=sample_tile)
    state = sac.init_state(env, cfg, jax.random.PRNGKey(seed))
    fn = sac.make_train_iters(env, cfg, K)
    calls = steps // (cfg.num_envs * K)
    t0 = time.perf_counter()
    for c in range(calls):
        state, m = fn(state)
    float(np.asarray(state.total_steps))
    wall = time.perf_counter() - t0
    stats = evaluate.evaluate_policy(
        env, lambda obs: sac.greedy_action(env, state.actor, obs),
        jax.random.PRNGKey(123), num_envs=256, horizon=1000)
    m = jax.device_get(m)
    print(f"{name:12s}: eval_return {stats.mean_return:9.1f}  "
          f"survival {stats.survival_frac:.3f}  "
          f"alpha {float(m['alpha']):7.3f}  "
          f"mean_rew {float(m['mean_reward']):7.2f}  "
          f"done_frac {float(m['done_frac']):.4f}  ({wall:.0f}s)",
          flush=True)


def run_te(name, target_entropy, sample_tile="auto", fused_collect="auto",
           seed=0, steps=STEPS, grad_steps=1):
    env = reinmav_tpu.make("MujocoQuadForce-v1")
    cfg = sac.SacConfig(num_envs=8192, batch_size=2048,
                        buffer_capacity=1 << 20, warmup_steps=10000,
                        hidden=(64, 64), grad_steps=grad_steps,
                        target_entropy=target_entropy,
                        fused_collect=fused_collect,
                        sample_tile=sample_tile)
    state = sac.init_state(env, cfg, jax.random.PRNGKey(seed))
    fn = sac.make_train_iters(env, cfg, K)
    for c in range(steps // (cfg.num_envs * K)):
        state, m = fn(state)
    float(np.asarray(state.total_steps))
    stats = evaluate.evaluate_policy(
        env, lambda obs: sac.greedy_action(env, state.actor, obs),
        jax.random.PRNGKey(123), num_envs=256, horizon=1000)
    m = jax.device_get(m)
    print(f"{name:14s}: eval_return {stats.mean_return:9.1f}  "
          f"survival {stats.survival_frac:.3f}  "
          f"alpha {float(m['alpha']):7.3f}  "
          f"mean_rew {float(m['mean_reward']):7.2f}  "
          f"done_frac {float(m['done_frac']):.4f}", flush=True)


def run_cfg(name, sample_tile="auto", steps=STEPS, seed=0, **kw):
    env = reinmav_tpu.make("MujocoQuadForce-v1")
    base = dict(num_envs=8192, batch_size=2048, buffer_capacity=1 << 20,
                warmup_steps=10000, hidden=(64, 64), grad_steps=1)
    base.update(kw)
    cfg = sac.SacConfig(sample_tile=sample_tile, **base)
    state = sac.init_state(env, cfg, jax.random.PRNGKey(seed))
    fn = sac.make_train_iters(env, cfg, K)
    for c in range(steps // (cfg.num_envs * K)):
        state, m = fn(state)
    float(np.asarray(state.total_steps))
    stats = evaluate.evaluate_policy(
        env, lambda obs: sac.greedy_action(env, state.actor, obs),
        jax.random.PRNGKey(123), num_envs=256, horizon=1000)
    m = jax.device_get(m)
    print(f"{name:16s}: eval_return {stats.mean_return:9.1f}  "
          f"survival {stats.survival_frac:.3f}  "
          f"alpha {float(m['alpha']):7.3f}  "
          f"mean_rew {float(m['mean_reward']):7.2f}  "
          f"done_frac {float(m['done_frac']):.4f}", flush=True)


def artifact_run(path, steps=int(6e7), seed=1):
    """The r4 hover-solving recipe (grad_steps=16, 256x256 critics,
    production defaults otherwise) logged to a committed artifact."""
    import json

    env = reinmav_tpu.make("MujocoQuadForce-v1")
    cfg = sac.SacConfig(num_envs=8192, batch_size=2048,
                        buffer_capacity=1 << 20, warmup_steps=10000,
                        hidden=(256, 256), grad_steps=16)
    state = sac.init_state(env, cfg, jax.random.PRNGKey(seed))
    fn = sac.make_train_iters(env, cfg, K)
    calls = steps // (cfg.num_envs * K)
    t0 = time.perf_counter()
    with open(path, "w") as f:
        f.write(json.dumps({"config": {
            "env": "MujocoQuadForce-v1", "alg": "sac", "num_envs": 8192,
            "batch_size": 2048, "grad_steps": 16, "hidden": [256, 256],
            "warmup_steps": 10000, "buffer_capacity": 1 << 20,
            "sample_tile": "auto", "fused_collect": "auto", "seed": seed,
            "updates_per_jit": K}}) + "\n")
        for c in range(1, calls + 1):
            state, m = fn(state)
            if c % 8 == 0 or c == calls:
                float(np.asarray(state.total_steps))
                row = {"step": c, "wall_s": round(time.perf_counter() - t0, 3),
                       "env_steps": c * cfg.num_envs * K}
                row.update({k: float(v) for k, v in
                            jax.device_get(m).items()})
                if c % 32 == 0 or c == calls:
                    st = evaluate.evaluate_policy(
                        env,
                        lambda obs: sac.greedy_action(env, state.actor, obs),
                        jax.random.fold_in(jax.random.PRNGKey(99), c),
                        num_envs=256, horizon=1000)
                    row.update(eval_mean_return=float(st.mean_return),
                               eval_survival_frac=float(st.survival_frac),
                               eval_mean_length=float(st.mean_length))
                f.write(json.dumps(row) + "\n")
                f.flush()
    print("artifact written:", path)
