"""Quantify SAC fused_update on the real TPU: train_iters(K) ms/iter with
the one-launch kernel off vs on.  (Run solo on an idle chip.)"""
import time

import jax
import numpy as np

import reinmav_tpu
from reinmav_tpu.rl import sac


def measure(env_id, fused_update, K=64):
    env = reinmav_tpu.make(env_id)
    cfg = sac.SacConfig(num_envs=65536, batch_size=8192,
                        buffer_capacity=1 << 21, warmup_steps=0,
                        max_grad_norm=None,
                        fused_update=("auto" if fused_update else "off"))
    state = sac.init_state(env, cfg, jax.random.PRNGKey(0))
    fn = jax.jit(lambda s: sac.train_iters(env, cfg, s, K))
    state2, m = fn(state)
    float(np.asarray(jax.tree.leaves(m)[0]).ravel()[0])  # sync (tunnel rule)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state2, m = fn(state)
        float(np.asarray(jax.tree.leaves(m)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / K * 1000
    sps = cfg.num_envs / (min(ts) / K)
    print(f"{env_id} fused_update={fused_update}: {ms:.2f} ms/iter, "
          f"{sps/1e6:.1f}M env-steps/s")
    return sps


if __name__ == "__main__":
    for env_id in ("MujocoQuadForce-v1",):
        off = measure(env_id, False)
        on = measure(env_id, True)
        print(f"  -> speedup {on/off:.2f}x")
