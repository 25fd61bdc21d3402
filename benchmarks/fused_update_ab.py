"""Quantify fused_update on the real TPU: train_many(8) ms/update with
the kernel off vs on, quad3d + Force-v1.  (Run solo on an idle chip.)"""
import time
import jax
import numpy as np
import reinmav_tpu
from reinmav_tpu.rl import ppo

def measure(env_id, fused_update, K=8):
    env = reinmav_tpu.make(env_id)
    cfg = ppo.PpoConfig(num_envs=32768, rollout_len=32, hidden=(64, 64),
                        compute_dtype="bfloat16",
                        fused_update=("auto" if fused_update else "off"))
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0))
    fn = jax.jit(lambda s: ppo.train_many(env, cfg, s, K))
    state, m = fn(state)
    float(np.asarray(jax.tree.leaves(m)[0]).ravel()[0])  # sync (tunnel rule)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = fn(state)
        float(np.asarray(jax.tree.leaves(m)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / K * 1000
    sps = cfg.num_envs * cfg.rollout_len / (min(ts) / K)
    print(f"{env_id} fused_update={fused_update}: {ms:.2f} ms/update, "
          f"{sps/1e6:.1f}M env-steps/s")
    return sps

if __name__ == "__main__":
    for env_id in ("quadrotor3d-v0", "MujocoQuadForce-v1"):
        off = measure(env_id, False)
        on = measure(env_id, True)
        print(f"  -> speedup {on/off:.2f}x")
