"""SAC compute_dtype A/B on the real TPU: f32 vs bf16 matmul inputs at
the bench.py headline config.  (Run solo on an idle chip.)"""
import time

import jax
import numpy as np

import reinmav_tpu
from reinmav_tpu.rl import sac


def measure(cd, K=128):
    env = reinmav_tpu.make("MujocoQuadForce-v1")
    cfg = sac.SacConfig(num_envs=65536, batch_size=8192,
                        buffer_capacity=1 << 21, warmup_steps=0,
                        compute_dtype=cd)
    state = sac.init_state(env, cfg, jax.random.PRNGKey(0))
    fn = sac.make_train_iters(env, cfg, K)
    state2, m = fn(state)
    float(np.asarray(state2.total_steps))  # sync (tunnel rule)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state2, m = fn(state)
        float(np.asarray(state2.total_steps))
        ts.append(time.perf_counter() - t0)
    assert np.isfinite(float(np.asarray(m["q_loss"])))
    sps = K * cfg.num_envs / min(ts)
    print(f"compute_dtype={cd}: {min(ts)/K*1e3:.3f} ms/iter, "
          f"{sps/1e6:.1f}M env-steps/s")
    return sps


if __name__ == "__main__":
    f32 = measure("float32")
    bf16 = measure("bfloat16")
    print(f"  -> bf16 speedup {bf16/f32:.2f}x")
