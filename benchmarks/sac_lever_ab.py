"""Full-loop SAC lever A/B on the real TPU: one session, one chip, each
arm the COMPLETE train loop with one knob turned (tunnel rule: never
compare timings across sessions).  Arms:

  base        f32, sample_tile=1           (the r3 headline config)
  bf16        compute_dtype=bfloat16
  tile128     sample_tile=128
  batch1k     batch_size=1024              (isolates update+gather share)
  bf16+tile   both levers
"""
import time

import jax
import numpy as np

import reinmav_tpu
from reinmav_tpu.rl import sac

K = 64


def measure(name, **kw):
    env = reinmav_tpu.make("MujocoQuadForce-v1")
    kw.setdefault("batch_size", 8192)
    kw.setdefault("buffer_capacity", 1 << 21)
    cfg = sac.SacConfig(num_envs=65536, warmup_steps=0, **kw)
    state = sac.init_state(env, cfg, jax.random.PRNGKey(0))
    fn = jax.jit(lambda s: sac.train_iters(env, cfg, s, K))
    state2, m = fn(state)
    float(np.asarray(state2.total_steps))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state2, m = fn(state)
        float(np.asarray(state2.total_steps))
        ts.append(time.perf_counter() - t0)
    assert np.isfinite(float(np.asarray(m["q_loss"])))
    sps = K * cfg.num_envs / min(ts)
    print(f"{name:12s}: {min(ts)/K*1e3:7.3f} ms/iter  {sps/1e6:6.1f}M steps/s",
          flush=True)
    return sps


if __name__ == "__main__":
    import sys

    arms = sys.argv[1:] or ["base", "bf16", "tile128", "bf16+tile",
                            "batch1k", "tile+b1k"]
    off = dict(fused_collect="off")
    spec = {
        "base": dict(**off),
        "bf16": dict(compute_dtype="bfloat16", **off),
        "tile128": dict(sample_tile=128, **off),
        "bf16+tile": dict(compute_dtype="bfloat16", sample_tile=128, **off),
        "batch1k": dict(batch_size=1024, **off),
        "tile+b1k": dict(sample_tile=128, batch_size=1024, **off),
        "fcol": dict(fused_collect="auto"),
        "fcol+tile": dict(fused_collect="auto", sample_tile=128),
        "fcol+t+bf16": dict(fused_collect="auto", sample_tile=128,
                            compute_dtype="bfloat16"),
        "buf256k": dict(buffer_capacity=1 << 18, **off),
        "fcol+t+b256k": dict(fused_collect="auto", sample_tile=128,
                             buffer_capacity=1 << 18),
    }
    for name in arms:
        measure(name, **spec[name])
