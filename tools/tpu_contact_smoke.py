"""Real-TPU smoke + timing for the coupled-contact throughput kernel.

Compiles contact_rollout_pallas8 for both models on the live chip,
checks settle behaviour, and times kernel vs dense8 scan.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
import reinmav_tpu
from reinmav_tpu.envs.core import throughput_rollout
from reinmav_tpu.ops import pallas_tpuquad

print("platform:", jax.devices()[0].platform)
B = 65536
H = 100
rng = np.random.default_rng(0)
base = np.tile(np.asarray(pallas_tpuquad._INIT0, np.float32), (B, 1))
base[:, 2] += rng.uniform(0.0, 0.05, B).astype(np.float32)
base[:, 4:7] += rng.uniform(-0.1, 0.1, (B, 3)).astype(np.float32)
base[:, 3:7] /= np.linalg.norm(base[:, 3:7], axis=1, keepdims=True)
states = jnp.asarray(base)

for model in ("ground", "quat"):
    for tile8 in (128, 256, 512):
        try:
            t0 = time.time()
            out, z = pallas_tpuquad.contact_rollout_pallas8(states.T, H, model=model, tile8=tile8)
            z0 = float(out[2].mean())
            tc = time.time() - t0
            t0 = time.time()
            out, z = pallas_tpuquad.contact_rollout_pallas8(states.T, H, model=model, tile8=tile8)
            zf = float(out[2].mean())
            tr = time.time() - t0
            rate = B * H / tr
            print(f"{model} tile8={tile8}: compile {tc:.1f}s run {tr*1e3:.1f}ms "
                  f"-> {rate/1e6:.1f}M steps/s, mean z={zf:.5f}")
        except Exception as e:
            print(f"{model} tile8={tile8}: FAILED {type(e).__name__}: {str(e)[:300]}")

# scan path comparison
env = reinmav_tpu.make("MujocoQuadForce-v0")
t0 = time.time()
f, r = throughput_rollout(env, states, jax.random.PRNGKey(0), H, backend="scan")
print("scan compile+run:", time.time() - t0, "mean z:", float(f[:, 2].mean()))
t0 = time.time()
f, r = throughput_rollout(env, states, jax.random.PRNGKey(0), H, backend="scan")
zf = float(f[:, 2].mean())
tr = time.time() - t0
print(f"scan run {tr*1e3:.1f}ms -> {B*H/tr/1e6:.1f}M steps/s, z={zf:.5f}")
