import jax
jax.config.update("jax_platforms", "cpu")
import time
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
import reinmav_tpu
from reinmav_tpu.ops import pallas_tpuquad
from jax.experimental.pallas import tpu as pltpu

env = reinmav_tpu.make("MujocoQuadForce-v0")
B = 64
rng = np.random.default_rng(3)
base = np.tile(np.asarray(pallas_tpuquad._INIT0, np.float32), (B, 1))
base[:, 2] += rng.uniform(0.0, 0.05, B)
base[:, 4:7] += rng.uniform(-0.05, 0.05, (B, 3))
base[:, 7:13] += rng.uniform(-0.2, 0.2, (B, 6))
base[:, 3:7] /= np.linalg.norm(base[:, 3:7], axis=1, keepdims=True)
states = jnp.asarray(base)

a = jnp.zeros((B, 4), jnp.float32)
f_scan = jax.jit(jax.vmap(lambda s, aa: env.step_fn(env.params, s, aa).state, (0, 0)))(states, a)

t0 = time.time()
with pltpu.force_tpu_interpret_mode():
    f_pal, _ = pallas_tpuquad.contact_rollout_pallas8(states.T, 1, model="ground", tile8=8)
print(f"interpret 1 step B=64: {time.time()-t0:.1f}s")
err = np.abs(np.asarray(f_pal.T) - np.asarray(f_scan)).max()
print("kernel vs scan 1-step max err:", err)
