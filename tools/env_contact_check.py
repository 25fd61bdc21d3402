import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import sys, time
sys.path.insert(0, "/root/repo")
import reinmav_tpu
from reinmav_tpu.oracle import tpuquad_ref as ref

env = reinmav_tpu.make("MujocoQuadForce-v0")
step = jax.jit(lambda s, a: env.step_fn(env.params, s, a).state)

q0 = np.array([0, 0, 0.06, 0.996, 0.05, 0.05, 0, 0.3, 0, 0, 0, 0, 0], float)
q0[3:7] /= np.linalg.norm(q0[3:7])
t0 = time.time()
s_env = step(q0, np.zeros(4))
print(f"compile: {time.time()-t0:.1f}s")

s_env = q0.copy(); s_or = q0.copy()
worst = 0.0
t0 = time.time()
for t in range(50):
    a = np.zeros(4)
    s_env = np.asarray(step(s_env, a))
    s_or, _, _, _ = ref.step_force(s_or, a)
    worst = max(worst, np.abs(s_env - s_or).max())
print(f"env vs oracle lockstep (50 outer steps, f64): {worst:.3e} ({time.time()-t0:.1f}s)")

import mujoco
ASSETS = "/root/reference/gym_reinmav/envs/mujoco/assets"
m = mujoco.MjModel.from_xml_string(open(f"{ASSETS}/quadrotor_ground.xml").read())
d = mujoco.MjData(m)
d.qpos[:] = q0[:7]; d.qvel[:] = q0[7:]
s_env = q0.copy()
worst_p = worst_q = 0.0
for t in range(50):
    for _ in range(2):
        d.ctrl[:] = 0; mujoco.mj_step(m, d)
    s_env = np.asarray(step(s_env, np.zeros(4)))
    mjs = np.concatenate([d.qpos, d.qvel])
    worst_p = max(worst_p, np.abs(mjs[:3]-s_env[:3]).max())
    worst_q = max(worst_q, np.abs(mjs[3:7]-s_env[3:7]).max())
print(f"env vs mj tilted drop 1s: pos {worst_p:.3e} quat {worst_q:.3e}")
