"""Geometric quaternion controller flying the body-rate quad on a circle —
the reference demo ``example/mujoco/control_quat.py`` (10k steps, circle
R=0.5, ω=1 rad/s, z=1), on the TPU-native rigid-body env.

Note: like the reference demo, the controller is mass-blind (thrust =
desired_acc·ẑ_b), so the 0.4 kg quat model settles above the commanded
altitude — faithful behaviour, see tests/test_controllers.py.

Run:  python examples/control_quat.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout use

import jax
import jax.numpy as jnp
import numpy as np

import reinmav_tpu
from reinmav_tpu.controllers import geometric
from reinmav_tpu.render import plot_trajectory


def main():
    env = reinmav_tpu.make("MujocoQuadQuat-v0")
    dt = env.params.dt * env.params.frame_skip
    gains = geometric.Gains(gravity=-9.81)

    def body(s, t):
        ref_pos = geometric.circle_reference(dt * t, radius=0.5, omega=1.0, z=1.0)
        a = geometric.control(gains, s[0:3], s[3:7], s[7:10], ref_pos)
        out = env.step(s, a)
        return out.state, out.state

    s0 = env.reset(jax.random.PRNGKey(0))
    _, traj = jax.jit(lambda s: jax.lax.scan(body, s, jnp.arange(10000.0)))(s0)

    traj = np.asarray(traj)
    print("final position:", traj[-1, 0:3])
    print(plot_trajectory("MujocoQuadQuat-v0", traj, "control_quat"))


if __name__ == "__main__":
    main()
