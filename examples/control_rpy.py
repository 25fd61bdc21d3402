"""Cascaded RPY PID flying the force-actuated quad on a circle — the
reference demo ``example/mujoco/control_rpy.py`` (1000-step loop, circle
R=0.5, ω=1 rad/s, z=1), rebuilt on the TPU-native rigid-body env and fully
compiled as one ``lax.scan``.

Run:  python examples/control_rpy.py   (writes control_rpy_path3d.pdf)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout use

import jax
import jax.numpy as jnp
import numpy as np

import reinmav_tpu
from reinmav_tpu.controllers import rpy_pid
from reinmav_tpu.render import plot_trajectory


def main():
    env = reinmav_tpu.make("MujocoQuadForce-v0")
    p = env.params
    dt = p.dt * p.frame_skip
    gains = rpy_pid.Gains()

    def body(carry, t):
        s, pid = carry
        pos_d = jnp.stack([0.5 * jnp.cos(dt * t), 0.5 * jnp.sin(dt * t), 1.0])
        yaw_d = jnp.mod(dt * t + jnp.pi, 2 * jnp.pi) - jnp.pi
        forces, pid = rpy_pid.control(
            gains, pid, s[0:3], s[3:7], pos_d, yaw_d, dt, p.mass, p.gravity
        )
        out = env.step(s, forces)
        return (out.state, pid), out.state

    s0 = env.reset(jax.random.PRNGKey(0))
    (_, _), traj = jax.jit(
        lambda s, c: jax.lax.scan(body, (s, c), jnp.arange(1000.0))
    )(s0, rpy_pid.init_carry(s0.dtype))

    traj = np.asarray(traj)
    print("final position:", traj[-1, 0:3])
    print(plot_trajectory("MujocoQuadForce-v0", traj, "control_rpy"))


if __name__ == "__main__":
    main()
