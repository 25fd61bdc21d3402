"""reinmav-v0 controller-in-the-loop simulation + trajectory plots — the
reference flow ``test/test_reinmav.py`` (400 steps = 4 s of the quintic
min-jerk trajectory) + ``ReinmavEnv.plot_state``
(``reinmav_env.py:138-185``: position/velocity/yaw vs desired, saved as
PDFs), fully compiled as one ``lax.scan``.

Run:  python examples/reinmav_sim.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout use

import jax
import jax.numpy as jnp
import numpy as np

import reinmav_tpu
from reinmav_tpu.envs import reinmav13
from reinmav_tpu.render import plot_trajectory


def main():
    env = reinmav_tpu.make("reinmav-v0")
    s0 = env.reset(jax.random.PRNGKey(0))

    def body(s, _):
        out = env.step(s, jnp.zeros(0))
        return out.state, out.obs

    _, traj = jax.jit(lambda s: jax.lax.scan(body, s, None, length=400))(s0)
    traj = np.asarray(traj)

    # Desired trajectory at the outer-step times (reference plot overlay).
    times = np.arange(1, 401) / 100.0
    desired = np.stack([np.asarray(reinmav13.trj_gen(env.params, t)) for t in times])

    print("final position:", traj[-1, 0:3], "(desired ~ [1, 1, 1])")
    print("max |x - x_des|:", np.abs(traj[:, 0] - desired[:, 0]).max())
    print(plot_trajectory("reinmav-v0", traj, "reinmav_sim", desired=desired))


if __name__ == "__main__":
    main()
