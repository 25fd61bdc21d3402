"""Generate golden trajectories from the float64 NumPy oracle.

Run:  python tests/make_goldens.py   (writes tests/goldens/*.npz)

The goldens pin the oracle's behaviour: 100-step closed-loop rollouts
(controller where available) from fixed initial states, stored as the
full trajectory.  ``test_goldens.py`` replays both the oracle and the JAX
envs against them, so any silent change to either implementation trips a
test (the reference ships no goldens — SURVEY.md §4).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from reinmav_tpu.oracle import (
    ORACLES,
    Reinmav13Oracle,
)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
HORIZON = 100


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    rng = np.random.default_rng(12345)
    for env_id, oracle_cls in sorted(ORACLES.items()):
        oracle = oracle_cls()
        if oracle_cls is Reinmav13Oracle:
            init = oracle.init_state.copy()
            oracle.reset_to(init)
            traj, rewards = [], []
            for _ in range(HORIZON):
                s, r, _, _ = oracle.step()
                traj.append(s.copy())
                rewards.append(r)
        else:
            init = rng.uniform(-0.5, 0.5, size=(oracle_cls.state_dim,))
            oracle.reset_to(init)
            traj, rewards = [], []
            for _ in range(HORIZON):
                a = oracle.control()
                s, r, _, _ = oracle.step(a)
                traj.append(s.copy())
                rewards.append(r)
        path = os.path.join(GOLDEN_DIR, env_id.replace("/", "_") + ".npz")
        np.savez_compressed(
            path, init=init, traj=np.stack(traj), rewards=np.asarray(rewards)
        )
        print("wrote", path, "traj", np.stack(traj).shape)


if __name__ == "__main__":
    main()
