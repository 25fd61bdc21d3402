"""PPO on quadrotor2d-v0 — the stable-baselines recipe of the reference
(``examples/train_quadrotor2d_ppo2.py``: PPO2 + MlpPolicy, 3e5 steps,
then a play rollout), TPU-native.

Run:  python examples/train_quadrotor2d_ppo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout use

import jax

import reinmav_tpu
from reinmav_tpu.rl import ppo


def main():
    env = reinmav_tpu.make("quadrotor2d-v0")
    cfg = ppo.PpoConfig(num_envs=512, rollout_len=64, hidden=(64, 64))
    step = ppo.make_train_step(env, cfg)
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0))

    total_steps = 300_000
    per_update = cfg.num_envs * cfg.rollout_len
    for update in range(max(1, total_steps // per_update)):
        state, metrics = step(state)
        print(f"update {update}: mean_reward={float(metrics['mean_reward']):.4f}")

    # Play: greedy policy, single env, 1000 steps.
    from reinmav_tpu.rl import networks

    s = env.reset(jax.random.PRNGKey(1))
    ret = 0.0
    for _ in range(1000):
        obs = s[: env.obs_dim]
        norm = ppo._normalize(obs, state.obs_norm)
        mean, _, _ = networks.apply(state.params, norm)
        out = env.step(s, mean)
        ret += float(out.reward)
        s = env.reset(jax.random.PRNGKey(2)) if bool(out.done) else out.state
    print("play return:", ret)


if __name__ == "__main__":
    main()
