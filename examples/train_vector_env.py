"""Train through the ``gymnasium.vector.VectorEnv`` adapter with an
EXTERNAL-library-style loop — numpy policy, standard ``reset``/``step``
vector API, no reinmav_tpu internals.

Demonstrates the role the reference filled with baselines'
``make_vec_env`` + ppo2 (``gym_reinmav/run.py:73-94``): any third-party
RL library that can drive a gymnasium VectorEnv gets the batched
on-device stepping.  The learner here is a deliberately tiny vanilla
policy gradient (REINFORCE with a value baseline) written in numpy —
the point is the interface, not the algorithm; for the real learner use
``python -m reinmav_tpu.rl.run``.

Run: python examples/train_vector_env.py [--num_envs 512] [--iters 30]
"""

import argparse

import numpy as np

from reinmav_tpu.compat import vector_env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=512)
    ap.add_argument("--horizon", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    venv = vector_env.make_vec("quadrotor3d-v0", args.num_envs)
    obs_dim = venv.single_observation_space.shape[0]
    act_dim = venv.single_action_space.shape[0]

    rng = np.random.default_rng(args.seed)
    # Linear-Gaussian policy + linear value baseline, pure numpy.
    W = 0.01 * rng.standard_normal((obs_dim, act_dim))
    b = np.zeros(act_dim)
    log_std = np.full(act_dim, -0.5)
    Vw = np.zeros(obs_dim)

    obs, _ = venv.reset(seed=args.seed)
    for it in range(args.iters):
        obs_buf, act_buf, rew_buf, done_buf = [], [], [], []
        for _ in range(args.horizon):
            mean = obs @ W + b
            act = mean + np.exp(log_std) * rng.standard_normal(mean.shape)
            nobs, rew, term, trunc, _ = venv.step(act.astype(np.float32))
            obs_buf.append(obs)
            act_buf.append(act)
            rew_buf.append(rew)
            done_buf.append(term | trunc)
            obs = nobs
        O = np.stack(obs_buf)          # (T, N, d)
        A = np.stack(act_buf)
        R = np.stack(rew_buf)
        D = np.stack(done_buf)

        # Reward-to-go with done masking; linear value baseline.
        G = np.zeros_like(R)
        run = np.zeros(R.shape[1])
        for t in range(R.shape[0] - 1, -1, -1):
            run = R[t] + 0.99 * run * (1.0 - D[t])
            G[t] = run
        V = O @ Vw
        adv = G - V
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        # REINFORCE gradient for the linear-Gaussian policy.
        z = (A - (O @ W + b)) / np.exp(log_std)
        gW = np.einsum("tnd,tna->da", O, z * adv[..., None]) / z[..., 0].size
        gb = (z * adv[..., None]).mean((0, 1))
        W += args.lr * gW / np.exp(log_std)
        b += args.lr * gb / np.exp(log_std)
        # Value baseline: one least-mean-squares step.
        Vw += 1e-3 * np.einsum("tnd,tn->d", O, (G - V)) / G.size

        print(f"iter {it:3d}  mean_reward {R.mean():+.3f}  "
              f"episodes_ended {int(D.sum())}")


if __name__ == "__main__":
    main()
