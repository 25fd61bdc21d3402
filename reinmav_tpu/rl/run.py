"""Train/play CLI — the TPU-native counterpart of the reference's
baselines-style entry points (``gym_reinmav/run.py:40-218`` and
``example/mujoco/train_hovering.py:34-193``).

Usage (mirrors ``README.md:134`` / ``train_hovering.py:28-32``)::

    python -m reinmav_tpu.rl.run --alg=ppo --env=quadrotor3d-v0 \
        --num_timesteps=1e7 --num_env=1024 --save_path=./models/quad3d
    python -m reinmav_tpu.rl.run --env=MujocoQuadForce-v1 --play \
        --load_path=./models/quad3d

Differences by design: envs are batched on-device (``--num_env`` shards
over the mesh instead of spawning subprocesses); rank-gated logging is
``jax.process_index() == 0`` instead of MPI.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import make
from ..parallel.mesh import make_mesh
from ..utils import checkpoint as ckpt
from ..utils.metrics import MetricsLogger
from . import evaluate, networks, ppo


def build_parser() -> argparse.ArgumentParser:
    # Flag names follow the reference CLIs (run.py:151-163,
    # train_hovering.py:34-54).
    p = argparse.ArgumentParser(description="TPU-native PPO training for reinmav envs")
    p.add_argument("--env", default="quadrotor3d-v0")
    p.add_argument("--alg", default="ppo",
                   choices=["ppo", "a2c", "ppo_kl", "sac", "td3", "ddpg"],
                   help="a2c = single-pass advantage actor-critic: the PPO "
                        "machinery with one epoch, one batch and no ratio "
                        "clipping (the surrogate reduces to the vanilla PG "
                        "loss at ratio=1).  ppo_kl = adaptive-KL-penalty "
                        "PPO (baselines ppo1 / TRPO-flavoured: beta*KL "
                        "instead of clipping, beta adapted to --kl_target). "
                        "sac = off-policy soft actor-critic with a "
                        "TPU-resident replay buffer (rl/sac.py).  td3 = "
                        "twin-delayed DDPG on the same replay machinery "
                        "(rl/td3.py).  ddpg = classic DDPG: td3 with "
                        "single_critic, policy_noise=0, policy_delay=1")
    p.add_argument("--network", default="mlp", choices=["mlp", "gru"],
                   help="policy network for --alg=ppo: the default fused "
                        "2-layer MLP, or a GRU recurrent actor-critic "
                        "(rl/recurrent.py — the reference stack's "
                        "network= kwarg, gym_reinmav/run.py:63-68; "
                        "sequences train whole, minibatched over envs)")
    # Off-policy knobs (ignored by the on-policy algs).
    p.add_argument("--buffer_capacity", type=int, default=1 << 20)
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--grad_steps", type=int, default=1,
                   help="SAC gradient updates per collected env step")
    p.add_argument("--warmup_steps", type=int, default=10_000)
    p.add_argument("--tau", type=float, default=0.005)
    p.add_argument("--reward_scale", type=float, default=1.0)
    p.add_argument("--target_entropy", type=float, default=None,
                   help="SAC entropy target (default -action_dim); more "
                        "negative = less exploration noise")
    p.add_argument("--sample_tile", default="auto",
                   type=lambda v: v if v == "auto" else int(v),
                   help="replay gather granularity: 'auto' (default) = "
                        "exact uniform tile=1 (tiled block sampling "
                        "measurably collapses learning on deterministic-"
                        "reset envs — see SacConfig.sample_tile); an int "
                        "forces a tile width for experiments")
    p.add_argument("--explore_noise", type=float, default=0.1,
                   help="TD3 collect-time action-noise std")
    p.add_argument("--policy_noise", type=float, default=0.2,
                   help="TD3 target-smoothing noise std")
    p.add_argument("--policy_delay", type=int, default=2,
                   help="TD3 critic updates per actor/target update")
    p.add_argument("--kl_target", type=float, default=0.01,
                   help="per-update KL target for --alg=ppo_kl")
    p.add_argument("--num_timesteps", type=float, default=1e6)
    p.add_argument("--num_env", type=int, default=1024)
    p.add_argument("--rollout_len", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--lam", type=float, default=0.95)
    p.add_argument("--clip", type=float, default=0.2)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--num_hidden", type=int, default=64)
    p.add_argument("--compute_dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="matmul input precision for the learner networks "
                        "(accumulation and params stay float32; bfloat16 "
                        "halves the hidden-activation HBM traffic — the "
                        "PPO/SAC/TD3 update phases' bandwidth cost)")
    p.add_argument("--ent_coef", type=float, default=0.0)
    p.add_argument("--log_std_floor", type=float, default=None,
                   help="lower clamp on the policy log-std after each "
                        "optimiser step; with ent_coef=0 long runs "
                        "collapse exploration (log_std drifts to ~-2 in "
                        "the 500M-step hover artifact) — a floor keeps "
                        "minimum noise without biasing the gradient")
    p.add_argument("--save_path", default=None)
    p.add_argument("--load_path", default=None)
    p.add_argument("--save_interval", type=int, default=50)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--updates_per_jit", type=int, default=1,
                   help="fold this many updates (PPO) / iterations "
                        "(sac/td3/ddpg) into one compiled call — amortises "
                        "per-dispatch overhead on remote TPU runtimes, worth "
                        "~30%% at 16-256 for PPO and up to ~20%% at 1024-4096 "
                        "for the off-policy loops (results.json "
                        "ppo_dispatch_folding / sac_dispatch_folding)")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--eval_interval", type=int, default=0,
                   help="greedy-policy evaluation every N logged updates (0=off)")
    p.add_argument("--eval_envs", type=int, default=256)
    p.add_argument("--eval_horizon", type=int, default=1000)
    p.add_argument("--play", action="store_true")
    p.add_argument("--play_steps", type=int, default=1000)
    p.add_argument("--live", action="store_true",
                   help="serve a LIVE browser view during --play (the "
                        "reference's vpython while-stepping canvas, as a "
                        "stdlib HTTP page; prints the URL)")
    p.add_argument("--live_port", type=int, default=0,
                   help="port for --live (0 = ephemeral)")
    p.add_argument("--live_hold", type=float, default=0.0,
                   help="keep the --live server up this many seconds "
                        "after the rollout ends")
    p.add_argument("--gif", default=None, help="write the play rollout as a GIF")
    p.add_argument("--html", default=None,
                   help="write the play rollout as an interactive HTML "
                        "animation (self-contained, open in any browser)")
    p.add_argument("--no_mesh", action="store_true", help="disable mesh sharding")
    p.add_argument("--shard_map", action="store_true",
                   help="multi-chip FAST path: shard_map train step with "
                        "per-device dense rollouts + fused loss kernels "
                        "(MPI-recipe semantics; see ppo.make_train_step_shardmap)")
    return p


def _offpolicy_alg_cfg(args):
    """Resolve ``--alg=sac|td3|ddpg`` to (module, config).  Shared by
    the train and play paths (the restore target must mirror the
    training shapes, so --play rebuilds the same config)."""
    common = dict(
        num_envs=args.num_env,
        buffer_capacity=args.buffer_capacity,
        batch_size=args.batch_size,
        learning_rate=args.lr,
        gamma=args.gamma,
        tau=args.tau,
        grad_steps=args.grad_steps,
        warmup_steps=args.warmup_steps,
        reward_scale=args.reward_scale,
        sample_tile=args.sample_tile,
        hidden=tuple([args.num_hidden] * args.num_layers),
        compute_dtype=args.compute_dtype,
    )
    if args.alg == "sac":
        from . import sac as alg

        return alg, alg.SacConfig(target_entropy=args.target_entropy,
                                  **common)
    from . import td3 as alg

    if args.alg == "ddpg":
        # Classic DDPG = TD3 minus its three additions (rl/td3.py
        # module docstring); --policy_noise/--policy_delay are TD3
        # knobs and intentionally not threaded through.
        return alg, alg.Td3Config(
            explore_noise=args.explore_noise,
            policy_noise=0.0, noise_clip=0.0, policy_delay=1,
            single_critic=True,
            **common,
        )
    return alg, alg.Td3Config(
        explore_noise=args.explore_noise,
        policy_noise=args.policy_noise,
        policy_delay=args.policy_delay,
        **common,
    )


def train_offpolicy(args):
    """Off-policy training loop (--alg=sac|td3|ddpg): iterations are
    single batched env steps + replay-sampled gradient updates, folded
    ``--updates_per_jit`` at a time into one compiled call."""
    env = make(args.env)
    alg, cfg = _offpolicy_alg_cfg(args)
    k = max(1, args.updates_per_jit)
    fn = alg.make_train_iters(env, cfg, k)
    state = alg.init_state(env, cfg, jax.random.PRNGKey(args.seed))
    if args.load_path:
        state = ckpt.restore(args.load_path, state)

    steps_per_call = cfg.num_envs * k
    num_calls = max(1, int(args.num_timesteps) // steps_per_call)
    logger = MetricsLogger(log_dir=args.log_dir, config=vars(args))
    last_t, last_call = time.perf_counter(), 0
    for call in range(1, num_calls + 1):
        state, metrics = fn(state)
        if call % args.log_interval == 0 or call == num_calls:
            float(np.asarray(state.total_steps))  # transfer fence
            now = time.perf_counter()
            sps = steps_per_call * (call - last_call) / max(now - last_t, 1e-9)
            last_t, last_call = now, call
            logger.log(call, {"env_steps": int(call) * steps_per_call,
                              "steps_per_sec": round(sps),
                              **jax.device_get(metrics)})
        if args.eval_interval and call % args.eval_interval == 0:
            stats = evaluate.evaluate_policy(
                env,
                lambda obs: alg.greedy_action(env, state.actor, obs),
                jax.random.fold_in(state.key, call),
                num_envs=args.eval_envs, horizon=args.eval_horizon,
            )
            logger.log(call, {"eval_mean_return": stats.mean_return,
                              "eval_mean_length": stats.mean_length,
                              "eval_episodes": stats.num_episodes,
                              "eval_running_return": stats.mean_running_return,
                              "eval_survival_frac": stats.survival_frac})
        if args.save_path and call % args.save_interval == 0:
            ckpt.save(args.save_path, state)
    if args.save_path:
        ckpt.save(args.save_path, state)
    return state


def train_recurrent(args):
    """--network=gru training loop (rl/recurrent.py): GRU actor-critic
    PPO, env-axis minibatches, whole sequences."""
    from . import recurrent

    env = make(args.env)
    cfg = recurrent.RecurrentPpoConfig(
        num_envs=args.num_env,
        rollout_len=args.rollout_len,
        hidden=args.num_hidden,
        embed=args.num_hidden,
        learning_rate=args.lr,
        gamma=args.gamma,
        lam=args.lam,
        clip_eps=args.clip,
        entropy_coef=args.ent_coef,
    )
    k = max(1, args.updates_per_jit)
    fn = (recurrent.make_train_step(env, cfg) if k == 1
          else recurrent.make_train_many(env, cfg, k))
    state = recurrent.init_train_state(env, cfg, jax.random.PRNGKey(args.seed))
    if args.load_path:
        state = ckpt.restore(args.load_path, state)
    steps_per_update = cfg.num_envs * cfg.rollout_len
    num_updates = max(1, int(args.num_timesteps) // steps_per_update)
    logger = MetricsLogger(log_dir=args.log_dir, config=vars(args))
    last_t, last_update, update = time.perf_counter(), 0, 0
    while update < num_updates:
        state, metrics = fn(state)
        update += k
        if (update // k) % args.log_interval == 0 or update >= num_updates:
            float(np.asarray(state.update_step))  # transfer fence
            now = time.perf_counter()
            sps = steps_per_update * (update - last_update) / max(
                now - last_t, 1e-9)
            last_t, last_update = now, update
            logger.log(update, {"env_steps": steps_per_update * update,
                                "steps_per_sec": round(sps),
                                **jax.device_get(metrics)})
        if args.save_path and (update // k) % args.save_interval == 0:
            ckpt.save(args.save_path, state)
    if args.save_path:
        ckpt.save(args.save_path, state)
    return state


def train(args) -> ppo.TrainState:
    env = make(args.env)
    cfg = ppo.PpoConfig(
        num_envs=args.num_env,
        rollout_len=args.rollout_len,
        learning_rate=args.lr,
        gamma=args.gamma,
        gae_lambda=args.lam,
        clip_eps=args.clip,
        entropy_coef=args.ent_coef,
        log_std_floor=args.log_std_floor,
        hidden=tuple([args.num_hidden] * args.num_layers),
        compute_dtype=args.compute_dtype,
    )
    if args.alg == "a2c":
        # On-policy single-pass PG: with exactly one epoch over the fresh
        # rollout the importance ratio is 1, so an unclipped PPO surrogate
        # IS the A2C objective (reference: baselines a2c via run.py --alg).
        cfg = cfg._replace(num_epochs=1, num_minibatches=1, clip_eps=1e9,
                           value_clip_eps=1e9)
    elif args.alg == "ppo_kl":
        cfg = cfg._replace(kl_target=args.kl_target)
    mesh = None if args.no_mesh else make_mesh()
    k = max(1, args.updates_per_jit)
    if args.shard_map and mesh is None:
        raise SystemExit("--shard_map requires a mesh (drop --no_mesh)")
    if args.shard_map:
        step_fn = (
            ppo.make_train_step_shardmap(env, cfg, mesh)
            if k == 1
            else ppo.make_train_many_shardmap(env, cfg, k, mesh)
        )
    else:
        step_fn = (
            ppo.make_train_step(env, cfg, mesh)
            if k == 1
            else ppo.make_train_many(env, cfg, k, mesh)
        )
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(args.seed))
    if args.load_path:
        state = ckpt.restore(args.load_path, state)

    steps_per_update = cfg.num_envs * cfg.rollout_len
    num_updates = max(1, int(args.num_timesteps) // steps_per_update)
    logger = MetricsLogger(log_dir=args.log_dir, config=vars(args))

    last_t = time.perf_counter()
    last_update = 0
    update = 0
    while update < num_updates:
        state, metrics = step_fn(state)
        update += k
        # (train_many already averages its stacked metrics in-jit.)
        if (update // k) % args.log_interval == 0 or update >= num_updates:
            # Interval rate (not cumulative): the first interval absorbs
            # the multi-minute XLA compile and would dominate a running
            # average for hundreds of updates.  Timing-honesty rule
            # (CLAUDE.md / bench.py): force a device->host transfer of a
            # scalar that depends on the update — on the tunnelled TPU
            # runtime block_until_ready returns before execution completes
            # and would inflate steps_per_sec.
            float(np.asarray(state.update_step))
            now = time.perf_counter()
            sps = steps_per_update * (update - last_update) / max(now - last_t, 1e-9)
            last_t, last_update = now, update
            # One bulk device->host fetch (per-scalar float() would pay a
            # tunnel round trip per metric).
            host_metrics = jax.device_get(metrics)
            logger.log(
                update,
                {"env_steps": steps_per_update * update,
                 "steps_per_sec": round(sps),
                 **host_metrics},
            )
        if args.eval_interval and (update // k) % args.eval_interval == 0:
            stats = evaluate.evaluate(
                env, state.params,
                state.obs_norm if cfg.normalize_obs else None,
                jax.random.fold_in(state.key, update),
                num_envs=args.eval_envs, horizon=args.eval_horizon,
            )
            logger.log(update, {"eval_mean_return": stats.mean_return,
                                "eval_mean_length": stats.mean_length,
                                "eval_episodes": stats.num_episodes,
                                "eval_running_return": stats.mean_running_return,
                                "eval_survival_frac": stats.survival_frac})
        # ckpt.save is COLLECTIVE: in a multi-process run every process
        # must call it (each writes its addressable shards of the global
        # env batch) — host-0 gating would deadlock/drop shards.
        if args.save_path and (update // k) % args.save_interval == 0:
            ckpt.save(args.save_path, state)

    if args.save_path:
        ckpt.save(args.save_path, state)
    return state


def _greedy_rollout(env, args, greedy_step):
    """Shared ``--play`` loop: single-env greedy stepping with
    reset-on-done, returning the stacked obs trajectory.
    ``greedy_step(state) -> StepOut`` applies the policy and steps.
    With ``--live``, each stepped obs streams to the browser viewer AS
    the loop runs (the reference's vpython while-stepping canvas,
    render/live_view.py)."""
    viewer = None
    if getattr(args, "live", False):
        from ..render import LiveViewer

        viewer = LiveViewer(args.env, port=args.live_port)
        print(f"# live view: {viewer.url}", flush=True)
    try:
        s = env.reset(jax.random.PRNGKey(args.seed + 1))
        total_reward, episodes = 0.0, 0
        states = []
        for t in range(args.play_steps):
            out = greedy_step(s)
            total_reward += float(out.reward)
            states.append(np.asarray(out.obs))
            if viewer is not None:
                viewer.push(states[-1])
            truncated = out.truncated is not None and bool(out.truncated)
            if bool(out.done) or truncated:  # episode boundary / time_limit
                episodes += 1
                s = env.reset(jax.random.PRNGKey(args.seed + 3 + t))
            else:
                s = out.state
        if viewer is not None:
            viewer.finish()
            if args.live_hold > 0:
                print(f"# live view held for {args.live_hold}s: {viewer.url}",
                      flush=True)
                time.sleep(args.live_hold)
    finally:
        if viewer is not None:
            viewer.close()  # no leaked server/socket on repeated play calls
    return np.stack(states), total_reward, episodes


def play(args, state: ppo.TrainState | None = None):
    """Deterministic greedy rollout with the trained policy
    (the ``--play`` loop of ``run.py:190-213``)."""
    env = make(args.env)
    # The restore target must mirror the TRAINING shapes (num_env /
    # rollout_len define env_states/env_returns sizes in the checkpoint).
    cfg = ppo.PpoConfig(
        num_envs=args.num_env, rollout_len=args.rollout_len,
        hidden=tuple([args.num_hidden] * args.num_layers),
    )
    if state is None:
        state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(args.seed))
        if args.load_path:
            state = ckpt.restore(args.load_path, state)

    @jax.jit
    def greedy_step(params, obs_norm, s):
        obs = s[: env.obs_dim]
        norm = ppo._normalize(obs, obs_norm)
        mean, _, _ = networks.apply(params, norm)
        out = env.step(s, mean)
        return out

    states, total_reward, episodes = _greedy_rollout(
        env, args, lambda s: greedy_step(state.params, state.obs_norm, s))
    return _emit_play_outputs(env, args, states, total_reward, episodes)


def play_recurrent(args, state=None):
    """``--play`` for ``--network=gru``: greedy (mean-action) rollout
    with the GRU hidden threaded through the play loop and masked on
    episode boundaries exactly as in training (recurrent.policy_step) —
    the reference play loop works for every policy it can train
    (``run.py:190-213``).  GIF/HTML export ride the shared emitter."""
    from . import recurrent

    env = make(args.env)
    cfg = recurrent.RecurrentPpoConfig(
        num_envs=args.num_env, rollout_len=args.rollout_len,
        hidden=args.num_hidden, embed=args.num_hidden,
    )
    if state is None:
        state = recurrent.init_train_state(env, cfg,
                                           jax.random.PRNGKey(args.seed))
        if args.load_path:
            state = ckpt.restore(args.load_path, state)

    @jax.jit
    def greedy_step(params, h, done_prev, s):
        a, h2 = recurrent.greedy_action(
            env, params, h, s[: env.obs_dim].astype(jnp.float32), done_prev)
        out = env.step(s, a.astype(s.dtype))
        return out, h2

    # The hidden is the play loop's carry: _greedy_rollout resets the
    # ENV state on done; the GRU state resets itself via the done_prev
    # mask on the next call (same contract as the training scan).
    carry = {
        "h": jnp.zeros((cfg.hidden, 1), jnp.float32),
        "d": jnp.zeros((1,), jnp.float32),
    }

    def step(s):
        out, h2 = greedy_step(state.params, carry["h"], carry["d"], s)
        carry["h"] = h2
        carry["d"] = jnp.asarray(
            [float(bool(out.done) or (out.truncated is not None
                                      and bool(out.truncated)))],
            jnp.float32)
        return out

    states, total_reward, episodes = _greedy_rollout(env, args, step)
    return _emit_play_outputs(env, args, states, total_reward, episodes)


def play_offpolicy(args, state=None):
    """``--play`` for the off-policy algs: noise-free actor rollout
    with the same reset-on-done loop and GIF/HTML export as the PPO
    path.  The restore target mirrors the training shapes (the
    checkpoint carries the replay ring), so pass the same --num_env /
    --buffer_capacity / net flags as the training run."""
    env = make(args.env)
    alg, cfg = _offpolicy_alg_cfg(args)
    if state is None:
        state = alg.init_state(env, cfg, jax.random.PRNGKey(args.seed))
        if args.load_path:
            state = ckpt.restore(args.load_path, state)

    @jax.jit
    def greedy_step(actor, s):
        return env.step(s, alg.greedy_action(env, actor, s[: env.obs_dim]))

    states, total_reward, episodes = _greedy_rollout(
        env, args, lambda s: greedy_step(state.actor, s))
    return _emit_play_outputs(env, args, states, total_reward, episodes)


def _emit_play_outputs(env, args, states, total_reward, episodes):
    if args.gif:
        from ..render import save_gif

        save_gif(env.name, states, args.gif)
    if args.html:
        from ..render import save_html

        save_html(env.name, states, args.html)
    print(json.dumps({"play_steps": args.play_steps, "episodes": episodes,
                      "total_reward": round(total_reward, 3),
                      **({"gif": args.gif} if args.gif else {}),
                      **({"html": args.html} if args.html else {})}))
    return states


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.alg in ("sac", "td3", "ddpg"):
        state = None
        if not args.play or args.load_path is None:
            state = train_offpolicy(args)
        if args.play:
            play_offpolicy(args, state)
        return
    if args.network == "gru":
        if args.alg != "ppo":
            raise SystemExit("--network=gru supports --alg=ppo only")
        state = None
        if not args.play or args.load_path is None:
            state = train_recurrent(args)
        if args.play:
            play_recurrent(args, state)
        return
    state = None
    if not args.play or args.load_path is None:
        state = train(args)
    if args.play:
        play(args, state)


if __name__ == "__main__":
    main()
