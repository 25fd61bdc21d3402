"""Multi-chip scaling bench: per-device env-steps/s and weak-scaling
efficiency for the shard_map rollout and the shard_map PPO train loop,
over any device mesh — the harness that produces the BASELINE.json
"host-scaling efficiency" row the moment real multi-chip hardware is
available (this environment exposes one chip; see --label).

Replaces the role of the reference's MPI/subprocess scaling stack
(``gym_reinmav/run.py:73-94`` vec-envs, ``:177-182`` MPI rank gating):
here scaling is a ``jax.sharding.Mesh`` + ``shard_map``, so the same
script measures 1 device vs N devices with no code change.

Methodology: WEAK scaling (fixed per-device env batch — the BASELINE
metric is env-steps/s/chip).  Each arm times K folded dispatches with a
forced host transfer (tunnel rule, CLAUDE.md); efficiency =
(rate_N / N) / rate_1.

Real hardware:       python benchmarks/bench_multichip.py
Virtual wiring run:  JAX_PLATFORMS=cpu python benchmarks/bench_multichip.py \
                       --devices 8 --per-device-envs 256 --horizon 64 \
                       --updates 2 --label virtual-cpu8-wiring
(The virtual run validates the measurement path end-to-end; its numbers
are CPU-emulation wiring artifacts, NOT performance.)
"""
import argparse
import json
import os
import sys
import time

import numpy as np


def _timeit(fn, sync, reps=3):
    r = fn()
    sync(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        sync(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure_rollout(env, mesh, per_device_envs, horizon, key):
    """shard_map dense8 closed-loop rollout, weak-scaled."""
    import jax

    from reinmav_tpu.parallel import batch_sharding
    from reinmav_tpu.parallel.mesh import sharded_dense_rollout

    n = mesh.devices.size
    batch = per_device_envs * n
    keys = jax.random.split(key, batch)
    states = jax.jit(env.vreset,
                     out_shardings=batch_sharding(mesh))(keys)
    states = states.astype(np.float32)

    def run():
        return sharded_dense_rollout(env, mesh, states, key, horizon)

    t = _timeit(run, lambda r: float(np.asarray(r[1])[0]))
    return batch * horizon / t


def measure_ppo(env, mesh, per_device_envs, updates, key):
    """shard_map PPO train loop (K updates folded), weak-scaled."""
    import jax

    from reinmav_tpu.rl import ppo

    n = mesh.devices.size
    cfg = ppo.PpoConfig(num_envs=per_device_envs * n, rollout_len=32,
                        hidden=(64, 64))
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0))
    state = jax.device_put(state, ppo.state_shardings(mesh))
    fn = ppo.make_train_many_shardmap(env, cfg, updates, mesh)
    state, m = fn(state)  # compile + warm
    float(np.asarray(m["pg_loss"]))

    def run():
        nonlocal state
        state, met = fn(state)
        return met

    t = _timeit(run, lambda met: float(np.asarray(met["pg_loss"])))
    return cfg.num_envs * cfg.rollout_len * updates / t


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="quadrotor3d-v0")
    p.add_argument("--devices", type=int, default=0,
                   help="force a virtual CPU mesh of this many devices "
                        "(sets xla_force_host_platform_device_count; 0 = "
                        "use the real devices)")
    p.add_argument("--per-device-envs", type=int, default=65536)
    p.add_argument("--horizon", type=int, default=512)
    p.add_argument("--updates", type=int, default=8)
    p.add_argument("--label", default="")
    p.add_argument("--out", default="", help="also append the JSON line here")
    args = p.parse_args(argv)

    if args.devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}")

    import jax

    if args.devices:
        jax.config.update("jax_platforms", "cpu")

    import reinmav_tpu
    from reinmav_tpu.parallel import make_mesh

    devices = jax.devices()
    env = reinmav_tpu.make(args.env)
    key = jax.random.PRNGKey(7)

    rows = {}
    arms = sorted({1, len(devices)})
    for n in arms:
        mesh = make_mesh(devices[:n])
        roll = measure_rollout(env, mesh, args.per_device_envs,
                               args.horizon, key)
        train = measure_ppo(env, mesh, args.per_device_envs // 8,
                            args.updates, key)
        rows[n] = {"rollout_steps_per_sec": roll,
                   "ppo_steps_per_sec": train}

    n = len(devices)
    r1, rn = rows[1], rows[n]
    result = {
        "metric": "multichip_weak_scaling",
        "env": args.env,
        "devices": n,
        "device_kind": str(devices[0].device_kind),
        "per_device_envs": args.per_device_envs,
        "rollout_steps_per_sec_per_device": rn["rollout_steps_per_sec"] / n,
        "rollout_scaling_efficiency": (
            rn["rollout_steps_per_sec"] / n / r1["rollout_steps_per_sec"]),
        "ppo_steps_per_sec_per_device": rn["ppo_steps_per_sec"] / n,
        "ppo_scaling_efficiency": (
            rn["ppo_steps_per_sec"] / n / r1["ppo_steps_per_sec"]),
        "arms": rows,
        "label": args.label or ("real-hw" if devices[0].platform == "tpu"
                                else "cpu-wiring"),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
