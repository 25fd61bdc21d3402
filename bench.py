"""Benchmark: batched quadrotor3d closed-loop stepping throughput on TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "env_steps_per_sec", "vs_baseline": N}

Metric (BASELINE.md): env-steps/s/chip for the batched quadrotor3d step —
the canonical reference workload (geometric controller in the loop, the
``test_quadrotor3d.py`` pattern) with auto-reset fused in, no trajectory
materialisation (state-carry scan only, like a training rollout consumer
would fuse).  ``vs_baseline`` is measured against the reference's implied
single-env Python stepping rate of ~830 steps/s on one CPU core
(BASELINE.md: ReinmavEnv ≈1.2 ms/step is the only in-repo number; the
plain quadrotor3d python loop is the same order of magnitude).
"""

import json
import time

import jax
import jax.numpy as jnp

import reinmav_tpu

REFERENCE_STEPS_PER_SEC = 830.0  # BASELINE.md implied reference throughput


def bench_config(env, batch: int, horizon: int, key) -> float:
    """Closed-loop steps/s: controller + step + auto-reset, transposed
    (D, B) layout, reward-sum output only.

    Timing forces a device->host transfer of the scalar reward sum —
    ``block_until_ready`` alone under-reports on the tunnelled TPU runtime
    (it returns before execution completes)."""
    import numpy as np

    states = env.vreset(jax.random.split(key, batch))

    @jax.jit
    def run(states, key):
        from reinmav_tpu.envs.core import control_rollout

        final, traj = control_rollout(
            env, states, key, horizon, auto_reset=True,
            collect_trajectory=False, dense8=True,
        )
        return traj.reward.sum()

    float(run(states, key))  # compile + warm-up, synchronised
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        r = float(run(states, jax.random.fold_in(key, i)))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(r)
    return batch * horizon / min(times)


def bench_pallas(env, batch: int, horizon: int, key) -> float:
    """Fused pallas rollout (controller + step + auto-reset resident in
    VMEM for the whole horizon) — the fast path, ~3x the XLA scan."""
    import numpy as np

    from reinmav_tpu.ops import pallas_rollout

    states_t = env.vreset(jax.random.split(key, batch)).T

    float(pallas_rollout.quad3d_rollout_autoreset_pallas8(states_t, 7, horizon)[1].sum())
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        r = float(
            pallas_rollout.quad3d_rollout_autoreset_pallas8(states_t, i, horizon)[1].sum()
        )
        times.append(time.perf_counter() - t0)
        assert np.isfinite(r)
    return batch * horizon / min(times)


def main():
    env = reinmav_tpu.make("quadrotor3d-v0")
    key = jax.random.PRNGKey(0)
    best = 0.0
    best_cfg = None
    for batch in (131072,):  # scan fallback datapoint (pallas is the headline)
        sps = bench_config(env, batch, horizon=1000, key=key)
        if sps > best:
            best, best_cfg = sps, f"scan-b{batch}"
    try:
        from reinmav_tpu.ops import pallas_rollout

        if pallas_rollout.available() and jax.devices()[0].platform != "cpu":
            for batch in (524288, 2097152):
                sps = bench_pallas(env, batch, horizon=1000, key=key)
                if sps > best:
                    best, best_cfg = sps, f"pallas-b{batch}"
    except Exception as e:  # pallas path is optional; never fail the bench
        import sys

        print(f"# pallas path unavailable: {e}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": "quadrotor3d_closed_loop_env_steps_per_sec_per_chip",
                "value": round(best),
                "unit": "env_steps_per_sec",
                "vs_baseline": round(best / REFERENCE_STEPS_PER_SEC, 1),
                "config": best_cfg,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
