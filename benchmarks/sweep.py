"""Per-env throughput sweep on the current accelerator.

Measures batched closed-loop (or fixed-action) stepping rates for every
registered env and writes JSON to stdout / benchmarks/results.json.

Run:  python benchmarks/sweep.py [--batch 131072] [--horizon 500]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import reinmav_tpu
from reinmav_tpu.envs.core import control_rollout


def bench_env(env_id: str, batch: int, horizon: int,
              scan_chunk: int | None = None) -> dict:
    """``scan_chunk``: split the SCAN leg's horizon into host-level
    dispatches of this length (state/key carried between them) so no
    single dispatch exceeds the tunnel watchdog's device-time budget —
    the in-contact tpuquad scan runs ~0.6M steps/s, so a 500-step
    B=131072 dispatch is ~100+ s of device time (the r4 horizon cap this
    replaces; see envs/core.chunked_throughput_rollout for the
    user-facing equivalent).  Chunk dispatches are queued asynchronously
    and synced once per timing rep, so the measured rate stays honest.
    """
    env = reinmav_tpu.make(env_id)
    key = jax.random.PRNGKey(0)
    states = env.vreset(jax.random.split(key, batch))
    chunk = horizon if scan_chunk is None else min(scan_chunk, horizon)
    assert horizon % chunk == 0, (horizon, chunk)

    if env.control_fn is not None:

        @jax.jit
        def run(states, key):
            final, traj, key_out = control_rollout(
                env, states, key, chunk, auto_reset=True,
                collect_trajectory=False, dense8=batch % 8 == 0,
                return_key=True,
            )
            # Depend on the final state too: a state-independent reward
            # would otherwise let XLA dead-code-eliminate the dynamics.
            return final, key_out, traj.reward.sum() + final.sum()

    else:
        # Fixed-action stepping (reinmav ignores actions; tpuquad hover-ish).
        actions_t = jnp.full((max(env.action_dim, 1), batch), 0.4, states.dtype)[: env.action_dim]

        actions8 = actions_t.reshape(env.action_dim, 8, batch // 8) if env.action_dim else jnp.zeros((0, 8, batch // 8), states.dtype)

        @jax.jit
        def run(states, key):
            def body(carry, _):
                s8, k = carry
                k, k_reset = jax.random.split(k)
                out = env.autoreset_step_t8(s8, actions8, k_reset)
                # Depend on the stepped OBS, not just reward/carry: envs
                # with constant rewards and deterministic resets (reinmav:
                # done≡True, reward≡90) would otherwise let XLA dead-code
                # -eliminate the entire physics.
                return (out.state, k), out.obs.sum()

            s8 = states.T.reshape(env.state_dim, 8, batch // 8)
            (final, k_out), obs_sums = jax.lax.scan(
                body, (s8, key), None, length=chunk)
            return (final.reshape(env.state_dim, batch).T, k_out,
                    obs_sums.sum() + final.sum())

    def run_horizon(key):
        s, k, r = states, key, None
        for _ in range(horizon // chunk):
            s, k, r = run(s, k)
        return float(r)  # sync once: all queued dispatches drain here

    run_horizon(key)  # compile + sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = run_horizon(key)
        times.append(time.perf_counter() - t0)
        assert np.isfinite(r), env_id
    sps = batch * horizon / min(times)
    row = {"env": env_id, "batch": batch, "horizon": horizon,
           "env_steps_per_sec": round(sps)}
    if chunk != horizon:
        row["scan_chunk"] = chunk

    # Fused-Pallas backend where a kernel exists (TPU only).
    if jax.devices()[0].platform == "tpu":
        from reinmav_tpu.envs.core import throughput_rollout

        try:
            @jax.jit
            def run_pallas_jit(states, key):
                f, rs = throughput_rollout(env, states, key, horizon,
                                           backend="pallas")
                # Reduce ON DEVICE: a (B, D) host transfer over the
                # tunnelled runtime costs ~0.1 s and poisons the timing.
                return rs.sum() + f.sum()

            def run_pallas(i):
                return float(run_pallas_jit(states, jax.random.fold_in(key, i)))

            run_pallas(99)  # compile + sync
            ptimes = []
            for i in range(3):
                t0 = time.perf_counter()
                r = run_pallas(i)
                ptimes.append(time.perf_counter() - t0)
                assert np.isfinite(r), env_id
            row["pallas_env_steps_per_sec"] = round(batch * horizon / min(ptimes))
        except ValueError as e:
            # Refused dispatch (wrapped env / batch shape / no kernel):
            # surface it — a silent hole in results.json would hide a
            # dispatch regression for a benchmarked env.
            print(f"# {env_id}: pallas backend skipped: {e}", file=sys.stderr)
            row["pallas_skipped"] = str(e)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=131072)
    ap.add_argument("--horizon", type=int, default=500)
    ap.add_argument("--reinmav_batch", type=int, default=8192,
                    help="smaller batch for the 50-substep reinmav env")
    ap.add_argument("--only", default="",
                    help="substring filter: re-measure only matching env ids "
                         "(other rows in results.json are kept)")
    ap.add_argument("--also_batch", type=int, default=0,
                    help="additionally measure each env at this batch in the "
                         "SAME run (the merge invalidates ALL of an env's "
                         "old rows per run, so modest- and large-batch rows "
                         "must come from one invocation)")
    args = ap.parse_args()

    results = {"device": str(jax.devices()[0]), "sweeps": []}
    for env_id in reinmav_tpu.registered_ids():
        if args.only and args.only not in env_id:
            continue
        batch = args.reinmav_batch if env_id == "reinmav-v0" else args.batch
        horizon = args.horizon
        scan_chunk = None
        if env_id in ("MujocoQuadForce-v0", "MujocoQuadQuat-v0"):
            # The coupled contact solve makes the SCAN path ~0.6M steps/s:
            # a 500-step dispatch at B=131072 is ~200 s of device time,
            # which trips the tunnelled runtime's watchdog and kills the
            # TPU worker (observed 2026-08-20).  Chunk the scan leg into
            # 50-step dispatches (state/key carried) — full horizon, safe
            # dispatches (replaces the r4 horizon cap).
            scan_chunk = min(50, horizon)
            while horizon % scan_chunk:
                scan_chunk -= 1
        row = bench_env(env_id, batch, horizon, scan_chunk=scan_chunk)

        if env_id == "reinmav-v0":
            row["note"] = "each step runs ~50 controller+EOM substeps"
        results["sweeps"].append(row)
        print(json.dumps(row), flush=True)
        if env_id == "reinmav-v0" and args.batch != batch:
            # Large-batch row: the kernel's intrinsic rate (the small
            # default batch under-fills the chip for this 50-substep env;
            # PARITY.md's headline must map to a committed artifact).
            row = bench_env(env_id, args.batch, args.horizon)
            row["note"] = "large-batch row (kernel intrinsic rate)"
            results["sweeps"].append(row)
            print(json.dumps(row), flush=True)
        if args.also_batch and args.also_batch != batch:
            row = bench_env(env_id, args.also_batch, args.horizon,
                            scan_chunk=scan_chunk)
            row["note"] = ("large-batch row (dispatch floor amortised; "
                           "the kernels' per-env rate keeps rising with "
                           "batch — results.json pallas_batch_scaling)")
            results["sweeps"].append(row)
            print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    # MERGE into the existing file: results.json also carries curated
    # sections (ppo_full_update, offpolicy_full_loop, A/B tables) that a
    # sweep must not wipe; with --only, unmatched sweep rows survive too.
    try:
        with open(out) as f:
            existing = json.load(f)
    except (OSError, ValueError):
        existing = {}
    # A re-measured env INVALIDATES all of its old rows (an env whose
    # physics changed gets fresh numbers; keying on (env, note) used to
    # let superseded rows survive next to their replacements — the r4
    # stale Force-v0/Quat-v0 horizon-500 rows).  reinmav-v0's two rows
    # (default + large batch) are both produced by the same run.
    measured = {r["env"] for r in results["sweeps"]}
    kept = [r for r in existing.get("sweeps", []) if r["env"] not in measured]
    existing["device"] = results["device"]
    existing["sweeps"] = kept + results["sweeps"]
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
