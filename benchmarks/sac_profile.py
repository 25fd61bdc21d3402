"""Phase-level SAC timing on the real TPU (K-folded, honest transfers).

Times, as separately jitted K-folded scans:
  * the full train iteration (collect + update)
  * actor sampling on the collect batch
  * the autoreset env step (FLAT layout — the pre-dense8 baseline)
  * replay-ring insert / sample (sample at the configured tile)
  * critic and actor+alpha fwd+bwd at the replay batch size

Every probe returns a SCALAR: fetching a full array (the ring is
hundreds of MB) would time the tunnel transfer, not the compute
(CLAUDE.md timing rules).  The isolated phases overlap in the real
program, so they map hotspots rather than summing to the total.

Usage: python benchmarks/sac_profile.py [--envs 65536] [--batch 8192]
       [--tile 128]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import reinmav_tpu
from reinmav_tpu.rl import sac


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=65536)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--env_id", default="MujocoQuadForce-v1")
    ap.add_argument("--k", type=int, default=64)
    args = ap.parse_args()

    env = reinmav_tpu.make(args.env_id)
    cfg = sac.SacConfig(num_envs=args.envs, batch_size=args.batch,
                        buffer_capacity=1 << 21, warmup_steps=0,
                        sample_tile=args.tile)
    K = args.k
    key = jax.random.PRNGKey(0)
    state = sac.init_state(env, cfg, key)
    d, a = env.obs_dim, env.action_dim
    print(f"device={jax.devices()[0]} envs={cfg.num_envs} "
          f"batch={cfg.batch_size} tile={cfg.sample_tile} K={K}")

    def timeit(fn, *fargs, reps=3):
        r = fn(*fargs)
        float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(*fargs)
            float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts) / K

    # Full iteration (non-donating jit; scalar output).
    full = jax.jit(lambda s: sac.train_iters(env, cfg, s, K)[1]["q_loss"])
    t_full = timeit(full, state)
    print(f"full iter      : {t_full*1e3:8.3f} ms  "
          f"({cfg.num_envs/t_full/1e6:.1f}M env-steps/s)")

    @jax.jit
    def actor_only(s, k):
        def body(c, _):
            st, kk = c
            kk, ks = jax.random.split(kk)
            a_t, _ = sac.sample_squashed_t(s.actor, st[:d], ks, a)
            st = st.at[:a].add(a_t * 1e-9)  # keep the chain live
            return (st, kk), None
        (st, _), _ = jax.lax.scan(body, (s.env_states.T, k), None, length=K)
        return jnp.sum(st)
    print(f"actor sample   : {timeit(actor_only, state, key)*1e3:8.3f} ms")

    @jax.jit
    def env_only(s, k):
        def body(c, _):
            st, kk = c
            kk, kr = jax.random.split(kk)
            out = env.autoreset_step_t(
                st, jnp.zeros((a, st.shape[1])) + 0.5, kr)
            return (out.state, kk), None
        (st, _), _ = jax.lax.scan(body, (s.env_states.T, k), None, length=K)
        return jnp.sum(st)
    print(f"env step (flat): {timeit(env_only, state, key)*1e3:8.3f} ms")

    @jax.jit
    def insert_only(s, _k):
        def body(c, i):
            buf, ptr, filled = c
            block = jnp.full((buf.shape[0], cfg.num_envs), i, jnp.float32)
            return sac.buffer_insert(buf, ptr, filled, block), None
        c, _ = jax.lax.scan(body, (s.buffer, s.ptr, s.filled),
                            jnp.arange(K, dtype=jnp.float32))
        return jnp.sum(c[0][:, ::4096])
    print(f"buffer insert  : {timeit(insert_only, state, key)*1e3:8.3f} ms")

    @jax.jit
    def sample_only(s, k):
        def body(c, _):
            kk, acc = c
            kk, ks = jax.random.split(kk)
            rows = sac.buffer_sample(s.buffer, jnp.asarray(1 << 21, jnp.int32),
                                     ks, cfg.batch_size, tile=cfg.sample_tile)
            return (kk, acc + jnp.sum(rows[0])), None
        c, _ = jax.lax.scan(body, (k, 0.0), None, length=K)
        return c[1]
    print(f"buffer sample  : {timeit(sample_only, state, key)*1e3:8.3f} ms")

    rows0 = jax.random.normal(jax.random.PRNGKey(9),
                              (sac._row_dims(env), cfg.batch_size))

    @jax.jit
    def critic_only(s, rows, k):
        def body(c, _):
            q, kk = c
            kk, kt = jax.random.split(kk)
            _, qg = jax.value_and_grad(sac.critic_loss, has_aux=True)(
                q, cfg, env, rows, (s.q1_target, s.q2_target), kt, s.actor,
                s.log_alpha)
            q = jax.tree.map(lambda p, g: p - 1e-9 * g, q, qg)
            return (q, kk), None
        c, _ = jax.lax.scan(body, ({"q1": s.q1, "q2": s.q2}, k), None,
                            length=K)
        return jnp.sum(c[0]["q1"][0]["w"])
    print(f"critic fwd+bwd : {timeit(critic_only, state, rows0, key)*1e3:8.3f} ms")

    @jax.jit
    def actor_upd_only(s, rows, k):
        def body(c, _):
            p, kk = c
            kk, kp = jax.random.split(kk)
            _, ag = jax.value_and_grad(sac.actor_alpha_loss, has_aux=True)(
                p, cfg, env, rows, s.q1, s.q2, kp, -4.0)
            p = jax.tree.map(lambda x, g: x - 1e-9 * g, p, ag)
            return (p, kk), None
        c, _ = jax.lax.scan(
            body, ({"actor": s.actor, "log_alpha": s.log_alpha}, k), None,
            length=K)
        return jnp.sum(c[0]["actor"][0]["w"])
    print(f"actor fwd+bwd  : {timeit(actor_upd_only, state, rows0, key)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
