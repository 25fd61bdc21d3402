"""Isolate the SAC iteration's collection-side costs on the real TPU:
K-folded scans that mimic the real train_iters carry structure, each
arm dropping one piece.  (Run solo on an idle chip.)"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import reinmav_tpu
from reinmav_tpu.rl import sac
from reinmav_tpu.ops import pallas_offpolicy as pop
from reinmav_tpu.ops import pallas_ppo_rollout as ppr

K = 64
env = reinmav_tpu.make("MujocoQuadForce-v1")
cfg = sac.SacConfig(num_envs=65536, batch_size=8192,
                    buffer_capacity=1 << 21, warmup_steps=0)
state = sac.init_state(env, cfg, jax.random.PRNGKey(0))
d, a = env.obs_dim, env.action_dim
B = cfg.num_envs
R = sac._row_dims(env)


def timeit(fn, *args, reps=3):
    r = fn(*args)
    jax.block_until_ready(r)
    float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


def fused_collect(actor, states_t, kk, warm):
    seed = jax.random.randint(kk, (1,), 0, 2**31 - 1, jnp.int32)
    consts = sac._collect_consts(env, warm, 0.0)
    new_rows, block_rows = pop.collect_step_pallas(
        env.name, "sac", states_t.reshape(8 * d, B // 8), seed, consts,
        ppr.env_params_vec(env),
        *pop.actor_kernel_args(actor), tile=128)
    return (new_rows.reshape(d, B),
            block_rows.reshape(R, B))


@jax.jit
def collect_insert(s):
    def it(c, _):
        st, buf, ptr, fil, kk = c
        kk, k1 = jax.random.split(kk)
        new_t, block = fused_collect(s.actor, st, k1,
                                     jnp.zeros((), jnp.float32))
        buf, ptr, fil = sac.buffer_insert(buf, ptr, fil, block)
        return (new_t, buf, ptr, fil, kk), jnp.mean(block[d + a])
    c, r = jax.lax.scan(it, (s.env_states.T, s.buffer, s.ptr, s.filled,
                             s.key), None, length=K)
    return c[1][0, 0], jnp.mean(r)


@jax.jit
def collect_noinsert(s):
    def it(c, _):
        st, kk = c
        kk, k1 = jax.random.split(kk)
        new_t, block = fused_collect(s.actor, st, k1,
                                     jnp.zeros((), jnp.float32))
        return (new_t, kk), jnp.mean(block[d + a])
    c, r = jax.lax.scan(it, (s.env_states.T, s.key), None, length=K)
    return c[0][0, 0], jnp.mean(r)


@jax.jit
def insert_only(s, block0):
    def it(c, i):
        buf, ptr, fil = c
        buf, ptr, fil = sac.buffer_insert(buf, ptr, fil, block0 + i)
        return (buf, ptr, fil), None
    c, _ = jax.lax.scan(it, (s.buffer, s.ptr, s.filled),
                        jnp.arange(K, dtype=jnp.float32))
    return c[0][0, 0]


@jax.jit
def scan_collect_insert(s):
    """The UN-fused collection (the old path) in the same scan shape."""
    def it(c, _):
        st, buf, ptr, fil, kk = c
        kk, k_act, k_reset = jax.random.split(kk, 3)
        obs_t = st[:d]
        a_t, _ = sac.sample_squashed_t(s.actor, obs_t, k_act, a)
        out = sac._autoreset_dense8(env, st, sac._scale_action_t(env, a_t),
                                    k_reset)
        block = jnp.concatenate([
            obs_t, a_t, out.reward[None], out.obs[:d],
            out.done[None].astype(jnp.float32)])
        buf, ptr, fil = sac.buffer_insert(buf, ptr, fil, block)
        return (out.state, buf, ptr, fil, kk), jnp.mean(block[d + a])
    c, r = jax.lax.scan(it, (s.env_states.T, s.buffer, s.ptr, s.filled,
                             s.key), None, length=K)
    return c[1][0, 0], jnp.mean(r)


block0 = jnp.ones((R, B), jnp.float32)
print(f"scan collect+insert : {timeit(scan_collect_insert, state)*1e3:7.3f} ms")
print(f"fused collect+insert: {timeit(collect_insert, state)*1e3:7.3f} ms")
print(f"fused collect only  : {timeit(collect_noinsert, state)*1e3:7.3f} ms")
print(f"insert only         : {timeit(insert_only, state, block0)*1e3:7.3f} ms")
