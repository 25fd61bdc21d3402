"""Micro-probes for the SAC iteration floor on the real TPU: scan glue,
HBM bandwidth, ring-insert cost, and the fused-collect kernel's tile
sweep.  (Run solo on an idle chip.)"""
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
    float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / K


@jax.jit
def trivial_scan(x):
    def it(c, _):
        return c * 1.000001, c[0, 0]
    c, r = jax.lax.scan(it, x, None, length=K)
    return c[0, 0] + jnp.sum(r)


@jax.jit
def bandwidth_scan(x):
    """256 MB elementwise per iteration -> read+write 512 MB."""
    def it(c, _):
        return c * 1.000001, c[0, 0]
    c, r = jax.lax.scan(it, x, None, length=K)
    return c[0, 0] + jnp.sum(r)


@jax.jit
def insert_const(s):
    """DUS of a loop-invariant block (no per-iter block materialise)."""
    blk = jnp.ones((R, B), jnp.float32)
    def it(c, i):
        buf, ptr, fil = c
        buf, ptr, fil = sac.buffer_insert(buf, ptr, fil, blk)
        return (buf, ptr, fil), None
    c, _ = jax.lax.scan(it, (s.buffer, s.ptr, s.filled), None, length=K)
    return c[0][0, 0]


@jax.jit
def insert_static_ptr(s):
    """DUS at a STATIC column offset (aliasing-friendliest case)."""
    blk = jnp.ones((R, B), jnp.float32)
    def it(c, i):
        buf = jax.lax.dynamic_update_slice(c, blk, (0, 0))
        return buf, None
    c, _ = jax.lax.scan(it, s.buffer, None, length=K)
    return c[0, 0]


def collect_tile(tile):
    @jax.jit
    def run(s):
        def it(c, _):
            st, kk = c
            kk, k1 = jax.random.split(kk)
            seed = jax.random.randint(k1, (1,), 0, 2**31 - 1, jnp.int32)
            consts = sac._collect_consts(env, jnp.zeros((), jnp.float32), 0.0)
            new_rows, block_rows = pop.collect_step_pallas(
                env.name, "sac", st, seed, consts,
                ppr.env_params_vec(env),
                *pop.actor_kernel_args(s.actor), tile=tile)
            return (new_rows, kk), jnp.mean(block_rows[8 * (d + a)])
        c, r = jax.lax.scan(it, (s.env_states.T.reshape(8 * d, B // 8),
                                 s.key), None, length=K)
        return c[0][0, 0], jnp.mean(r)
    return run


x_small = jnp.ones((8, 128), jnp.float32)
x_big = jnp.ones((512, 131072), jnp.float32)  # 256 MB
print(f"trivial scan (8,128) : {timeit(trivial_scan, x_small)*1e3:7.3f} ms")
print(f"elementwise 256MB    : {timeit(bandwidth_scan, x_big)*1e3:7.3f} ms "
      f"(512MB traffic -> {0.512/timeit(bandwidth_scan, x_big):5.0f} GB/s)")
print(f"insert const blk     : {timeit(insert_const, state)*1e3:7.3f} ms")
print(f"insert static ptr    : {timeit(insert_static_ptr, state)*1e3:7.3f} ms")
for tile in (128, 256, 512):
    print(f"fused collect t={tile:3d} : "
          f"{timeit(collect_tile(tile), state)*1e3:7.3f} ms")
