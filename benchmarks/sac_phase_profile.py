"""Phase-level SAC timing on the real TPU (K-folded, honest transfers) —
run BEFORE building any off-policy fused kernel (CLAUDE.md deferred list:
profile the phase split on a live chip first)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import reinmav_tpu
from reinmav_tpu.rl import sac

env = reinmav_tpu.make("MujocoQuadForce-v1")
cfg = sac.SacConfig(num_envs=65536, batch_size=8192,
                    buffer_capacity=1 << 21, warmup_steps=0)
K = 64
key = jax.random.PRNGKey(0)
state = sac.init_state(env, cfg, key)
d, a = env.obs_dim, env.action_dim


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


# full iteration (no donation — the state is reused by every probe below)
full = jax.jit(lambda s: sac.train_iters(env, cfg, s, K))
state2, m = full(state)
t_full = timeit(full, state)
print(f"full iter      : {t_full*1e3:8.3f} ms  ({cfg.num_envs/t_full/1e6:.1f}M steps/s)")

# actor sample on the full env batch
@jax.jit
def actor_only(s, k):
    def body(c, i):
        st, kk = c
        kk, ks = jax.random.split(kk)
        a_t, _ = sac.sample_squashed_t(s.actor, st[:d], ks, a)
        # fold the action back in so nothing is DCE'd
        st = st.at[:a].add(a_t * 1e-9)
        return (st, kk), None
    (st, _), _ = jax.lax.scan(body, (s.env_states.T, k), None, length=K)
    return st
print(f"actor sample   : {timeit(actor_only, state, key)*1e3:8.3f} ms")

# env step only (autoreset)
@jax.jit
def env_only(s, k):
    def body(c, i):
        st, kk = c
        kk, kr = jax.random.split(kk)
        out = env.autoreset_step_t(st, jnp.zeros((a, st.shape[1])) + 0.5, kr)
        return (out.state, kk), None
    (st, _), _ = jax.lax.scan(body, (s.env_states.T, k), None, length=K)
    return st
print(f"env step       : {timeit(env_only, state, key)*1e3:8.3f} ms")

# insert only
@jax.jit
def insert_only(s, k):
    def body(c, i):
        buf, ptr, filled = c
        block = jnp.full((buf.shape[0], cfg.num_envs), 1.0 * i, jnp.float32)
        return sac.buffer_insert(buf, ptr, filled, block), None
    c, _ = jax.lax.scan(body, (s.buffer, s.ptr, s.filled), jnp.arange(K, dtype=jnp.float32))
    return c[0]
print(f"buffer insert  : {timeit(insert_only, state, key)*1e3:8.3f} ms")

# sample gather only
@jax.jit
def sample_only(s, k):
    def body(c, i):
        kk, acc = c
        kk, ks = jax.random.split(kk)
        rows = sac.buffer_sample(s.buffer, jnp.asarray(1 << 21, jnp.int32), ks, cfg.batch_size)
        return (kk, acc + jnp.sum(rows[0])), None
    c, _ = jax.lax.scan(body, (k, 0.0), None, length=K)
    return c[1]
print(f"buffer sample  : {timeit(sample_only, state, key)*1e3:8.3f} ms")

# critic update fwd+bwd only (fixed rows)
rows0 = jax.random.normal(jax.random.PRNGKey(9), (sac._row_dims(env), cfg.batch_size))
@jax.jit
def critic_only(s, rows, k):
    def body(c, i):
        q, kk = c
        kk, kt = jax.random.split(kk)
        (_, _), qg = jax.value_and_grad(sac.critic_loss, has_aux=True)(
            q, cfg, env, rows, (s.q1_target, s.q2_target), kt, s.actor,
            s.log_alpha)
        q = jax.tree.map(lambda p, g: p - 1e-9 * g, q, qg)
        return (q, kk), None
    c, _ = jax.lax.scan(body, ({"q1": s.q1, "q2": s.q2}, k), None, length=K)
    return c[0]
print(f"critic fwd+bwd : {timeit(critic_only, state, rows0, key)*1e3:8.3f} ms")

# actor+alpha update fwd+bwd only
@jax.jit
def actor_upd_only(s, rows, k):
    def body(c, i):
        p, kk = c
        kk, kp = jax.random.split(kk)
        (_, _), ag = jax.value_and_grad(sac.actor_alpha_loss, has_aux=True)(
            p, cfg, env, rows, s.q1, s.q2, kp, -4.0)
        p = jax.tree.map(lambda x, g: x - 1e-9 * g, p, ag)
        return (p, kk), None
    c, _ = jax.lax.scan(body, ({"actor": s.actor, "log_alpha": s.log_alpha}, k), None, length=K)
    return c[0]
print(f"actor fwd+bwd  : {timeit(actor_upd_only, state, rows0, key)*1e3:8.3f} ms")
