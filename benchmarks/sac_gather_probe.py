"""Replay-gather microbenchmarks on the real TPU: per-index cost of the
uniform sample gather under different lowerings (K-folded scans; subtract
the ~0.45 ms/iter dispatch floor of a trivial K=64 scan)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 64
CAP, R, BATCH = 1 << 21, 44, 8192
ring = jnp.zeros((CAP, R), jnp.float32) + jnp.arange(R, dtype=jnp.float32)


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


def scan_over(gather):
    @jax.jit
    def run(buf, key):
        def it(c, _):
            k, acc = c
            k, ks = jax.random.split(k)
            u = jax.random.uniform(ks, (BATCH,), jnp.float32)
            idx = (u * CAP).astype(jnp.int32)
            rows = gather(buf, idx)
            return (k, acc + jnp.sum(rows[0])), None
        (k, acc), _ = jax.lax.scan(it, (key, 0.0), None, length=K)
        return acc
    return run


def g_fancy(buf, idx):
    return buf[idx].T


def g_sorted(buf, idx):
    idx = jax.lax.sort(idx)
    return jnp.take(buf, idx, axis=0, indices_are_sorted=True).T


def g_vmap_slice(buf, idx):
    rows = jax.vmap(
        lambda i: jax.lax.dynamic_slice(buf, (i, jnp.zeros((), idx.dtype)),
                                        (1, buf.shape[1])))(idx)
    return rows[:, 0].T


def g_col_fancy(buf_t, idx):
    return buf_t[:, idx]


key = jax.random.PRNGKey(0)
print(f"row fancy      : {timeit(scan_over(g_fancy), ring, key)*1e3:7.3f} ms")
print(f"row sorted     : {timeit(scan_over(g_sorted), ring, key)*1e3:7.3f} ms")
print(f"row vmap slice : {timeit(scan_over(g_vmap_slice), ring, key)*1e3:7.3f} ms")
ring_t = jnp.asarray(ring.T)
print(f"col fancy (old): {timeit(scan_over(g_col_fancy), ring_t, key)*1e3:7.3f} ms")


def g_vmap_colslice(buf_t, idx):
    cols = jax.vmap(
        lambda i: jax.lax.dynamic_slice(
            buf_t, (jnp.zeros((), idx.dtype), i), (buf_t.shape[0], 1)))(idx)
    return jnp.moveaxis(cols[:, :, 0], 0, 1)


if __name__ == "__main__":
    pass
