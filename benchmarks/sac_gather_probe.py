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


# ---------------------------------------------------------------------------
# r4 verdict #7: in-kernel gather — scalar-prefetched per-column DMAs
# (the PPO loss kernel's trick at tile=1 granularity).  The ring stays
# in HBM (memory_space ANY); each grid step issues a wave of G column
# copies on G semaphores, waits, and writes the (R, G) block out.

def pallas_gather_fn(R=32, CAP=1 << 21, BATCH=8192, G=128):
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, buf_ref, out_ref, scratch, sems):
        g = pl.program_id(0)

        def start(i, _):
            c = idx_ref[g * G + i]
            pltpu.make_async_copy(
                buf_ref.at[:, pl.ds(c, 1)], scratch.at[:, pl.ds(i, 1)],
                sems.at[i],
            ).start()
            return 0

        jax.lax.fori_loop(0, G, start, 0)

        def wait(i, _):
            pltpu.make_async_copy(
                buf_ref.at[:, pl.ds(0, 1)], scratch.at[:, pl.ds(i, 1)],
                sems.at[i],
            ).wait()
            return 0

        jax.lax.fori_loop(0, G, wait, 0)
        out_ref[:, :] = scratch[:, :]

    @jax.jit
    def gather(buf, idx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BATCH // G,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
            out_specs=pl.BlockSpec((R, G), lambda b, *_: (0, b)),
            scratch_shapes=[
                pltpu.VMEM((R, G), jnp.float32),
                pltpu.SemaphoreType.DMA((G,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, BATCH), jnp.float32),
        )(idx, buf)

    return gather


def probe_pallas_gather():
    R = 32
    ring32 = jnp.zeros((R, CAP), jnp.float32) + jnp.arange(
        R, dtype=jnp.float32)[:, None]
    for G in (64, 128, 256, 512):
        gf = pallas_gather_fn(R=R, CAP=CAP, BATCH=BATCH, G=G)
        t = timeit(scan_over(lambda buf, idx, gf=gf: gf(buf, idx)), ring32,
                   jax.random.PRNGKey(1))
        print(f"pallas col dma (G={G}): {t*1e3:7.3f} ms")
    # reference on the same 32-row ring
    ring32_rows = jnp.asarray(ring32.T)
    print(f"vmap slice (R=32)     : "
          f"{timeit(scan_over(g_vmap_colslice), ring32, jax.random.PRNGKey(1))*1e3:7.3f} ms")


if __name__ == "__main__":
    probe_pallas_gather()
