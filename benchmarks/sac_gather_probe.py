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

def pallas_gather_fn(CAP=1 << 21, BATCH=8192, G=128):
    """ROW-gather kernel on the packed (CAP/4, 128) ring: per grid step,
    a wave of G (1, 128) row DMAs (Mosaic requires lane-aligned slices —
    single-COLUMN DMAs of an (R, CAP) ring are rejected outright) on G
    semaphores, overlapped, then one block write.  Output is the raw
    (BATCH, 128) rows; the caller's 4-way phase select unpacks.
    ``idx`` here is the ROW index (sample//4)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    del CAP  # ring extent is carried by the buf argument itself

    def kernel(idx_ref, buf_ref, out_ref, scratch, sems):
        g = pl.program_id(0)

        def start(i, _):
            r = idx_ref[g * G + i]
            pltpu.make_async_copy(
                buf_ref.at[pl.ds(r, 1), :], scratch.at[pl.ds(i, 1), :],
                sems.at[i],
            ).start()
            return 0

        jax.lax.fori_loop(0, G, start, 0)

        def wait(i, _):
            pltpu.make_async_copy(
                buf_ref.at[pl.ds(0, 1), :], scratch.at[pl.ds(i, 1), :],
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
            out_specs=pl.BlockSpec((G, 128), lambda b, *_: (b, 0)),
            scratch_shapes=[
                pltpu.VMEM((G, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((G,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((BATCH, 128), jnp.float32),
        )(idx, buf)

    return gather


def probe_pallas_gather():
    ringp = jnp.zeros((CAP // 4, 128), jnp.float32)
    # G=512 crashes the remote compile helper outright (measured
    # 2026-08-20) — a 512-deep DMA-semaphore wave exceeds what Mosaic
    # will lower; the recorded A/B is G in {128, 256}.
    for G in (128, 256):  # lane dim must be 128-divisible
        gf = pallas_gather_fn(CAP=CAP, BATCH=BATCH, G=G)

        def g(buf, idx, gf=gf):
            rows = gf(buf, idx // 4)          # (BATCH, 128) raw rows
            ph = (idx % 4)[:, None]
            out = jnp.where(ph == 0, rows[:, 0:32],
                  jnp.where(ph == 1, rows[:, 32:64],
                  jnp.where(ph == 2, rows[:, 64:96], rows[:, 96:128])))
            return out.T

        t = timeit(scan_over(g), ringp, jax.random.PRNGKey(1))
        print(f"pallas row dma (G={G}): {t*1e3:7.3f} ms")


def probe_packed_rows():
    """4-samples-per-128-lane-row packing: the gather becomes fully
    lane-aligned (1, 128) row slices + a 4-way lane select — no
    pallas, no per-column layout ops.  Sample i lives in row i//4,
    lanes 32*(i%4):32*(i%4)+32."""
    R = 32
    CAPP = CAP // 4
    ringp = jnp.arange(CAPP * 128, dtype=jnp.float32).reshape(CAPP, 128)

    def g_packed(buf, idx):
        row = idx // 4
        ph = (idx % 4)[:, None]
        rows = jax.vmap(
            lambda r: jax.lax.dynamic_slice(
                buf, (r, jnp.zeros((), r.dtype)), (1, 128)))(row)[:, 0]
        out = jnp.where(ph == 0, rows[:, 0:32],
              jnp.where(ph == 1, rows[:, 32:64],
              jnp.where(ph == 2, rows[:, 64:96], rows[:, 96:128])))
        return out.T

    print(f"packed rows (4/row)   : "
          f"{timeit(scan_over(g_packed), ringp, jax.random.PRNGKey(1))*1e3:7.3f} ms")
    ring32 = jnp.zeros((R, CAP), jnp.float32)
    print(f"vmap colslice (R=32)  : "
          f"{timeit(scan_over(g_vmap_colslice), ring32, jax.random.PRNGKey(1))*1e3:7.3f} ms")


if __name__ == "__main__":
    probe_packed_rows()
    probe_pallas_gather()
