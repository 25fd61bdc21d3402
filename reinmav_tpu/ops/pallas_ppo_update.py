"""Pallas TPU kernel: the ENTIRE PPO update phase in one launch.

``epochs x minibatches x (gather + loss fwd/bwd + clip-by-global-norm +
Adam)`` runs as a single sequential-grid kernel with the fused MLP
parameters, Adam moments, and gradient accumulators resident in VMEM for
the whole update.  The per-minibatch Pallas loss kernel
(:mod:`pallas_ppo`) already keeps activations in VMEM; what remained in
XLA was the glue BETWEEN passes — 16 optimiser applications on tiny
tensors, per-pass parameter reloads, and 16 kernel launches per update.
Here the parameters never leave VMEM between minibatches and the
optimiser is a handful of VPU ops at each minibatch boundary.

Semantics mirrored exactly (differentially tested against the
``rl/ppo.py`` per-minibatch loop in ``tests/test_pallas_ppo_update.py``):

* loss math: :func:`pallas_ppo._tile_loss_grads` (shared code);
* shuffle: the caller precomputes every epoch's tile permutation with
  the same key stream as the XLA epoch scan;
* advantage normalisation: per-minibatch [shift, inv_scale] precomputed
  by the caller from the raw advantage row (same gather formula);
* optimiser: ``optax.chain(clip_by_global_norm(c), adam(lr, eps=1e-5))``
  re-derived in-kernel — ``g*(c/gnorm)`` when ``gnorm >= c``, biased
  moment EMAs with ``1 - beta^t`` corrections (t carried across calls
  via the optax count);
* ``log_std_floor``: optional post-step clamp, applied at each
  minibatch boundary like the XLA path.

Packed parameter plane
----------------------
All seven fused tensors live in ONE (R, 2H) f32 plane so the kernel
carries four VMEM arrays (params, mu, nu, grad-accum) instead of 28:

  rows [0, s1)        w1 (D used, s1 = D rounded up to 8)
  rows [s1, s1+2H)    w2
  rows [r_wo, +8)     woT — the output layer TRANSPOSED (A+1 used)
  rows [r_vec, +8)    b1, b2, bo (A+1 lanes), log_std (A lanes), 4 pad

Segment starts are multiples of 8 so every gradient STORE is
sublane-aligned and full-width (padded rows/lanes accumulate exact
zeros).  The fused-tower structural zeros (w2 off-diagonal blocks, woT
cross-tower lanes — see ``networks.fused_weights``) are masked out of
the gradients at each boundary so the packed Adam is elementwise
identical to optax on the unfused parameters, including the global
norm.

The multi-device (shard_map) path CANNOT use this kernel: gradients
must be ``pmean``-ed across devices between minibatches, which is a
cross-chip collective mid-kernel.  ``rl/ppo.py`` gates accordingly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_ppo

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False


def available() -> bool:
    return _PALLAS


_LOG2PIE = float(np.log(2.0 * np.pi * np.e))


def _rup8(x: int) -> int:
    return -(-x // 8) * 8


def plane_rows(d: int, h2dim: int) -> int:
    return _rup8(d) + h2dim + 16


def _offsets(d: int, h2dim: int):
    s1 = _rup8(d)
    return s1, s1 + h2dim, s1 + h2dim + 8  # w2, woT, vec starts


def _structure_masks(d: int, adim: int, h2dim: int):
    """(structure, log_std) masks as (R, 2H) f32, built from iota so the
    kernel can materialise them without captured-array constants:
    1 on real parameter entries / log_std lanes, 0 on structural zeros
    (fused-tower off-blocks) and padding."""
    h = h2dim // 2
    s1, r_wo, r_vec = _offsets(d, h2dim)
    shape = (plane_rows(d, h2dim), h2dim)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    in_w1 = rows < d
    in_w2 = (rows >= s1) & (rows < s1 + h2dim)
    diag_ok = ((rows - s1) < h) == (cols < h)
    wo_pi = (rows >= r_wo) & (rows < r_wo + adim) & (cols < h)
    wo_v = (rows == r_wo + adim) & (cols >= h)
    biases = (rows == r_vec) | (rows == r_vec + 1)
    bo = (rows == r_vec + 2) & (cols < adim + 1)
    ls = (rows == r_vec + 3) & (cols < adim)
    structure = (in_w1 | (in_w2 & diag_ok) | wo_pi | wo_v | biases | bo | ls)
    return structure.astype(jnp.float32), ls.astype(jnp.float32)


def pack_plane(w1, b1, w2, b2, wo, bo, ls, d: int, adim: int,
               h2dim: int) -> jnp.ndarray:
    """Fused tensors -> the packed (R, 2H) f32 plane (wo transposed)."""
    s1 = _rup8(d)
    f32 = lambda x: x.astype(jnp.float32)  # noqa: E731

    def rows(x, n):
        return jnp.concatenate(
            [f32(x), jnp.zeros((n - x.shape[0], h2dim), jnp.float32)])

    def lane_row(x):
        return jnp.concatenate(
            [f32(x).reshape(1, -1),
             jnp.zeros((1, h2dim - x.size), jnp.float32)], axis=1)

    return jnp.concatenate([
        rows(w1, s1),
        f32(w2),
        rows(f32(wo).T, 8),
        lane_row(b1), lane_row(b2), lane_row(bo), lane_row(ls),
        jnp.zeros((4, h2dim), jnp.float32),
    ])


def unpack_plane(pk, d: int, adim: int, h2dim: int):
    """Packed plane -> dict of fused tensors (wo back untransposed)."""
    s1, r_wo, r_vec = _offsets(d, h2dim)
    return {
        "w1": pk[0:d],
        "w2": pk[s1:s1 + h2dim],
        "wo": pk[r_wo:r_wo + adim + 1].T,
        "b1": pk[r_vec],
        "b2": pk[r_vec + 1],
        "bo": pk[r_vec + 2, :adim + 1],
        "log_std": pk[r_vec + 3, :adim],
    }


def _update_kernel(cfg, d, adim, tile, group, steps_per_mb, n_passes,
                   h2dim, cd,
                   perm_ref, hyper_ref,
                   data_hbm, pk_in, mu_in, nu_in,
                   pk_out, mu_out, nu_out, met_ref,
                   pk, mu, nu, gk, data_s, sem):
    """Grid step = one tile-group of one minibatch pass; pass boundaries
    apply the optimiser to the VMEM-resident plane.

    Scalar-prefetch refs: ``perm_ref`` int32 (n_passes·tiles_per_mb,) —
    shuffle-tile ids, epoch-concatenated; ``hyper_ref`` f32
    (2 + 2·n_passes,) = [adam_t0, kl_beta, shift_0, inv_0, shift_1, ...]
    (``kl_beta`` read only under ``cfg["kl_mode"]`` — the adaptive-KL
    surrogate, constant across the update like the XLA loop's carried
    ``state.kl_beta``).
    Metric row (1, 8): [pg, v, kl, clipfrac, entropy, kl_last_epoch,
    0, 0] raw sums — lane 5 accumulates KL over the LAST epoch only,
    feeding the between-updates beta adaptation.
    """
    i = pl.program_id(0).astype(jnp.int32)  # x64 configs: program_id is i64
    s1, r_wo, r_vec = _offsets(d, h2dim)

    @pl.when(i == 0)
    def _init():
        pk[:, :] = pk_in[:, :]
        mu[:, :] = mu_in[:, :]
        nu[:, :] = nu_in[:, :]
        gk[:, :] = jnp.zeros_like(gk)
        met_ref[:, :] = jnp.zeros_like(met_ref)

    # ---- gather this group's shuffle-tiles (pallas_ppo._kernel pattern) --
    copies = [
        pltpu.make_async_copy(
            data_hbm.at[:, pl.ds(perm_ref[i * jnp.int32(group) + jnp.int32(j)]
                                 * jnp.int32(tile), tile)],
            data_s.at[:, pl.ds(jnp.int32(j * tile), tile)],
            sem.at[jnp.int32(j)],
        )
        for j in range(group)  # static unroll
    ]
    for dma in copies:
        dma.start()
    for dma in copies:
        dma.wait()

    # Index math stays EXPLICITLY int32: under an x64 config a plain
    # `i // python_int` promotes through int64 and Mosaic's
    # convert_element_type lowering recurses forever (caught by the
    # cross-platform export test).
    pass_id = jax.lax.div(i, jnp.int32(steps_per_mb))
    x = data_s[0:d, :]
    act = data_s[d:d + adim, :]
    old_logp = data_s[d + adim:d + adim + 1, :]
    old_value = data_s[d + adim + 1:d + adim + 2, :]
    adv = ((data_s[d + adim + 2:d + adim + 3, :] - hyper_ref[2 + 2 * pass_id])
           * hyper_ref[3 + 2 * pass_id])
    ret = data_s[d + adim + 3:d + adim + 4, :]

    dw1, db1, dw2, db2, dwoT, dbo, dls, met4 = pallas_ppo._tile_loss_grads(
        cfg, cd, x, act, old_logp, old_value, adv, ret,
        pk[0:d, :], pk[r_vec:r_vec + 1, :],
        pk[s1:s1 + h2dim, :], pk[r_vec + 1:r_vec + 2, :],
        pk[r_wo:r_wo + adim + 1, :], pk[r_vec + 2:r_vec + 3, 0:adim + 1],
        pk[r_vec + 3:r_vec + 4, 0:adim],
        kl_beta=(hyper_ref[1] if cfg.get("kl_mode") else None),
    )

    # ---- accumulate into the packed grad plane (8-aligned stores) --------
    def rpad(m, n):
        # A ZERO-row pad (m already n rows — e.g. slung3d's d=16 == s1)
        # must skip the concat: Mosaic rejects (0, 128) vectors at
        # lowering ("vector types must have positive constant sizes").
        if m.shape[0] == n:
            return m
        return jnp.concatenate([m, jnp.zeros((n - m.shape[0], h2dim),
                                             jnp.float32)])

    def lpad(row):
        if row.shape[1] == h2dim:  # same zero-width-concat guard
            return row
        return jnp.concatenate(
            [row, jnp.zeros((1, h2dim - row.shape[1]), jnp.float32)], axis=1)

    gk[0:s1, :] += rpad(dw1, s1)
    gk[s1:s1 + h2dim, :] += dw2
    gk[r_wo:r_wo + 8, :] += rpad(dwoT, 8)
    gk[r_vec:r_vec + 8, :] += jnp.concatenate(
        [db1, db2, lpad(dbo), lpad(dls), jnp.zeros((4, h2dim), jnp.float32)])
    # Lane 5: KL restricted to the LAST epoch's passes (for the
    # between-updates beta adaptation; kl_sum itself sits in lane 2).
    last_epoch = (pass_id >= n_passes - cfg["n_minibatches"]).astype(
        jnp.float32)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    met_ref[:, :] += (jnp.concatenate(
        [met4, jnp.zeros((1, 4), jnp.float32)], axis=1)
        + jnp.where(lane8 == 5, met4[0, 2] * last_epoch,
                    jnp.float32(0.0)))

    # ---- minibatch boundary: clip-by-global-norm + Adam ------------------
    @pl.when(jax.lax.rem(i + jnp.int32(1), jnp.int32(steps_per_mb))
             == jnp.int32(0))
    def _optimise():
        mask, ls_mask = _structure_masks(d, adim, h2dim)
        # Scalar hyperparameters as EXPLICIT f32 — under an x64 config
        # python floats promote jnp.where/clip expressions to f64, which
        # Mosaic has no cast lowering for (tests/test_tpu_export.py).
        inv_nmb = jnp.float32(1.0 / (steps_per_mb * group * tile))
        g = gk[:, :] * (mask * inv_nmb)
        # entropy gradient: -ent_coef per log_std dim (pallas_ppo._finish)
        g = g - jnp.float32(cfg["entropy_coef"]) * ls_mask
        # optax.clip_by_global_norm: (g / gnorm) * max_norm when over
        gnorm = jnp.sqrt(jnp.sum(g * g))
        c = jnp.float32(cfg["max_grad_norm"])
        g = jnp.where(gnorm < c, g, (g / gnorm) * c)
        # entropy metric from the PRE-update log_std
        ent = (jnp.sum(pk[r_vec + 3:r_vec + 4, 0:adim])
               + jnp.float32(0.5 * adim * _LOG2PIE))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        met_ref[:, :] += jnp.where(lane == 4, ent, jnp.float32(0.0))
        # optax.scale_by_adam(eps=1e-5, eps_root=0) + scale(-lr)
        b1c = jnp.float32(cfg["adam_b1"])
        b2c = jnp.float32(cfg["adam_b2"])
        t = hyper_ref[0] + (pass_id + jnp.int32(1)).astype(jnp.float32)
        c1 = 1.0 - jnp.exp(t * jnp.float32(np.log(cfg["adam_b1"])))
        c2 = 1.0 - jnp.exp(t * jnp.float32(np.log(cfg["adam_b2"])))
        m_new = (1.0 - b1c) * g + b1c * mu[:, :]
        v_new = (1.0 - b2c) * (g * g) + b2c * nu[:, :]
        mu[:, :] = m_new
        nu[:, :] = v_new
        upd = (m_new / c1) / (jnp.sqrt(v_new / c2)
                              + jnp.float32(cfg["adam_eps"]))
        pnew = pk[:, :] - jnp.float32(cfg["lr"]) * upd
        if cfg["log_std_floor"] is not None:
            pnew = jnp.where(ls_mask > 0.5,
                             jnp.maximum(pnew,
                                         jnp.float32(cfg["log_std_floor"])),
                             pnew)
        pk[:, :] = pnew
        gk[:, :] = jnp.zeros_like(gk)

    @pl.when(i == n_passes * steps_per_mb - 1)
    def _emit():
        pk_out[:, :] = pk[:, :]
        mu_out[:, :] = mu[:, :]
        nu_out[:, :] = nu[:, :]


@functools.partial(
    jax.jit,
    static_argnames=("d", "adim", "h2dim", "tile", "n_minibatches",
                     "n_epochs", "clip_eps", "value_clip_eps", "value_coef",
                     "ent_coef", "lr", "max_grad_norm", "log_std_floor",
                     "compute_dtype"),
)
def ppo_update_pallas(data, adv_stats, perm, adam_t0, pk, mu, nu,
                      d: int, adim: int, h2dim: int, tile: int,
                      n_minibatches: int, n_epochs: int,
                      clip_eps: float, value_clip_eps: float,
                      value_coef: float, ent_coef: float,
                      lr: float, max_grad_norm: float,
                      log_std_floor: float | None,
                      compute_dtype: str = "bfloat16",
                      kl_beta=None):
    """One full PPO update on the packed parameter plane.

    ``data``: (R8, n) stacked batch (``pallas_ppo.stack_batch`` layout,
    RAW advantage row).  ``adv_stats``: (E·M, 2) per-pass
    [shift, inv_scale].  ``perm``: (E · n_tiles,) int32 — every epoch's
    full tile permutation, concatenated in pass order.  ``adam_t0``: the
    optax Adam count BEFORE this update (int32 scalar).  ``pk/mu/nu``:
    packed planes from :func:`pack_plane`.

    Returns ``(pk, mu, nu, metrics)`` — metrics are means matching the
    per-minibatch XLA loop's summary: pg_loss, v_loss, approx_kl,
    clip_frac over all processed samples; entropy over passes.
    """
    n = data.shape[1]
    n_tiles = n // tile
    n_passes = n_epochs * n_minibatches
    assert perm.shape[0] == n_epochs * n_tiles
    tiles_per_mb = n_tiles // n_minibatches
    group = max(1, 1024 // tile)
    while tiles_per_mb % group:
        group //= 2
    steps_per_mb = tiles_per_mb // group
    r8 = data.shape[0]
    rows = plane_rows(d, h2dim)
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else None

    cfg = dict(clip_eps=clip_eps, value_clip_eps=value_clip_eps,
               value_coef=value_coef, entropy_coef=ent_coef, lr=lr,
               max_grad_norm=max_grad_norm, adam_b1=0.9, adam_b2=0.999,
               adam_eps=1e-5, log_std_floor=log_std_floor,
               kl_mode=kl_beta is not None, n_minibatches=n_minibatches)
    kernel = functools.partial(
        _update_kernel, cfg, d, adim, tile, group, steps_per_mb, n_passes,
        h2dim, cd)

    hyper = jnp.concatenate([
        adam_t0.astype(jnp.float32).reshape(1),
        jnp.asarray(0.0 if kl_beta is None else kl_beta,
                    jnp.float32).reshape(1),
        adv_stats.astype(jnp.float32).reshape(-1),
    ])

    def resident(shape):
        return pl.BlockSpec(shape, lambda i, *_: (0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_passes * steps_per_mb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            resident((rows, h2dim)),
            resident((rows, h2dim)),
            resident((rows, h2dim)),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, h2dim), jnp.float32),
            pltpu.VMEM((rows, h2dim), jnp.float32),
            pltpu.VMEM((rows, h2dim), jnp.float32),
            pltpu.VMEM((rows, h2dim), jnp.float32),
            pltpu.VMEM((r8, group * tile), jnp.float32),
            pltpu.SemaphoreType.DMA((group,)),
        ],
        out_specs=[
            resident((rows, h2dim)),
            resident((rows, h2dim)),
            resident((rows, h2dim)),
            resident((1, 8)),
        ],
    )
    pk_o, mu_o, nu_o, met = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, h2dim), jnp.float32),
            jax.ShapeDtypeStruct((rows, h2dim), jnp.float32),
            jax.ShapeDtypeStruct((rows, h2dim), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(perm.astype(jnp.int32), hyper,
      data.astype(jnp.float32), pk, mu, nu)

    n_proc = n_passes * steps_per_mb * group * tile
    metrics = {
        "pg_loss": met[0, 0] / n_proc,
        "v_loss": met[0, 1] / n_proc,
        "approx_kl": met[0, 2] / n_proc,
        "clip_frac": met[0, 3] / n_proc,
        "entropy": met[0, 4] / n_passes,
    }
    if kl_beta is not None:
        # Lane 5 summed KL over the last epoch's n/1 samples.
        metrics["approx_kl_last"] = met[0, 5] / (
            n_minibatches * steps_per_mb * group * tile)
    return pk_o, mu_o, nu_o, metrics
