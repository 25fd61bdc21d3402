"""Pallas TPU kernel: fused PPO loss forward+backward for the 2-layer
fused actor-critic MLP.

Why: after the transposed/bf16 rewrite the PPO update phase is bound by
HBM traffic on the (2H, n) hidden activations — XLA materialises them in
the forward pass and re-reads them in the backward.  This kernel computes
the WHOLE minibatch loss gradient tile-by-tile with every activation
resident in VMEM: HBM traffic drops to one read of the (D+A+4, n)
minibatch plus the (tiny) parameter gradients, and the matmuls run bf16
on the MXU with f32 accumulation.

Scope: the fused 2-hidden-layer network of ``networks.fused_weights``
(the reference's 2x64 policy; ``rl/ppo.py`` falls back to the XLA path
for other depths).  The gradient math is hand-derived below and
differentially tested against ``jax.value_and_grad(ppo_loss)`` in
``tests/test_pallas_ppo.py`` (f32, rtol 1e-4).

Tie conventions match JAX: ``jnp.minimum(a, b)`` routes the cotangent to
``a`` where ``a < b``, to ``b`` where ``b < a``, and half-half on exact
ties; the clipped-ratio branch uses the same selector as the XLA loss so
gradients agree everywhere except measure-zero boundaries.

The minibatch GATHER is fused into the kernel (round 3): the caller
stacks the FULL flattened batch into one row-padded (R8, n) array
(rows: obs, action, old_logp, old_value, raw advantage, return — R8
rounded up to a multiple of 8, Mosaic's HBM sublane-slice granule) and
passes a per-minibatch list of shuffle-tile indices (``perm``,
scalar-prefetched).  Each grid step assembles a group of tiles into VMEM
scratch with one async copy per tile, straight from the permuted
positions.  The XLA path previously materialised every minibatch with
``take``-style gathers — profiled at ~5.5 ms/update of pure data
formatting (vs 7.6 ms of actual loss-grad compute) because the
128-lane×1-sublane gather granule defeats the copy pipeline.  In-kernel
DMA makes the gather part of the compute pipeline: the minibatch is
never materialised in HBM at all.  Advantage normalisation moves
in-kernel too (``adv_stats`` = per-minibatch shift/inv-scale computed by
the caller from the one cheap (n,) row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False


def available() -> bool:
    return _PALLAS


_LOG2PI = 1.8378770664093453


def _mm(a, b, dims, cd):
    """dot_general with optional bf16 inputs, f32 accumulation."""
    if cd is not None:
        a, b = a.astype(cd), b.astype(cd)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _tile_loss_grads(cfg, cd, x, act, old_logp, old_value, adv, ret,
                     w1, b1, w2, b2, woT, bo, ls, kl_beta=None):
    """PPO loss forward+backward on one VMEM-resident sample block
    (shared by the per-minibatch kernel below and the full-update
    kernel in :mod:`pallas_ppo_update`).  Clipped surrogate by default;
    ``kl_beta`` (traced scalar, not None — a STATIC mode switch) selects
    the adaptive-KL-penalty surrogate instead (baselines-ppo1 style,
    matching ``ppo.ppo_loss`` with ``cfg.kl_target`` set):
    ``-ratio*adv + beta*(old_logp - logp)``.

    Layouts: ``x`` (D, nt), ``act`` (A, nt), per-sample rows (1, nt);
    ``w1`` (D, 2H), ``w2`` (2H, 2H), ``woT`` (A+1, 2H) — the output
    layer TRANSPOSED so both kernels can store it 8-row aligned;
    ``b1``/``b2`` (1, 2H), ``bo`` (1, A+1), ``ls`` (1, A).

    Returns ``(dw1, db1, dw2, db2, dwoT, dbo, dls, met)`` — raw SUMS
    over the block (callers scale); ``met`` is a (1, 4) row
    [pg_sum, v_sum, kl_sum, clipfrac_sum]."""
    # Scalars as EXPLICIT f32: under an x64 config jnp.clip's python-
    # float bounds promote the whole expression to f64, which Mosaic has
    # no cast lowering for (caught by tests/test_tpu_export.py).
    clip_eps = jnp.float32(cfg["clip_eps"])
    value_clip = jnp.float32(cfg["value_clip_eps"])
    value_coef = jnp.float32(cfg["value_coef"])
    adim = act.shape[0]

    # ---- forward ---------------------------------------------------------
    h1 = jnp.tanh(_mm(w1, x, ((0,), (0,)), cd) + b1.T)      # (2H, nt)
    h2 = jnp.tanh(_mm(w2, h1, ((0,), (0,)), cd) + b2.T)     # (2H, nt)
    out = _mm(woT, h2, ((1,), (0,)), cd) + bo.T             # (A+1, nt)
    mean = out[:adim]                                            # (A, nt)
    value = out[adim:adim + 1]                                   # (1, nt)

    # ---- policy-gradient term -------------------------------------------
    ls_col = ls.T                                                # (A, 1)
    var = jnp.exp(2.0 * ls_col)
    diff = act - mean                                            # (A, nt)
    quad = diff * diff / var
    logp = (-0.5 * jnp.sum(quad, axis=0, keepdims=True)
            - jnp.sum(ls) - 0.5 * adim * _LOG2PI)                # (1, nt)
    ratio = jnp.exp(logp - old_logp)
    if kl_beta is not None:
        # KL-penalty surrogate: loss_sum = -sum(ratio*adv)
        #                                  + beta*sum(old_logp - logp).
        dlogp = -ratio * adv - kl_beta                            # per sample
    else:
        clipped = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
        pg1 = ratio * adv
        pg2 = clipped * adv
        pg_min = jnp.minimum(pg1, pg2)
        # d pg_min / d ratio with JAX's tie convention (half-half on ties).
        inside = (jnp.abs(ratio - 1.0) < clip_eps).astype(jnp.float32)
        sel1 = (pg1 < pg2).astype(jnp.float32)
        sel2 = (pg2 < pg1).astype(jnp.float32)
        tie = 1.0 - sel1 - sel2
        dmin_dratio = adv * (sel1 + sel2 * inside + 0.5 * tie * (1.0 + inside))
        dlogp = -dmin_dratio * ratio                              # d(-pg)/dlogp

    # ---- value term ------------------------------------------------------
    vdiff = value - old_value
    vcl = old_value + jnp.clip(vdiff, -value_clip, value_clip)
    e1 = value - ret
    e2 = vcl - ret
    sq1, sq2 = e1 * e1, e2 * e2
    v_max = jnp.maximum(sq1, sq2)
    vin = (jnp.abs(vdiff) < value_clip).astype(jnp.float32)
    vs1 = (sq1 > sq2).astype(jnp.float32)
    vs2 = (sq2 > sq1).astype(jnp.float32)
    vtie = 1.0 - vs1 - vs2
    dvalue = value_coef * (vs1 * e1 + vs2 * e2 * vin
                           + 0.5 * vtie * (e1 + e2 * vin))        # (1, nt)

    # ---- per-sample output cotangent ------------------------------------
    dmean = dlogp * (diff / var)                                  # (A, nt)
    dout = jnp.concatenate([dmean, dvalue], axis=0)               # (A+1, nt)

    # ---- backward through the MLP ---------------------------------------
    dh2 = _mm(woT, dout, ((0,), (0,)), cd)                    # (2H, nt)
    dpre2 = dh2 * (1.0 - h2 * h2)
    dh1 = _mm(w2, dpre2, ((1,), (0,)), cd)                    # (2H, nt)
    dpre1 = dh1 * (1.0 - h1 * h1)

    dwoT = _mm(dout, h2, ((1,), (1,)), cd)                    # (A+1, 2H)
    dbo = jnp.sum(dout, axis=1, keepdims=True).T                  # (1, A+1)
    dw2 = _mm(h1, dpre2, ((1,), (1,)), cd)                    # (2H, 2H)
    db2 = jnp.sum(dpre2, axis=1, keepdims=True).T                 # (1, 2H)
    dw1 = _mm(x, dpre1, ((1,), (1,)), cd)                     # (D, 2H)
    db1 = jnp.sum(dpre1, axis=1, keepdims=True).T                 # (1, 2H)

    # log_std grad: pg term only (entropy handled by the caller — its
    # gradient is the constant -ent_coef per dim).
    dls = jnp.sum(dlogp * (quad - 1.0), axis=1, keepdims=True).T  # (1, A)

    # ---- metrics ---------------------------------------------------------
    kl_sum = jnp.sum(old_logp - logp)
    if kl_beta is not None:
        pg_sum = -jnp.sum(ratio * adv) + kl_beta * kl_sum
    else:
        pg_sum = -jnp.sum(pg_min)
    v_sum = 0.5 * jnp.sum(v_max)
    clip_sum = jnp.sum((jnp.abs(ratio - 1.0) > clip_eps).astype(jnp.float32))
    met = jnp.stack([pg_sum, v_sum, kl_sum, clip_sum]).reshape(1, 4)
    return dw1, db1, dw2, db2, dwoT, dbo, dls, met


def _kernel(cfg, d, adim, tile, group, cd,
            perm_ref, data_hbm, stats_ref,
            w1_ref, b1_ref, w2_ref, b2_ref,
            wo_ref, bo_ref, ls_ref,
            dw1_ref, db1_ref, dw2_ref, db2_ref, dwo_ref, dbo_ref,
            dls_ref, met_ref,
            data_s, sem):
    """One batch group: gather ``group`` shuffle-tiles by DMA, forward,
    per-sample loss grads, backward, and accumulation into the
    parameter-grad outputs.

    ``perm_ref`` (scalar prefetch, SMEM) holds the shuffle-tile index of
    every tile in minibatch order; grid step ``i`` assembles tiles
    ``perm[i*group : (i+1)*group]`` into the (R8, group·tile) VMEM
    scratch with one async copy per tile straight out of the full
    stacked batch (``data_hbm``, HBM-resident; see module docstring for
    the row layout).  Grouping keeps the matmuls ~1024 wide: a
    one-tile-per-step grid (tile=128) measured 2.5× slower — per-step
    fixed costs and the (2H, 2H) accumulator read-modify-writes dominate
    128-wide compute.
    ``stats_ref`` (1, 4): [adv_shift, adv_inv_scale, kl_beta, 0] — the
    per-minibatch advantage normalisation (0, 1 when disabled) and the
    adaptive-KL coefficient (read only when ``cfg["kl_mode"]``).
    Metric row: [pg_sum, v_sum, kl_sum, clipfrac_sum].
    All sums are raw; the caller divides by n.
    ``wo_ref``/``dwo_ref`` hold the output layer TRANSPOSED —
    (A+1, 2H) — the :func:`_tile_loss_grads` convention.
    """
    i = pl.program_id(0).astype(jnp.int32)  # x64 configs: program_id is i64

    # ---- gather: one DMA per shuffle-tile, then one barrier -------------
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

    x = data_s[0:d, :]                      # (D, nt) f32
    act = data_s[d:d + adim, :]             # (A, nt)
    old_logp = data_s[d + adim:d + adim + 1, :]
    old_value = data_s[d + adim + 1:d + adim + 2, :]
    adv = ((data_s[d + adim + 2:d + adim + 3, :] - stats_ref[0, 0])
           * stats_ref[0, 1])
    ret = data_s[d + adim + 3:d + adim + 4, :]

    dw1, db1, dw2, db2, dwoT, dbo, dls, met = _tile_loss_grads(
        cfg, cd, x, act, old_logp, old_value, adv, ret,
        w1_ref[:, :], b1_ref[:, :], w2_ref[:, :], b2_ref[:, :],
        wo_ref[:, :], bo_ref[:, :], ls_ref[0:1, :],
        kl_beta=(stats_ref[0, 2] if cfg.get("kl_mode") else None),
    )

    # ---- accumulate across grid steps -----------------------------------
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dw2_ref[:, :] = jnp.zeros_like(dw2_ref)
        db2_ref[:, :] = jnp.zeros_like(db2_ref)
        dwo_ref[:, :] = jnp.zeros_like(dwo_ref)
        dbo_ref[:, :] = jnp.zeros_like(dbo_ref)
        dls_ref[:, :] = jnp.zeros_like(dls_ref)
        met_ref[:, :] = jnp.zeros_like(met_ref)

    dw1_ref[:, :] += dw1
    db1_ref[:, :] += db1
    dw2_ref[:, :] += dw2
    db2_ref[:, :] += db2
    dwo_ref[:, :] += dwoT
    dbo_ref[:, :] += dbo
    dls_ref[:, :] += dls
    met_ref[:, :] += met


def _loss_grads_call(data, adv_stats, perm,
                     w1, b1, w2, b2, wo, bo, log_std,
                     cfg: dict, d: int, adim: int, tile: int,
                     compute_dtype: str, m: int):
    """Shared pallas_call: grid = ``m // group`` steps, each assembling
    ``group`` shuffle-tiles (``perm[i*group:(i+1)*group]``) from the full
    stacked (R8, n) HBM array into VMEM scratch and computing on the wide
    block."""
    r8 = data.shape[0]
    h2dim = w2.shape[0]
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else None

    # Group tiles so each grid step computes on ~1024 samples (MXU-wide
    # matmuls, amortised accumulator updates) regardless of shuffle
    # granularity.
    group = max(1, 1024 // tile)
    while m % group:
        group //= 2
    nt = group * tile

    kernel = functools.partial(_kernel, cfg, d, adim, tile, group, cd)

    def resident(shape):
        return pl.BlockSpec(shape, lambda i, *_: (0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            resident((1, 4)),
            resident((d, h2dim)),
            resident((1, h2dim)),
            resident((h2dim, h2dim)),
            resident((1, h2dim)),
            resident((adim + 1, h2dim)),
            resident((1, adim + 1)),
            resident((1, adim)),
        ],
        scratch_shapes=[
            pltpu.VMEM((r8, nt), jnp.float32),
            pltpu.SemaphoreType.DMA((group,)),
        ],
        out_specs=[
            resident((d, h2dim)),
            resident((1, h2dim)),
            resident((h2dim, h2dim)),
            resident((1, h2dim)),
            resident((adim + 1, h2dim)),
            resident((1, adim + 1)),
            resident((1, adim)),
            resident((1, 4)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((d, h2dim), jnp.float32),
            jax.ShapeDtypeStruct((1, h2dim), jnp.float32),
            jax.ShapeDtypeStruct((h2dim, h2dim), jnp.float32),
            jax.ShapeDtypeStruct((1, h2dim), jnp.float32),
            jax.ShapeDtypeStruct((adim + 1, h2dim), jnp.float32),
            jax.ShapeDtypeStruct((1, adim + 1), jnp.float32),
            jax.ShapeDtypeStruct((1, adim), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(perm, data, adv_stats,
      w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
      wo.T, bo.reshape(1, -1), log_std.reshape(1, -1))


def _finish(outs, n, ent_coef):
    dw1, db1, dw2, db2, dwoT, dbo, dls, met = outs
    inv_n = 1.0 / n
    grads = {
        "w1": dw1 * inv_n, "b1": db1[0] * inv_n,
        "w2": dw2 * inv_n, "b2": db2[0] * inv_n,
        "wo": dwoT.T * inv_n, "bo": dbo[0] * inv_n,
        # entropy term: d(-ent_coef * entropy)/d log_std = -ent_coef
        "log_std": dls[0] * inv_n - ent_coef,
    }
    metrics = {
        "pg_loss": met[0, 0] * inv_n,
        "v_loss": met[0, 1] * inv_n,
        "approx_kl": met[0, 2] * inv_n,
        "clip_frac": met[0, 3] * inv_n,
    }
    return grads, metrics


def _f32(*xs):
    return tuple(x.astype(jnp.float32) for x in xs)


def stack_batch(obs, act, old_logp, old_value, adv, ret):
    """Stack the flattened batch into the kernel's row-padded (R8, n)
    layout: rows [0:D) obs, [D:D+A) action, then old_logp, old_value,
    RAW advantage, return, then zero rows up to the next multiple of 8
    (Mosaic requires HBM sublane slices in multiples of 8 rows)."""
    rows = jnp.concatenate([
        obs.astype(jnp.float32), act.astype(jnp.float32),
        jnp.stack([old_logp, old_value, adv, ret]).astype(jnp.float32),
    ])
    r, n = rows.shape
    r8 = -(-r // 8) * 8
    if r8 != r:
        rows = jnp.concatenate([rows, jnp.zeros((r8 - r, n), jnp.float32)])
    return rows


@functools.partial(
    jax.jit,
    static_argnames=("clip_eps", "value_clip_eps", "value_coef", "ent_coef",
                     "tile", "compute_dtype"),
)
def ppo_loss_grads_pallas(obs, act, old_logp, old_value, adv, ret,
                          w1, b1, w2, b2, wo, bo, log_std,
                          clip_eps: float, value_clip_eps: float,
                          value_coef: float, ent_coef: float,
                          tile: int = 1024, compute_dtype: str = "bfloat16",
                          kl_beta=None):
    """Fused PPO loss gradient over a CONTIGUOUS transposed minibatch.

    Inputs: ``obs`` (D, n) f32, ``act`` (A, n), per-sample rows (n,),
    fused weights from :func:`networks.fused_weights`.  ``adv`` must
    already be normalised if the config asks for it.
    Returns ``(grads, metrics)`` where grads is a dict with keys
    ``w1 b1 w2 b2 wo bo log_std`` (loss-mean gradients, entropy term
    included in ``log_std``) and metrics ``{pg_loss, v_loss, approx_kl,
    clip_frac}`` (means).
    """
    d, n = obs.shape
    adim = act.shape[0]
    assert n % tile == 0, (n, tile)
    cfg = dict(clip_eps=clip_eps, value_clip_eps=value_clip_eps,
               value_coef=value_coef, entropy_coef=ent_coef,
               kl_mode=kl_beta is not None)
    # The kernel is float32 (its production precision); under x64 test
    # configs the inputs may arrive as f64 — cast at the boundary.
    w1, b1, w2, b2 = _f32(w1, b1, w2, b2)
    wo, bo, log_std = _f32(wo, bo, log_std)

    data = stack_batch(obs, act, old_logp, old_value, adv, ret)
    m = n // tile
    perm = jnp.arange(m, dtype=jnp.int32)
    beta_val = 0.0 if kl_beta is None else kl_beta
    adv_stats = jnp.stack([
        jnp.asarray(0.0, jnp.float32), jnp.asarray(1.0, jnp.float32),
        jnp.asarray(beta_val, jnp.float32), jnp.asarray(0.0, jnp.float32),
    ]).reshape(1, 4)
    outs = _loss_grads_call(data, adv_stats, perm,
                            w1, b1, w2, b2, wo, bo, log_std,
                            cfg, d, adim, tile, compute_dtype, m)
    return _finish(outs, n, ent_coef)


@functools.partial(
    jax.jit,
    static_argnames=("d", "adim", "clip_eps", "value_clip_eps",
                     "value_coef", "ent_coef", "tile", "compute_dtype",
                     "kl_mode"),
)
def ppo_loss_grads_pallas_gather(data, adv_stats, perm,
                                 w1, b1, w2, b2, wo, bo, log_std,
                                 d: int, adim: int,
                                 clip_eps: float, value_clip_eps: float,
                                 value_coef: float, ent_coef: float,
                                 tile: int, compute_dtype: str = "bfloat16",
                                 kl_mode: bool = False):
    """Fused gather + PPO loss gradient: the minibatch is DEFINED by
    ``perm`` — int32 (m,) shuffle-tile indices into the FULL flattened
    batch — and never materialised.  ``data`` is the whole rollout in the
    :func:`stack_batch` row layout (R8, n — built ONCE per update, with
    the RAW advantage row); each grid step DMAs its tiles directly from
    the permuted positions.  ``adv_stats`` (1, 2) = [shift, inv_scale]
    applied to the adv row in-kernel (per-minibatch advantage
    normalisation).  ``tile`` must keep HBM column slices lane-aligned
    (tile % 128 == 0) on real TPUs.
    Returns the same ``(grads, metrics)`` as :func:`ppo_loss_grads_pallas`.
    """
    n = data.shape[1]
    assert n % tile == 0, (n, tile)
    m = perm.shape[0]
    cfg = dict(clip_eps=clip_eps, value_clip_eps=value_clip_eps,
               value_coef=value_coef, entropy_coef=ent_coef,
               kl_mode=kl_mode)
    data = data.astype(jnp.float32)
    adv_stats = adv_stats.astype(jnp.float32)
    w1, b1, w2, b2 = _f32(w1, b1, w2, b2)
    wo, bo, log_std = _f32(wo, bo, log_std)
    outs = _loss_grads_call(data, adv_stats,
                            perm.astype(jnp.int32),
                            w1, b1, w2, b2, wo, bo, log_std,
                            cfg, d, adim, tile, compute_dtype, m)
    return _finish(outs, m * tile, ent_coef)
