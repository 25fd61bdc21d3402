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


def _kernel(cfg, adim, nt, cd,
            obs_ref, act_ref, aux_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            wo_ref, bo_ref, ls_ref,
            dw1_ref, db1_ref, dw2_ref, db2_ref, dwo_ref, dbo_ref,
            dls_ref, met_ref):
    """One batch tile: forward, per-sample loss grads, backward, and
    accumulation into the parameter-grad outputs.

    aux rows: 0 old_logp, 1 old_value, 2 advantage (pre-normalised),
    3 return.  Metric row: [pg_sum, v_sum, kl_sum, clipfrac_sum].
    All sums are raw; the caller divides by n.
    """
    clip_eps, value_clip, value_coef, ent_coef = (
        cfg["clip_eps"], cfg["value_clip_eps"], cfg["value_coef"],
        cfg["entropy_coef"],
    )

    x = obs_ref[:, :]                       # (D, nt) f32
    act = act_ref[:, :]                     # (A, nt)
    old_logp = aux_ref[0:1, :]
    old_value = aux_ref[1:2, :]
    adv = aux_ref[2:3, :]
    ret = aux_ref[3:4, :]
    w1, b1 = w1_ref[:, :], b1_ref[:, :]     # (D, 2H), (1, 2H)
    w2, b2 = w2_ref[:, :], b2_ref[:, :]     # (2H, 2H), (1, 2H)
    wo, bo = wo_ref[:, :], bo_ref[:, :]     # (2H, A+1), (1, A+1)
    ls = ls_ref[0:1, :]                     # (1, A) log_std

    # ---- forward ---------------------------------------------------------
    h1 = jnp.tanh(_mm(w1, x, ((0,), (0,)), cd) + b1.T)      # (2H, nt)
    h2 = jnp.tanh(_mm(w2, h1, ((0,), (0,)), cd) + b2.T)     # (2H, nt)
    out = _mm(wo, h2, ((0,), (0,)), cd) + bo.T              # (A+1, nt)
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
    dlogp = -dmin_dratio * ratio                                  # d(-pg)/dlogp

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
    dh2 = _mm(wo, dout, ((1,), (0,)), cd)                     # (2H, nt)
    dpre2 = dh2 * (1.0 - h2 * h2)
    dh1 = _mm(w2, dpre2, ((1,), (0,)), cd)                    # (2H, nt)
    dpre1 = dh1 * (1.0 - h1 * h1)

    dwo = _mm(h2, dout, ((1,), (1,)), cd)                     # (2H, A+1)
    dbo = jnp.sum(dout, axis=1, keepdims=True).T                  # (1, A+1)
    dw2 = _mm(h1, dpre2, ((1,), (1,)), cd)                    # (2H, 2H)
    db2 = jnp.sum(dpre2, axis=1, keepdims=True).T                 # (1, 2H)
    dw1 = _mm(x, dpre1, ((1,), (1,)), cd)                     # (D, 2H)
    db1 = jnp.sum(dpre1, axis=1, keepdims=True).T                 # (1, 2H)

    # log_std grad: pg term only (entropy handled by the caller — its
    # gradient is the constant -ent_coef per dim).
    dls = jnp.sum(dlogp * (quad - 1.0), axis=1, keepdims=True).T  # (1, A)

    # ---- metrics ---------------------------------------------------------
    pg_sum = -jnp.sum(pg_min)
    v_sum = 0.5 * jnp.sum(v_max)
    kl_sum = jnp.sum(old_logp - logp)
    clip_sum = jnp.sum((jnp.abs(ratio - 1.0) > clip_eps).astype(jnp.float32))
    met = jnp.stack([pg_sum, v_sum, kl_sum, clip_sum]).reshape(1, 4)

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
    dwo_ref[:, :] += dwo
    dbo_ref[:, :] += dbo
    dls_ref[:, :] += dls
    met_ref[:, :] += met


@functools.partial(
    jax.jit,
    static_argnames=("clip_eps", "value_clip_eps", "value_coef", "ent_coef",
                     "tile", "compute_dtype"),
)
def ppo_loss_grads_pallas(obs, act, old_logp, old_value, adv, ret,
                          w1, b1, w2, b2, wo, bo, log_std,
                          clip_eps: float, value_clip_eps: float,
                          value_coef: float, ent_coef: float,
                          tile: int = 1024, compute_dtype: str = "bfloat16"):
    """Fused PPO loss gradient over a transposed minibatch.

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
    h2dim = w2.shape[0]
    assert n % tile == 0, (n, tile)
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else None
    cfg = dict(clip_eps=clip_eps, value_clip_eps=value_clip_eps,
               value_coef=value_coef, entropy_coef=ent_coef)

    # The kernel is float32 (its production precision); under x64 test
    # configs the inputs may arrive as f64 — cast at the boundary.
    f32 = jnp.float32
    obs, act = obs.astype(f32), act.astype(f32)
    old_logp, old_value = old_logp.astype(f32), old_value.astype(f32)
    adv, ret = adv.astype(f32), ret.astype(f32)
    w1, b1, w2, b2 = (x.astype(f32) for x in (w1, b1, w2, b2))
    wo, bo, log_std = wo.astype(f32), bo.astype(f32), log_std.astype(f32)

    aux = jnp.stack([old_logp, old_value, adv, ret])              # (4, n)
    grid = (n // tile,)
    kernel = functools.partial(_kernel, cfg, adim, tile, cd)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((adim, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h2dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h2dim, h2dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h2dim, adim + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, adim + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, adim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d, h2dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h2dim, h2dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h2dim, adim + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, adim + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, adim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, h2dim), jnp.float32),
            jax.ShapeDtypeStruct((1, h2dim), jnp.float32),
            jax.ShapeDtypeStruct((h2dim, h2dim), jnp.float32),
            jax.ShapeDtypeStruct((1, h2dim), jnp.float32),
            jax.ShapeDtypeStruct((h2dim, adim + 1), jnp.float32),
            jax.ShapeDtypeStruct((1, adim + 1), jnp.float32),
            jax.ShapeDtypeStruct((1, adim), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ],
    )(obs, act, aux, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
      wo, bo.reshape(1, -1), log_std.reshape(1, -1))

    dw1, db1, dw2, db2, dwo, dbo, dls, met = outs
    inv_n = 1.0 / n
    grads = {
        "w1": dw1 * inv_n, "b1": db1[0] * inv_n,
        "w2": dw2 * inv_n, "b2": db2[0] * inv_n,
        "wo": dwo * inv_n, "bo": dbo[0] * inv_n,
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
