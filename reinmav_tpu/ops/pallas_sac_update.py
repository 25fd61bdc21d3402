"""Pallas TPU kernel: the SAC update phase — all ``grad_steps`` gradient
updates of one iteration — in ONE launch.

Motivation (the PPO fused-update result, ops/pallas_ppo_update): at
SAC's scales the update phase is a swarm of tiny XLA ops — three
``value_and_grad`` networks over an 8192-sample batch, three Adam
applications across ~14 small tensors, polyak blends over four trees —
each a separate TPU kernel with fixed launch cost, while the actual
matmul work is microseconds.  Here the five MLPs (actor, twin critics,
twin targets), the Adam moments, and the gradient accumulators live in
packed VMEM planes for the whole call; each grid step processes one
sample group through the REAL loss functions (``sac.critic_loss`` /
``sac.actor_alpha_loss`` internals via their eps-based variants) with
``jax.value_and_grad`` traced INSIDE the kernel, and group boundaries
apply Adam + polyak as a few VPU ops.

Semantics mirrored from ``sac.train_iters``'s ``one_update`` scan:

* per grad-step: sample batch (gathered by the CALLER with the same
  key stream — scattered gathers stay in XLA where they lower to one
  gather op), critic update FIRST, then the actor/alpha update reads
  the UPDATED critics (two sequential phases per grad step), then the
  polyak target blend;
* the Gaussian draws for the Bellman target and the actor resample are
  precomputed by the caller with the exact keys ``one_update`` would
  use and ride along as extra data rows — bitwise-identical streams;
* the warmup gate freezes params, Adam state, and targets exactly like
  the (review-fixed) XLA path; metrics are masked by the caller.

Plane layout (lanes = hidden width H): each MLP is stored naturally —
layer ``i``'s (din, dout) weight occupies ``rup8(din)`` rows x ``dout``
lanes, followed by an 8-row bias block (layer i's bias in row i).  The
params plane stacks [actor | q1 | q2 | q1_target | q2_target | misc];
the moment/grad planes stack [actor | q1 | q2 | misc]; ``misc`` row 0
lane 0 holds log_alpha.  All stores are 8-row aligned and full-width
(padding accumulates exact zeros), so the packed elementwise Adam is
exactly optax on the unfused trees.

The planes enter and leave through ``memory_space=ANY`` (HBM) with
explicit first/last-step DMAs — keeping only the working copies
VMEM-resident (~8 MB at H=256 + autodiff temporaries per group).

Multi-device: NOT this kernel's job — the shard_map path must ``pmean``
gradients between updates; ``sac.train_iters`` gates accordingly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False


def available() -> bool:
    return _PALLAS


def _rup8(x: int) -> int:
    return -(-x // 8) * 8


def mlp_rows(dims) -> int:
    """Rows one MLP occupies in a plane: per-layer rup8(din) + an 8-row
    bias block."""
    return sum(_rup8(din) for din in dims[:-1]) + 8


def _layer_offsets(dims):
    """[(w_row, din, dout)] per layer + the bias-block row."""
    offs, r = [], 0
    for din, dout in zip(dims[:-1], dims[1:]):
        offs.append((r, din, dout))
        r += _rup8(din)
    return offs, r  # bias block starts at r


def plane_offsets(adims, qdims, with_targets: bool):
    """Net start-rows within a plane: [actor, q1, q2, (q1t, q2t,)] +
    misc row; returns (dict, total_rows)."""
    offs = {}
    r = 0
    names = (("actor", adims), ("q1", qdims), ("q2", qdims))
    if with_targets:
        names = names + (("q1t", qdims), ("q2t", qdims))
    for name, dims in names:
        offs[name] = r
        r += mlp_rows(dims)
    offs["misc"] = r
    return offs, r + 8


def pack_mlp(layers, dims, lanes: int) -> jnp.ndarray:
    """Layer dicts -> the (mlp_rows, lanes) f32 block."""
    parts = []
    for layer, (_, din, dout) in zip(layers, _layer_offsets(dims)[0]):
        w = layer["w"].astype(jnp.float32)
        w = jnp.pad(w, ((0, _rup8(din) - din), (0, lanes - dout)))
        parts.append(w)
    brows = []
    for layer, (_, _, dout) in zip(layers, _layer_offsets(dims)[0]):
        b = layer["b"].astype(jnp.float32).reshape(1, -1)
        brows.append(jnp.pad(b, ((0, 0), (0, lanes - dout))))
    brows.append(jnp.zeros((8 - len(layers), lanes), jnp.float32))
    return jnp.concatenate(parts + brows)


def unpack_mlp(block, dims, lanes: int):
    offs, brow = _layer_offsets(dims)
    layers = []
    for i, (r, din, dout) in enumerate(offs):
        layers.append({"w": block[r:r + din, :dout],
                       "b": block[brow + i, :dout]})
    return layers


def _read_mlp(ref, off: int, dims):
    """Layer dicts of VALUES read from a plane ref (for value_and_grad)."""
    offs, brow = _layer_offsets(dims)
    layers = []
    for i, (r, din, dout) in enumerate(offs):
        w = ref[off + r:off + r + din, 0:dout]
        b = ref[off + brow + i:off + brow + i + 1, 0:dout][0]
        layers.append({"w": w, "b": b})
    return layers


def _acc_mlp_grads(gref, off: int, dims, lanes: int, grads):
    """Accumulate a layer-dict gradient tree into the plane (8-aligned
    full-width stores; pads add exact zeros)."""
    offs, brow = _layer_offsets(dims)
    for (r, din, dout), layer in zip(offs, grads):
        gw = jnp.pad(layer["w"], ((0, _rup8(din) - din), (0, lanes - dout)))
        gref[off + r:off + r + _rup8(din), :] += gw
    brows = []
    for (_, _, dout), layer in zip(offs, grads):
        brows.append(jnp.pad(layer["b"].reshape(1, -1),
                             ((0, 0), (0, lanes - dout))))
    brows.append(jnp.zeros((8 - len(grads), lanes), jnp.float32))
    gref[off + brow:off + brow + 8, :] += jnp.concatenate(brows)


def _sac_kernel(cfg, env, adims, qdims, lanes, group, groups, grad_steps,
                batch, r_raw, cd, target_entropy,
                p_offs, g_offs,
                hyper_ref,
                data_hbm, p_in, m_in, n_in,
                p_out, m_out, n_out, met_ref,
                ps, ms, ns, gs_, data_s,
                sem_in, sem_data, sem_out):
    """Grid step = (grad_step, phase, group); phase 0 accumulates critic
    grads, phase 1 (after the critic Adam) actor+alpha grads.

    ``hyper_ref`` (scalar prefetch f32): [adam_t0, gate].
    Metric row (1, 8): sums of per-group means
    [q_loss, q_mean, target_mean, pi_loss, entropy, alpha, 0, 0].
    """
    from ..rl import sac as sac_mod

    d, a = env.obs_dim, env.action_dim
    i = pl.program_id(0).astype(jnp.int32)
    per_gs = jnp.int32(2 * groups)
    gs_idx = jax.lax.div(i, per_gs)
    rem = jax.lax.rem(i, per_gs)
    phase = jax.lax.div(rem, jnp.int32(groups))
    gidx = jax.lax.rem(rem, jnp.int32(groups))
    gate = hyper_ref[1]
    use = gate > jnp.float32(0.5)

    @pl.when(i == 0)
    def _load():
        copies = [
            pltpu.make_async_copy(src, dst, sem_in.at[jnp.int32(k)])
            for k, (src, dst) in enumerate(((p_in, ps), (m_in, ms),
                                            (n_in, ns)))
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        gs_[:, :] = jnp.zeros_like(gs_)
        met_ref[:, :] = jnp.zeros_like(met_ref)

    col0 = gs_idx * jnp.int32(batch) + gidx * jnp.int32(group)
    dma = pltpu.make_async_copy(
        data_hbm.at[:, pl.ds(col0, group)], data_s, sem_data)
    dma.start()
    dma.wait()

    rows = data_s[0:r_raw, :]
    eps_t = data_s[r_raw:r_raw + a, :]
    eps_pi = data_s[r_raw + a:r_raw + 2 * a, :]
    inv_groups = jnp.float32(1.0 / groups)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)

    def metlane(k, v):
        return jnp.where(lane == k, v, jnp.float32(0.0))

    def read_alpha():
        return ps[p_offs["misc"]:p_offs["misc"] + 1, 0:1][0, 0]

    seg_rows = {"actor": mlp_rows(adims), "q1": mlp_rows(qdims),
                "q2": mlp_rows(qdims), "misc": 8}

    def adam_seg(name, lr, t):
        """Gate-selected Adam on one plane segment (grad plane is the
        group-mean-accumulated sum; scale by 1/groups here)."""
        o = g_offs[name]
        po = p_offs[name]
        n_rows = seg_rows[name]
        g = gs_[o:o + n_rows, :] * inv_groups
        m_old = ms[o:o + n_rows, :]
        n_old = ns[o:o + n_rows, :]
        b1, b2 = jnp.float32(0.9), jnp.float32(0.999)
        m_new = (1.0 - b1) * g + b1 * m_old
        n_new = (1.0 - b2) * (g * g) + b2 * n_old
        c1 = 1.0 - jnp.exp(t * jnp.float32(np.log(0.9)))
        c2 = 1.0 - jnp.exp(t * jnp.float32(np.log(0.999)))
        upd = (m_new / c1) / (jnp.sqrt(n_new / c2) + jnp.float32(1e-8))
        p_old = ps[po:po + n_rows, :]
        ms[o:o + n_rows, :] = jnp.where(use, m_new, m_old)
        ns[o:o + n_rows, :] = jnp.where(use, n_new, n_old)
        ps[po:po + n_rows, :] = jnp.where(use, p_old - jnp.float32(lr) * upd,
                                          p_old)

    t = hyper_ref[0] + (gs_idx + jnp.int32(1)).astype(jnp.float32)

    @pl.when(phase == 0)
    def _critic():
        actor = _read_mlp(ps, p_offs["actor"], adims)
        q1t = _read_mlp(ps, p_offs["q1t"], qdims)
        q2t = _read_mlp(ps, p_offs["q2t"], qdims)
        log_alpha = read_alpha()
        qtree = {"q1": _read_mlp(ps, p_offs["q1"], qdims),
                 "q2": _read_mlp(ps, p_offs["q2"], qdims)}

        def loss_fn(qp):
            # safe_twin: the stacked-twin concat layout does not lower
            # through Mosaic (see sac.twin_q_value_safe_t).
            return sac_mod._critic_loss_eps(
                qp, cfg, env, rows, (q1t, q2t), eps_t, actor, log_alpha, cd,
                safe_twin=True)

        (qloss, (q_mean, t_mean)), qg = jax.value_and_grad(
            loss_fn, has_aux=True)(qtree)
        _acc_mlp_grads(gs_, g_offs["q1"], qdims, lanes, qg["q1"])
        _acc_mlp_grads(gs_, g_offs["q2"], qdims, lanes, qg["q2"])
        met_ref[:, :] += (metlane(0, qloss * inv_groups)
                          + metlane(1, q_mean * inv_groups)
                          + metlane(2, t_mean * inv_groups))

    @pl.when((phase == 0) & (gidx == jnp.int32(groups - 1)))
    def _critic_adam():
        adam_seg("q1", cfg.learning_rate, t)
        adam_seg("q2", cfg.learning_rate, t)
        gs_[:, :] = jnp.zeros_like(gs_)

    @pl.when(phase == 1)
    def _actor_alpha():
        # Reads the CRITIC-UPDATED q1/q2 (sequential grid, phase 0's
        # boundary already ran) — the one_update ordering.
        q1 = _read_mlp(ps, p_offs["q1"], qdims)
        q2 = _read_mlp(ps, p_offs["q2"], qdims)
        aa = {"actor": _read_mlp(ps, p_offs["actor"], adims),
              "log_alpha": read_alpha()}

        def loss_fn(aap):
            return sac_mod._actor_alpha_loss_eps(
                aap, cfg, env, rows, q1, q2, eps_pi, target_entropy, cd,
                safe_twin=True)

        (_, (pi_loss, ent, alpha)), ag = jax.value_and_grad(
            loss_fn, has_aux=True)(aa)
        _acc_mlp_grads(gs_, g_offs["actor"], adims, lanes, ag["actor"])
        mo = g_offs["misc"]
        gs_[mo:mo + 1, :] += jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) == 0,
            ag["log_alpha"], jnp.float32(0.0))
        met_ref[:, :] += (metlane(3, pi_loss * inv_groups)
                          + metlane(4, ent * inv_groups)
                          + metlane(5, alpha * inv_groups))

    @pl.when((phase == 1) & (gidx == jnp.int32(groups - 1)))
    def _actor_adam_polyak():
        adam_seg("actor", cfg.learning_rate, t)
        adam_seg("misc", cfg.alpha_lr, t)
        blend = jnp.float32(cfg.tau) * gate
        for tgt, src in (("q1t", "q1"), ("q2t", "q2")):
            ot, os_ = p_offs[tgt], p_offs[src]
            n_rows = seg_rows[src]
            ps[ot:ot + n_rows, :] = (
                (1.0 - blend) * ps[ot:ot + n_rows, :]
                + blend * ps[os_:os_ + n_rows, :])
        gs_[:, :] = jnp.zeros_like(gs_)

    @pl.when(i == jnp.int32(grad_steps * 2 * groups - 1))
    def _emit():
        copies = [
            pltpu.make_async_copy(src, dst, sem_out.at[jnp.int32(k)])
            for k, (src, dst) in enumerate(((ps, p_out), (ms, m_out),
                                            (ns, n_out)))
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()


def sac_update_pallas(cfg, env, data, p_plane, m_plane, n_plane,
                      adam_t0, gate, target_entropy: float):
    """One iteration's ``grad_steps`` SAC updates on the packed planes.

    ``data``: (R8, grad_steps*batch) f32 — per grad step the sampled
    [obs, act, rew, next_obs, done] rows followed by eps_target (A) and
    eps_pi (A) standard-normal rows.  ``p/m/n_plane``: from
    :func:`pack_mlp`-built planes (see module docstring).  ``adam_t0``:
    the optax Adam count before this call (equal across the three
    optimizers — the gate advances them together).  ``gate``: f32 warmup
    gate (0 = frozen).  Returns ``(p, m, n, met)`` with ``met`` (1, 8)
    raw sums of per-group means.
    """
    d, a = env.obs_dim, env.action_dim
    h = cfg.hidden[0]
    adims = (d, *cfg.hidden, 2 * a)
    qdims = (d + a, *cfg.hidden, 1)
    lanes = h
    batch = cfg.batch_size
    group = min(512, batch)
    while batch % group:
        group //= 2
    groups = batch // group
    grad_steps = cfg.grad_steps
    r_raw = 2 * d + a + 2
    r8 = data.shape[0]
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    p_offs, p_rows = plane_offsets(adims, qdims, with_targets=True)
    g_offs, g_rows = plane_offsets(adims, qdims, with_targets=False)
    assert p_plane.shape == (p_rows, lanes), (p_plane.shape, p_rows, lanes)
    assert m_plane.shape == (g_rows, lanes)

    kernel = functools.partial(
        _sac_kernel, cfg, env, adims, qdims, lanes, group, groups,
        grad_steps, batch, r_raw, cd, target_entropy, p_offs, g_offs)

    hyper = jnp.stack([adam_t0.astype(jnp.float32),
                       gate.astype(jnp.float32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grad_steps * 2 * groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((p_rows, lanes), jnp.float32),
            pltpu.VMEM((g_rows, lanes), jnp.float32),
            pltpu.VMEM((g_rows, lanes), jnp.float32),
            pltpu.VMEM((g_rows, lanes), jnp.float32),
            pltpu.VMEM((r8, group), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((3,)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8), lambda i, *_: (0, 0)),
        ],
    )
    p_o, m_o, n_o, met = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((p_rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((g_rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((g_rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(hyper, data.astype(jnp.float32),
      p_plane.astype(jnp.float32), m_plane.astype(jnp.float32),
      n_plane.astype(jnp.float32))
    return p_o, m_o, n_o, met
