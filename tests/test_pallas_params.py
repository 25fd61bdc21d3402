"""Parameterised fused throughput kernels: swept (non-default) env
params must keep the Pallas fast path AND match the scan semantics.

Round-3 verdict item: the kernels baked default ``Params`` as
compile-time constants, so a one-line param edit (one line in the
reference, ``quadrotor3d.py:45-56``) silently cost the entire fused
tier.  Now the flat physics scalars ride in as an SMEM vector
(``<env>_params_vec``) and ``throughput_rollout(backend="pallas")``
accepts any param values for the parameterised kernels (quad3d, quad2d,
both slungloads, hover); wrapped/replaced step functions are still
refused by identity.

Differential: interpret mode, kernel vs the dense8 scan at f32
tolerance (ulp-compatible reimplementations — the PPO-kernel
precedent); lanes the scan reset are excluded (the two paths' reset
streams differ by design).  The slung-load cases resynchronise on the
scan state each step and skip lanes within 1e-4 of the tether sphere
(the taut projection parks lanes exactly on the branch boundary —
the test_pallas_slungload knife-edge precedent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.envs import (quadrotor2d, quadrotor2d_slungload, quadrotor3d,
                              quadrotor3d_slungload, tpuquad)
from reinmav_tpu.envs.core import fused_kernel_mismatch, throughput_rollout
from reinmav_tpu.ops import pallas_rollout

pytestmark = pytest.mark.skipif(
    not pallas_rollout.available(), reason="pallas unavailable"
)

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


SWEPT = [
    # (env ctor, swept params, horizon, state damping, resync)
    (quadrotor3d.make,
     quadrotor3d.Params(mass=1.3, ref_z=1.0, kp=-6.0, kv=-3.5, tau=0.25,
                        vel_limit=8.0), 8, 1.0, False),
    (quadrotor2d.make,
     quadrotor2d.Params(kp=-4.0, kv=-3.0, tau=0.15, thrust_scale=8.0), 4,
     0.15, False),
    (quadrotor2d_slungload.make,
     quadrotor2d_slungload.Params(tether_length=0.8, load_mass=0.2,
                                  mass=1.2), 4, 0.5, True),
    (quadrotor3d_slungload.make,
     quadrotor3d_slungload.Params(tether_length=1.0, load_mass=0.25,
                                  kp=-4.5), 4, 0.5, True),
    (lambda params: tpuquad.make_hovering(params),
     tpuquad.Params(mass=0.35, init_z=1.0, contact_friction=0.8,
                    density=1.2), 8, 1.0, False),
]


def _done_trace(env, states, key, horizon):
    """Scan-side any-step done mask (controller-driven where the env has
    one, zero actions otherwise — mirroring throughput_rollout's scan)."""
    from reinmav_tpu.envs.core import control_rollout

    if env.control_fn is not None:
        _, traj = control_rollout(env, states, key, horizon,
                                  collect_trajectory=False, dense8=True)
        return np.asarray(traj.done).any(axis=0)
    b = states.shape[0]
    st = states.T.reshape(env.state_dim, 8, b // 8)
    acts = jnp.zeros((env.action_dim, 8, b // 8), states.dtype)

    def body(c, _):
        s, k = c
        k, kr = jax.random.split(k)
        out = env.autoreset_step_t8(s, acts, kr)
        return (out.state, k), out.done

    _, dones = jax.lax.scan(body, (st, key), None, length=horizon)
    return np.asarray(dones.reshape(horizon, b)).any(axis=0)


def _tether_safe(env, states, eps=1e-4):
    """Lanes farther than eps from the swept tether sphere (taut/slack
    branch boundary)."""
    s = np.asarray(states)
    L = float(env.params.tether_length)
    if "3d" in env.name:
        tn = np.linalg.norm(s[:, 10:13] - s[:, 0:3], axis=1)
    else:
        tn = np.linalg.norm(s[:, 5:7] - s[:, 0:2], axis=1)
    return np.abs(tn - L) > eps


def _done_margin_safe(env, post_states, eps=1e-5):
    """Lanes whose POST-step norms sit farther than eps from every done
    threshold (the kernel evaluates done on the post-step state; a lane
    within ulp of a threshold can reset in one arm only)."""
    s = np.asarray(post_states)
    if env.name == "quadrotor3d-v0":
        pn = np.linalg.norm(s[:, 0:3], axis=1)
        vn = np.linalg.norm(s[:, 7:10], axis=1)
        lims = [(pn, env.params.pos_limit), (vn, env.params.vel_limit)]
    else:  # quadrotor2d-v0: [x, z, theta, vx, vz]
        pn = np.linalg.norm(s[:, 0:2], axis=1)
        vn = np.linalg.norm(s[:, 3:5], axis=1)
        lims = [(pn, env.params.pos_limit), (vn, 10.0),
                (vn, env.params.vel_limit)]
    keep = np.ones(s.shape[0], bool)
    for norm, lim in lims:
        keep &= np.abs(norm - float(lim)) > eps
    return keep


def _ids(case):
    return case[0](case[1]).name


@pytest.mark.parametrize("case", SWEPT, ids=_ids)
def test_swept_params_keep_fast_path_and_match_scan(case):
    make_fn, params, horizon, damp, resync = case
    env = make_fn(params)
    # The throughput gate must now ACCEPT swept params for these kernels
    # (packed_params=True — the SMEM-vector path)...
    reason = fused_kernel_mismatch(env, packed_params=True)
    assert reason is None, reason
    # ...while the policy-driven kernels (which bake defaults) refuse.
    assert fused_kernel_mismatch(env) is not None

    batch = 4096  # throughput_rollout requires batch % 4096 == 0
    states = env.vreset(jax.random.split(jax.random.PRNGKey(1), batch))
    states = (states * damp).astype(jnp.float32)
    key = jax.random.PRNGKey(2)

    for t in range(horizon if resync else 1):
        k_t = jax.random.fold_in(key, t)
        h = 1 if resync else horizon
        with pltpu.force_tpu_interpret_mode():
            fin_p, rew_p = throughput_rollout(env, states, k_t, h,
                                              backend="pallas")
        fin_s, rew_s = throughput_rollout(env, states, k_t, h,
                                          backend="scan")
        # Compare only lanes the SCAN path never reset (auto-reset draws
        # diverge by design even when the physics matches).
        alive = ~_done_trace(env, states, k_t, h)
        if resync:
            alive &= _tether_safe(env, states)
        alive &= np.isclose(
            np.asarray(rew_p, np.float32), np.asarray(rew_s, np.float32),
            rtol=1e-4, atol=1e-4)
        assert alive.mean() > 0.5, (t, alive.mean())
        np.testing.assert_allclose(
            np.asarray(fin_p, np.float32)[alive],
            np.asarray(fin_s, np.float32)[alive], rtol=2e-4, atol=2e-4,
            err_msg=f"step {t}")
        states = jnp.asarray(fin_s, states.dtype)  # resynchronise


def test_swept_params_change_the_physics():
    """Guard against the kernel silently ignoring the vector: sweeping
    ref_z must move the closed-loop trajectory."""
    batch = 4096
    states = reinmav_tpu.make("quadrotor3d-v0").vreset(
        jax.random.split(jax.random.PRNGKey(1), batch)).astype(jnp.float32)
    outs = []
    for ref_z in (1.0, 2.5):
        env = quadrotor3d.make(quadrotor3d.Params(ref_z=ref_z))
        with pltpu.force_tpu_interpret_mode():
            fin, _ = throughput_rollout(env, states, jax.random.PRNGKey(2),
                                        8, backend="pallas")
        outs.append(np.asarray(fin))
    assert np.abs(outs[0] - outs[1]).max() > 1e-3


@pytest.mark.parametrize("make_fn", [quadrotor3d.make, quadrotor2d.make,
                                     quadrotor2d_slungload.make,
                                     quadrotor3d_slungload.make],
                         ids=lambda f: f.__module__.rsplit(".", 1)[-1])
def test_baked_default_variant_matches_smem_defaults(make_fn):
    """params_vec=None now lowers the BAKED-constant kernel (no SMEM
    vector); it must agree with the SMEM default-params vector to a few
    f32 ulps — the same math on the same values; XLA folds Python-float
    constants slightly differently from SMEM scalar reads (measured
    max 3e-8 on <0.1% of elements).  Pins the bake-if-default dispatch
    (`envs/core._live_params_vec`) against a baked constant drifting
    from the Params default (a real drift is way above ulp noise)."""
    from reinmav_tpu.envs.core import _live_params_vec
    from reinmav_tpu.ops import pallas_slungload

    env = make_fn()
    assert _live_params_vec(env) is None  # defaults -> baked variant
    kern, pvec_fn = {
        "quadrotor3d-v0": (
            pallas_rollout.quad3d_rollout_autoreset_pallas8,
            pallas_rollout.quad3d_params_vec),
        "quadrotor2d-v0": (
            pallas_rollout.quad2d_rollout_autoreset_pallas8,
            pallas_rollout.quad2d_params_vec),
        "quadrotor2d-slungload-v0": (
            pallas_slungload.slung2d_rollout_pallas8,
            pallas_slungload.slung2d_params_vec),
        "quadrotor3d-slungload-v0": (
            pallas_slungload.slung3d_rollout_pallas8,
            pallas_slungload.slung3d_params_vec),
    }[env.name]
    batch = 1024
    states = env.vreset(jax.random.split(jax.random.PRNGKey(5), batch))
    st = states.T.astype(jnp.float32)
    # ONE step reads every param.  Every branch boundary gets an
    # exclusion band: the slungloads' taut/slack sphere (the
    # test_pallas_slungload knife-edge precedent) AND the quads' done
    # thresholds — a 1-ulp baked-vs-SMEM drift on a lane sitting on
    # ‖pos‖==pos_limit would reset one arm but not the other, an O(1)
    # flake the 5e-7 tolerance can't absorb.
    slung = "slungload" in env.name
    horizon = 1
    with pltpu.force_tpu_interpret_mode():
        f_baked, r_baked = kern(st, 11, horizon, tile8=batch // 8)
        f_smem, r_smem = kern(st, 11, horizon, tile8=batch // 8,
                              params_vec=pvec_fn(env.params))
    keep = _tether_safe(env, states) if slung else _done_margin_safe(
        env, np.asarray(f_smem).T)
    assert keep.mean() > 0.9
    np.testing.assert_allclose(np.asarray(f_baked)[:, keep],
                               np.asarray(f_smem)[:, keep],
                               rtol=5e-7, atol=5e-7)
    np.testing.assert_allclose(np.asarray(r_baked)[keep],
                               np.asarray(r_smem)[keep],
                               rtol=5e-7, atol=5e-6)


def test_baked_hover_variant_matches_smem_defaults():
    """MujocoQuadForce-v1's baked kernel (_HOVER_BAKED compile-time
    floats, no SMEM vector) vs the SMEM default-params vector."""
    from reinmav_tpu.envs.core import _live_params_vec
    from reinmav_tpu.ops import pallas_tpuquad

    env = tpuquad.make_hovering(tpuquad.Params(init_z=1.0))
    assert _live_params_vec(env) is None
    batch = 1024
    states = env.vreset(jax.random.split(jax.random.PRNGKey(5), batch))
    st = states.T.astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        f_baked, r_baked = pallas_tpuquad.hover_rollout_pallas8(
            st, 4, tile8=batch // 8)
        f_smem, r_smem = pallas_tpuquad.hover_rollout_pallas8(
            st, 4, tile8=batch // 8,
            params_vec=pallas_tpuquad.hover_params_vec(env.params))
    np.testing.assert_allclose(np.asarray(f_baked), np.asarray(f_smem),
                               rtol=5e-7, atol=5e-7)
    np.testing.assert_allclose(np.asarray(r_baked), np.asarray(r_smem),
                               rtol=5e-7, atol=5e-4)


def test_live_params_vec_swept_params_keep_smem_path():
    """Swept params must still ride the SMEM vector (not silently bake)."""
    from reinmav_tpu.envs.core import _live_params_vec

    env = quadrotor3d.make(quadrotor3d.Params(mass=1.3))
    vec = _live_params_vec(env)
    assert vec is not None and float(vec[0]) == np.float32(1.3)


def test_wrapped_step_fn_still_refused():
    env = quadrotor3d.make()
    import dataclasses

    wrapped = dataclasses.replace(
        env, step_fn=lambda p, s, a: quadrotor3d.step(p, s, a))
    assert fused_kernel_mismatch(wrapped) is not None


def test_unparameterised_kernel_still_refuses_params():
    """reinmav-v0's kernel still bakes defaults — non-default params must
    keep refusing rather than silently running default physics."""
    from reinmav_tpu.envs import reinmav13

    env = reinmav13.make(reinmav13.Params(mass=0.2))
    reason = fused_kernel_mismatch(env, packed_params=True)
    assert reason is not None and "params" in reason
