"""Fused MujocoQuadForce-v1 Pallas kernel vs the scan path (interpret
mode on CPU; real-TPU numbers in benchmarks/results.json).

Unlike the slung-load envs the hovering dynamics have no knife-edge
branch, and the reset is deterministic — so kernel and scan can be
compared FREE-RUNNING across auto-resets, not just per-step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.ops import pallas_tpuquad

pytestmark = pytest.mark.skipif(
    not pallas_tpuquad.available(), reason="pallas unavailable"
)


def _scan_rollout(env, states, horizon, action):
    a = jnp.tile(jnp.asarray(action, jnp.float32), (states.shape[0], 1))

    def body(carry, _):
        s, k = carry
        k, k_reset = jax.random.split(k)
        out = env.autoreset_step(s, a, k_reset)
        return (out.state, k), out.reward

    (final, _), rewards = jax.lax.scan(
        body, (states, jax.random.PRNGKey(0)), None, length=horizon
    )
    return final, rewards.sum(axis=0)


@pytest.mark.parametrize("action", [(0.0, 0.0, 0.0, 0.0), (0.75, 0.73, 0.74, 0.76)])
def test_hover_pallas_matches_scan_through_resets(action):
    from jax.experimental.pallas import tpu as pltpu

    env = reinmav_tpu.make("MujocoQuadForce-v1")
    B, T = 512, 80  # zero-action envs crash (z<=0.3) at ~t=37: resets covered
    base = np.tile(np.asarray(pallas_tpuquad._INIT, np.float32), (B, 1))
    rng = np.random.default_rng(0)
    base[:, :3] += rng.uniform(-0.3, 0.3, (B, 3)).astype(np.float32)
    base[:, 7:13] = rng.uniform(-0.5, 0.5, (B, 6)).astype(np.float32)
    states = jnp.asarray(base)

    f_scan, rew_scan = jax.jit(
        lambda s: _scan_rollout(env, s, T, action)
    )(states)

    with pltpu.force_tpu_interpret_mode():
        f_pal, rew_pal = pallas_tpuquad.hover_rollout_pallas8(
            states.T, T, tile8=8, action=action
        )

    np.testing.assert_allclose(
        np.asarray(f_pal.T), np.asarray(f_scan), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(rew_pal), np.asarray(rew_scan), rtol=1e-4, atol=1e-2
    )
    # Resets actually happened (zero-action case crashes within the horizon).
    if sum(action) == 0.0:
        assert np.asarray(f_pal.T)[:, 2].max() > 0.3


def _scan_zero_action(env, states, horizon):
    a = jnp.zeros((states.shape[0], 4), jnp.float32)

    def body(carry, _):
        s, k = carry
        k, k_reset = jax.random.split(k)
        out = env.autoreset_step(s, a, k_reset)
        return (out.state, k), out.obs[:, 2]

    (final, _), zs = jax.lax.scan(
        body, (states, jax.random.PRNGKey(0)), None, length=horizon
    )
    return final, zs.sum(axis=0)


@pytest.mark.parametrize("env_id,model", [
    ("MujocoQuadForce-v0", "ground"),
    ("MujocoQuadQuat-v0", "quat"),
])
def test_contact_kernel_matches_scan(env_id, model, monkeypatch):
    """Ground-riding envs: the kernel's in-kernel COUPLED contact solve
    (matrix-free PGS on MuJoCo's dual QP) must reproduce the scan path
    from contact-heavy states.

    The PGS sweep count is lowered to 8 on BOTH sides for this test
    only: kernel≡scan is a per-row-math property independent of the
    sweep count, and interpret mode executes the in-kernel solve
    op-by-op in Python (~1 s per env-step at the production 60)."""
    from jax.experimental.pallas import tpu as pltpu
    from reinmav_tpu.envs import tpuquad as tpuquad_env
    from reinmav_tpu.ops import pallas_tpuquad

    monkeypatch.setattr(tpuquad_env, "_PGS_ITERS", 8)
    monkeypatch.setattr(pallas_tpuquad, "_PGS_ITERS", 8)

    env = reinmav_tpu.make(env_id)
    B, T = 64, 12
    rng = np.random.default_rng(3)
    base = np.tile(np.asarray(pallas_tpuquad._INIT0, np.float32), (B, 1))
    # Perturb attitude/velocity so the contact sees tilted, moving bodies
    # (incl. tilts that ride the thruster-cylinder rim candidates).
    base[:, 2] += rng.uniform(0.0, 0.05, B)          # slight drop heights
    base[:, 4:7] += rng.uniform(-0.25, 0.25, (B, 3))  # quat tilt
    base[:, 7:13] += rng.uniform(-0.2, 0.2, (B, 6))
    base[:, 3:7] /= np.linalg.norm(base[:, 3:7], axis=1, keepdims=True)
    states = jnp.asarray(base)

    # Per-step resynchronisation (the slung-load precedent, CLAUDE.md):
    # the contact solve has knife-edge branches (the f ≥ 0 projection
    # per PGS row, the candidate active mask, the d(pen) spline's
    # piecewise knot) that f32 reassociation differences flip on
    # straddling lanes; a free-running comparison amplifies a flipped
    # branch into O(1) state divergence.  Comparing one step at a time
    # from identical states pins the kernel's physics tightly.
    s_sync = states
    step_jit = jax.jit(lambda s: _scan_zero_action(env, s, 1))
    for t in range(0, T, 3):
        f_scan1, _ = step_jit(s_sync)
        with pltpu.force_tpu_interpret_mode():
            f_pal1, _ = pallas_tpuquad.contact_rollout_pallas8(
                s_sync.T, 1, model=model, tile8=8
            )
        np.testing.assert_allclose(
            np.asarray(f_pal1.T), np.asarray(f_scan1), rtol=2e-4, atol=2e-5,
            err_msg=f"{env_id} step {t}",
        )
        s_sync = f_scan1

    # Free-running behaviour check (loose): both paths settle the batch
    # near the plane and agree on the Σz statistic at the batch level.
    f_scan, z_scan = jax.jit(lambda s: _scan_zero_action(env, s, T))(states)
    with pltpu.force_tpu_interpret_mode():
        f_pal, z_pal = pallas_tpuquad.contact_rollout_pallas8(
            states.T, T, model=model, tile8=8
        )
    np.testing.assert_allclose(
        float(np.asarray(z_pal).mean()), float(np.asarray(z_scan).mean()),
        rtol=1e-2,
    )
    # Contact genuinely engaged: bodies stay near the plane, not in
    # freefall.
    assert np.asarray(f_pal.T)[:, 2].min() > -0.1


def test_hover_sliced_dispatch_matches_single(monkeypatch):
    """The hover wrapper slices batches above _HOVER_MAX_DISPATCH_B into
    sub-calls (tunnelled-runtime erratum 2026-08-20: a single large call
    after a smaller hover executable corrupts the final 128 lanes on
    hardware).  Shrink the cap so the slicing path runs on CPU and pin
    sliced ≡ unsliced bitwise (the grid is embarrassingly parallel)."""
    from jax.experimental.pallas import tpu as pltpu

    env = reinmav_tpu.make("MujocoQuadForce-v1")
    batch = 4096
    states_t = env.vreset(
        jax.random.split(jax.random.PRNGKey(7), batch)).T.astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        f1, r1 = pallas_tpuquad.hover_rollout_pallas8(states_t, 5, tile8=128)
        monkeypatch.setattr(pallas_tpuquad, "_HOVER_MAX_DISPATCH_B", 1024)
        pallas_tpuquad.hover_rollout_pallas8.clear_cache()
        f2, r2 = pallas_tpuquad.hover_rollout_pallas8(states_t, 5, tile8=128)
    pallas_tpuquad.hover_rollout_pallas8.clear_cache()  # drop the patched trace
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
