"""Pallas fused-rollout kernel vs the XLA scan path (interpret mode on the
CPU test backend; the real TPU path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.envs.core import control_rollout
from reinmav_tpu.ops import pallas_rollout

pytestmark = pytest.mark.skipif(
    not pallas_rollout.available(), reason="pallas unavailable"
)


def test_pallas_rollout_matches_scan():
    from jax.experimental.pallas import tpu as pltpu

    env = reinmav_tpu.make("quadrotor3d-v0")
    key = jax.random.PRNGKey(0)
    B, T = 256, 50
    # float32: the kernel is the production-precision path.
    states = (env.vreset(jax.random.split(key, B)) * 0.5).astype(jnp.float32)

    f_scan, traj = jax.jit(
        lambda s, k: control_rollout(env, s, k, T, auto_reset=False)
    )(states, key)

    with pltpu.force_tpu_interpret_mode():
        f_pal, rew = pallas_rollout.quad3d_rollout_pallas(states.T, T, tile=128)

    np.testing.assert_allclose(
        np.asarray(f_pal.T), np.asarray(f_scan), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        float(rew.sum()), float(traj.reward.sum()), rtol=1e-4
    )


def test_pallas_autoreset_stays_in_envelope():
    from jax.experimental.pallas import tpu as pltpu

    env = reinmav_tpu.make("quadrotor3d-v0")
    key = jax.random.PRNGKey(1)
    B, T = 256, 200
    states = env.vreset(jax.random.split(key, B)).astype(jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        f, rew = pallas_rollout.quad3d_rollout_autoreset_pallas(states.T, 3, T, tile=128)

    f = np.asarray(f)
    assert np.isfinite(f).all()
    # Auto-reset keeps every env inside the done envelope (+one-step slack).
    pos_norm = np.linalg.norm(f[0:3], axis=0)
    assert pos_norm.max() < 3.5
    assert np.isfinite(float(rew.sum()))


def test_pallas_dense_kernel_matches_base():
    """The sublane-dense (80, B/8) kernel computes the same math as the
    base kernel / scan path."""
    from jax.experimental.pallas import tpu as pltpu

    env = reinmav_tpu.make("quadrotor3d-v0")
    key = jax.random.PRNGKey(2)
    B, T = 1024, 30
    states = (env.vreset(jax.random.split(key, B)) * 0.1).astype(jnp.float32)  # tame

    f_scan, traj = jax.jit(
        lambda s, k: control_rollout(env, s, k, T, auto_reset=False)
    )(states, key)
    assert int(traj.done.sum()) == 0  # no resets -> comparable

    with pltpu.force_tpu_interpret_mode():
        f8, rew8 = pallas_rollout.quad3d_rollout_autoreset_pallas8(
            states.T, 3, T, tile8=64
        )

    np.testing.assert_allclose(
        np.asarray(f8.T), np.asarray(f_scan), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        float(rew8.sum()), float(traj.reward.sum()), rtol=1e-4
    )


def test_pallas_autoreset_deterministic_per_seed():
    """Same seed -> bitwise-identical kernel results (on-core PRNG)."""
    from jax.experimental.pallas import tpu as pltpu

    env = reinmav_tpu.make("quadrotor3d-v0")
    states = env.vreset(jax.random.split(jax.random.PRNGKey(4), 256)).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        f1, r1 = pallas_rollout.quad3d_rollout_autoreset_pallas8(states.T, 9, 100, tile8=32)
        f2, r2 = pallas_rollout.quad3d_rollout_autoreset_pallas8(states.T, 9, 100, tile8=32)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_reinmav_pallas_kernel_matches_scan():
    """reinmav-v0 fused kernel vs the scan path (f32): agreement within
    the scan path's own f32-vs-f64 drift."""
    from jax.experimental.pallas import tpu as pltpu

    from reinmav_tpu.ops.pallas_reinmav import available as r_available
    from reinmav_tpu.ops.pallas_reinmav import reinmav_rollout_pallas8

    if not r_available():
        pytest.skip("pallas unavailable")
    env = reinmav_tpu.make("reinmav-v0")
    B, T = 256, 20
    key = jax.random.PRNGKey(0)
    base = env.reset(key)
    states = jnp.tile(base, (B, 1)).astype(jnp.float32)
    pert = jax.random.uniform(key, (B, 13), minval=-0.05, maxval=0.05).astype(jnp.float32)
    states = states.at[:, :13].add(pert)

    def body(s, _):
        out = env.step(s, jnp.zeros(0))
        return out.state, None

    scan_run = jax.jit(jax.vmap(lambda s: jax.lax.scan(body, s, None, length=T)[0]))
    f_scan = np.asarray(scan_run(states))

    with pltpu.force_tpu_interpret_mode():
        f_pal = np.asarray(reinmav_rollout_pallas8(states.T, T, tile8=32).T)

    # ~1000 substeps of f32 vs the scan's own f32 rounding: <= 1e-3 abs.
    assert np.abs(f_scan - f_pal).max() < 1e-3
    np.testing.assert_allclose(f_pal[:, 13], T / 100.0, rtol=1e-5)


def test_pallas_inverse_trig_accuracy():
    """Custom asin/atan2 (Mosaic has no lowering) vs numpy, f32-eps level."""
    from reinmav_tpu.ops import pallas_reinmav as pr

    x = np.linspace(-0.999, 0.999, 5001).astype(np.float32)
    assert np.abs(np.asarray(pr._asin(jnp.asarray(x))) - np.arcsin(x)).max() < 1e-6
    rng_ = np.random.default_rng(0)
    y = rng_.normal(size=5000).astype(np.float32)
    z = rng_.normal(size=5000).astype(np.float32)
    got = np.asarray(pr._atan2(jnp.asarray(y), jnp.asarray(z)))
    assert np.abs(got - np.arctan2(y, z)).max() < 1e-6


def test_quad2d_pallas_matches_scan():
    """2D closed-loop kernel vs the scan path (contracting dynamics —
    free-running comparison works)."""
    from jax.experimental.pallas import tpu as pltpu

    env = reinmav_tpu.make("quadrotor2d-v0")
    key = jax.random.PRNGKey(0)
    B, T = 256, 50
    states = (env.vreset(jax.random.split(key, B)) * 0.4).astype(jnp.float32)

    f_scan, traj = jax.jit(
        lambda s, k: control_rollout(env, s, k, T, auto_reset=False)
    )(states, key)

    with pltpu.force_tpu_interpret_mode():
        f_pal, rew = pallas_rollout.quad2d_rollout_autoreset_pallas8(
            states.T, 0, T, tile8=8, autoreset=False
        )

    np.testing.assert_allclose(
        np.asarray(f_pal.T), np.asarray(f_scan), rtol=3e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        float(rew.sum()), float(traj.reward.sum()), rtol=1e-4
    )
