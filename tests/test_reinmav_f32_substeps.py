"""Characterisation of the f32 reinmav-v0 substep-count drift
(VERDICT r1 #8).

The reference computes its inner substep count as
``len(np.arange(t, t + dt, ds))`` in float64 (``reinmav_env.py:91-98``),
which fluctuates between 50 and 51 purely from floating-point rounding of
``(t + dt) - t``.  The repo replicates this with
``ceil(((t + dt) - t) / ds)`` in the carry dtype
(``envs/reinmav13.py:167``, ``ops/pallas_reinmav.py``).  In float64 the
pattern matches the reference bit-for-bit (oracle parity).  In float32 —
the TPU production dtype — the rounding differs, so the 50/51 pattern
*drifts*: these tests pin the measured drift so a change to the substep
logic is caught, and quantify its trajectory impact.

Measured (and asserted below): over the 400-step reference horizon (t
accumulated by repeated addition, as the reference does), f64 yields
212×50 + 188×51 substeps, f32 yields 386×50 + 14×51; the two dtypes
disagree on 176/400 steps.  Physically each 51-substep step
double-integrates one extra ds = 0.2 ms of dynamics (a reference quirk —
sim time still advances by dt), so f32 integrates ~34.8 ms less quirk
time over the horizon.  The closed-loop trajectory stays within ~1e-2 of
the f64 oracle (controller-stabilised; the quirk perturbation is damped).
"""

import jax
import jax.numpy as jnp
import numpy as np

import reinmav_tpu


def _nsub_pattern(dtype):
    """The carry accumulates t by repeated addition (t += dt), matching
    the reference's ``self.t + self.dt`` bookkeeping — NOT t = k*dt,
    whose rounding differs."""
    t = dtype(0.0)
    dt = dtype(0.01)
    ds = dtype(1.0 / 5000.0)
    counts = []
    for _ in range(400):
        counts.append(int(np.ceil(((t + dt) - t) / ds)))
        t = t + dt
    return np.asarray(counts)


def test_substep_pattern_f64_vs_f32_characterised():
    n64 = _nsub_pattern(np.float64)
    n32 = _nsub_pattern(np.float32)
    assert set(n64) == {50, 51} and set(n32) == {50, 51}
    # Pinned measurements — if these change, the substep logic changed.
    assert (n64 == 51).sum() == 188
    assert (n32 == 51).sum() == 14
    assert (n64 != n32).sum() == 176


def test_env_matches_characterised_pattern():
    """The jitted env's n_sub (computed in the carry dtype) must follow
    the characterised pattern in both dtypes."""
    env = reinmav_tpu.make("reinmav-v0")
    step = jax.jit(lambda s: env.step(s, None).state)

    def measure(dtype, np_dtype):
        s = env.reset(jax.random.PRNGKey(0)).astype(dtype)
        # Recompute the env's expression on the env's own carry values.
        counts = []
        for k in range(40):
            t = np_dtype(s[13])
            dt = np_dtype(0.01)
            ds = np_dtype(1.0 / 5000.0)
            counts.append(int(np.ceil(((t + dt) - t) / ds)))
            s = step(s).astype(dtype)
        return np.asarray(counts)

    got64 = measure(jnp.float64, np.float64)
    np.testing.assert_array_equal(got64, _nsub_pattern(np.float64)[:40])
    got32 = measure(jnp.float32, np.float32)
    # The f32 carry accumulates t by repeated addition (t += dt) rather
    # than k*dt, so compare against a repeated-addition reference.
    t = np.float32(0.0)
    ref32 = []
    for _ in range(40):
        dt = np.float32(0.01)
        ds = np.float32(1.0 / 5000.0)
        ref32.append(int(np.ceil(((t + dt) - t) / ds)))
        t = t + dt
    np.testing.assert_array_equal(got32, np.asarray(ref32))


def test_f32_trajectory_drift_bounded():
    """The substep drift's end-to-end impact: the f32 trajectory stays
    within a small bound of the f64 oracle over the reference horizon
    (the embedded controller damps the 0.2 ms double-integration quirks)."""
    env = reinmav_tpu.make("reinmav-v0")

    @jax.jit
    def run(s0):
        return jax.lax.scan(
            lambda s, _: (env.step(s, None).state, None), s0, None, length=400
        )[0]

    s64 = run(env.reset(jax.random.PRNGKey(0)).astype(jnp.float64))
    s32 = run(env.reset(jax.random.PRNGKey(0)).astype(jnp.float32))
    pos_err = float(jnp.abs(s64[:3] - s32[:3].astype(jnp.float64)).max())
    # Measured ~1e-3; assert an order-of-magnitude bound so regressions
    # (e.g. a substep-logic change that breaks f32 entirely) are caught.
    assert pos_err < 2e-2, pos_err
    assert np.isfinite(np.asarray(s32)).all()
