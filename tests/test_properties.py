"""Property tests (SURVEY.md §4): structural invariants of the dynamics
that hold along any trajectory, checked over random rollouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu


def _rollout_states(env, key, batch, horizon, action_fn):
    states = env.vreset(jax.random.split(key, batch)) * 0.5

    def body(s_t, k):
        a_t = action_fn(s_t, k)
        out = env.vstep_t(s_t, a_t)
        return out.state, out.state

    keys = jax.random.split(jax.random.fold_in(key, 1), horizon)
    _, traj = jax.lax.scan(body, states.T, keys)
    return np.asarray(traj)  # (T, D, B)


@pytest.mark.parametrize(
    "env_id,d", [("quadrotor2d-slungload-v0", 2), ("quadrotor3d-slungload-v0", 3)]
)
def test_tether_constraint_after_taut_step(env_id, d):
    """After a taut-branch step, the kinematic projection must leave the
    load exactly on the tether sphere: ‖load − quad‖ == L (to fp)."""
    env = reinmav_tpu.make(env_id)
    L = env.params.tether_length

    def controller_actions(s_t, k):
        return env.vcontrol_t(s_t)

    traj = _rollout_states(env, jax.random.PRNGKey(0), 64, 200, controller_actions)
    pos = traj[:, 0:d, :]
    load = traj[:, -2 * d : -d, :]
    dist = np.linalg.norm(load - pos, axis=1)  # (T, B) post-step distances
    # Branch is decided on the PRE-step distance (>= L → taut).  A taut
    # step's projection pins the post-state exactly onto the sphere; a
    # slack step has no projection, so the load may overshoot the sphere
    # within that one step (faithful reference behaviour,
    # quadrotor2d_slungload.py:119-132) — it is then projected back by the
    # following taut step.
    # Exclude the knife-edge: a projected state sits on the sphere within
    # 1 ulp, where the env's own `>= L` check may round either way (the
    # same fp degeneracy as in test_parity's slung-load strategy).  Steps
    # clearly OUTSIDE the sphere are unambiguously taut.
    pre_taut = dist[:-1] >= L + 1e-9
    post_of_taut = dist[1:][pre_taut]
    assert pre_taut.any()
    np.testing.assert_allclose(post_of_taut, L, rtol=1e-6)
    # Overshoot beyond the sphere is bounded by one step of free flight.
    assert dist.max() < L * 1.1


def test_quat_norm_drift_bounded_closed_loop():
    """The 3D env never renormalises its stored quaternion (Q4); under the
    geometric controller the drift must stay small over 400 steps (the
    derivative of a *normalised* quat keeps the update near the sphere)."""
    env = reinmav_tpu.make("quadrotor3d-v0")

    def controller_actions(s_t, k):
        return env.vcontrol_t(s_t)

    traj = _rollout_states(env, jax.random.PRNGKey(1), 64, 400, controller_actions)
    qn = np.linalg.norm(traj[:, 3:7, :], axis=1)
    # Start norms are U(-1,1)^4 draws scaled by 0.5 → anywhere in (0, 1];
    # the drift per step is O(dt²‖ω‖²); over 400 steps stays bounded.
    assert np.isfinite(qn).all()
    assert qn.max() < 2.0 and qn.min() > 0.05


def test_slungload_energy_sane_in_slack_flight():
    """Slack-branch load is ballistic: with zero thrust the load's
    horizontal velocity must be conserved exactly."""
    env = reinmav_tpu.make("quadrotor3d-slungload-v0")
    s = jnp.zeros(16).at[3].set(1.0).at[10:13].set(jnp.asarray([0.2, 0.0, -0.2]))
    # load within tether length (1.5) → slack; zero action.
    out = env.step(s, jnp.zeros(4))
    np.testing.assert_allclose(float(out.state[13]), 0.0, atol=1e-12)  # lvx
    np.testing.assert_allclose(float(out.state[14]), 0.0, atol=1e-12)  # lvy
    # Vertical: one Euler step of gravity.
    np.testing.assert_allclose(float(out.state[15]), -9.8 * 0.01, rtol=1e-6)


def test_reset_respects_reference_law(rng):
    """Resets draw every component from U(-1,1) — including quaternions,
    unnormalised (reference quadrotor3d.py:184, Q11)."""
    env = reinmav_tpu.make("quadrotor3d-v0")
    states = np.asarray(env.vreset(jax.random.split(jax.random.PRNGKey(2), 4096)))
    assert states.shape == (4096, 10)
    assert (states > -1.0).all() and (states < 1.0).all()
    # Mean ~0, quaternion norms not 1 (unnormalised draws).
    assert abs(states.mean()) < 0.02
    qn = np.linalg.norm(states[:, 3:7], axis=1)
    assert (np.abs(qn - 1.0) > 1e-3).mean() > 0.95
