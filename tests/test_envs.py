"""Behavioural env tests: closed-loop stability (the reference's test
pattern, ``test/*.py`` — 400-step controller rollouts), auto-reset
semantics, rigid-body analogue physics sanity, and rollout API shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reinmav_tpu
from reinmav_tpu.envs.core import control_rollout


@pytest.mark.parametrize(
    "env_id", ["quadrotor3d-v0", "quadrotor3d-slungload-v0"]
)
def test_controller_stabilises_batch(env_id):
    """Batched 400-step closed-loop flight from small perturbations: the
    geometric controller keeps the fleet finite and bounded (the reference
    smoke-test invariant), and drives the plain 3D env to its reference."""
    env = reinmav_tpu.make(env_id)
    key = jax.random.PRNGKey(0)
    batch = 256
    states = env.vreset(jax.random.split(key, batch)) * 0.3
    final, traj = jax.jit(
        lambda s, k: control_rollout(env, s, k, 400, auto_reset=False)
    )(states, key)
    final = np.asarray(final)
    assert np.isfinite(final).all()
    if env_id == "quadrotor3d-v0":
        dist = np.linalg.norm(final[:, 0:3] - np.array([0, 0, 2.0]), axis=1)
        assert dist.mean() < 0.2, dist.mean()


def test_quadrotor2d_closed_loop_reset_churn():
    """quadrotor2d's closed loop is only 'stable' through resets: the 10x
    thrust gain quirk (Q5, reference quadrotor2d.py:75 vs :134) makes the
    controller over-thrust 10x, so episodes terminate and restart
    constantly — exactly how the reference test survives
    (``test_quadrotor2d.py`` resets on done).  Under fused auto-reset the
    batch must stay finite and inside the done envelope."""
    env = reinmav_tpu.make("quadrotor2d-v0")
    key = jax.random.PRNGKey(0)
    states = env.vreset(jax.random.split(key, 256)) * 0.3
    final, traj = jax.jit(
        lambda s, k: control_rollout(env, s, k, 400, auto_reset=True)
    )(states, key)
    st = np.asarray(traj.state)
    assert np.isfinite(st).all()
    # Any excursion past the done envelope is reset on the next step, so
    # positions can never run away.
    assert np.abs(st[:, :, 0:2]).max() < 5.0
    # Resets do happen (the churn the reference exhibits).
    assert np.asarray(traj.done).mean() > 0.01


def test_autoreset_redraws_done_envs():
    env = reinmav_tpu.make("quadrotor3d-v0")
    # States far outside the position limit: every env is done this step.
    states = jnp.tile(jnp.asarray([5.0, 0, 0, 1, 0, 0, 0, 0, 0, 0]), (8, 1))
    actions = jnp.zeros((8, 4))
    out = env.autoreset_step(states, actions, jax.random.PRNGKey(0))
    assert bool(out.done.all())
    assert np.asarray(out.reward == 1.0).all()  # terminal +1 (reference)
    ns = np.asarray(out.state)
    assert (np.abs(ns) <= 1.0).all()  # redrawn from U(-1,1)
    # Distinct draws per env.
    assert len({tuple(row) for row in np.round(ns, 6)}) == 8


def test_autoreset_keeps_live_envs():
    env = reinmav_tpu.make("quadrotor3d-v0")
    near = jnp.asarray([0.1, 0.2, 1.0, 1, 0, 0, 0, 0, 0, 0])
    states = jnp.stack([near, near.at[0].set(5.0)])  # [live, done]
    actions = jnp.zeros((2, 4))
    out = env.autoreset_step(states, actions, jax.random.PRNGKey(0))
    assert not bool(out.done[0]) and bool(out.done[1])
    # Live env advanced by plain dynamics.
    expected = env.step(near, actions[0]).state
    np.testing.assert_allclose(np.asarray(out.state[0]), np.asarray(expected), rtol=1e-12)


def test_rollout_trajectory_shapes():
    env = reinmav_tpu.make("quadrotor2d-slungload-v0")
    key = jax.random.PRNGKey(0)
    states = env.vreset(jax.random.split(key, 16))
    final, traj = control_rollout(env, states, key, 25)
    assert final.shape == (16, 9)
    assert traj.state.shape == (25, 16, 9)
    assert traj.reward.shape == (25, 16)
    assert traj.done.shape == (25, 16)


class TestTpuQuad:
    """Physics sanity for the rigid-body analogues of the MuJoCo envs."""

    def test_freefall_no_thrust(self):
        env = reinmav_tpu.make("MujocoQuadForce-v1")  # starts at z=1, no floor nearby
        s = env.reset(jax.random.PRNGKey(0))
        out = env.step(s, jnp.zeros(4))
        dt = env.params.dt
        # Two physics substeps of semi-implicit Euler free fall; the
        # quadratic fluid drag (MuJoCo inertia-box model) trims ~1e-5 off
        # |vz| on the second substep, hence the loosened rtol.
        expected_vz = 2 * dt * env.params.gravity
        np.testing.assert_allclose(float(out.state[9]), expected_vz, rtol=1e-4)

    def test_hover_equilibrium(self):
        """Total thrust mg, symmetric motors → stays put (no rotation)."""
        env = reinmav_tpu.make("MujocoQuadForce-v1")
        p = env.params
        hover = -p.gravity * p.mass / 4.0  # per motor, gravity is negative
        s = env.reset(jax.random.PRNGKey(0))

        def body(s, _):
            out = env.step(s, jnp.full((4,), hover))
            return out.state, out.state

        _, traj = jax.lax.scan(body, s, None, length=200)
        final = np.asarray(traj[-1])
        np.testing.assert_allclose(final[0:3], [0, 0, 1.0], atol=1e-3)
        np.testing.assert_allclose(final[3:7], [1, 0, 0, 0], atol=1e-4)

    def test_yaw_torque_spins(self):
        """Asymmetric yaw gears: motors 1+3 (gear +0.1) vs 0+2 (−0.1)."""
        env = reinmav_tpu.make("MujocoQuadForce-v1")
        s = env.reset(jax.random.PRNGKey(0))
        a = jnp.asarray([0.0, 1.0, 0.0, 1.0])  # only +yaw motors
        out = env.step(s, a)
        assert float(out.state[12]) > 0.0  # positive yaw rate

    def test_ground_contact_stops_fall(self):
        env = reinmav_tpu.make("MujocoQuadForce-v0")  # starts on ground
        s = env.reset(jax.random.PRNGKey(0))

        def body(s, _):
            out = env.step(s, jnp.zeros(4))
            return out.state, out.state

        _, traj = jax.lax.scan(body, s, None, length=300)
        traj = np.asarray(traj)
        assert np.isfinite(traj).all()
        # Settles resting near the ground, not falling through.
        assert traj[-1, 2] > -0.1, f"fell through floor: z={traj[-1, 2]}"
        assert abs(traj[-1, 9]) < 0.1  # vertical velocity damped out

    def test_hovering_reward_and_done(self):
        env = reinmav_tpu.make("MujocoQuadForce-v1")
        s = env.reset(jax.random.PRNGKey(0))
        a = jnp.full((4,), 0.5)
        out = env.step(s, a)
        # reward = -10*err² - 0.1*vel², -Σa² + 0.1Σa + 100 with raw action.
        assert 95.0 < float(out.reward) < 101.0
        assert not bool(out.done)
        # Below the z floor → done.
        low = s.at[2].set(0.2)
        out2 = env.step(low, jnp.zeros(4))
        assert bool(out2.done)

    def test_quat_env_rate_servo_tracks(self):
        env = reinmav_tpu.make("MujocoQuadQuat-v0")
        # Start airborne: on the ground the contact torques fight the servo.
        s = env.reset(jax.random.PRNGKey(0)).at[2].set(5.0)
        a = jnp.asarray([0.0, 1.0, 0.0, 0.0])  # roll-rate command

        def body(s, _):
            out = env.step(s, a)
            return out.state, out.state[10]

        _, p_traj = jax.lax.scan(body, s, None, length=50)
        # First-order servo (tau = I/kv ≈ 17 ms) converges to the command.
        assert abs(float(p_traj[-1]) - 1.0) < 0.05, float(p_traj[-1])


def test_reinmav_follows_quintic_trajectory():
    """The embedded controller tracks the min-jerk reference: x(4s) ≈ 1."""
    env = reinmav_tpu.make("reinmav-v0")
    s = env.reset(jax.random.PRNGKey(0))

    def body(s, _):
        out = env.step(s, jnp.zeros(0))
        return out.state, out.obs

    _, traj = jax.lax.scan(body, s, None, length=400)
    traj = np.asarray(traj)
    assert np.isfinite(traj).all()
    np.testing.assert_allclose(traj[-1, 0:3], [1.0, 1.0, 1.0], atol=0.05)
    # Quaternion stays near unit norm (K_quat feedback).
    qn = np.linalg.norm(traj[:, 6:10], axis=1)
    assert np.abs(qn - 1.0).max() < 1e-3


def test_dense8_rollout_matches_flat():
    """The sublane-dense (D, 8, B/8) scan view returns identical results
    to the flat (D, B) path for every env with a controller."""
    for env_id in ["quadrotor2d-slungload-v0", "quadrotor3d-v0"]:
        env = reinmav_tpu.make(env_id)
        key = jax.random.PRNGKey(0)
        states = env.vreset(jax.random.split(key, 64)) * 0.5
        f1, t1 = control_rollout(env, states, key, 50, auto_reset=False, dense8=False)
        f8, t8 = control_rollout(env, states, key, 50, auto_reset=False, dense8=True)
        np.testing.assert_allclose(np.asarray(f8), np.asarray(f1), rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(
            np.asarray(t8.reward), np.asarray(t1.reward), rtol=1e-12, atol=1e-14
        )
        np.testing.assert_allclose(
            np.asarray(t8.state), np.asarray(t1.state), rtol=1e-12, atol=1e-14
        )


def test_policy_rollout_full_state_contract():
    """rollout() hands the FULL state (row layout) to policy_fn; a
    controller-as-policy matches control_rollout exactly."""
    from reinmav_tpu.envs.core import controller_policy, rollout

    env = reinmav_tpu.make("quadrotor3d-v0")
    key = jax.random.PRNGKey(0)
    states = env.vreset(jax.random.split(key, 16)) * 0.5

    seen_shapes = []

    def probe_policy(full_states, k):
        seen_shapes.append(full_states.shape)
        return env.vcontrol(full_states)

    final1, traj1 = rollout(env, probe_policy, states, key, 20, auto_reset=False)
    assert seen_shapes[0] == (16, env.state_dim)  # full state, row layout

    final2, traj2 = control_rollout(env, states, key, 20, auto_reset=False)
    np.testing.assert_allclose(np.asarray(final1), np.asarray(final2), rtol=1e-12)

    final3, traj3 = rollout(env, controller_policy(env), states, key, 20, auto_reset=False)
    np.testing.assert_allclose(np.asarray(final3), np.asarray(final2), rtol=1e-12)


def test_pallas_backend_refuses_wrapped_or_custom_envs():
    """ADVICE r1 / VERDICT r3 #2: the fused Pallas kernels bake in the
    module step/control/reset fns — a wrapped env (same name+params)
    must be refused loudly.  Custom PARAMS, by contrast, now ride into
    the parameterised kernels through SMEM (tests/test_pallas_params.py
    pins the physics); only the non-parameterised kernels (e.g.
    reinmav-v0) still refuse them."""
    import pytest

    from reinmav_tpu.envs import core, quadrotor3d, reinmav13, wrappers

    key = jax.random.PRNGKey(0)
    states = reinmav_tpu.make("quadrotor3d-v0").vreset(jax.random.split(key, 4096))

    wrapped = wrappers.scale_reward(reinmav_tpu.make("quadrotor3d-v0"), 2.0)
    with pytest.raises(ValueError, match="wrapped or replaced"):
        core.throughput_rollout(wrapped, states, key, 4, backend="pallas")

    # Custom params keep the fast path (interpret mode off-TPU).
    custom = quadrotor3d.make(quadrotor3d.Params(ref_z=5.0))
    assert core.fused_kernel_mismatch(custom, packed_params=True) is None

    custom_rm = reinmav13.make(reinmav13.Params(mass=0.2))
    with pytest.raises(ValueError, match="non-default params"):
        s_rm = custom_rm.vreset(jax.random.split(key, 4096))
        core.throughput_rollout(custom_rm, s_rm, key, 4, backend="pallas")

    # Every registered env now has a fused kernel, so the "no kernel"
    # refusal needs a foreign EnvDef.
    import dataclasses

    other = dataclasses.replace(reinmav_tpu.make("quadrotor2d-v0"), name="custom-v9")
    s2 = other.vreset(jax.random.split(key, 4096))
    with pytest.raises(ValueError, match="no fused kernel"):
        core.throughput_rollout(other, s2, key, 4, backend="pallas")

    # auto must fall back to scan for all of these (no raise)
    core.throughput_rollout(wrapped, states[:64], key, 2, backend="auto")
