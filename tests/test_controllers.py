"""Controller tests: RPY PID parity vs its oracle, and closed-loop flights
of the standalone controllers on the TPU-native rigid-body envs
(mirroring the reference demos ``control_rpy.py`` / ``control_quat.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

import reinmav_tpu
from reinmav_tpu.controllers import geometric, rpy_pid
from reinmav_tpu.oracle.rpy_pid_ref import RpyControllerOracle


def test_rpy_pid_parity_sequence(rng):
    """Stateful parity over a 100-call sequence (buffers/integrator carry),
    random inputs."""
    dt, mass, gravity = 0.01, 0.3, -9.81
    oracle = RpyControllerOracle(dt, mass, gravity)
    gains = rpy_pid.Gains()
    carry = rpy_pid.init_carry(jnp.float64)

    control = jax.jit(
        lambda c, pos, quat, pos_d, yaw_d: rpy_pid.control(
            gains, c, pos, quat, pos_d, yaw_d, dt, mass, gravity
        )
    )
    for _ in range(100):
        pos = rng.uniform(-1.0, 1.0, size=3)
        quat = rng.uniform(-1.0, 1.0, size=4)
        quat = quat / np.linalg.norm(quat)
        pos_d = rng.uniform(-1.0, 1.0, size=3)
        yaw_d = rng.uniform(-np.pi, np.pi)
        ref = oracle.control(pos, quat, pos_d, yaw_d)
        forces, carry = control(carry, jnp.asarray(pos), jnp.asarray(quat), jnp.asarray(pos_d), yaw_d)
        np.testing.assert_allclose(np.asarray(forces), ref, rtol=1e-9, atol=1e-11)


def test_rpy_pid_flies_tpuquad_circle():
    """The control_rpy.py demo flow (reference example/mujoco/control_rpy.py):
    cascaded PID flying the force-actuated rigid-body quad on a circle."""
    env = reinmav_tpu.make("MujocoQuadForce-v0")
    p = env.params
    dt = p.dt * p.frame_skip
    gains = rpy_pid.Gains()

    def body(carry, t):
        s, pid_carry = carry
        pos = s[0:3]
        quat = s[3:7]
        pos_d = jnp.stack([0.5 * jnp.cos(1.0 * dt * t), 0.5 * jnp.sin(1.0 * dt * t), 1.0])
        yaw_d = jnp.mod(1.0 * dt * t + jnp.pi, 2 * jnp.pi) - jnp.pi
        forces, pid_carry = rpy_pid.control(
            gains, pid_carry, pos, quat, pos_d, yaw_d, dt, p.mass, p.gravity
        )
        out = env.step(s, forces)
        return (out.state, pid_carry), out.state

    s0 = env.reset(jax.random.PRNGKey(0))
    carry0 = rpy_pid.init_carry(s0.dtype)
    (_, _), traj = jax.lax.scan(body, (s0, carry0), jnp.arange(1000.0))
    traj = np.asarray(traj)
    assert np.isfinite(traj).all()
    # Stays upright and near the circle altitude in steady state.
    late = traj[500:]
    assert np.all(np.abs(late[:, 2] - 1.0) < 0.5), f"z drifted: {late[-1, 2]}"
    r_xy = np.linalg.norm(late[:, 0:2], axis=1)
    assert np.all(r_xy < 1.5), f"xy diverged: {r_xy.max()}"


def test_geometric_flies_tpuquad_quat_circle():
    """The control_quat.py demo flow: geometric controller + body-rate
    actuated rigid-body quad tracking a circle at z=1."""
    env = reinmav_tpu.make("MujocoQuadQuat-v0")
    p = env.params
    dt = p.dt * p.frame_skip
    gains = geometric.Gains(gravity=-9.81)

    def body(s, t):
        ref_pos = jnp.stack([0.5 * jnp.cos(dt * t), 0.5 * jnp.sin(dt * t), 1.0])
        a = geometric.control(gains, s[0:3], s[3:7], s[7:10], ref_pos)
        out = env.step(s, a)
        return out.state, out.state

    s0 = env.reset(jax.random.PRNGKey(0))
    _, traj = jax.lax.scan(body, s0, jnp.arange(2000.0))
    traj = np.asarray(traj)
    assert np.isfinite(traj).all()
    late = traj[1000:]
    # The demo controller is mass-blind (thrust = desired_acc·ẑ_b with no
    # mass scaling, reference control_quat.py:126) while the quat model
    # weighs 0.4 kg, so the closed loop settles at the offset equilibrium
    # z* = 1 + g(1-m)/|kp_z| ≈ 2.177 — faithful to the reference demo.
    z_eq = 1.0 + 9.81 * (1.0 - 0.4) / 5.0
    assert np.abs(late[:, 2] - z_eq).max() < 0.4, f"z err {np.abs(late[:,2]-z_eq).max()}"
    r_xy = np.linalg.norm(late[:, 0:2], axis=1)
    assert abs(float(r_xy.mean()) - 0.5) < 0.3, f"mean radius {r_xy.mean()}"


def test_pd2d_standalone_matches_env_control(rng):
    from reinmav_tpu.controllers import pd2d

    env = reinmav_tpu.make("quadrotor2d-v0")
    gains = pd2d.Gains()
    for _ in range(10):
        s = jnp.asarray(rng.uniform(-1, 1, size=5))
        a_env = env.control(s)
        a_ctl = pd2d.control(gains, s[0:2], s[2], s[3:5], jnp.zeros(2, s.dtype))
        np.testing.assert_allclose(np.asarray(a_env), np.asarray(a_ctl), rtol=1e-12)
