"""CPU oracle: NumPy float64 ground-truth transcription of the reference
native quadrotor environments (ethz-asl/reinmav-gym).

These classes replicate the *behaviour* of the reference envs step for
step — including every quirk catalogued in SURVEY.md §2.1 — and serve as
the parity ground truth for the JAX/TPU kernels in
:mod:`reinmav_tpu.envs`.  They are NOT the production path.

Fidelity notes (reference file:line cites):

* ``Quadrotor2DOracle``     ← ``gym_reinmav/envs/native/quadrotor2d.py:41-190``
* ``Quadrotor2DSlungloadOracle`` ← ``quadrotor2d_slungload.py:41-260``
* ``Quadrotor3DOracle``     ← ``quadrotor3d.py:42-311``
* ``Quadrotor3DSlungloadOracle`` ← ``quadrotor3d_slungload.py:42-353``
* ``Reinmav13Oracle``       ← ``reinmav_env.py:51-354``

Documented intentional divergences from the reference:

* Q1 (SURVEY.md): the shipped ``quadrotor2d.py`` has a syntax error in its
  done-predicate (missing line continuation, ``quadrotor2d.py:95-98``).
  We implement the *intended* predicate
  ``‖pos‖>3 or ‖vel‖>10 or ‖vel‖<-2 or ‖vel‖>2``.
* Q2: the always-false ``norm < -threshold`` clauses are kept (they fold to
  False and change nothing).
* Q6: the reference stores 2D attitude as a shape-(1,) array inside a state
  tuple (ragged observation). We use flat float64 state vectors; the
  dynamics are identical.
* ``steps_beyond_done``: like the reference tests (``test_quadrotor3d.py:21``)
  we assume reset-on-done, so the "+1 then warn" tail never triggers;
  ``step`` returns reward=1.0 on the first done step.
* Seeding: gym's ``seeding.np_random`` stream is not reproduced; parity is
  defined on injected initial states (``reset_to``), per SURVEY.md §7 step 4.
"""

from __future__ import annotations

import math

import numpy as np

from .pyquat import Quat


class _OracleBase:
    state_dim: int
    action_dim: int

    def reset_to(self, state: np.ndarray) -> np.ndarray:
        self.state = np.asarray(state, dtype=np.float64).copy()
        return self.state.copy()

    def reset(self, rng: np.random.Generator) -> np.ndarray:
        """Production-style reset: full state ~ U(-1, 1), like the
        reference (``quadrotor3d.py:184`` et al.)."""
        return self.reset_to(rng.uniform(-1.0, 1.0, size=(self.state_dim,)))


class Quadrotor2DOracle(_OracleBase):
    """Planar quadrotor, state [x, z, theta, vx, vz], action [thrust, w].

    Reference: ``quadrotor2d.py:41-141``.  Quirks: 10x thrust scaling with
    zero floor (Q5, ``:75-78``), position-first Euler with old velocity
    (Q3, ``:89-91``).
    """

    state_dim = 5
    action_dim = 2

    mass = 1.0
    dt = 0.01
    g = np.array([0.0, -9.8])
    ref_pos = np.array([0.0, 0.0])
    ref_vel = np.array([0.0, 0.0])

    def step(self, action):
        thrust = 10.0 * float(action[0])  # quadrotor2d.py:75 — 10x gain
        if thrust < 0.0:
            thrust = 0.0
        w = float(action[1])

        pos = self.state[0:2].copy()
        att = float(self.state[2])
        vel = self.state[3:5].copy()

        acc = thrust / self.mass * np.array(
            [math.cos(att + math.pi / 2), math.sin(att + math.pi / 2)]
        ) + self.g
        pos = pos + vel * self.dt + 0.5 * acc * self.dt * self.dt  # old vel
        vel = vel + acc * self.dt
        att = att + w * self.dt

        self.state = np.array([pos[0], pos[1], att, vel[0], vel[1]])

        # Q1: intended predicate of the unparseable done expression.
        done = (
            np.linalg.norm(pos, 2) > 3.0
            or np.linalg.norm(vel, 2) > 10.0
            or np.linalg.norm(vel, 2) < -2.0   # Q2 dead clause
            or np.linalg.norm(vel, 2) > 2.0
        )
        reward = 1.0 if done else -np.linalg.norm(pos, 2)
        return self.state.copy(), float(reward), bool(done), {}

    def control(self):
        """PD position + atan2 attitude controller (quadrotor2d.py:115-138)."""
        kp, kv, tau = -5.0, -4.0, 0.1
        pos = self.state[0:2]
        att = float(self.state[2])
        vel = self.state[3:5]
        desired_acc = kp * (pos - self.ref_pos) + kv * (vel - self.ref_vel) + np.array([0.0, 9.8])
        desired_att = math.atan2(desired_acc[1], desired_acc[0]) - math.pi / 2
        w = (-1.0 / tau) * (att - desired_att)
        thrust = self.mass * np.linalg.norm(desired_acc, 2)
        return np.array([thrust, w])


class Quadrotor2DSlungloadOracle(_OracleBase):
    """Planar quadrotor + slung load.

    State [x, z, theta, vx, vz, lx, lz, lvx, lvz], action [thrust, w]
    (thrust in Newtons — *no* 10x gain here, ``quadrotor2d_slungload.py:80``).
    Taut/slack tether branches and velocity-FIRST Euler order per
    ``quadrotor2d_slungload.py:96-132`` (Q3).
    """

    state_dim = 9
    action_dim = 2

    mass = 1.0
    load_mass = 0.1
    dt = 0.01
    g = np.array([0.0, -9.8])
    tether_length = 0.5
    ref_pos = np.array([0.0, 0.0])
    ref_vel = np.array([0.0, 0.0])

    def step(self, action):
        thrust = float(action[0])
        w = float(action[1])
        dt = self.dt

        pos = self.state[0:2].copy()
        att = float(self.state[2])
        vel = self.state[3:5].copy()
        load_pos = self.state[5:7].copy()
        load_vel = self.state[7:9].copy()

        tether_vec = load_pos - pos
        tnorm = np.linalg.norm(tether_vec)
        unit = tether_vec / tnorm  # NaN for tnorm==0, like the reference

        heading = np.array([math.cos(att + math.pi / 2), math.sin(att + math.pi / 2)])

        if tnorm >= self.tether_length:
            # Taut branch (quadrotor2d_slungload.py:96-116).
            thrust_vec = thrust * heading
            # NOTE: scalar m·L·⟨lv,lv⟩ broadcast-subtracted from the vector.
            la = np.inner(unit, thrust_vec - self.mass * self.tether_length * np.inner(load_vel, load_vel)) * unit
            la = (1.0 / (self.mass + self.load_mass)) * la + self.g
            load_vel = load_vel + la * dt                               # vel FIRST
            load_pos = load_pos + load_vel * dt + 0.5 * la * dt * dt    # uses new vel

            tension = self.load_mass * np.linalg.norm(-self.g + la) * unit

            acc = thrust / self.mass * heading + self.g + tension / self.mass
            vel = vel + acc * dt                                        # vel FIRST
            pos = pos + vel * dt + 0.5 * acc * dt * dt
            att = att + w * dt

            # Kinematic projection back onto the tether sphere.
            load_dir = (load_pos - pos) / np.linalg.norm(load_pos - pos)
            load_pos = pos + load_dir * self.tether_length
            load_vel = load_vel - np.inner(load_vel - vel, load_dir) * load_dir
        else:
            # Slack branch (quadrotor2d_slungload.py:119-132): ballistic load.
            la = self.g
            load_vel = load_vel + la * dt
            load_pos = load_pos + load_vel * dt + 0.5 * la * dt * dt

            acc = thrust / self.mass * heading + self.g
            vel = vel + acc * dt
            pos = pos + vel * dt + 0.5 * acc * dt * dt
            att = att + w * dt

        self.state = np.array(
            [pos[0], pos[1], att, vel[0], vel[1], load_pos[0], load_pos[1], load_vel[0], load_vel[1]]
        )
        done = (
            np.linalg.norm(load_pos, 2) < -2.0   # Q2 dead clause
            or np.linalg.norm(load_pos, 2) > 2.0
            or np.linalg.norm(load_vel, 2) < -10.0
            or np.linalg.norm(load_vel, 2) > 10.0
        )
        reward = 1.0 if done else -np.linalg.norm(pos, 2)
        return self.state.copy(), float(reward), bool(done), {}

    def control(self):
        """Same PD controller as the plain 2D env
        (quadrotor2d_slungload.py:160-186)."""
        kp, kv, tau = -5.0, -4.0, 0.1
        pos = self.state[0:2]
        att = float(self.state[2])
        vel = self.state[3:5]
        desired_acc = kp * (pos - self.ref_pos) + kv * (vel - self.ref_vel) + np.array([0.0, 9.8])
        desired_att = math.atan2(desired_acc[1], desired_acc[0]) - math.pi / 2
        w = (-1.0 / tau) * (att - desired_att)
        thrust = self.mass * np.linalg.norm(desired_acc, 2)
        return np.array([thrust, w])


class Quadrotor3DOracle(_OracleBase):
    """3D quadrotor, state [pos3, quat wxyz, vel3], action [thrust, wx, wy, wz].

    Reference ``quadrotor3d.py:81-124``: position-first Euler (old
    velocity); quaternion integrated as
    ``q += dt · ½ q̂ ⊗ (0, ω)`` where ``q̂`` is the in-place-normalised
    quaternion (pyquaternion side effect, Q4) while the stored state keeps
    the unnormalised elements.
    """

    state_dim = 10
    action_dim = 4

    mass = 1.0
    dt = 0.01
    g = np.array([0.0, 0.0, -9.8])
    ref_pos = np.array([0.0, 0.0, 2.0])
    ref_vel = np.array([0.0, 0.0, 0.0])

    def step(self, action):
        thrust = float(action[0])
        w = np.asarray(action[1:4], dtype=np.float64)

        pos = self.state[0:3].copy()
        att = self.state[3:7].copy()
        vel = self.state[7:10].copy()

        q = Quat(att)
        acc = thrust / self.mass * q.rotation_matrix.dot(np.array([0.0, 0.0, 1.0])) + self.g
        pos = pos + vel * self.dt + 0.5 * acc * self.dt * self.dt  # old vel
        vel = vel + acc * self.dt
        q_dot = q.derivative(w)  # q already normalised in place by rotation_matrix
        att = att + q_dot.elements * self.dt  # att itself stays unnormalised

        self.state = np.concatenate([pos, att, vel])
        done = (
            np.linalg.norm(pos, 2) < -3.0   # Q2 dead clause
            or np.linalg.norm(pos, 2) > 3.0
            or np.linalg.norm(vel, 2) < -10.0
            or np.linalg.norm(vel, 2) > 10.0
        )
        reward = 1.0 if done else -np.linalg.norm(pos, 2)
        return self.state.copy(), float(reward), bool(done), {}

    def control(self):
        """Geometric / tilt-prioritised controller (quadrotor3d.py:126-180).

        The attitude error uses the *unnormalised* current quaternion
        (pyquaternion ``conjugate``/``__mul__`` do not normalise); the
        thrust projection normalises (``rotation_matrix``), in that order.
        """
        kp = np.array([-5.0, -5.0, -5.0])
        kv = np.array([-4.0, -4.0, -4.0])
        tau = 0.3

        pos = self.state[0:3]
        att = self.state[3:7]
        vel = self.state[7:10]

        desired_acc = kp * (pos - self.ref_pos) + kv * (vel - self.ref_vel) - self.g

        zb = desired_acc / np.linalg.norm(desired_acc)
        yc = np.array([0.0, 1.0, 0.0])
        xb = np.cross(yc, zb)
        xb = xb / np.linalg.norm(xb)
        yb = np.cross(zb, xb)
        zb = zb / np.linalg.norm(zb)
        rotmat = np.stack([xb, yb, zb], axis=1)
        desired_quat = Quat(matrix=rotmat)

        current = Quat(att)
        qe = (current.conjugate * desired_quat).elements
        w = (2.0 / tau) * np.sign(qe[0]) * qe[1:4]  # sign(0)=0, Q10
        thrust = desired_acc.dot(current.rotation_matrix.dot(np.array([0.0, 0.0, 1.0])))
        return np.array([thrust, w[0], w[1], w[2]])


class Quadrotor3DSlungloadOracle(_OracleBase):
    """3D quadrotor + slung load, 16-dim state
    [pos3, quat4, vel3, load_pos3, load_vel3].

    Reference ``quadrotor3d_slungload.py:87-152``: position-first Euler for
    *both* quad and load (opposite order from the 2D sibling, Q3); done on
    load-pos / quad-vel norms; reward −‖load_pos‖.
    """

    state_dim = 16
    action_dim = 4

    mass = 1.0
    load_mass = 0.1
    dt = 0.01
    g = np.array([0.0, 0.0, -9.8])
    tether_length = 1.5
    ref_pos = np.array([0.0, 0.0, 1.0])
    ref_vel = np.array([0.0, 0.0, 0.0])

    def step(self, action):
        thrust = float(action[0])
        w = np.asarray(action[1:4], dtype=np.float64)
        dt = self.dt

        pos = self.state[0:3].copy()
        att = self.state[3:7].copy()
        vel = self.state[7:10].copy()
        load_pos = self.state[10:13].copy()
        load_vel = self.state[13:16].copy()

        tether_vec = load_pos - pos
        tnorm = np.linalg.norm(tether_vec)
        unit = tether_vec / tnorm

        q = Quat(att)
        ez = np.array([0.0, 0.0, 1.0])

        if tnorm >= self.tether_length:
            # Taut branch (quadrotor3d_slungload.py:104-131).
            rot = q.rotation_matrix  # normalises q in place
            thrust_vec = thrust * rot.dot(ez)
            la = np.inner(unit, thrust_vec - self.mass * self.tether_length * np.inner(load_vel, load_vel)) * unit
            la = (1.0 / (self.mass + self.load_mass)) * la + self.g
            load_pos = load_pos + load_vel * dt + 0.5 * la * dt * dt    # pos FIRST
            load_vel = load_vel + la * dt

            tension = self.load_mass * np.linalg.norm(-self.g + la) * unit

            acc = thrust / self.mass * rot.dot(ez) + self.g + tension / self.mass
            pos = pos + vel * dt + 0.5 * acc * dt * dt                  # old vel
            vel = vel + acc * dt
            att = att + q.derivative(w).elements * dt

            load_dir = (load_pos - pos) / np.linalg.norm(load_pos - pos)
            load_pos = pos + load_dir * self.tether_length
            load_vel = load_vel - np.inner(load_vel - vel, load_dir) * load_dir
        else:
            # Slack branch (quadrotor3d_slungload.py:134-148).
            rot = q.rotation_matrix
            la = self.g
            load_pos = load_pos + load_vel * dt + 0.5 * la * dt * dt
            load_vel = load_vel + la * dt

            acc = thrust / self.mass * rot.dot(ez) + self.g
            pos = pos + vel * dt + 0.5 * acc * dt * dt
            vel = vel + acc * dt
            att = att + q.derivative(w).elements * dt

        self.state = np.concatenate([pos, att, vel, load_pos, load_vel])
        done = (
            np.linalg.norm(load_pos, 2) < -3.0   # Q2 dead clause
            or np.linalg.norm(load_pos, 2) > 3.0
            or np.linalg.norm(vel, 2) < -10.0
            or np.linalg.norm(vel, 2) > 10.0
        )
        reward = 1.0 if done else -np.linalg.norm(load_pos, 2)
        return self.state.copy(), float(reward), bool(done), {}

    def control(self):
        """Identical geometric controller to Quadrotor3D, with ref_pos at
        z=1 (quadrotor3d_slungload.py:169-226)."""
        kp = np.array([-5.0, -5.0, -5.0])
        kv = np.array([-4.0, -4.0, -4.0])
        tau = 0.3

        pos = self.state[0:3]
        att = self.state[3:7]
        vel = self.state[7:10]

        desired_acc = kp * (pos - self.ref_pos) + kv * (vel - self.ref_vel) - self.g

        zb = desired_acc / np.linalg.norm(desired_acc)
        yc = np.array([0.0, 1.0, 0.0])
        xb = np.cross(yc, zb)
        xb = xb / np.linalg.norm(xb)
        yb = np.cross(zb, xb)
        zb = zb / np.linalg.norm(zb)
        rotmat = np.stack([xb, yb, zb], axis=1)
        desired_quat = Quat(matrix=rotmat)

        current = Quat(att)
        qe = (current.conjugate * desired_quat).elements
        w = (2.0 / tau) * np.sign(qe[0]) * qe[1:4]
        thrust = desired_acc.dot(current.rotation_matrix.dot(np.array([0.0, 0.0, 1.0])))
        return np.array([thrust, w[0], w[1], w[2]])


class Reinmav13Oracle:
    """13-state controller-in-the-loop simulator (reference ``reinmav-v0``).

    Reference ``reinmav_env.py:51-354``.  One outer ``step()`` (dt=1/100)
    runs ``n = len(np.arange(t, t+dt, ds))`` explicit-Euler substeps
    (ds=1/5000; n floats between 50 and 51 — replicated exactly), with the
    full PD controller + quintic trajectory re-evaluated inside the
    integrator.  ``step`` takes no action; reward is always 90 and done is
    always True (Q9).
    """

    state_dim = 13
    mass = 0.18
    gravity = 9.81
    arm_length = 0.086
    min_force = 0.0
    max_force = 3.5316
    inertia = np.array(
        [[0.00025, 0.0, 2.55e-06], [0.0, 0.000232, 0.0], [2.55e-06, 0.0, 0.0003738]]
    )
    inv_inertia = np.linalg.inv(inertia)
    dt = 1.0 / 100.0
    ds = 1.0 / 5000.0
    init_state = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])

    def __init__(self):
        self.t = 0.0
        self.state = self.init_state.copy()

    def reset_to(self, state: np.ndarray, t: float = 0.0) -> np.ndarray:
        self.state = np.asarray(state, dtype=np.float64).copy()
        self.t = float(t)
        return self.state.copy()

    # -- trajectory generator (reinmav_env.py:128-136) ---------------------
    @classmethod
    def trj_gen(cls, t: float) -> np.ndarray:
        t_max = 4.0
        t = np.maximum(0.0, np.minimum(t, t_max))
        t = t / t_max
        pos = 10.0 * t**3 - 15.0 * t**4 + 6.0 * t**5
        vel = (30.0 / t_max) * t**2 - (60.0 / t_max) * t**3 + (30.0 / t_max) * t**4
        acc = (60.0 / t_max**2) * t - (180.0 / t_max**2) * t**2 + (120.0 / t_max**2) * t**3
        return np.array([pos, pos, pos, vel, vel, vel, acc, acc, acc, pos, vel])

    # -- quat → ZXY euler 12-vector (reinmav_env.py:292-304) ---------------
    def state_to_qd(self, s: np.ndarray) -> np.ndarray:
        qd = np.zeros(12)
        qd[0:6] = s[0:6]
        r = self._quat2mat(s[6:10])
        phi = math.asin(r[1, 2])
        cphi = math.cos(phi)
        psi = math.atan2(-r[1, 0] / cphi, r[1, 1] / cphi)
        theta = math.atan2(-r[0, 2] / cphi, r[2, 2] / cphi)
        qd[6], qd[7], qd[8] = phi, theta, psi
        qd[9:12] = s[10:13]
        return qd

    @staticmethod
    def _quat2mat(quat: np.ndarray) -> np.ndarray:
        """Non-unit tolerant quat→R (reinmav_env.py:267-290)."""
        w, x, y, z = quat
        nq = w * w + x * x + y * y + z * z
        if nq <= np.finfo(np.float64).eps:
            return np.eye(3)
        s = 2.0 / nq
        X, Y, Z = x * s, y * s, z * s
        wX, wY, wZ = w * X, w * Y, w * Z
        xX, xY, xZ = x * X, x * Y, x * Z
        yY, yZ, zZ = y * Y, y * Z, z * Z
        return np.array(
            [
                [1.0 - (yY + zZ), xY - wZ, xZ + wY],
                [xY + wZ, 1.0 - (xX + zZ), yZ - wX],
                [xZ - wY, yZ + wX, 1.0 - (xX + yY)],
            ]
        )

    # -- inner PD controller (reinmav_env.py:306-337) ----------------------
    def controller(self, cur_state: np.ndarray, desired_state: np.ndarray):
        kp = np.array([10.0, 10.0, 35.0])
        kd = np.array([5.0, 5.0, 22.0])
        kp_rot = np.array([100.0, 100.0, 100.0])
        kd_rot = np.array([0.1, 0.1, 0.1])

        error_p = desired_state[0:3] - cur_state[0:3]
        error_v = desired_state[3:6] - cur_state[3:6]
        phi, theta, psi = cur_state[6], cur_state[7], cur_state[8]
        p, q, r = cur_state[9], cur_state[10], cur_state[11]
        psi_des = desired_state[9]
        dpsi_des = desired_state[10]

        ddr = desired_state[6:9] + kd * error_v + kp * error_p
        u1 = self.mass * (self.gravity + ddr[2])

        phi_des = 1.0 / self.gravity * (ddr[0] * math.sin(psi_des) - ddr[1] * math.cos(psi_des))
        theta_des = 1.0 / self.gravity * (ddr[0] * math.cos(psi_des) + ddr[1] * math.sin(psi_des))
        mx = kp_rot[0] * (phi_des - phi) - kd_rot[0] * p
        my = kp_rot[1] * (theta_des - theta) - kd_rot[1] * q
        mz = kp_rot[2] * (psi_des - psi) + kd_rot[2] * (dpsi_des - r)
        return float(u1), np.array([mx, my, mz])

    # -- equations of motion (reinmav_env.py:201-264) ----------------------
    def eom(self, state: np.ndarray, force: float, moment: np.ndarray) -> np.ndarray:
        L = self.arm_length
        a_mix = np.array(
            [
                [0.25, 0.0, -0.5 / L],
                [0.25, 0.5 / L, 0.0],
                [0.25, 0.0, 0.5 / L],
                [0.25, -0.5 / L, 0.0],
            ]
        )
        t_rotor = a_mix.dot(np.array([force, moment[0], moment[1]]))
        t_rotor = np.clip(t_rotor, self.min_force / 4.0, self.max_force / 4.0)
        b_mix = np.array(
            [[1.0, 1.0, 1.0, 1.0], [0.0, L, 0.0, -L], [-L, 0.0, L, 0.0]]
        )
        total_force = float(b_mix[0].dot(t_rotor))
        # Mz passes through UNCLAMPED (reinmav_env.py:204-216, Q9).
        mixed_moment = np.array(
            [b_mix[1].dot(t_rotor), b_mix[2].dot(t_rotor), moment[2]]
        )

        vel = state[3:6]
        quat = state[6:10]
        pqr = state[10:13]

        brw = self._quat2mat(quat)
        wrb = brw.T
        accel = 1.0 / self.mass * (
            wrb.dot(np.array([0.0, 0.0, total_force]))
            - np.array([0.0, 0.0, self.mass * self.gravity])
        )

        p, q, r = pqr
        k_quat = 2.0
        quat_err = 1.0 - (quat[0] ** 2 + quat[1] ** 2 + quat[2] ** 2 + quat[3] ** 2)
        omega_mat = np.array(
            [[0.0, -p, -q, -r], [p, 0.0, -r, q], [q, r, 0.0, -p], [r, -q, p, 0.0]]
        )
        qdot = -0.5 * omega_mat.dot(quat) + k_quat * quat_err * quat

        temp = np.cross(pqr, self.inertia.dot(pqr))
        pqrdot = self.inv_inertia.dot(mixed_moment - temp)

        sdot = np.zeros(13)
        sdot[0:3] = vel
        sdot[3:6] = accel
        sdot[6:10] = qdot
        sdot[10:13] = pqrdot
        return sdot

    def substep_count(self, t: float) -> int:
        """Exact np.arange-count replica: ``len(np.arange(t, t+dt, ds))``."""
        return int(math.ceil(((t + self.dt) - t) / self.ds))

    def step(self):
        """One outer step = n Euler substeps with controller in the loop
        (reinmav_env.py:90-126)."""
        t = self.t
        n = self.substep_count(t)
        for k in range(n):
            tk = t + k * self.ds  # np.arange element: start + i*step
            cur = self.state_to_qd(self.state)
            des = self.trj_gen(tk)
            force, moment = self.controller(cur, des)
            sdot = self.eom(self.state, force, moment)
            self.state = self.state + self.ds * sdot
        self.t = t + self.dt
        reward = 100.0 - 10.0
        done = True
        return self.state.copy(), reward, done, {}


ORACLES = {
    "quadrotor2d-v0": Quadrotor2DOracle,
    "quadrotor2d-slungload-v0": Quadrotor2DSlungloadOracle,
    "quadrotor3d-v0": Quadrotor3DOracle,
    "quadrotor3d-slungload-v0": Quadrotor3DSlungloadOracle,
    "reinmav-v0": Reinmav13Oracle,
}
