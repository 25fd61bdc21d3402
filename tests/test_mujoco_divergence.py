"""Differential test vs REAL MuJoCo (VERDICT r2 missing #1 / next #5).

The tpuquad family analogues (`envs/tpuquad.py`) are defined by the
reference's `mj_step` workload
(/root/reference/gym_reinmav/envs/mujoco/mujoco_quad.py:46 and
assets/*.xml).  These tests load the ACTUAL reference XMLs into modern
MuJoCo and run the JAX envs in lockstep (float64 CPU backend):

* model build: mass/CoM/inertia must match `mj_makeModel`'s
  inertiafromgeom output to round-off;
* off-ground trajectories: same integrator family (semi-implicit Euler,
  exp-map quaternions) + the mirrored fluid-drag and CoM-coupling terms
  — must match to float64 round-off scale;
* contact trajectories: the impedance contact law is a per-point
  diagonal approximation of the engine's coupled Newton solve — bounded
  divergence, pinned here (the table in docs/architecture.md is
  generated from these scenarios).

Skip-gated on a mujoco install; the envs do not depend on it.
"""

import importlib.util

import numpy as np
import pytest

import reinmav_tpu

mujoco = pytest.importorskip("mujoco")

ASSETS = "/root/reference/gym_reinmav/envs/mujoco/assets"
HOVER_XML = f"{ASSETS}/quadrotor_hovering.xml"
GROUND_XML = f"{ASSETS}/quadrotor_ground.xml"
QUAT_XML = f"{ASSETS}/quadrotor_quat.xml"

pytestmark = pytest.mark.skipif(
    importlib.util.find_spec("mujoco") is None, reason="mujoco not installed"
)


def _mj_rollout(xml_path, q0, ctrl_seq, frame_skip=2):
    m = mujoco.MjModel.from_xml_string(open(xml_path).read())
    d = mujoco.MjData(m)
    d.qpos[:] = q0[:7]
    d.qvel[:] = q0[7:]
    mujoco.mj_forward(m, d)
    out = []
    for ctrl in ctrl_seq:
        for _ in range(frame_skip):
            d.ctrl[:] = ctrl
            mujoco.mj_step(m, d)
        out.append(np.concatenate([d.qpos, d.qvel]))
    return np.array(out)


def _env_rollout(env_id, s0, act_seq):
    env = reinmav_tpu.make(env_id)
    s = np.asarray(s0, np.float64)
    out = []
    for a in act_seq:
        s = np.asarray(env.step(s, np.asarray(a, np.float64)).state)
        out.append(s.copy())
    return np.array(out)


def test_model_build_matches_mujoco():
    """mass / CoM / principal inertia == mj's inertiafromgeom build."""
    from reinmav_tpu.envs import tpuquad

    for xml, p in ((GROUND_XML, tpuquad.Params()), (QUAT_XML, tpuquad.QuatParams())):
        m = mujoco.MjModel.from_xml_string(open(xml).read())
        np.testing.assert_allclose(m.body_mass[1], p.mass, rtol=1e-12)
        np.testing.assert_allclose(m.body_ipos[1], [0.0, 0.0, p.com_z], atol=1e-12)
        # mj stores inertia in the principal frame; rotate back.
        w, x, y, z = m.body_iquat[1]
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        I_body = R @ np.diag(m.body_inertia[1]) @ R.T
        np.testing.assert_allclose(np.diag(I_body), p.inertia_diag, rtol=1e-9)
        assert np.abs(I_body - np.diag(np.diag(I_body))).max() < 1e-12


def test_force_model_off_ground_matches_mj_step_to_roundoff():
    """30 outer steps (0.6 s) of asymmetric-thrust flight: the analogue
    (with fluid drag + CoM coupling) IS mj_step to f64 round-off."""
    q0 = np.array([0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], float)
    acts = np.tile([0.7, 0.65, 0.75, 0.68], (30, 1))
    mj = _mj_rollout(HOVER_XML, q0, acts)
    ours = _env_rollout("MujocoQuadForce-v1", q0, acts)
    np.testing.assert_allclose(ours, mj, rtol=0, atol=1e-10)


def test_force_model_lateral_flight_drag_matches():
    """2 s of hover-thrust flight with 2 m/s lateral velocity — the
    fluid-drag model dominates the trajectory and must match mj."""
    q0 = np.array([0, 0, 1, 1, 0, 0, 0, 2.0, 0, 0, 0, 0, 0], float)
    hover = 0.3 * 9.81 / 4.0
    acts = np.tile(np.full(4, hover), (100, 1))
    mj = _mj_rollout(HOVER_XML, q0, acts)
    ours = _env_rollout("MujocoQuadForce-v1", q0, acts)
    np.testing.assert_allclose(ours, mj, rtol=0, atol=1e-10)


def test_quat_model_off_ground_matches_mj_step_to_roundoff():
    """25 outer steps of thrust + rate-servo flight (velocity actuators,
    kv=0.1) against the quat XML."""
    q0 = np.array([0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], float)
    acts = np.tile([2.0, 0.3, -0.2, 0.1], (25, 1))
    mj = _mj_rollout(QUAT_XML, q0, acts)
    ours = _env_rollout("MujocoQuadQuat-v0", q0, acts)
    np.testing.assert_allclose(ours, mj, rtol=0, atol=1e-9)


def test_ground_drop_and_settle_divergence_bound():
    """Zero-thrust drop from 5 cm onto the plane: the diagonal-approx
    impedance contact vs the engine's Newton solve.  Measured bound:
    ≤7e-4 m position transient at the impact instant, ≤3e-4 settled
    (both settle at sub-mm penetration — MuJoCo contacts the core-box
    corners, the analogue its bottom-centre point)."""
    q0 = np.array([0, 0, 0.05, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], float)
    acts = np.tile(np.zeros(4), (100, 1))
    mj = _mj_rollout(GROUND_XML, q0, acts)
    ours = _env_rollout("MujocoQuadForce-v0", q0, acts)
    assert np.abs(mj[:, :3] - ours[:, :3]).max() < 1e-3
    assert np.abs(mj[:, 3:7] - ours[:, 3:7]).max() < 1e-6  # stays flat
    # Settled within 3e-4 of mj's resting height, sub-mm penetration.
    assert abs(mj[-1, 2] - ours[-1, 2]) < 3e-4
    assert 0.024 < ours[-1, 2] < 0.025


def test_ground_takeoff_through_contact_matches():
    """Full thrust from the resting pose: pushes through the contact
    regime into free flight — matches to round-off once airborne."""
    q0 = np.array([0, 0, 0.02489, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], float)
    acts = np.tile(np.ones(4), (50, 1))
    mj = _mj_rollout(GROUND_XML, q0, acts)
    ours = _env_rollout("MujocoQuadForce-v0", q0, acts)
    np.testing.assert_allclose(ours, mj, rtol=0, atol=1e-6)


def test_tilted_drop_slide_divergence_bound():
    """Tilted drop with lateral velocity: tumbling multi-point contact
    with sliding friction — the coarsest regime for the diagonal
    approximation (and elliptic-vs-pyramidal cones).  Measured bound
    over 1 s: ≤3 cm position, ≤0.2 quat components."""
    q0 = np.array([0, 0, 0.06, 0.996, 0.05, 0.05, 0, 0.3, 0, 0, 0, 0, 0], float)
    q0[3:7] /= np.linalg.norm(q0[3:7])
    acts = np.tile(np.zeros(4), (100, 1))
    mj = _mj_rollout(GROUND_XML, q0, acts)
    ours = _env_rollout("MujocoQuadForce-v0", q0, acts)
    assert np.abs(mj[:, :3] - ours[:, :3]).max() < 3e-2
    assert np.abs(mj[:, 3:7] - ours[:, 3:7]).max() < 0.2
