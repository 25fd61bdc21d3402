"""Validate the oracle's coupled contact solve against real MuJoCo.

For states sampled along mj trajectories of the pinned scenarios, runs
mj_forward and compares: candidate/active contact sets, per-row pyramid
forces, and the resulting qacc.  Then full-trajectory divergence.
"""
import numpy as np
import mujoco
import sys
sys.path.insert(0, "/root/repo")
from reinmav_tpu.oracle import tpuquad_ref as ref

ASSETS = "/root/reference/gym_reinmav/envs/mujoco/assets"
xml = open(f"{ASSETS}/quadrotor_ground.xml").read()
m = mujoco.MjModel.from_xml_string(xml)
m.opt.jacobian = mujoco.mjtJacobian.mjJAC_DENSE
# disable arm contacts for the row-level check (documented exclusion)
names = {i: mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, i) for i in range(m.ngeom)}
m_noarm = mujoco.MjModel.from_xml_string(xml)
m_noarm.opt.jacobian = mujoco.mjtJacobian.mjJAC_DENSE
for i in range(m_noarm.ngeom):
    if names[i].startswith("a") and names[i] != "a":  # a00..a30
        m_noarm.geom_contype[i] = 0; m_noarm.geom_conaffinity[i] = 0

p = ref.OracleParams("ground")

def oracle_qacc_and_forces(state):
    """Replicate the oracle's smooth dynamics + coupled contact at one
    state; returns (qacc(6: acc_origin, omega_dot), F_w, T_b)."""
    pos, quat, vel, omega = state[0:3], state[3:7], state[7:10], state[10:13]
    rot = ref.quat_to_rotmat(quat)
    I = p.inertia_diag; c = p.com
    force_w = np.array([0.0, 0.0, p.gravity * p.mass])
    torque_b = np.zeros(3)
    vel_com_b = rot.T @ vel + np.cross(omega, c)
    df, dtq = ref._fluid_wrench_body(p, vel_com_b, omega)
    force_w = force_w + rot @ df
    torque_b = torque_b + dtq
    alpha0 = (torque_b - np.cross(omega, I * omega)) / I
    acc0_com = force_w / p.mass
    F_w, T_b = ref._contact_wrench(p, pos, vel, omega, rot, acc0_com, alpha0)
    force_w += F_w; torque_b += T_b
    om_dot = (torque_b - np.cross(omega, I * omega)) / I
    acc_com = force_w / p.mass
    acc = acc_com - rot @ (np.cross(om_dot, c) + np.cross(omega, np.cross(omega, c)))
    return np.concatenate([acc, om_dot]), F_w, T_b

def check_states(model, states, label):
    d = mujoco.MjData(model)
    worst_qacc = 0.0; worst_ncon = 0
    for s in states:
        d.qpos[:] = s[:7]; d.qvel[:] = s[7:]
        d.ctrl[:] = 0
        mujoco.mj_forward(m if model is None else model, d)
        qacc_mj = d.qacc.copy()
        qacc_o, F_w, T_b = oracle_qacc_and_forces(s)
        err = np.abs(qacc_o - qacc_mj).max()
        if err > worst_qacc:
            worst_qacc = err; worst_ncon = d.ncon
    print(f"{label}: worst qacc err {worst_qacc:.3e} (ncon at worst: {worst_ncon})")

def mj_traj(model, q0, steps=100, ctrl=None):
    d = mujoco.MjData(model)
    d.qpos[:] = q0[:7]; d.qvel[:] = q0[7:]
    out = []
    for t in range(steps):
        d.ctrl[:] = 0 if ctrl is None else ctrl(t)
        mujoco.mj_step(model, d)
        out.append(np.concatenate([d.qpos, d.qvel]))
    return np.array(out)

def oracle_traj(q0, steps=100, ctrl=None):
    s = np.asarray(q0, float)
    out = []
    for t in range(steps):
        a = np.zeros(4) if ctrl is None else np.asarray(ctrl(t))
        yaw = (ref.YAW_SIGN * np.clip(a, 0, 1)).sum()
        s = ref._physics_step(p, s, np.clip(a, 0, 1), yaw, np.zeros(3), True)
        out.append(s.copy())
    return np.array(out)

scenarios = {}
# tilted drop (the committed test)
q0 = np.array([0, 0, 0.06, 0.996, 0.05, 0.05, 0, 0.3, 0, 0, 0, 0, 0], float)
q0[3:7] /= np.linalg.norm(q0[3:7])
scenarios["tilted_drop"] = (q0, None)
# flat drop
scenarios["flat_drop"] = (np.array([0,0,0.05,1,0,0,0,0,0,0,0,0,0], float), None)
# 40-deg tumble
ang = np.deg2rad(40.0)
qt = np.zeros(13); qt[2]=0.12; qt[3]=np.cos(ang/2); qt[4]=np.sin(ang/2); qt[7]=0.3
scenarios["tumble40"] = (qt, None)
# reset pop-out (z=0): arms contact here in full mj
scenarios["reset_popout"] = (np.zeros(13) + np.array([0,0,0,1]+[0]*9, float), None)

# adversarial random-thrust ground-crawling (the regime that motivated
# the arm-corner candidates, r4 verdict #5): asymmetric thrusts tip the
# quad onto arm tips while it scrapes along the floor.
_crawl_rng = np.random.default_rng(0)
_crawl_ctrl_seq = _crawl_rng.uniform(0.0, 0.55, size=(400, 4))
scenarios["crawl_random_thrust"] = (
    np.array([0, 0, 0.026, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], float),
    lambda t: _crawl_ctrl_seq[t],
)

# per-state qacc checks along FULL mj trajectories (arms enabled — the
# oracle now carries the arm-corner candidates)
for name, (q0s, ctrl) in scenarios.items():
    traj = mj_traj(m, q0s, steps=200, ctrl=ctrl)
    states = traj[::5]
    check_states(m, states, f"qacc[full] {name}")

# full-trajectory divergence: oracle vs FULL mj (arms enabled; noarm
# kept as the what-if-we-had-skipped-arms reference)
print()
for name, (q0s, ctrl) in scenarios.items():
    for label, model in (("full", m), ("noarm", m_noarm)):
        steps = 300 if name == "crawl_random_thrust" else 100
        mjt = mj_traj(model, q0s, steps=steps, ctrl=ctrl)
        # oracle _physics_step = ONE inner dt step: compare 1:1
        ours = oracle_traj(q0s, steps=steps, ctrl=ctrl)
        mjo = mjt
        dp = np.abs(mjo[:, :3] - ours[:, :3]).max()
        dq = np.abs(mjo[:, 3:7] - ours[:, 3:7]).max()
        print(f"traj {name} vs mj[{label}]: pos {dp:.3e} quat {dq:.3e}")
