"""Dump MuJoCo efc internals for one contact-rich state and verify we can
reproduce efc_force by solving the dual QP ourselves."""
import numpy as np
import mujoco

ASSETS = "/root/reference/gym_reinmav/envs/mujoco/assets"
m = mujoco.MjModel.from_xml_string(open(f"{ASSETS}/quadrotor_ground.xml").read())
m.opt.jacobian = mujoco.mjtJacobian.mjJAC_DENSE
d = mujoco.MjData(m)

# A settling tilted state (from the earlier probe, inner step 11-ish)
q0 = np.array([0, 0, 0.06, 0.996, 0.05, 0.05, 0, 0.3, 0, 0, 0, 0, 0], float)
q0[3:7] /= np.linalg.norm(q0[3:7])
d.qpos[:] = q0[:7]; d.qvel[:] = q0[7:]
for _ in range(11):
    d.ctrl[:] = 0
    mujoco.mj_step(m, d)

# one mj_forward at the current state to populate efc arrays
mujoco.mj_forward(m, d)
ncon, nefc, nv = d.ncon, d.nefc, m.nv
print("ncon", ncon, "nefc", nefc, "nv", nv)
for i in range(ncon):
    c = d.contact[i]
    print(f"contact {i}: pos={np.round(c.pos,6)} dist={c.dist:.8f}")
    print("  frame:", np.round(np.array(c.frame).reshape(3,3),6))
    print("  mu:", c.friction[:2], "solref:", c.solref, "solimp:", c.solimp)
J = d.efc_J.reshape(nefc, nv).copy()
print("efc_J:"); print(np.round(J, 6))
print("efc_pos:", d.efc_pos[:nefc])
print("efc_margin:", d.efc_margin[:nefc])
print("efc_diagApprox:", d.efc_diagApprox[:nefc])
print("efc_KBIP:", d.efc_KBIP[:nefc])
print("efc_D:", d.efc_D[:nefc])
print("efc_R:", d.efc_R[:nefc])
print("efc_vel:", d.efc_vel[:nefc])
print("efc_aref:", d.efc_aref[:nefc])
print("efc_b:", d.efc_b[:nefc])
print("efc_force:", d.efc_force[:nefc])
print("qacc_smooth:", d.qacc_smooth)
print("qacc:", d.qacc)
print("qvel:", d.qvel)
print("qM dense:")
M = np.zeros((nv, nv)); mujoco.mj_fullM(m, M, d.qM)
print(np.round(M, 8))

# Dual QP check: min .5 f'(A+R)f + f'(J qacc_smooth - aref), f >= 0
Minv_Jt = np.linalg.solve(M, J.T)
A = J @ Minv_Jt
R = np.diag(d.efc_R[:nefc])
b = J @ d.qacc_smooth - d.efc_aref[:nefc]
AR = A + R
# projected Gauss-Seidel
f = np.zeros(nefc)
for it in range(20000):
    for i in range(nefc):
        f[i] = max(0.0, f[i] - (AR[i] @ f + b[i]) / AR[i, i])
print("PGS f:", f)
print("mj  f:", d.efc_force[:nefc])
print("max |diff|:", np.abs(f - d.efc_force[:nefc]).max())
qacc_mine = d.qacc_smooth + Minv_Jt @ f
print("qacc diff:", np.abs(qacc_mine - d.qacc).max())

# verify aref formula: aref = -k*imp*pos - b*vel (KBIP = K,B,imp,?)
print("KBIP row0:", d.efc_KBIP[0])
k, bb, imp, ip = d.efc_KBIP[0]
print("aref calc:", -k*imp*d.efc_pos[0] - bb*d.efc_vel[0], "vs", d.efc_aref[0])
# verify R formula: (1-imp)/imp * diagApprox
print("R calc:", (1-imp)/imp*d.efc_diagApprox[0], "vs", d.efc_R[0])
# diagApprox vs true diag(A)
print("diagA:", np.round(np.diag(A),4)); print("diagApprox:", np.round(d.efc_diagApprox[:nefc],4))
