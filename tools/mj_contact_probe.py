"""Probe MuJoCo's contact generation + solver on the divergence scenarios.

Prints, per outer step: active contacts (geom names, pos, dist, frame),
efc forces, and solver options. Dev tool for the coupled-contact work.
"""
import numpy as np
import mujoco

ASSETS = "/root/reference/gym_reinmav/envs/mujoco/assets"
GROUND_XML = f"{ASSETS}/quadrotor_ground.xml"

m = mujoco.MjModel.from_xml_string(open(GROUND_XML).read())
print("solver:", m.opt.solver, "(1=CG,2=Newton?)", "iterations:", m.opt.iterations,
      "cone:", m.opt.cone, "(0=pyramidal,1=elliptic)", "impratio:", m.opt.impratio,
      "tolerance:", m.opt.tolerance)
print("geom names:", [mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, i) for i in range(m.ngeom)])
print("geom condim:", m.geom_condim)
print("geom friction:", m.geom_friction)
print("geom solref:", m.geom_solref[:2], "solimp:", m.geom_solimp[:2])
print("geom margin:", m.geom_margin.max(), "gap:", m.geom_gap.max())

d = mujoco.MjData(m)
q0 = np.array([0, 0, 0.06, 0.996, 0.05, 0.05, 0, 0.3, 0, 0, 0, 0, 0], float)
q0[3:7] /= np.linalg.norm(q0[3:7])
d.qpos[:] = q0[:7]; d.qvel[:] = q0[7:]
mujoco.mj_forward(m, d)
for step in range(40):  # inner steps (dt=0.01 each)
    d.ctrl[:] = 0
    mujoco.mj_step(m, d)
    if d.ncon and step % 2 == 0:
        print(f"--- inner step {step+1} z={d.qpos[2]:.5f} ncon={d.ncon}")
        for i in range(d.ncon):
            c = d.contact[i]
            g1 = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, c.geom1)
            g2 = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, c.geom2)
            print(f"  {g1}|{g2} pos={np.round(c.pos,5)} dist={c.dist:.6f} dim={c.dim}"
                  f" efc_adr={c.efc_address}")
