"""Probe mujoco 3.10's plane-convex (plane-MESH) contact emission rule.

The oracle emits at most 3 contacts for a mesh resting on a plane
(observed: square base -> 3 of the 4 corners).  This probe drops meshes
with square/pentagon/hexagon bases onto the plane in several poses and
prints which vertices mjc_PlaneConvex selects, to pin the selection rule
for ops/collision._plane_mesh parity.
"""
import numpy as np, mujoco

def probe(name, verts, pos, euler=(0,0,0)):
    v = " ".join(f"{x} {y} {z}" for x, y, z in verts)
    xml = f"""
<mujoco><option timestep="0.002"/>
<asset><mesh name="m" vertex="{v}"/></asset>
<worldbody><geom type="plane" size="0 0 .05"/>
<body pos="{pos[0]} {pos[1]} {pos[2]}" euler="{euler[0]} {euler[1]} {euler[2]}"><freejoint/>
<geom type="mesh" mesh="m" mass="0.1"/></body></worldbody></mujoco>"""
    mm = mujoco.MjModel.from_xml_string(xml)
    dd = mujoco.MjData(mm)
    mujoco.mj_forward(mm, dd)
    print(f"== {name} pos={pos} euler={euler}: ncon={dd.ncon}")
    for i in range(dd.ncon):
        c = dd.contact[i]
        print("   pos", np.round(c.pos, 5), "dist", f"{float(c.dist):.6f}")

# square base prism, resting flat, slightly penetrating
sq = [(x, y, z) for x in (-.03,.03) for y in (-.03,.03) for z in (-.02,.02)]
probe("square flat", sq, (0, 0, 0.0195))
probe("square tilted x", sq, (0, 0, 0.0199), (0.5, 0, 0))
probe("square tilted xy", sq, (0, 0, 0.0199), (0.4, 0.3, 0))
# pentagon base
a = np.arange(5) * 2*np.pi/5 + 0.3
pent = [(0.03*np.cos(t), 0.03*np.sin(t), -0.02) for t in a] + \
       [(0.02*np.cos(t), 0.02*np.sin(t), 0.02) for t in a]
probe("pentagon flat", pent, (0, 0, 0.0195))
# hexagon base
a = np.arange(6) * np.pi/3
hexa = [(0.03*np.cos(t), 0.03*np.sin(t), -0.02) for t in a] + \
       [(0.02*np.cos(t), 0.02*np.sin(t), 0.02) for t in a]
probe("hexagon flat", hexa, (0, 0, 0.0195))
probe("hexagon tilted", hexa, (0, 0, 0.0199), (0.6, 0, 0))
# deep vertex-first (tilted heavily: single corner down)
probe("square corner-down", sq, (0, 0, 0.035), (35, 20, 0))

# ---- rule identification: tiny controlled tilts + asymmetric bases
print("\n-- mesh_vert order (mujoco reorders for hull) --")
def probe_verts(name, verts, pos, euler=(0,0,0)):
    v = " ".join(f"{x} {y} {z}" for x, y, z in verts)
    xml = f"""
<mujoco><asset><mesh name="m" vertex="{v}"/></asset>
<worldbody><geom type="plane" size="0 0 .05"/>
<body pos="{pos[0]} {pos[1]} {pos[2]}" euler="{euler[0]} {euler[1]} {euler[2]}"><freejoint/>
<geom type="mesh" mesh="m" mass="0.1"/></body></worldbody></mujoco>"""
    mm = mujoco.MjModel.from_xml_string(xml)
    dd = mujoco.MjData(mm)
    mujoco.mj_forward(mm, dd)
    mv = mm.mesh_vert.copy()
    print(f"== {name}: stored mesh_vert base ring order:")
    base = mv[np.abs(mv[:,2] - mv[:,2].min()) < 1e-9]
    print(np.round(base, 4).tolist())
    print(f"   ncon={dd.ncon}")
    for i in range(dd.ncon):
        c = dd.contact[i]
        print("   pos", np.round(c.pos, 5), "dist", f"{float(c.dist):.7f}")

sq = [(x, y, z) for x in (-.03,.03) for y in (-.03,.03) for z in (-.02,.02)]
probe_verts("square microtilt +x", sq, (0, 0, 0.01999), (0.02, 0, 0))
probe_verts("square microtilt -x", sq, (0, 0, 0.01999), (-0.02, 0, 0))
a = np.arange(6) * np.pi/3
hexa = [(0.03*np.cos(t), 0.03*np.sin(t), -0.02) for t in a] + \
       [(0.02*np.cos(t), 0.02*np.sin(t), 0.02) for t in a]
probe_verts("hex microtilt +y", hexa, (0, 0, 0.01999), (0.02, 0, 0))
# asymmetric base: a squashed quad (kite)
kite = [(-0.03,-0.01,-0.02),(0.04,-0.02,-0.02),(0.03,0.03,-0.02),(-0.02,0.02,-0.02),
        (-0.02,-0.005,0.02),(0.02,-0.01,0.02),(0.02,0.02,0.02),(-0.01,0.01,0.02)]
probe_verts("kite flat", kite, (0, 0, 0.01999))
