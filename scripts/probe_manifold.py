"""Probe: exact_pair_contacts vs the mujoco 3.10 oracle on deep cube pairs.

Builds a two-cube scene at configurable poses, runs one oracle mj_forward
to dump its contacts, and calls ops/manifold.exact_pair_contacts directly
with the compiled hull tables at the same poses.
"""
import sys

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import mujoco  # noqa: E402

from mujoco_sim_tpu.models.compile import load_model  # noqa: E402
from mujoco_sim_tpu.ops.manifold import exact_pair_contacts  # noqa: E402
from tests.test_mesh_contacts import write_box_stl  # noqa: E402

write_box_stl("tests/fixtures/cube.stl")

XML = """
<mujoco>
  <asset><mesh name="cube" file="cube.stl"/></asset>
  <worldbody>
    <body name="b1" pos="0 0 0"><freejoint/>
      <geom type="mesh" mesh="cube"/></body>
    <body name="b2" pos="{pos}" quat="{quat}"><freejoint/>
      <geom type="mesh" mesh="cube"/></body>
  </worldbody>
</mujoco>
"""


def quat_from_axis(axis, angle):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])


def run_case(name, pos, quat):
    xml = XML.format(pos=" ".join(map(str, pos)),
                     quat=" ".join(map(str, quat)))
    path = "/tmp/probe_manifold.xml"
    with open(path, "w") as f:
        f.write(xml)
    mm = mujoco.MjModel.from_xml_path(path)
    dd = mujoco.MjData(mm)
    mujoco.mj_forward(mm, dd)
    print(f"=== {name}: pos={pos} quat={np.round(quat,4)}")
    print(f"oracle ncon={dd.ncon}")
    for i in range(dd.ncon):
        c = dd.contact[i]
        print(f"  oracle dist={c.dist:+.6f} pos={np.round(c.pos,4)} "
              f"n={np.round(c.frame[:3],4)}")

    m = load_model(path)
    lay = m.layout
    h1 = int(lay.geom_hullid[0])
    h2 = int(lay.geom_hullid[1])
    dtype = np.float64

    nh = np.asarray(m.mesh_vert_hi).shape[0]
    tables = dict(vert=np.asarray(m.mesh_vert_hi, dtype),
                  vmask=np.asarray(m.mesh_vert_hi_mask, dtype),
                  fplane=np.asarray(m.mesh_fplane, dtype),
                  fmask=np.asarray(m.mesh_fmask, dtype),
                  fpoly=np.asarray(m.mesh_fpoly, dtype),
                  hedge=np.asarray(m.mesh_hedge, dtype),
                  hemask=np.asarray(m.mesh_hedge_mask, dtype))

    def tabs(h):
        moh = np.zeros(nh, dtype)
        moh[h] = 1.0
        return moh, np.asarray(m.mesh_cyl[h], dtype)

    def rot(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])

    pA = np.zeros(3)
    RA = np.eye(3)
    pB = np.asarray(pos, dtype)
    RB = rot(np.asarray(quat, dtype) / np.linalg.norm(quat))
    TA = tabs(h1)
    TB = tabs(h2)
    d4, p4, n1, ok, _sep = jax.jit(exact_pair_contacts)(
        pA, RA, *TA, pB, RB, *TB, np.asarray(True), tables)
    d4, p4, n1 = np.asarray(d4), np.asarray(p4), np.asarray(n1)
    print(f"ours ok={bool(ok)} n={np.round(n1,4)}")
    for i in range(4):
        if d4[i] < 1e8:
            print(f"  ours   dist={d4[i]:+.6f} pos={np.round(p4[i],4)}")
    print()


# cube half extent = 0.1 (write_box_stl default)
cases = {
    "face-face-shallow": (run_case, [0.02, -0.01, 0.195], [1, 0, 0, 0]),
    "face-face-deep": (run_case, [0.03, 0.02, 0.15], [1, 0, 0, 0]),
    "face-face-offset-deep": (run_case, [0.12, 0.08, 0.15], [1, 0, 0, 0]),
    "vertex-face-deep": (run_case, [0.0, 0.0, 0.25],
                         quat_from_axis([1, 1, 0], np.arccos(1/np.sqrt(3)))),
    "edge-face-deep": (run_case, [0.0, 0.0, 0.22],
                       quat_from_axis([1, 0, 0], np.pi / 4)),
    "edge-edge": (run_case, [0.0, 0.19, 0.19],
                  quat_from_axis([0, 0, 1], np.pi / 4)),
    "twist-deep": (run_case, [0.0, 0.0, 0.15],
                   quat_from_axis([0, 0, 1], np.pi / 4)),
}

sel = sys.argv[1:] if len(sys.argv) > 1 else cases.keys()
for k in sel:
    fn, pos, quat = cases[k]
    fn(k, pos, quat)
