"""Probe mujoco 3.10 native-CCD emission for deep cylinder-vs-mesh contact.

The hsrb4s wheel sits 5.6 cm inside its base hull; the oracle emits 3
points per wheel (segment ends + a near-duplicate).  Learn the pattern on
a clean fixture: mesh cube, cylinder side embedded in its top face.
"""
import sys

import numpy as np
import mujoco

from tests.test_mesh_contacts import write_box_stl

write_box_stl("/tmp/cube.stl", half=0.2)

XML = """
<mujoco>
  <asset><mesh name="cube" file="/tmp/cube.stl"/></asset>
  <worldbody>
    <body name="block" pos="0 0 0"><freejoint/>
      <geom type="mesh" mesh="cube"/></body>
    <body name="cyl" pos="{pos}" euler="{euler}"><freejoint/>
      <geom type="cylinder" size="0.04 0.015"/></body>
  </worldbody>
</mujoco>
"""


def run(name, pos, euler="90 0 0"):
    with open("/tmp/probe_cyl.xml", "w") as f:
        f.write(XML.format(pos=" ".join(map(str, pos)), euler=euler))
    mm = mujoco.MjModel.from_xml_path("/tmp/probe_cyl.xml")
    dd = mujoco.MjData(mm)
    mujoco.mj_forward(mm, dd)
    print(f"=== {name} pos={pos} euler={euler}: ncon={dd.ncon}")
    for i in range(dd.ncon):
        c = dd.contact[i]
        print(f"  dist={c.dist:+.6f} pos={np.round(c.pos, 5)} "
              f"n={np.round(c.frame[:3], 4)}")


# cube half=0.2 top at z=0.2; cylinder axis along y (euler 90 0 0),
# radius 0.04 -> side contact.  depth = 0.2 + 0.04 - z
run("side-shallow", [0, 0, 0.235])           # depth 5 mm
run("side-deep", [0, 0, 0.19])               # depth 50 mm
run("side-deep-off", [0.03, 0.05, 0.19])     # depth 50 mm off-center
run("cap-deep", [0, 0, 0.205], euler="0 0 0")  # cap contact depth 50mm
run("tilted-deep", [0, 0, 0.19], euler="90 0 10")
run("side-very-deep", [0, 0, 0.17])          # depth 70 mm
