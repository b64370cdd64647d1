"""Parser feature coverage: defaults classes, euler seq, includes."""

import os

import numpy as np

from mujoco_sim_tpu.models.compile import load_model
from tests.oracle import oracle_model


def test_defaults_classes(tmp_path):
    xml = tmp_path / "defaults.xml"
    xml.write_text("""
<mujoco>
  <compiler angle="radian"/>
  <default>
    <joint damping="2.5" armature="0.01"/>
    <geom friction="0.8 0.01 0.001" density="500"/>
    <default class="heavy">
      <geom density="3000" rgba="1 0 0 1"/>
      <joint damping="9.0"/>
    </default>
  </default>
  <worldbody>
    <body name="a" pos="0 0 1">
      <joint name="ja" type="hinge" axis="0 1 0"/>
      <geom type="box" size=".1 .1 .1"/>
      <body name="b" pos="0 0 .5" childclass="heavy">
        <joint name="jb" type="hinge" axis="0 1 0"/>
        <geom type="sphere" size=".05"/>
        <geom type="sphere" size=".05" pos=".2 0 0" class="main"/>
      </body>
    </body>
  </worldbody>
</mujoco>""")
    mm = oracle_model(str(xml))
    m = load_model(str(xml))
    np.testing.assert_allclose(np.asarray(m.dof_damping), mm.dof_damping)
    np.testing.assert_allclose(np.asarray(m.dof_armature), mm.dof_armature)
    np.testing.assert_allclose(np.asarray(m.body_mass), mm.body_mass,
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(m.geom_friction), mm.geom_friction)


def test_euler_orientation_and_include(tmp_path):
    inc = tmp_path / "part.xml"
    inc.write_text("""
<mujoco>
  <worldbody>
    <body name="incl" pos="1 0 0.5">
      <joint type="free"/>
      <geom type="box" size=".05 .05 .05" euler="10 20 30"/>
    </body>
  </worldbody>
</mujoco>""")
    xml = tmp_path / "main.xml"
    xml.write_text("""
<mujoco>
  <compiler angle="degree" eulerseq="zyx"/>
  <worldbody>
    <body name="tilted" pos="0 0 1" euler="30 45 60">
      <joint type="free"/>
      <geom type="box" size=".1 .05 .02"/>
    </body>
  </worldbody>
  <include file="part.xml"/>
</mujoco>""")
    mm = oracle_model(str(xml))
    m = load_model(str(xml))
    assert m.nbody == mm.nbody == 3
    np.testing.assert_allclose(np.asarray(m.body_quat), mm.body_quat,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.geom_quat), mm.geom_quat,
                               atol=1e-12)
