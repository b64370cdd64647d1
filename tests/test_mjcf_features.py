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


def test_keyframes_oracle(tmp_path):
    """<keyframe><key>: stored snapshots match mjModel.key_*, and
    make_data(keyframe=...) reproduces mj_resetDataKeyframe dynamics."""
    import jax
    import jax.numpy as jnp
    import mujoco
    from mujoco_sim_tpu import engine

    xml = tmp_path / "keyed.xml"
    xml.write_text("""
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="2 2 0.1"/>
    <body pos="0 0 0.5"><freejoint/>
      <geom type="box" size="0.1 0.08 0.06" mass="1"/></body>
    <body pos="0.5 0 0.3">
      <joint name="h" type="hinge" axis="0 1 0" damping="0.2"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
    </body>
  </worldbody>
  <actuator><motor joint="h" gear="1.5"/></actuator>
  <keyframe>
    <key name="tossed" time="0.5"
         qpos="0.1 -0.05 0.8 0.9689124 0.2474040 0 0 0.4"
         qvel="1 0 2 0.5 0 0 -0.8" ctrl="0.3"/>
    <key name="rest" qpos="0 0 0.161 1 0 0 0 0"/>
  </keyframe>
</mujoco>""")
    mm = oracle_model(str(xml))
    m = load_model(str(xml))
    assert m.nkey == mm.nkey == 2
    np.testing.assert_allclose(np.asarray(m.key_qpos), mm.key_qpos,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.key_qvel), mm.key_qvel,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.key_time), mm.key_time,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.key_ctrl), mm.key_ctrl,
                               atol=1e-12)
    dd = mujoco.MjData(mm)
    mujoco.mj_resetDataKeyframe(mm, dd, 0)
    d = engine.make_data(m, keyframe="tossed")
    assert float(d.time) == dd.time
    step = jax.jit(engine.step)
    for _ in range(100):
        mujoco.mj_step(mm, dd)
        d = step(m, d)
    assert np.abs(dd.qpos - np.asarray(d.qpos)).max() < 1e-8


def test_frame_elements(tmp_path):
    """<frame>: a pure compile-time transform folded into its children
    (bodies/geoms/sites/joints), including nesting."""
    xml = tmp_path / "framed.xml"
    xml.write_text("""
<mujoco>
  <compiler angle="radian"/>
  <worldbody>
    <frame pos="0.5 0 1" euler="0 0.4 0">
      <geom name="g1" type="box" size=".1 .05 .02" pos="0.1 0 0"
            euler="0.2 0 0"/>
      <frame pos="0 0.3 0" euler="0.3 0 0">
        <body name="b1" pos="0.05 0 0.1">
          <joint name="j1" type="hinge" axis="0 1 0"/>
          <geom type="sphere" size="0.04" mass="1"/>
          <site name="s1" pos="0.02 0 0" euler="0 0 0.5"/>
        </body>
      </frame>
    </frame>
  </worldbody>
</mujoco>""")
    mm = oracle_model(str(xml))
    m = load_model(str(xml))
    assert m.nbody == mm.nbody
    np.testing.assert_allclose(np.asarray(m.body_pos), mm.body_pos,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.body_quat), mm.body_quat,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.geom_pos), mm.geom_pos,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.geom_quat), mm.geom_quat,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.site_pos), mm.site_pos,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.site_quat), mm.site_quat,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.jnt_axis), mm.jnt_axis,
                               atol=1e-12)


def test_contact_override_flag(tmp_path):
    """<flag override="enable"/>: o_margin/o_solref/o_solimp replace the
    mixed per-pair contact parameters (mjENBL_OVERRIDE)."""
    import jax
    import jax.numpy as jnp
    import mujoco
    from mujoco_sim_tpu import engine

    xml = tmp_path / "override.xml"
    xml.write_text("""
<mujoco>
  <option timestep="0.002" o_margin="0.01" o_solref="0.01 0.7"
          o_solimp="0.8 0.9 0.002 0.6 2">
    <flag override="enable"/>
  </option>
  <worldbody>
    <geom type="plane" size="2 2 0.1" solref="0.05 0.5" solimp="0.5 0.6 0.01"/>
    <body pos="0 0 0.3"><freejoint/>
      <geom type="box" size="0.1 0.08 0.06" mass="1"
            solref="0.04 2" margin="0.002"/></body>
  </worldbody>
</mujoco>""")
    mm = oracle_model(str(xml))
    dd = mujoco.MjData(mm)
    m = load_model(str(xml))
    d = engine.make_data(m)
    step = jax.jit(engine.step)
    dd.qvel[:] = [0.3, -0.2, -1.0, 1.0, 2.0, 0.5]
    d = d.replace(qvel=jnp.asarray(dd.qvel.copy(), d.qpos.dtype))
    for _ in range(300):
        mujoco.mj_step(mm, dd)
        d = step(m, d)
    assert np.abs(dd.qpos - np.asarray(d.qpos)).max() < 1e-8
