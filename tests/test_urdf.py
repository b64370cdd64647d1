"""URDF importer vs the mujoco oracle's native URDF loader."""

import mujoco
import numpy as np

from mujoco_sim_tpu.models.urdf import load_urdf, compile_urdf
from mujoco_sim_tpu.models.compile import compile_spec

URDF = "tests/fixtures/two_link.urdf"


def setup_module():
    with open(URDF, "w") as f:
        f.write("""<?xml version="1.0"?>
<robot name="twolink">
  <link name="base">
    <inertial>
      <origin xyz="0 0 0.05"/>
      <mass value="2.0"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <origin xyz="0 0 0.05"/>
      <geometry><box size="0.2 0.2 0.1"/></geometry>
    </collision>
  </link>
  <link name="upper">
    <inertial>
      <origin xyz="0 0 0.15"/>
      <mass value="1.0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.002" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <origin xyz="0 0 0.15"/>
      <geometry><cylinder radius="0.03" length="0.3"/></geometry>
    </collision>
  </link>
  <link name="lower">
    <inertial>
      <origin xyz="0 0 0.1"/>
      <mass value="0.5"/>
      <inertia ixx="0.005" iyy="0.005" izz="0.001" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <origin xyz="0 0 0.1"/>
      <geometry><sphere radius="0.04"/></geometry>
    </collision>
  </link>
  <joint name="shoulder" type="revolute">
    <parent link="base"/>
    <child link="upper"/>
    <origin xyz="0 0 0.1" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-1.5" upper="1.5" effort="10" velocity="2"/>
    <dynamics damping="0.4"/>
  </joint>
  <joint name="elbow" type="continuous">
    <parent link="upper"/>
    <child link="lower"/>
    <origin xyz="0 0 0.3" rpy="0.1 0 0"/>
    <axis xyz="0 1 0"/>
    <dynamics damping="0.2"/>
  </joint>
  <joint name="elbow_mimic_target" type="revolute">
    <parent link="base"/>
    <child link="flap"/>
    <origin xyz="0.2 0 0.1"/>
    <axis xyz="1 0 0"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
    <mimic joint="shoulder" multiplier="0.5" offset="0.1"/>
  </joint>
  <link name="flap">
    <inertial>
      <mass value="0.1"/>
      <inertia ixx="0.001" iyy="0.001" izz="0.001" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><geometry><box size="0.05 0.05 0.01"/></geometry></collision>
  </link>
</robot>
""")


def test_urdf_structure():
    spec = load_urdf(URDF, collision_level=1)
    m = compile_spec(spec)
    # wrapper(+fused base) + upper + lower + flap (+world)
    assert m.nbody == 5
    assert m.names.body_id("twolink") == 1
    assert m.names.joint_id("shoulder") >= 0
    assert m.names.joint_id("elbow") >= 0
    # mimic -> joint equality with polycoef [offset, multiplier, ...]
    assert m.neq == 1
    np.testing.assert_allclose(np.asarray(m.eq_data[0][:2]), [0.1, 0.5])
    # limits preserved (revolute limited, continuous not)
    j = m.names.joint_id("shoulder")
    assert bool(m.jnt_limited[j])
    np.testing.assert_allclose(np.asarray(m.jnt_range[j]), [-1.5, 1.5])
    assert not bool(m.jnt_limited[m.names.joint_id("elbow")])


def test_urdf_vs_mujoco_oracle():
    """mujoco loads URDF natively: masses/structure should agree."""
    mm = mujoco.MjModel.from_xml_path(URDF)
    m = compile_urdf(URDF)
    # mujoco's URDF loader does not add the robot wrapper body the reference
    # adds, so compare per-link via names
    # root link "base" fuses into the wrapper on both sides
    for link in ("upper", "lower", "flap"):
        mid = m.names.body_id(link)
        oid = mujoco.mj_name2id(mm, mujoco.mjtObj.mjOBJ_BODY, link)
        assert mid >= 0 and oid >= 0
        np.testing.assert_allclose(
            float(m.body_mass[mid]), float(mm.body_mass[oid]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(m.body_inertia[mid]), mm.body_inertia[oid],
            rtol=1e-5, atol=1e-12)
    # joint damping carried over
    j = m.names.joint_id("shoulder")
    assert float(m.dof_damping[m.layout.jnt_dofadr[j]]) == 0.4


def test_urdf_steps():
    m = compile_urdf(URDF)
    import jax
    from mujoco_sim_tpu import engine
    d = engine.make_data(m)
    step = jax.jit(engine.step)
    for _ in range(20):
        d = step(m, d)
    assert np.isfinite(np.asarray(d.qpos)).all()


def test_compile_output_is_relocatable(tmp_path):
    """`python -m mujoco_sim_tpu compile` output: meshes are COPIED next
    to the emitted MJCF (assets/) and referenced relatively, so the whole
    output directory can be moved and still load — mirroring the
    reference compiler's stl/ copy step
    (/root/reference/src/mujoco_compile.cpp:317-399)."""
    import os
    import shutil
    import jax
    from mujoco_sim_tpu.models.compile import load_model
    from mujoco_sim_tpu import engine
    from tests.test_mesh_contacts import write_box_stl

    src = tmp_path / "src"
    src.mkdir()
    write_box_stl(str(src / "part.stl"))
    with open(src / "meshbot.urdf", "w") as f:
        f.write("""<?xml version="1.0"?>
<robot name="meshbot">
  <link name="base">
    <inertial><mass value="1.0"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><geometry><box size="0.1 0.1 0.1"/></geometry></collision>
  </link>
  <link name="tool">
    <inertial><mass value="0.5"/>
      <inertia ixx="0.005" iyy="0.005" izz="0.005" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><geometry><mesh filename="package://pkg/part.stl"/></geometry>
    </collision>
  </link>
  <joint name="wrist" type="revolute">
    <parent link="base"/><child link="tool"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="5" velocity="2"/>
  </joint>
</robot>""")

    out = tmp_path / "out"
    out.mkdir()
    from mujoco_sim_tpu.__main__ import _compile
    _compile([str(src / "meshbot.urdf"), str(out / "meshbot.xml")])
    assert (out / "assets" / "part.stl").exists()

    # move the whole output dir; the original source tree goes away
    moved = tmp_path / "moved"
    shutil.move(str(out), str(moved))
    shutil.rmtree(src)
    m = load_model(str(moved / "meshbot.xml"))
    d = jax.jit(engine.step)(m, engine.make_data(m))
    assert np.isfinite(np.asarray(d.qpos)).all()
