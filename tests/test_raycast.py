"""Rangefinder (mj_ray) and joint/tendon limit sensors vs the oracle.

mj_ray semantics probed: ray from the site along its +Z axis; the
site's own body is excluded (bodyexclude); geoms with no material and
alpha=0 are skipped; miss returns -1.  Limit sensors read the limit
efc row's pos/vel/force when the limit is active and 0 otherwise.
"""

import jax
import jax.numpy as jnp
import numpy as np

import mujoco

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import compile_spec
from mujoco_sim_tpu.models.mjcf import parse_mjcf_string

RANGE_XML = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <geom name="ball" type="sphere" size="0.3" pos="2 0 0.5"/>
    <geom name="crate" type="box" size="0.2 0.3 0.4" pos="-2 0.2 0.4"
          euler="0 0 0.4"/>
    <geom name="pill" type="capsule" size="0.15 0.3" pos="0 2 0.6"
          euler="0.3 0 0"/>
    <geom name="can" type="cylinder" size="0.2 0.25" pos="0 -2 0.3"
          euler="0.2 0.1 0"/>
    <geom name="egg" type="ellipsoid" size="0.2 0.3 0.15" pos="1.5 1.5 0.3"/>
    <geom name="ghost" type="sphere" size="0.5" pos="0.5 0 0.5"
          rgba="1 0 0 0"/>
    <body name="scanner" pos="0 0 0.5">
      <freejoint/>
      <geom type="sphere" size="0.05" mass="0.2"/>
      <site name="down" pos="0 0 -0.02" euler="3.14159265 0 0"/>
      <site name="fwd" pos="0.06 0 0" euler="0 1.5707963 0"/>
      <site name="up" pos="0 0 0.06"/>
      <site name="diag" pos="0 0.05 0" euler="-0.9 0.3 0"/>
    </body>
  </worldbody>
  <sensor>
    <rangefinder name="r_down" site="down"/>
    <rangefinder name="r_fwd" site="fwd"/>
    <rangefinder name="r_up" site="up"/>
    <rangefinder name="r_diag" site="diag" cutoff="2.5"/>
  </sensor>
</mujoco>
"""


def _pair(xml):
    mo = mujoco.MjModel.from_xml_string(xml)
    do = mujoco.MjData(mo)
    m = engine.set_const(compile_spec(parse_mjcf_string(xml)))
    d = engine.make_data(m)
    return mo, do, m, d


def _sensordata(m, d, qpos, qvel, mo, do):
    do.qpos[:] = qpos
    do.qvel[:] = qvel
    mujoco.mj_forward(mo, do)
    d = d.replace(qpos=jnp.asarray(qpos, d.qpos.dtype),
                  qvel=jnp.asarray(qvel, d.qpos.dtype))
    d = engine.forward(m, d)
    return np.asarray(d.sensordata), do.sensordata.copy()


def test_rangefinder_primitives_oracle():
    mo, do, m, d = _pair(RANGE_XML)
    rng = np.random.default_rng(3)
    hit_miss = []
    for _ in range(25):
        qpos = np.zeros(7)
        qpos[:3] = rng.uniform([-2.5, -2.5, 0.2], [2.5, 2.5, 2.0])
        q = rng.standard_normal(4)
        qpos[3:] = q / np.linalg.norm(q)
        ours, oracle = _sensordata(m, d, qpos, np.zeros(6), mo, do)
        np.testing.assert_allclose(ours, oracle, atol=1e-5,
                                   err_msg=f"qpos={qpos}")
        hit_miss.extend((oracle >= 0).tolist())
    # the pose sweep must exercise both hits and misses to mean anything
    assert any(hit_miss) and not all(hit_miss)


def test_rangefinder_mesh_and_hfield():
    elev = " ".join(str(v) for v in
                    np.linspace(0, 1, 25).round(3))
    xml = f"""
    <mujoco>
      <asset>
        <hfield name="hf" nrow="5" ncol="5" size="1.5 1.5 0.6 0.1"
                elevation="{elev}"/>
        <mesh name="tet" vertex="0 0 0  0.4 0 0  0 0.4 0  0 0 0.4"/>
      </asset>
      <worldbody>
        <geom type="hfield" hfield="hf" pos="0 0 0"/>
        <geom type="mesh" mesh="tet" pos="1.0 -0.5 0.8"/>
        <body name="scanner" pos="0 0 1.5">
          <freejoint/>
          <geom type="sphere" size="0.05" mass="0.2"/>
          <site name="down" euler="3.14159265 0 0"/>
          <site name="diag" euler="2.6 0.4 0"/>
        </body>
      </worldbody>
      <sensor>
        <rangefinder name="r0" site="down"/>
        <rangefinder name="r1" site="diag"/>
      </sensor>
    </mujoco>
    """
    mo = mujoco.MjModel.from_xml_string(xml)
    do = mujoco.MjData(mo)
    m = engine.set_const(compile_spec(parse_mjcf_string(xml)))
    d = engine.make_data(m)
    rng = np.random.default_rng(5)
    for _ in range(15):
        qpos = np.zeros(7)
        qpos[:3] = rng.uniform([-1.2, -1.2, 0.7], [1.2, 1.2, 1.8])
        q = rng.standard_normal(4)
        qpos[3:] = q / np.linalg.norm(q)
        do.qpos[:] = qpos
        mujoco.mj_forward(mo, do)
        dd = d.replace(qpos=jnp.asarray(qpos, d.qpos.dtype))
        dd = engine.forward(m, dd)
        np.testing.assert_allclose(np.asarray(dd.sensordata),
                                   do.sensordata, atol=1e-5,
                                   err_msg=f"qpos={qpos}")


LIMIT_XML = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" range="-0.5 0.4"
             limited="true" margin="0.01" damping="0.05"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0" mass="1"/>
      <body pos="0.4 0 0">
        <joint name="j2" type="slide" axis="1 0 0" range="-0.1 0.1"
               limited="true" stiffness="4"/>
        <geom type="sphere" size="0.05" mass="0.3"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t1" limited="true" range="-0.3 0.35">
      <joint joint="j1" coef="0.7"/><joint joint="j2" coef="1.2"/>
    </fixed>
  </tendon>
  <sensor>
    <jointlimitpos name="s0" joint="j1"/>
    <jointlimitvel name="s1" joint="j1"/>
    <jointlimitfrc name="s2" joint="j1"/>
    <jointlimitpos name="s3" joint="j2"/>
    <jointlimitfrc name="s4" joint="j2"/>
    <tendonlimitpos name="s5" tendon="t1"/>
    <tendonlimitvel name="s6" tendon="t1"/>
    <tendonlimitfrc name="s7" tendon="t1"/>
  </sensor>
</mujoco>
"""


def test_limit_sensors_oracle():
    mo, do, m, d = _pair(LIMIT_XML)
    cases = [
        ([0.39, 0.0], [0.5, 0.0]),        # j1 near upper limit
        ([-0.499, 0.02], [-0.8, 0.1]),    # j1 at lower limit
        ([0.0, 0.0], [0.0, 0.0]),         # nothing active
        ([0.3, 0.095], [0.2, 0.4]),       # j2 limit + tendon near limit
        ([0.45, 0.12], [1.0, 0.5]),       # past limits (penetrating)
    ]
    for qpos, qvel in cases:
        ours, oracle = _sensordata(m, d, np.array(qpos), np.array(qvel),
                                   mo, do)
        np.testing.assert_allclose(ours, oracle, atol=1e-6,
                                   err_msg=f"qpos={qpos}")


def test_limit_sensors_in_rollout():
    """force values stay matched through a dynamic 300-step rollout."""
    mo, do, m, d = _pair(LIMIT_XML)
    do.qvel[:] = [2.0, 0.3]
    d = d.replace(qvel=jnp.asarray([2.0, 0.3], d.qpos.dtype))
    step = jax.jit(engine.step)
    worst = 0.0
    for _ in range(300):
        mujoco.mj_step(mo, do)
        d = step(m, d)
        mujoco.mj_forward(mo, do)
        df = engine.forward(m, d)
        worst = max(worst, float(np.abs(np.asarray(df.sensordata)
                                        - do.sensordata).max()))
    assert worst < 1e-6, worst
