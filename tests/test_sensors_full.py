"""Full sensor surface vs the oracle (mj_sensorPos/Vel/Acc).

The reference registers only FORCE/TORQUE publishers (mj_sim.cpp:973-1014)
but its libmujoco backend evaluates the whole mjtSensor set for arbitrary
user worlds; this pins every supported type (joint/tendon/actuator state,
frame sensors on site/geom/body/xbody, IMU triplet, magnetometer, touch
with zone test, subtree com/linvel/angmom, clock) to mj_step trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import compile_spec
from mujoco_sim_tpu.models.mjcf import parse_mjcf_string

XML = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="2 2 0.1"/>
    <body name="base" pos="0 0 0.3">
      <freejoint name="fj"/>
      <geom name="bx" type="box" size="0.1 0.08 0.06" mass="1"/>
      <site name="s_touch" type="box" pos="0 0 -0.05" size="0.12 0.1 0.03"/>
      <site name="s_imu" pos="0.02 0.01 0.03" euler="0.2 0.1 0.3"/>
      <body name="arm" pos="0.1 0 0.1">
        <joint name="hinge1" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom name="cap" type="capsule" size="0.02" fromto="0 0 0 0.2 0 0"
              mass="0.3"/>
        <body name="wrist" pos="0.2 0 0">
          <joint name="ball1" type="ball" damping="0.05"/>
          <geom type="sphere" size="0.03" mass="0.1"/>
          <site name="s_tip"/>
        </body>
      </body>
    </body>
  </worldbody>
  <tendon><fixed name="t1"><joint joint="hinge1" coef="1.5"/></fixed></tendon>
  <actuator><motor name="mot" joint="hinge1" gear="2"/></actuator>
  <sensor>
    <jointpos name="jp" joint="hinge1"/>
    <jointvel name="jv" joint="hinge1"/>
    <ballquat name="bq" joint="ball1"/>
    <ballangvel name="bav" joint="ball1"/>
    <tendonpos name="tp" tendon="t1"/>
    <tendonvel name="tv" tendon="t1"/>
    <actuatorpos name="ap" actuator="mot"/>
    <actuatorvel name="av" actuator="mot"/>
    <actuatorfrc name="af" actuator="mot"/>
    <framepos name="fps" objtype="site" objname="s_tip"/>
    <framequat name="fqs" objtype="site" objname="s_imu"/>
    <framexaxis name="fxa" objtype="geom" objname="cap"/>
    <framezaxis name="fza" objtype="xbody" objname="wrist"/>
    <framelinvel name="flv" objtype="site" objname="s_tip"/>
    <frameangvel name="fav" objtype="body" objname="arm"/>
    <framepos name="fpb" objtype="body" objname="arm"/>
    <framequat name="fqb" objtype="body" objname="arm"/>
    <framepos name="rfp" objtype="site" objname="s_tip"
              reftype="body" refname="arm"/>
    <framequat name="rfq" objtype="xbody" objname="wrist"
               reftype="site" refname="s_imu"/>
    <framexaxis name="rfx" objtype="geom" objname="cap"
                reftype="xbody" refname="base"/>
    <framelinvel name="rflv" objtype="site" objname="s_tip"
                 reftype="xbody" refname="base"/>
    <frameangvel name="rfav" objtype="body" objname="wrist"
                 reftype="site" refname="s_imu"/>
    <gyro name="gy" site="s_imu"/>
    <velocimeter name="vm" site="s_imu"/>
    <accelerometer name="ac" site="s_imu"/>
    <magnetometer name="mg" site="s_imu"/>
    <touch name="tc" site="s_touch"/>
    <subtreecom name="sc" body="base"/>
    <subtreelinvel name="sl" body="base"/>
    <subtreeangmom name="sa" body="base"/>
    <clock name="ck"/>
    <force name="fo" site="s_tip"/>
    <torque name="to" site="s_tip"/>
  </sensor>
</mujoco>
"""


def _pair():
    mo = mujoco.MjModel.from_xml_string(XML)
    do = mujoco.MjData(mo)
    m = engine.set_const(compile_spec(parse_mjcf_string(XML)))
    d = engine.make_data(m)
    return mo, do, m, d


def test_inertial_and_geom_frames_match_oracle():
    """single-geom body iquat keeps the geom frame (no eigen gauge), and
    fromto geom quats map +z to the NEGATIVE segment direction."""
    mo, _, m, _ = _pair()
    np.testing.assert_allclose(np.asarray(m.body_iquat), mo.body_iquat,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.body_inertia), mo.body_inertia,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.geom_quat), mo.geom_quat,
                               atol=1e-12)


def test_all_sensors_vs_oracle_trajectory():
    mo, do, m, d = _pair()
    rng = np.random.default_rng(0)
    qv = 0.3 * rng.standard_normal(mo.nv)
    do.qvel[:] = qv
    do.ctrl[:] = [0.4]
    do.qpos[3:7] = [0.9, 0.2, -0.3, 0.1]
    do.qpos[3:7] /= np.linalg.norm(do.qpos[3:7])
    do.qpos[8:12] = [0.95, 0.1, 0.2, -0.15]
    do.qpos[8:12] /= np.linalg.norm(do.qpos[8:12])
    d = d.replace(qpos=jnp.asarray(do.qpos.copy(), d.qpos.dtype),
                  qvel=jnp.asarray(qv, d.qpos.dtype),
                  ctrl=jnp.asarray([0.4], d.qpos.dtype))
    step = jax.jit(engine.step)
    for _ in range(200):          # free fall, impact, settle on the plane
        mujoco.mj_step(mo, do)
        d = step(m, d)
    mine = np.asarray(d.sensordata)
    failures = []
    for i in range(mo.nsensor):
        name = mujoco.mj_id2name(mo, mujoco.mjtObj.mjOBJ_SENSOR, i)
        a0, dim = mo.sensor_adr[i], mo.sensor_dim[i]
        a, b = mine[a0:a0 + dim], do.sensordata[a0:a0 + dim]
        # force-class sensors amplify the tiny trajectory drift; compare
        # with a relative band on top of the absolute one
        tol = 1e-6 + 1e-5 * np.abs(b).max()
        if np.abs(a - b).max() > tol:
            failures.append((name, a, b))
    assert not failures, failures
    assert float(d.sensordata[mo.sensor_adr[-3]]) != 0.0  # clock advanced
    # touch saw the box resting on the plane
    tc = mo.sensor_adr[[mujoco.mj_id2name(
        mo, mujoco.mjtObj.mjOBJ_SENSOR, i)
        for i in range(mo.nsensor)].index("tc")]
    assert do.sensordata[tc] > 1.0 and mine[tc] > 1.0


def test_cutoff_clamp():
    xml = XML.replace('<jointpos name="jp" joint="hinge1"/>',
                      '<jointpos name="jp" joint="hinge1" cutoff="0.01"/>')
    mo = mujoco.MjModel.from_xml_string(xml)
    do = mujoco.MjData(mo)
    m = engine.set_const(compile_spec(parse_mjcf_string(xml)))
    d = engine.make_data(m)
    do.qpos[7] = 0.5                       # hinge well beyond the cutoff
    mujoco.mj_forward(mo, do)
    d = d.replace(qpos=jnp.asarray(do.qpos.copy(), d.qpos.dtype))
    d = engine.forward(m, d)
    jp = mo.sensor_adr[0]
    assert abs(float(d.sensordata[jp]) - 0.01) < 1e-12
    assert abs(do.sensordata[jp] - 0.01) < 1e-12


def test_unknown_sensor_raises():
    # user sensors need a callback host-side; they stay unsupported
    xml = XML.replace("<clock name=\"ck\"/>",
                      "<user name=\"u\" dim=\"1\"/>")
    with pytest.raises(ValueError, match="not supported"):
        parse_mjcf_string(xml)
