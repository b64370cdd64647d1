"""Force/torque site sensors vs the oracle (the only sensor types the
reference surfaces, mj_sim.cpp:973-1014 / publish_sensor_data)."""

import jax
import mujoco
import numpy as np

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import load_model
from tests.oracle import oracle_model

XML = "tests/fixtures/ft_arm.xml"


def setup_module():
    with open(XML, "w") as f:
        f.write("""
<mujoco model="ft">
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="base">
      <geom type="box" size=".05 .05 .05" mass="1"/>
      <body name="link" pos="0 0 0.1">
        <joint name="j1" type="hinge" axis="0 1 0" damping="0.2"/>
        <site name="ft_site" pos="0 0 0"/>
        <geom type="box" size=".02 .02 .2" pos="0 0 .2" mass="1.5"/>
        <body name="tip" pos="0 0 0.4">
          <joint name="j2" type="hinge" axis="0 1 0" damping="0.1"/>
          <geom type="sphere" size=".04" mass="0.5"/>
        </body>
      </body>
    </body>
  </worldbody>
  <sensor>
    <force site="ft_site"/>
    <torque site="ft_site"/>
  </sensor>
</mujoco>""")


def test_force_torque_vs_oracle(rng):
    mm = oracle_model(XML)
    dd = mujoco.MjData(mm)
    m = load_model(XML)
    assert m.nsensor == 2 and m.nsensordata == 6

    for _ in range(3):
        qpos = rng.standard_normal(2) * 0.6
        qvel = rng.standard_normal(2) * 0.4
        dd.qpos[:] = qpos
        dd.qvel[:] = qvel
        mujoco.mj_forward(mm, dd)

        d = engine.make_data(m)
        d = d.replace(qpos=d.qpos.at[:].set(qpos),
                      qvel=d.qvel.at[:].set(qvel))
        d = jax.jit(engine.forward)(m, d)
        np.testing.assert_allclose(np.asarray(d.sensordata), dd.sensordata,
                                   atol=1e-6, err_msg="force/torque")


def test_force_torque_with_contact(rng):
    """Sensor parity when the subtree rests on the floor (contact forces
    transmitted through the cut)."""
    xml = "tests/fixtures/ft_contact.xml"
    with open(xml, "w") as f:
        f.write("""
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <geom name="floor" size="0 0 .05" type="plane"/>
    <body name="base" pos="0 0 0.4">
      <body name="leg" pos="0 0 0">
        <joint name="slide" type="slide" axis="0 0 1" damping="5"/>
        <site name="ankle" pos="0 0 -0.2"/>
        <geom type="box" size=".05 .05 .2" mass="2"/>
        <body name="foot" pos="0 0 -0.25">
          <joint name="ankle_j" type="hinge" axis="0 1 0" damping="1"/>
          <geom type="box" size=".1 .06 .03" mass="1"/>
        </body>
      </body>
    </body>
  </worldbody>
  <sensor>
    <force site="ankle"/>
    <torque site="ankle"/>
  </sensor>
</mujoco>""")
    mm = oracle_model(xml)
    dd = mujoco.MjData(mm)
    m = load_model(xml)

    # push the foot sideways+down with an external wrench while in floor
    # contact: the cut must transmit the reaction (tests the contact and
    # xfrc correction terms of the sensor formula)
    dd.xfrc_applied[3] = [20.0, 0, -50.0, 0, 2.0, 0]  # body 'foot'
    for _ in range(600):
        mujoco.mj_step(mm, dd)
    mujoco.mj_forward(mm, dd)

    d = engine.make_data(m)
    foot = m.names.body_id("foot")
    # [torque, force] layout in our Data vs [force, torque] in mjData
    d = d.replace(
        qpos=d.qpos.at[:].set(dd.qpos),
        qvel=d.qvel.at[:].set(dd.qvel),
        xfrc_applied=d.xfrc_applied.at[foot, :3].set([0, 2.0, 0])
                                   .at[foot, 3:].set([20.0, 0, -50.0]))
    d = jax.jit(engine.forward)(m, d)
    assert np.abs(dd.sensordata).max() > 1.0  # non-trivial reading
    np.testing.assert_allclose(np.asarray(d.sensordata), dd.sensordata,
                               atol=0.7, rtol=0.05)
