"""Actuator pipeline vs the oracle (mj_fwdActuation + act integration).

The reference drives robots through ros_control effort PIDs, but its
libmujoco backend supports the full <actuator> MJCF surface for arbitrary
user worlds (SURVEY §2.2 'implicit in mj_step1/mj_step2'); these tests pin
our normalized gain/bias/dyn formulation to mj_step trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import compile_spec
from mujoco_sim_tpu.models.mjcf import parse_mjcf_string

ARM = """
<mujoco>
  <option timestep="0.002" integrator="{integrator}"/>
  <compiler angle="radian"/>
  <worldbody>
    <body name="b1" pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.2"/>
      <geom type="capsule" size="0.05" fromto="0 0 0 0.4 0 0" mass="1"/>
      <body name="b2" pos="0.4 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0.3 0 0" mass="0.5"/>
        <body name="b3" pos="0.3 0 0">
          <joint name="j3" type="slide" axis="1 0 0" damping="0.3"/>
          <geom type="sphere" size="0.04" mass="0.2"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
{actuators}
  </actuator>
</mujoco>
"""

FULL_SET = """
    <motor name="a1" joint="j1" gear="2.5" ctrlrange="-1 1"/>
    <position name="a2" joint="j2" kp="15" forcerange="-3 3"/>
    <velocity name="a3" joint="j3" kv="4"/>
    <general name="a4" joint="j1" dyntype="filter" dynprm="0.05"
             gainprm="1.5"/>
"""


def _pair(xml):
    mo = mujoco.MjModel.from_xml_string(xml)
    do = mujoco.MjData(mo)
    m = engine.set_const(compile_spec(parse_mjcf_string(xml)))
    d = engine.make_data(m)
    return mo, do, m, d


def _rollout_err(xml, ctrl, nsteps=200):
    mo, do, m, d = _pair(xml)
    do.ctrl[:] = ctrl[: mo.nu]
    d = d.replace(ctrl=jnp.asarray(ctrl[: mo.nu], d.qpos.dtype))
    step = jax.jit(engine.step)
    for _ in range(nsteps):
        mujoco.mj_step(mo, do)
        d = step(m, d)
    return (np.abs(do.qpos - np.asarray(d.qpos)).max(),
            np.abs(do.actuator_force - np.asarray(d.actuator_force)).max(),
            do, d)


def test_motor_position_velocity_filter_euler():
    xml = ARM.format(integrator="Euler", actuators=FULL_SET)
    qerr, ferr, do, d = _rollout_err(xml, np.array([0.7, 0.3, -0.5, 0.9]))
    assert qerr < 1e-10
    assert ferr < 1e-10
    # the filter activation state integrates identically
    assert abs(do.act[0] - float(d.act[3])) < 1e-12


def test_full_set_rk4():
    xml = ARM.format(integrator="RK4", actuators=FULL_SET)
    qerr, ferr, do, d = _rollout_err(xml, np.array([0.5, -0.2, 0.3, 0.6]),
                                     nsteps=100)
    # ferr is NOT comparable under RK4: mjData keeps the last internal
    # stage's actuator_force while ours holds the step-start evaluation;
    # the integrated state is the contract
    assert qerr < 1e-10
    assert np.abs(do.qvel - np.asarray(d.qvel)).max() < 1e-10
    assert abs(do.act[0] - float(d.act[3])) < 1e-12


def test_ctrlrange_clamp_and_damper():
    acts = """
    <motor name="m" joint="j1" ctrlrange="-0.5 0.5"/>
    <damper name="dmp" joint="j2" kv="2" ctrlrange="0 1"/>
    <motor name="m3" joint="j3"/>
    """
    xml = ARM.format(integrator="Euler", actuators=acts)
    # ctrl beyond range must clamp exactly like the oracle
    qerr, ferr, do, d = _rollout_err(xml, np.array([2.0, 0.7, -0.1]))
    assert qerr < 1e-10
    assert ferr < 1e-10
    # the clamp happened (force == 0.5, not 2.0)
    assert abs(float(d.actuator_force[0]) - 0.5) < 1e-12


def test_integrator_dyntype():
    acts = """
    <general name="gi" joint="j2" dyntype="integrator" gainprm="8"
             biastype="affine" biasprm="0 -8 -1"/>
    """
    xml = ARM.format(integrator="Euler", actuators=acts)
    qerr, ferr, do, d = _rollout_err(xml, np.array([0.25]), nsteps=150)
    assert qerr < 1e-10
    assert abs(do.act[0] - float(d.act[0])) < 1e-12


def test_unsupported_transmission_raises():
    acts = '<general name="bad" cranksite="nowhere"/>'
    xml = ARM.format(integrator="Euler", actuators=acts)
    with pytest.raises(ValueError, match="transmission"):
        parse_mjcf_string(xml)
    acts = '<motor name="bad" site="nowhere"/>'
    xml = ARM.format(integrator="Euler", actuators=acts)
    with pytest.raises(ValueError, match="unknown site"):
        compile_spec(parse_mjcf_string(xml))


SITE_ARM = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002"/>
  <worldbody>
    <site name="ref" pos="0.1 0.2 0.3" euler="0.3 0.2 0.1"/>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="1"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="slide" axis="1 0 0" damping="0.2"/>
        <geom type="sphere" size="0.03" mass="0.2"/>
        <site name="tip" pos="0.05 0.02 -0.01" euler="0.1 0.4 0.2"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <general name="a_site" site="tip" gear="1 2 3 0.5 0.4 0.3"/>
    <general name="a_ref"  site="tip" refsite="ref" gear="1 2 3 0.5 0.4 0.3"/>
  </actuator>
</mujoco>
"""


def test_site_transmission_oracle():
    """mjTRN_SITE length/velocity/moment parity, incl. the refsite length's
    offset-first quat composition (site_quat o body xquat), reverse-
    engineered with mj_forward probes like the elliptic-cone work."""
    mo, do, m, d = _pair(SITE_ARM)
    qs, vs, cs = [0.4, 0.13], [0.3, -0.2], [0.5, -1.0]
    do.qpos[:] = qs
    do.qvel[:] = vs
    do.ctrl[:] = cs
    mujoco.mj_forward(mo, do)
    d = d.replace(qpos=jnp.asarray(qs, d.qpos.dtype),
                  qvel=jnp.asarray(vs, d.qpos.dtype),
                  ctrl=jnp.asarray(cs, d.qpos.dtype))
    d = engine.forward(m, d)
    np.testing.assert_allclose(np.asarray(d.actuator_length),
                               do.actuator_length, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.actuator_velocity),
                               do.actuator_velocity, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.qfrc_actuator),
                               do.qfrc_actuator, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.qacc), do.qacc, atol=1e-10)


def test_actrange_clamp():
    """intvelocity integrator state clamps at actrange (mj_advance)."""
    acts = ('<intvelocity name="iv" joint="j1" kp="40" kv="3" '
            'actrange="-0.5 0.6"/>')
    xml = ARM.format(integrator="Euler", actuators=acts).replace(
        "<compiler angle=\"radian\"/>",
        "<compiler angle=\"radian\" autolimits=\"true\"/>")
    qerr, _, do, d = _rollout_err(xml, np.array([2.0]), nsteps=500)
    assert qerr < 1e-10
    assert abs(float(d.act[0]) - 0.6) < 1e-12   # clamped, same as oracle
    assert abs(do.act[0] - 0.6) < 1e-12


def test_site_transmission_trajectory():
    qerr, _, do, d = _rollout_err(SITE_ARM, np.array([0.3, -0.6]),
                                  nsteps=200)
    assert qerr < 1e-9


def test_fromto_geom_frames_match_oracle():
    xml = ARM.format(integrator="Euler", actuators=FULL_SET)
    mo, do, m, d = _pair(xml)
    np.testing.assert_allclose(np.asarray(m.geom_pos), mo.geom_pos,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.geom_size), mo.geom_size,
                               atol=1e-12)


def test_actuator_names():
    xml = ARM.format(integrator="Euler", actuators=FULL_SET)
    m = compile_spec(parse_mjcf_string(xml))
    assert m.nu == 4
    assert m.names.actuator == ("a1", "a2", "a3", "a4")
    assert m.names.actuator_id("a3") == 2


def test_free_and_ball_joint_transmissions():
    """motor on free/ball joints: the moment IS the gear vector on the
    joint's dofs (probed: constant at any orientation); length reads 0."""
    xml = """
    <mujoco>
      <compiler angle="radian"/>
      <option timestep="0.002"/>
      <worldbody>
        <geom type="plane" size="3 3 0.1"/>
        <body pos="0 0 0.5">
          <freejoint name="fj"/>
          <geom type="box" size="0.1 0.1 0.1" mass="1"/>
          <body pos="0 0 0.15">
            <joint name="bj" type="ball" damping="0.1"/>
            <geom type="capsule" size="0.02" fromto="0 0 0 0 0 0.2"
                  mass="0.3"/>
          </body>
        </body>
      </worldbody>
      <actuator>
        <motor joint="fj" gear="0 0 1 0 0 0"/>
        <motor joint="fj" gear="0 0 0 0.5 0 0.2"/>
        <motor joint="bj" gear="0 1 0"/>
      </actuator>
    </mujoco>
    """
    mo = mujoco.MjModel.from_xml_string(xml)
    do = mujoco.MjData(mo)
    m = engine.set_const(compile_spec(parse_mjcf_string(xml)))
    d = engine.make_data(m)
    do.ctrl[:] = [14.0, 0.8, 0.4]
    d = d.replace(ctrl=jnp.asarray([14.0, 0.8, 0.4], d.qpos.dtype))
    step = jax.jit(engine.step)
    worst = 0.0
    for _ in range(200):
        mujoco.mj_step(mo, do)
        d = step(m, d)
        mujoco.mj_forward(mo, do)
        df = engine.forward(m, d)
        worst = max(worst, float(np.abs(np.asarray(df.actuator_velocity)
                                        - do.actuator_velocity).max()))
    assert np.abs(do.qpos - np.asarray(d.qpos)).max() < 1e-8
    assert worst < 1e-8
    np.testing.assert_allclose(np.asarray(df.actuator_length),
                               do.actuator_length, atol=1e-12)
