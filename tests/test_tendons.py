"""Fixed tendons vs the oracle: length/velocity/moment, spring (incl. 3.x
deadband springlength), damper, limit rows, tendon actuator transmission.

The reference's libmujoco backend exposes the full <tendon> surface for
arbitrary user worlds (SURVEY §2.2); fixed tendons are a static linear form
W qpos, so the whole stage is two constant matmuls on TPU.
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
  <compiler angle="radian"/>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0" mass="1"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.25 0 0" mass="0.4"/>
        <body pos="0.25 0 0">
          <joint name="j3" type="slide" axis="1 0 0" damping="0.2"/>
          <geom type="sphere" size="0.03" mass="0.2"/>
        </body>
      </body>
    </body>
  </worldbody>
  <tendon>
{tendons}
  </tendon>
  <actuator>
{actuators}
  </actuator>
</mujoco>
"""

TENDONS = """
    <fixed name="t1" stiffness="25" damping="1.5" springlength="0.05">
      <joint joint="j1" coef="1.0"/>
      <joint joint="j2" coef="-0.7"/>
    </fixed>
    <fixed name="t2" limited="true" range="-0.15 0.2" solreflimit="0.01 1">
      <joint joint="j2" coef="0.5"/>
      <joint joint="j3" coef="2.0"/>
    </fixed>
"""


def _pair(xml):
    mo = mujoco.MjModel.from_xml_string(xml)
    do = mujoco.MjData(mo)
    m = engine.set_const(compile_spec(parse_mjcf_string(xml)))
    d = engine.make_data(m)
    return mo, do, m, d


def test_tendon_forward_oracle():
    xml = ARM.format(tendons=TENDONS,
                     actuators='<general name="at" tendon="t1" gear="1.7" '
                               'gainprm="3.0"/>')
    mo, do, m, d = _pair(xml)
    qs, vs, cs = [0.4, -0.25, 0.12], [0.5, -0.3, 0.2], [0.8]
    do.qpos[:] = qs
    do.qvel[:] = vs
    do.ctrl[:] = cs
    mujoco.mj_forward(mo, do)
    d = d.replace(qpos=jnp.asarray(qs, d.qpos.dtype),
                  qvel=jnp.asarray(vs, d.qpos.dtype),
                  ctrl=jnp.asarray(cs, d.qpos.dtype))
    d = engine.forward(m, d)
    np.testing.assert_allclose(np.asarray(m.ten_invweight0),
                               mo.tendon_invweight0, rtol=1e-9)
    for mine, orc in [(d.ten_length, do.ten_length),
                      (d.ten_velocity, do.ten_velocity),
                      (d.actuator_length, do.actuator_length),
                      (d.actuator_velocity, do.actuator_velocity),
                      (d.qfrc_spring, do.qfrc_spring),
                      (d.qfrc_damper, do.qfrc_damper),
                      (d.qfrc_actuator, do.qfrc_actuator)]:
        np.testing.assert_allclose(np.asarray(mine), orc, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.qacc), do.qacc, atol=1e-9)


def test_tendon_limit_trajectory():
    """300 steps with the t2 limit actively engaged at the end."""
    xml = ARM.format(tendons=TENDONS,
                     actuators='<general name="at" tendon="t1" gear="1.7" '
                               'gainprm="3.0"/>')
    mo, do, m, d = _pair(xml)
    do.ctrl[:] = [0.8]
    d = d.replace(ctrl=jnp.asarray([0.8], d.qpos.dtype))
    step = jax.jit(engine.step)
    engaged = 0
    for _ in range(300):
        mujoco.mj_step(mo, do)
        d = step(m, d)
        engaged = max(engaged, int(do.nefc))
    assert engaged > 0, "limit should engage during this rollout"
    assert np.abs(do.qpos - np.asarray(d.qpos)).max() < 1e-8
    assert np.abs(do.ten_length - np.asarray(d.ten_length)).max() < 1e-8


def test_deadband_springlength():
    """two-element springlength is a deadband spring (MuJoCo 3.x)."""
    tns = """
    <fixed name="db" stiffness="40" springlength="0.1 0.3">
      <joint joint="j1" coef="1"/>
    </fixed>
    """
    xml = ARM.format(tendons=tns, actuators="")
    mo, do, m, d = _pair(xml)
    step = jax.jit(engine.step)
    for q in (0.2, 0.05, 0.5):     # inside, below, above the deadband
        do.qpos[:] = [q, 0, 0]
        mujoco.mj_forward(mo, do)
        dd = d.replace(qpos=jnp.asarray([q, 0, 0], d.qpos.dtype))
        dd = engine.forward(m, dd)
        np.testing.assert_allclose(np.asarray(dd.qfrc_spring),
                                   do.qfrc_spring, atol=1e-12)


SPATIAL = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002"/>
  <worldbody>
    <site name="anchor" pos="0 0 1.5"/>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="1"/>
      <site name="mid" pos="0.15 0 0.03"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="1 0 0" damping="0.05"/>
        <geom type="capsule" size="0.015" fromto="0 0 0 0 0.2 0"
              mass="0.3"/>
        <site name="tip" pos="0 0.2 0"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <spatial name="cable" stiffness="60" damping="2" springlength="0.4"
             limited="true" range="0 0.9">
      <site site="anchor"/><site site="mid"/><site site="tip"/>
    </spatial>
  </tendon>
  <actuator><general name="wind" tendon="cable" gainprm="5"/></actuator>
</mujoco>
"""


def test_spatial_tendon_oracle():
    """straight site-chain tendon: length/J/velocity, spring+damper,
    limit rows, tendon actuator — machine-precision vs the oracle."""
    mo, do, m, d = _pair(SPATIAL)
    np.testing.assert_allclose(np.asarray(m.ten_invweight0),
                               mo.tendon_invweight0, rtol=1e-9)
    qs, vs, cs = [0.5, -0.3], [0.4, -0.6], [-0.5]
    do.qpos[:] = qs
    do.qvel[:] = vs
    do.ctrl[:] = cs
    mujoco.mj_forward(mo, do)
    d = d.replace(qpos=jnp.asarray(qs, d.qpos.dtype),
                  qvel=jnp.asarray(vs, d.qpos.dtype),
                  ctrl=jnp.asarray(cs, d.qpos.dtype))
    d = engine.forward(m, d)
    np.testing.assert_allclose(np.asarray(d.ten_length), do.ten_length,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.ten_J).ravel(),
                               do.ten_J.ravel(), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.qfrc_spring), do.qfrc_spring,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.qacc), do.qacc, atol=1e-9)
    step = jax.jit(engine.step)
    for _ in range(300):
        mujoco.mj_step(mo, do)
        d = step(m, d)
    assert np.abs(do.qpos - np.asarray(d.qpos)).max() < 1e-10


def test_spatial_wrap_geom_raises():
    xml = """
    <mujoco><worldbody>
      <site name="s1"/>
      <geom name="wrap" type="cylinder" size="0.05 0.2"/>
      <body><joint type="hinge"/><geom type="sphere" size="0.1" mass="1"/>
        <site name="s2"/></body>
    </worldbody>
    <tendon><spatial name="sp"><site site="s1"/><geom geom="wrap"/>
      <site site="s2"/></spatial>
    </tendon></mujoco>
    """
    with pytest.raises(ValueError, match="wrap"):
        parse_mjcf_string(xml)


def test_tendon_names_and_export_roundtrip(tmp_path):
    from mujoco_sim_tpu.models.export_mjcf import export_mjcf
    xml = ARM.format(tendons=TENDONS,
                     actuators='<general name="at" tendon="t1" gear="1.7" '
                               'gainprm="3.0"/>')
    spec = parse_mjcf_string(xml)
    m = compile_spec(spec)
    assert m.ntendon == 2
    assert m.names.tendon == ("t1", "t2")
    assert m.names.tendon_id("t2") == 1
    out = str(tmp_path / "roundtrip.xml")
    export_mjcf(spec, out)
    spec2 = parse_mjcf_string(open(out).read())
    m2 = compile_spec(spec2)
    np.testing.assert_allclose(np.asarray(m2.layout.ten_Wq),
                               np.asarray(m.layout.ten_Wq), atol=1e-12)
    np.testing.assert_allclose(np.asarray(m2.ten_springlength),
                               np.asarray(m.ten_springlength), atol=1e-12)
    assert m2.nu == 1 and int(m2.layout.act_trntype[0]) == 3
