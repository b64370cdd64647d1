"""Muscle actuators vs the oracle (mju_muscleDynamics/Gain/Bias semantics).

The FLV curves and activation dynamics were pinned with direct probes of
the oracle's mju_muscle* functions (machine precision); full-step parity
is limited only by actuator_lengthrange, which the oracle estimates by
SIMULATION (mj_setLengthRange) while we compute the exact analytic range
of the linear joint/tendon transmission over the joint limits (~0.02%
apart on these models).
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
  <compiler angle="radian" autolimits="true"/>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" range="-1.2 1.4"
             damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="1"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" range="-0.9 1.1"
               damping="0.05"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t1">
      <joint joint="j1" coef="0.03"/><joint joint="j2" coef="-0.02"/>
    </fixed>
  </tendon>
  <actuator>
    <muscle name="m1" joint="j1" gear="0.05"/>
    <muscle name="m2" tendon="t1" force="80" timeconst="0.02 0.06"
            lmin="0.4" lmax="1.7" vmax="2.0"/>
  </actuator>
</mujoco>
"""


def _pair(xml=XML):
    mo = mujoco.MjModel.from_xml_string(xml)
    do = mujoco.MjData(mo)
    m = engine.set_const(compile_spec(parse_mjcf_string(xml)))
    d = engine.make_data(m)
    return mo, do, m, d


def test_muscle_constants():
    mo, _, m, _ = _pair()
    np.testing.assert_allclose(np.asarray(m.actuator_acc0),
                               mo.actuator_acc0, rtol=1e-9)
    # analytic vs simulated lengthrange: within 0.1%
    np.testing.assert_allclose(np.asarray(m.actuator_lengthrange),
                               mo.actuator_lengthrange, rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m.actuator_gainprm)[:, :9],
                               mo.actuator_gainprm[:, :9], atol=1e-12)


def test_muscle_trajectory():
    mo, do, m, d = _pair()
    do.ctrl[:] = [0.7, 0.4]
    d = d.replace(ctrl=jnp.asarray([0.7, 0.4], d.qpos.dtype))
    step = jax.jit(engine.step)
    for _ in range(400):
        mujoco.mj_step(mo, do)
        d = step(m, d)
    # activation dynamics are exact; qpos drifts only through the tiny
    # lengthrange difference
    assert np.abs(do.act - np.asarray(d.act)).max() < 1e-12
    assert np.abs(do.qpos - np.asarray(d.qpos)).max() < 1e-4
    assert float(d.act[0]) > 0.5   # muscle actually activated


def test_muscle_explicit_lengthrange_is_exact():
    xml = XML.replace('<muscle name="m1" joint="j1" gear="0.05"/>',
                      '<muscle name="m1" joint="j1" gear="0.05" '
                      'lengthrange="-0.07 0.08"/>')
    xml = xml.replace('<muscle name="m2" tendon="t1" force="80" '
                      'timeconst="0.02 0.06"\n'
                      '            lmin="0.4" lmax="1.7" vmax="2.0"/>', '')
    mo, do, m, d = _pair(xml)
    do.ctrl[:] = 0.6
    d = d.replace(ctrl=jnp.full((mo.nu,), 0.6, d.qpos.dtype))
    step = jax.jit(engine.step)
    for _ in range(300):
        mujoco.mj_step(mo, do)
        d = step(m, d)
    assert np.abs(do.qpos - np.asarray(d.qpos)).max() < 1e-10
    assert np.abs(do.actuator_force - np.asarray(d.actuator_force)).max() \
        < 1e-10


def test_muscle_requires_limits():
    xml = XML.replace('range="-1.2 1.4"\n             damping="0.1"',
                      'damping="0.1"')
    with pytest.raises(ValueError, match="limits"):
        compile_spec(parse_mjcf_string(xml))
