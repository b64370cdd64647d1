"""Elliptic friction cones + impratio vs the oracle (VERDICT r1 #4).

The zone cost implemented in ops/solver.py was reverse-engineered from
mj_constraintUpdate probes; these tests pin the full pipeline: efc row
regularization (impratio scaling), forward qacc, and a sliding trajectory.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import load_model
from tests.oracle import oracle_model

ELL_XML = "tests/fixtures/elliptic_box.xml"


def _scene(impratio=4.0, condim=6):
    with open(ELL_XML, "w") as f:
        f.write(f"""
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81" cone="elliptic"
          impratio="{impratio}" jacobian="dense"/>
  <worldbody>
    <geom name="floor" size="0 0 .05" type="plane"
          friction="0.8 0.01 0.001"/>
    <body name="box" pos="0 0 0.0995"><freejoint/>
      <geom type="box" size=".1 .1 .1" friction="0.8 0.01 0.001"
            condim="{condim}"/></body>
  </worldbody>
</mujoco>""")
    return ELL_XML


def test_elliptic_efc_and_qacc_match_oracle():
    xml = _scene(impratio=4.0)
    mm = oracle_model(xml)
    dd = mujoco.MjData(mm)
    dd.qvel[0] = 0.3
    mujoco.mj_forward(mm, dd)
    m = load_model(xml)
    assert m.nefc_max == dd.nefc  # condim rows per contact, 4 corners
    d = engine.make_data(m)
    d = d.replace(qvel=d.qvel.at[0].set(0.3))
    d = jax.jit(engine.forward)(m, d)
    act = np.asarray(d.efc_active)
    assert int(act.sum()) == dd.nefc
    # impratio-scaled friction regularization, row for row
    np.testing.assert_allclose(np.asarray(d.efc_R)[act], dd.efc_R,
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(d.efc_aref)[act], dd.efc_aref,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.qacc), dd.qacc, atol=1e-8)


def test_elliptic_sliding_trajectory():
    """Box sliding to rest under elliptic friction tracks mj_step."""
    xml = _scene(impratio=4.0)
    mm = oracle_model(xml)
    dd = mujoco.MjData(mm)
    dd.qvel[0] = 0.3
    m = load_model(xml)
    d = engine.make_data(m)
    d = d.replace(qvel=d.qvel.at[0].set(0.3))
    step = jax.jit(engine.step)
    maxerr = 0.0
    for _ in range(200):
        mujoco.mj_step(mm, dd)
        d = step(m, d)
        maxerr = max(maxerr, float(
            np.abs(np.asarray(d.qpos) - dd.qpos).max()))
    assert maxerr < 1e-6, maxerr


def test_elliptic_condim3_drop():
    """condim-3 elliptic: dropped spinning box settles like the oracle."""
    xml = _scene(impratio=1.0, condim=3)
    mm = oracle_model(xml)
    dd = mujoco.MjData(mm)
    dd.qpos[2] = 0.3
    dd.qvel[3:6] = [0.5, -0.2, 0.1]
    m = load_model(xml)
    d = engine.make_data(m)
    d = d.replace(qpos=d.qpos.at[2].set(0.3),
                  qvel=d.qvel.at[3:6].set(jnp.asarray([0.5, -0.2, 0.1])))
    step = jax.jit(engine.step)
    for _ in range(300):
        mujoco.mj_step(mm, dd)
        d = step(m, d)
    np.testing.assert_allclose(np.asarray(d.qpos)[:3], dd.qpos[:3],
                               atol=2e-2)
    assert abs(float(d.qpos[2]) - 0.1) < 5e-3


def test_elliptic_noslip_drift_suppressed():
    """noslip with elliptic cones: sub-threshold lateral push holds the box
    still, tracking the oracle's drift suppression."""
    xml = "tests/fixtures/elliptic_noslip.xml"
    with open(xml, "w") as f:
        f.write("""
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81" cone="elliptic"
          noslip_iterations="5" noslip_tolerance="1e-6"/>
  <worldbody>
    <geom name="floor" size="0 0 .05" type="plane" friction="0.4"/>
    <body name="box" pos="0 0 0.0995"><freejoint/>
      <geom type="box" size=".1 .1 .1" friction="0.4"/></body>
  </worldbody>
</mujoco>""")
    mm = oracle_model(xml)
    dd = mujoco.MjData(mm)
    m = load_model(xml)
    d = engine.make_data(m)
    step = jax.jit(engine.step)
    push = jnp.asarray([0, 0, 0, 20.0, 0, 0.0])
    for _ in range(200):
        dd.xfrc_applied[1, :3] = [20.0, 0, 0]
        mujoco.mj_step(mm, dd)
        d = d.replace(xfrc_applied=d.xfrc_applied.at[1, :].set(push))
        d = step(m, d)
    # drift suppressed to the same order as the oracle
    assert abs(float(d.qpos[0])) < 5e-4, float(d.qpos[0])
    assert abs(float(d.qpos[0]) - dd.qpos[0]) < 5e-4
