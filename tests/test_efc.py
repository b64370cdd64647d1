"""Term-by-term efc array parity vs the oracle (CLAUDE.md round-2 bit-match
push): every active constraint row's Jacobian, aref, and regularization R
must match mj_forward exactly, across all four row families (equality,
dof friction loss, joint limit, contact)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import load_model
from tests.oracle import oracle_model

EFC_XML = "tests/fixtures/efc_scene.xml"


def _scene():
    with open(EFC_XML, "w") as f:
        f.write("""
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81" jacobian="dense"/>
  <worldbody>
    <geom name="floor" size="0 0 .05" type="plane"/>
    <body name="arm" pos="0 0 0.5">
      <joint name="j1" type="hinge" axis="0 1 0" range="-1 1"
             frictionloss="0.2" damping="0.1"/>
      <geom type="capsule" size=".04 .15" pos="0.15 0 0" euler="0 90 0"/>
      <body name="fore" pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" range="-2 0.5"
               frictionloss="0.1"/>
        <geom type="capsule" size=".03 .1" pos="0.1 0 0" euler="0 90 0"/>
      </body>
    </body>
    <body name="box" pos="0.1 0.4 0.09"><freejoint/>
      <geom type="box" size=".1 .1 .1" friction="0.6"/></body>
  </worldbody>
  <equality><joint joint1="j2" joint2="j1" polycoef="0.1 0.5 0 0 0"/></equality>
</mujoco>""")
    return EFC_XML


def test_efc_rows_match_oracle_exactly():
    xml = _scene()
    mm = oracle_model(xml)
    dd = mujoco.MjData(mm)
    dd.qpos[0] = 0.95          # near the j1 limit -> limit row active
    dd.qvel[2] = 0.3           # box sliding -> nonzero friction aref
    mujoco.mj_forward(mm, dd)
    assert dd.nefc > 10

    m = load_model(xml)
    d = engine.make_data(m)
    d = d.replace(qpos=d.qpos.at[0].set(0.95),
                  qvel=d.qvel.at[2].set(0.3))
    d = jax.jit(engine.forward)(m, d)

    act = np.asarray(d.efc_active)
    assert int(act.sum()) == dd.nefc
    J_o = dd.efc_J.reshape(dd.nefc, mm.nv)
    J_m = np.asarray(d.efc_J)[act]
    aref_m = np.asarray(d.efc_aref)[act]
    R_m = np.asarray(d.efc_R)[act]

    matched = set()
    for i in range(dd.nefc):
        dj = np.abs(J_m - J_o[i]).max(axis=1)
        j = int(np.argmin(dj))
        assert dj[j] < 1e-12, (i, dj[j])      # Jacobian row bit-equal
        assert j not in matched, "duplicate row match"
        matched.add(j)
        np.testing.assert_allclose(aref_m[j], dd.efc_aref[i], rtol=1e-10,
                                   atol=1e-10, err_msg=f"aref row {i}")
        np.testing.assert_allclose(R_m[j], dd.efc_R[i], rtol=1e-10,
                                   err_msg=f"R row {i}")
