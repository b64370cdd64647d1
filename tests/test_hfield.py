"""Heightfield terrain vs the oracle.

Grid conventions probed against mjModel.hfield_data (XML rows are
north-first and min-max normalized; storage row 0 = min y) and against
binary contact probes (cells split along the (low,low)->(high,high)
diagonal, depth measured to the triangle plane).  MuJoCo collides
per-cell PRISMS with convex geoms; on planar regions the two agree
exactly, so tests compare dist/normal at triangle-interior poses and a
shallow-contact qacc, not chaotic rolling trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import compile_spec
from mujoco_sim_tpu.models.mjcf import parse_mjcf_string

ELEV = " ".join(str(v) for v in [0, 0.2, 0.5, 1.0] * 3)
XML = f"""
<mujoco>
  <option timestep="0.002"/>
  <asset><hfield name="hf" nrow="3" ncol="4" size="2 1.5 0.8 0.1"
                 elevation="{ELEV}"/></asset>
  <worldbody>
    <geom name="terrain" type="hfield" hfield="hf"
          friction="1 0.005 0.0001"/>
    <body pos="0 0 1"><freejoint/>
      <geom type="sphere" size="0.1" mass="1"
            friction="1 0.005 0.0001"/></body>
  </worldbody>
</mujoco>
"""


def _pair(xml):
    mo = mujoco.MjModel.from_xml_string(xml)
    do = mujoco.MjData(mo)
    m = engine.set_const(compile_spec(parse_mjcf_string(xml)))
    d = engine.make_data(m)
    return mo, do, m, d


def test_hfield_data_matches_oracle():
    mo, _, m, _ = _pair(XML)
    np.testing.assert_allclose(
        np.asarray(m.hfield_data[0]),
        mo.hfield_data.reshape(3, 4), atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.hfield_size[0]),
                               mo.hfield_size[0], atol=1e-12)


def test_sphere_contacts_match_on_triangle_interiors():
    mo, do, m, d0 = _pair(XML)
    for (x, y, z), expect_contact in [((0.3, 0.2, 0.33), True),
                                      ((-1.0, -0.5, 0.18), True),
                                      ((1.2, 0.9, 0.72), False)]:
        do.qpos[:] = [x, y, z, 1, 0, 0, 0]
        do.qvel[:] = [0.1, -0.2, -0.3, 0.05, 0.02, 0]
        mujoco.mj_forward(mo, do)
        d = d0.replace(qpos=jnp.asarray(do.qpos.copy(), d0.qpos.dtype),
                       qvel=jnp.asarray(do.qvel.copy(), d0.qpos.dtype))
        d = engine.forward(m, d)
        act = np.asarray(d.contact.active)
        assert (do.ncon > 0) == expect_contact
        assert act.any() == expect_contact
        if expect_contact:
            i = int(np.nonzero(act)[0][0])
            # mjModel.hfield_data is float32 on the oracle side
            assert abs(float(d.contact.dist[i]) - do.contact.dist[0]) < 1e-6
            np.testing.assert_allclose(
                np.asarray(d.contact.frame[i, 0]),
                do.contact.frame[0][:3], atol=1e-6)


def test_shallow_contact_dynamics_exact():
    """away from cell edges with shallow penetration, the triangle plane
    IS MuJoCo's prism face: qacc matches to solver precision."""
    mo, do, m, d0 = _pair(XML)
    do.qpos[:] = [-1.0, -0.5, 0.18, 1, 0, 0, 0]
    do.qvel[:] = [0.1, -0.2, -0.3, 0.05, 0.02, 0]
    mujoco.mj_forward(mo, do)
    d = d0.replace(qpos=jnp.asarray(do.qpos.copy(), d0.qpos.dtype),
                   qvel=jnp.asarray(do.qvel.copy(), d0.qpos.dtype))
    d = engine.forward(m, d)
    np.testing.assert_allclose(np.asarray(d.qacc), do.qacc,
                               rtol=1e-5, atol=1e-5)


def test_bowl_settle_multi_shape():
    """sphere/box/capsule dropped into a bowl hfield settle at heights
    agreeing with the oracle within a millimeter."""
    n = 9
    yy, xx = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n),
                         indexing="ij")
    bowl = (xx ** 2 + yy ** 2) / 2.0
    elev = " ".join(f"{v:.6f}" for v in bowl.ravel())
    xml = f"""
    <mujoco>
      <option timestep="0.002"/>
      <asset><hfield name="hf" nrow="{n}" ncol="{n}" size="1.5 1.5 0.4 0.1"
                     elevation="{elev}"/></asset>
      <worldbody>
        <geom type="hfield" hfield="hf"/>
        <body pos="0.2 0.1 0.7"><joint type="free" damping="2"/>
          <geom type="sphere" size="0.08" mass="1"/></body>
        <body pos="-0.4 0.3 0.8"><joint type="free" damping="2"/>
          <geom type="box" size="0.07 0.05 0.04" mass="0.5"/></body>
        <body pos="0.3 -0.5 0.9"><joint type="free" damping="2"/>
          <geom type="capsule" size="0.04 0.1" mass="0.4"/></body>
      </worldbody>
    </mujoco>
    """
    mo, do, m, d = _pair(xml)
    step = jax.jit(engine.step)
    for _ in range(2000):
        mujoco.mj_step(mo, do)
        d = step(m, d)
    zs_o = do.qpos.reshape(3, 7)[:, 2]
    zs_m = np.asarray(d.qpos).reshape(3, 7)[:, 2]
    assert np.abs(np.asarray(d.qvel)).max() < 0.2      # settled
    assert np.abs(do.qvel).max() < 0.2
    assert np.abs(zs_o - zs_m).max() < 2e-3, (zs_o, zs_m)


def test_unknown_hfield_raises():
    xml = XML.replace('hfield="hf"', 'hfield="nope"', 1)
    # the first replace hits the geom reference -> unknown hfield name
    with pytest.raises(ValueError, match="hfield"):
        compile_spec(parse_mjcf_string(
            xml.replace('<asset><hfield name="hf"', '<asset><hfield '
                        'name="hf2"', 1)))
