"""Inertia-box fluid model (density/viscosity/wind) vs mj_passive.

Coefficients probed r3: equivalent box r_i = sqrt(3(I_j+I_k-I_i)/(2m));
viscous d = 2(r0+r1+r2)/3 with f=-3 pi d eta v, tau=-pi d^3 eta w;
quadratic drag f_i = -2 rho r_j r_k |v_i| v_i and
tau_i = -(rho/2) r_i (r_j^4+r_k^4) |w_i| w_i, wind subtracted.
"""

import jax
import jax.numpy as jnp
import numpy as np

import mujoco

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import compile_spec
from mujoco_sim_tpu.models.mjcf import parse_mjcf_string

XML = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002" density="1.2" viscosity="0.9"
          wind="0.4 -0.3 0.2"/>
  <worldbody>
    <body pos="0 0 2">
      <freejoint/>
      <geom type="box" size="0.1 0.15 0.2" mass="2" euler="0.3 0.2 0.1"/>
    </body>
    <body pos="1 0 1">
      <joint name="h" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.4 0 0" mass="0.8"/>
    </body>
  </worldbody>
</mujoco>
"""


def _pair(xml):
    mo = mujoco.MjModel.from_xml_string(xml)
    do = mujoco.MjData(mo)
    m = engine.set_const(compile_spec(parse_mjcf_string(xml)))
    d = engine.make_data(m)
    return mo, do, m, d


def test_fluid_forces_oracle():
    mo, do, m, d = _pair(XML)
    rng = np.random.default_rng(7)
    for _ in range(5):
        qpos = mo.qpos0.copy()
        q = rng.standard_normal(4)
        qpos[3:7] = q / np.linalg.norm(q)
        qpos[7] = rng.uniform(-1, 1)
        qvel = rng.uniform(-1.5, 1.5, mo.nv)
        do.qpos[:] = qpos
        do.qvel[:] = qvel
        mujoco.mj_forward(mo, do)
        dd = d.replace(qpos=jnp.asarray(qpos, d.qpos.dtype),
                       qvel=jnp.asarray(qvel, d.qpos.dtype))
        dd = engine.forward(m, dd)
        np.testing.assert_allclose(np.asarray(dd.qfrc_passive),
                                   do.qfrc_passive, atol=1e-10,
                                   err_msg=str(qvel))
        np.testing.assert_allclose(np.asarray(dd.qacc), do.qacc, atol=1e-8)


def test_fluid_trajectory():
    """tumbling box in wind: 300 steps bit-level."""
    mo, do, m, d = _pair(XML)
    do.qvel[:] = [1.0, -0.5, 2.0, 3.0, -2.0, 1.0, 0.5]
    d = d.replace(qvel=jnp.asarray(do.qvel.copy(), d.qpos.dtype))
    step = jax.jit(engine.step)
    for _ in range(300):
        mujoco.mj_step(mo, do)
        d = step(m, d)
    assert np.abs(do.qpos - np.asarray(d.qpos)).max() < 1e-9


def test_implicit_with_fluid_and_tendon_damping():
    """mj_implicit's qDeriv includes fluid drag and tendon damping
    derivatives (mjd_passive_vel); 200 steps bit-level."""
    xml = XML.replace('<option timestep="0.002"',
                      '<option integrator="implicit" timestep="0.002"')
    xml = xml.replace("</worldbody>", """
        <body pos="-1 0 1">
          <joint name="h2" type="hinge" axis="0 1 0"/>
          <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0"
                mass="0.5"/>
        </body>
      </worldbody>""").replace("</mujoco>", """
      <tendon><fixed name="tt" damping="0.8" stiffness="3">
        <joint joint="h" coef="1.0"/><joint joint="h2" coef="-0.6"/>
      </fixed></tendon>
    </mujoco>""")
    mo, do, m, d = _pair(xml)
    do.qvel[:] = np.linspace(-1, 1, mo.nv)
    d = d.replace(qvel=jnp.asarray(do.qvel.copy(), d.qpos.dtype))
    step = jax.jit(engine.step)
    for _ in range(200):
        mujoco.mj_step(mo, do)
        d = step(m, d)
    assert np.abs(do.qpos - np.asarray(d.qpos)).max() < 1e-9
