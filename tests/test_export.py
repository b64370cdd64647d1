"""USD / OWL export pipeline (reference script/* equivalents)."""

import os
import re

import jax
import numpy as np

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.compile import load_model
from mujoco_sim_tpu.export import usd as usd_mod
from mujoco_sim_tpu.export import owl as owl_mod


def test_usd_export_box(tmp_path):
    m = load_model("/root/reference/model/test/box.xml")
    d = jax.jit(engine.forward)(m, engine.make_data(m))
    path = usd_mod.export_usd(m, d, str(tmp_path / "box.usda"))
    text = open(path).read()
    assert text.startswith("#usda 1.0")
    assert 'def Xform "box"' in text
    # mesh flaps exported as Mesh prims with faces
    assert text.count("def Mesh") == 2
    assert "faceVertexIndices" in text
    assert "PhysicsRevoluteJoint" in text
    # live pose present
    assert "xformOp:translate" in text


def test_usd_to_abox_roundtrip(tmp_path):
    m = load_model("tests/fixtures/floor_ball.xml")
    d = jax.jit(engine.forward)(m, engine.make_data(m))
    usda = usd_mod.export_usd(m, d, str(tmp_path / "scene.usda"))
    owl = owl_mod.usd_to_abox(usda, str(tmp_path / "scene_ABox.owl"))
    import xml.etree.ElementTree as ET
    tree = ET.parse(owl)  # well-formed RDF/XML
    inds = list(tree.getroot().iter(
        "{http://www.w3.org/2002/07/owl#}NamedIndividual"))
    names = [i.get("{http://www.w3.org/1999/02/22-rdf-syntax-ns#}about")
             for i in inds]
    assert any("ball" in n for n in names)


def test_tbox_roundtrip_and_joint_update(tmp_path):
    # consume a REAL reference TBox ontology
    tbox = "/root/reference/model/owl/box_scenario_TBox.owl"
    usda = owl_mod.tbox_to_usd(tbox, str(tmp_path / "tbox.usda"))
    text = open(usda).read()
    assert text.startswith("#usda 1.0")
    assert "class " in text

    # joint-state updater on a generated ABox
    m = load_model("tests/fixtures/arm.xml")
    d = jax.jit(engine.forward)(m, engine.make_data(m))
    scene_usda = usd_mod.export_usd(m, d, str(tmp_path / "arm.usda"))
    abox = owl_mod.usd_to_abox(scene_usda, str(tmp_path / "arm_ABox.owl"))
    out = owl_mod.update_joint_states(abox, {"link1": 0.42})
    assert "0.42" in open(out).read()

    tagged = owl_mod.auto_sem_tag(abox, tbox, str(tmp_path / "tagged.owl"),
                                  name_to_class={"link1": "Box"})
    assert "semanticTag" in open(tagged).read()
