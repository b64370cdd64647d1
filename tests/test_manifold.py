"""Exact deep-pair manifold (ops/manifold.py) vs the mujoco 3.10 oracle.

Probe-pinned: the oracle resolves a penetrating convex pair with GJK/EPA
(exact MTV) and emits the contact-feature manifold — face-face overlap
polygon corners, edge segment endpoints, single witness for point
contacts — all points at the unperturbed depth on the mid-surface plane
(reference behavior behind mj_step1, /root/reference/src/mj_main.cpp:83).
Cylinder (smooth) pairs instead get multiCCD tilt re-queries: segment
ends + an interior witness.
"""

import jax
import numpy as np
import pytest

import mujoco

from mujoco_sim_tpu.models.compile import load_model
from mujoco_sim_tpu.models import mesh_io
from mujoco_sim_tpu.ops.manifold import exact_pair_contacts
from tests.test_mesh_contacts import write_box_stl

XML = """
<mujoco>
  <asset><mesh name="cube" file="cube.stl"/></asset>
  <worldbody>
    <body name="b1" pos="0 0 0"><freejoint/>
      <geom type="mesh" mesh="cube"/></body>
    <body name="b2" pos="{pos}" quat="{quat}"><freejoint/>
      <geom type="mesh" mesh="cube"/></body>
  </worldbody>
</mujoco>
"""

_jit_pair = jax.jit(exact_pair_contacts)


def _quat(axis, angle):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])


def _rotm(q):
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _tables(m):
    dt = np.float64
    return dict(vert=np.asarray(m.mesh_vert_hi, dt),
                vmask=np.asarray(m.mesh_vert_hi_mask, dt),
                fplane=np.asarray(m.mesh_fplane, dt),
                fmask=np.asarray(m.mesh_fmask, dt),
                fpoly=np.asarray(m.mesh_fpoly, dt),
                hedge=np.asarray(m.mesh_hedge, dt),
                hemask=np.asarray(m.mesh_hedge_mask, dt))


def _tabs(m, h):
    """(mesh one-hot, cyl descriptor) for hull h — per-lane query args."""
    dt = np.float64
    nh = np.asarray(m.mesh_vert_hi).shape[0]
    moh = np.zeros(nh, dt)
    moh[h] = 1.0
    return moh, np.asarray(m.mesh_cyl[h], dt)


def _case(tmp_path, pos, quat):
    write_box_stl(str(tmp_path / "cube.stl"))
    xml = XML.format(pos=" ".join(map(str, pos)),
                     quat=" ".join(map(str, quat)))
    path = str(tmp_path / "case.xml")
    with open(path, "w") as f:
        f.write(xml)
    mm = mujoco.MjModel.from_xml_path(path)
    dd = mujoco.MjData(mm)
    mujoco.mj_forward(mm, dd)
    oracle = [(dd.contact[i].dist, np.array(dd.contact[i].pos),
               np.array(dd.contact[i].frame[:3])) for i in range(dd.ncon)]

    m = load_model(path)
    lay = m.layout
    TA = _tabs(m, int(lay.geom_hullid[0]))
    TB = _tabs(m, int(lay.geom_hullid[1]))
    d4, p4, n1, ok, _sep = _jit_pair(
        np.zeros(3), np.eye(3), *TA,
        np.asarray(pos, np.float64), _rotm(np.asarray(quat, np.float64)),
        *TB, np.asarray(True), _tables(m))
    pts = [(float(d4[i]), np.asarray(p4[i]))
           for i in range(4) if float(d4[i]) < 1e8]
    return oracle, pts, np.asarray(n1), bool(ok)


def _match_sets(oracle, ours, tol=1e-6):
    """Every oracle point has one of ours nearby and vice versa."""
    op = np.array([o[1] for o in oracle])
    up = np.array([u[1] for u in ours])
    dmat = np.linalg.norm(op[:, None, :] - up[None, :, :], axis=-1)
    assert dmat.min(axis=1).max() < tol, dmat
    assert dmat.min(axis=0).max() < tol, dmat


def test_face_face_offset_deep(tmp_path):
    """5 cm face-face overlap: 4 overlap-rectangle corners, exact depth,
    shared +z normal."""
    oracle, ours, n, ok = _case(tmp_path, [0.12, 0.08, 0.15], [1, 0, 0, 0])
    assert ok and len(oracle) == 4 and len(ours) == 4
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-12)
    np.testing.assert_allclose([u[0] for u in ours], oracle[0][0],
                               atol=1e-12)
    _match_sets(oracle, ours)


def test_vertex_face_deep(tmp_path):
    """Corner-first cube: single EPA witness point."""
    q = _quat([1, 1, 0], np.arccos(1 / np.sqrt(3)))
    oracle, ours, n, ok = _case(tmp_path, [0.0, 0.0, 0.25], q)
    assert ok and len(oracle) == 1 and len(ours) == 1
    np.testing.assert_allclose(ours[0][0], oracle[0][0], atol=1e-9)
    np.testing.assert_allclose(ours[0][1], oracle[0][1], atol=1e-6)


def test_edge_edge_crossing(tmp_path):
    """45-degree twisted cube resting across an edge: the oracle's
    clipped-feature points all appear in our manifold."""
    oracle, ours, n, ok = _case(tmp_path, [0.0, 0.19, 0.19],
                                _quat([0, 0, 1], np.pi / 4))
    assert ok and len(ours) >= 2
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-12)
    op = np.array([o[1] for o in oracle])
    up = np.array([u[1] for u in ours])
    dmat = np.linalg.norm(op[:, None, :] - up[None, :, :], axis=-1)
    # every oracle point matched (ours may pick extra spread corners)
    assert dmat.min(axis=1).max() < 1e-6


def test_cylinder_side_deep_three_points():
    """Cylinder side 5 cm into a mesh face: oracle multiCCD emits the
    two tangent-segment ends + an interior witness (3 points); ours
    mirrors the pattern (ends exact, interior at the segment middle)."""
    import tempfile, os
    tmp = tempfile.mkdtemp()
    write_box_stl(os.path.join(tmp, "cube.stl"), half=0.2)
    xml = """
<mujoco>
  <asset><mesh name="cube" file="cube.stl"/></asset>
  <worldbody>
    <body name="block" pos="0 0 0"><freejoint/>
      <geom type="mesh" mesh="cube"/></body>
    <body name="cyl" pos="0.03 0.05 0.19" euler="90 0 0"><freejoint/>
      <geom type="cylinder" size="0.04 0.015"/></body>
  </worldbody>
</mujoco>"""
    path = os.path.join(tmp, "cyl.xml")
    with open(path, "w") as f:
        f.write(xml)
    mm = mujoco.MjModel.from_xml_path(path)
    dd = mujoco.MjData(mm)
    mujoco.mj_forward(mm, dd)
    assert dd.ncon == 3
    m = load_model(path)
    lay = m.layout
    TA = _tabs(m, int(lay.geom_hullid[0]))
    TB = _tabs(m, int(lay.geom_hullid[1]))
    RB = dd.geom_xmat[1].reshape(3, 3)
    d4, p4, n1, ok, _sep = _jit_pair(
        np.zeros(3), np.eye(3), *TA,
        dd.geom_xpos[1].copy(), RB.copy(), *TB, np.asarray(True),
        _tables(m))
    pts = np.asarray(p4)[np.asarray(d4) < 1e8]
    assert bool(ok) and len(pts) == 3
    np.testing.assert_allclose(np.asarray(d4)[np.asarray(d4) < 1e8],
                               dd.contact.dist[0], atol=1e-9)
    # segment ends (y = 0.035 / 0.065 at x=0.03, z=0.175); 1e-6 covers
    # the thin-rect delta (1e-6*rb) the clip rectangle carries
    ends_o = np.array([[0.03, 0.035, 0.175], [0.03, 0.065, 0.175]])
    for e in ends_o:
        assert np.linalg.norm(pts - e, axis=-1).min() < 1e-6
    # interior point on the segment
    mid = pts[np.argsort(np.linalg.norm(
        pts - ends_o.mean(0), axis=-1))][0]
    assert abs(mid[0] - 0.03) < 1e-6 and 0.035 < mid[1] < 0.065


def test_face_polygons_tables():
    """face_polygons: cube -> 6 CCW quads; prism -> capped polys; random
    hull faces lie on their planes (ADVICE r2: previously untested)."""
    h = 0.1
    verts = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                      for z in (-h, h)])
    hv, faces = mesh_io.convex_hull(verts)
    a, b, c = hv[faces[:, 0]], hv[faces[:, 1]], hv[faces[:, 2]]
    nrm = np.cross(b - a, c - a)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    planes = np.concatenate([nrm, (nrm * a).sum(1)[:, None]], axis=1)
    fpl, poly, nfv = mesh_io.face_polygons(hv, planes)
    assert len(fpl) == 6 and (nfv == 4).all()
    for p, n_, k in zip(poly, fpl, nfv):
        ring = p[:int(k)]
        # on-plane
        assert np.abs(ring @ n_[:3] - n_[3]).max() < 1e-9
        # CCW about outward normal: cross of consecutive edges along +n
        e0 = ring[1] - ring[0]
        e1 = ring[2] - ring[1]
        assert np.cross(e0, e1) @ n_[:3] > 0
        # repeat-pad: all pad columns equal the last real vertex
        assert (p[int(k):] == ring[-1]).all()
    # random hull: every merged face's verts on its plane, >= 3 each
    rng = np.random.default_rng(0)
    rv = rng.normal(size=(40, 3))
    hv2, faces2 = mesh_io.convex_hull(rv)
    a, b, c = hv2[faces2[:, 0]], hv2[faces2[:, 1]], hv2[faces2[:, 2]]
    nrm = np.cross(b - a, c - a)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    planes2 = np.concatenate([nrm, (nrm * a).sum(1)[:, None]], axis=1)
    fpl2, poly2, nfv2 = mesh_io.face_polygons(hv2, planes2)
    assert (nfv2 >= 3).all()
    for p, n_, k in zip(poly2, fpl2, nfv2):
        assert np.abs(p[:int(k)] @ n_[:3] - n_[3]).max() < 1e-7


def test_hull_edges_and_directions():
    """Cube: 12 unique edges, 3 deduped directions; direction cap keeps
    a spread subset."""
    h = 0.1
    verts = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                      for z in (-h, h)])
    hv, faces = mesh_io.convex_hull(verts)
    a, b, c = hv[faces[:, 0]], hv[faces[:, 1]], hv[faces[:, 2]]
    nrm = np.cross(b - a, c - a)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    planes = np.concatenate([nrm, (nrm * a).sum(1)[:, None]], axis=1)
    fpl, poly, nfv = mesh_io.face_polygons(hv, planes)
    he = mesh_io.hull_edges(poly, nfv)
    assert he.shape == (12, 2, 3)
    ed = mesh_io.edge_directions(poly, nfv)
    assert ed.shape == (3, 3)
    ed2 = mesh_io.edge_directions(poly, nfv, max_dirs=2)
    assert ed2.shape == (2, 3)
    # capped subset keeps non-parallel directions
    assert abs(ed2[0] @ ed2[1]) < 0.99
