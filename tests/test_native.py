"""Native geomlib (C++ STL/quickhull/mass-props) vs the scipy/numpy path."""

import glob

import numpy as np
import pytest

from mujoco_sim_tpu.models import mesh_io, native


@pytest.mark.skipif(not native.available(), reason="geomlib not built")
def test_cube_mass_properties():
    verts = np.array([[x, y, z] for x in (0, 1.0) for y in (0, 1.0)
                      for z in (0, 1.0)]) + [0.3, -0.2, 0.5]
    hull, faces = native.convex_hull(verts)
    vol, com, imat = native.mass_properties(hull, faces)
    assert abs(vol - 1.0) < 1e-9
    np.testing.assert_allclose(com, [0.8, 0.3, 1.0], atol=1e-12)
    np.testing.assert_allclose(np.diag(imat), 1 / 6, atol=1e-9)


@pytest.mark.skipif(not native.available(), reason="geomlib not built")
@pytest.mark.parametrize("stl", sorted(glob.glob(
    "/root/reference/model/test/pr2/pr2/stl/*.stl"))[:6])
def test_native_matches_scipy_on_robot_meshes(stl):
    nv = native.load_stl(stl)
    pv = np.unique(mesh_io.load_stl(stl).reshape(-1, 3), axis=0)
    assert nv.shape == pv.shape
    n_hull, n_faces = native.convex_hull(nv)
    vol_n, com_n, imat_n = native.mass_properties(n_hull, n_faces)
    s_hull, s_faces = mesh_io.convex_hull(pv)
    vol_s, com_s, imat_s = mesh_io.mass_properties(s_hull, s_faces)
    assert abs(vol_n - vol_s) / abs(vol_s) < 1e-9
    np.testing.assert_allclose(com_n, com_s, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(imat_n, imat_s, rtol=1e-7, atol=1e-12)
