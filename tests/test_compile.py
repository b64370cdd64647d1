"""Model compiler vs the C MuJoCo oracle (field-by-field)."""

import mujoco
import numpy as np
import pytest

from mujoco_sim_tpu.models.compile import load_model
from tests.oracle import oracle_model

REF = "/root/reference/model"

MODELS = [
    f"{REF}/test/pendulum.xml",
    f"{REF}/test/ball.xml",
    f"{REF}/test/cup.xml",
    f"{REF}/world/empty.xml",
    f"{REF}/test/box.xml",
]


@pytest.mark.parametrize("path", MODELS)
def test_compile_vs_mujoco(path):
    mm = oracle_model(path)
    m = load_model(path)

    assert m.nq == mm.nq
    assert m.nv == mm.nv
    assert m.nbody == mm.nbody
    assert m.njnt == mm.njnt
    assert m.ngeom == mm.ngeom

    np.testing.assert_array_equal(np.asarray(m.body_parentid), mm.body_parentid)
    np.testing.assert_array_equal(np.asarray(m.body_jntnum), mm.body_jntnum)
    np.testing.assert_array_equal(np.asarray(m.body_dofnum), mm.body_dofnum)
    np.testing.assert_array_equal(np.asarray(m.body_weldid), mm.body_weldid)
    np.testing.assert_array_equal(np.asarray(m.body_rootid), mm.body_rootid)
    np.testing.assert_array_equal(np.asarray(m.jnt_type), mm.jnt_type)
    np.testing.assert_array_equal(np.asarray(m.jnt_qposadr), mm.jnt_qposadr)
    np.testing.assert_array_equal(np.asarray(m.jnt_dofadr), mm.jnt_dofadr)
    np.testing.assert_array_equal(np.asarray(m.dof_bodyid), mm.dof_bodyid)
    np.testing.assert_array_equal(np.asarray(m.dof_parentid), mm.dof_parentid)

    np.testing.assert_allclose(np.asarray(m.body_pos), mm.body_pos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.body_quat), mm.body_quat, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.body_mass), mm.body_mass,
                               rtol=3e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(m.body_ipos), mm.body_ipos,
                               rtol=3e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(m.body_inertia), mm.body_inertia,
                               rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(np.asarray(m.body_subtreemass),
                               mm.body_subtreemass, rtol=3e-5, atol=1e-9)

    np.testing.assert_allclose(np.asarray(m.geom_pos), mm.geom_pos,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.geom_size), mm.geom_size,
                               rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(m.qpos0), mm.qpos0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.dof_damping), mm.dof_damping,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.jnt_stiffness), mm.jnt_stiffness,
                               atol=1e-12)

    np.testing.assert_allclose(float(m.opt.timestep), mm.opt.timestep)
    np.testing.assert_allclose(np.asarray(m.opt.gravity), mm.opt.gravity)

    # inertia orientation: compare full tensors (principal frame has gauge
    # freedom, so compare R diag(I) R^T instead of iquat directly)
    from mujoco_sim_tpu.models import rotations as R

    for i in range(m.nbody):
        mine = R.quat_to_mat_np(np.asarray(m.body_iquat[i]))
        theirs = R.quat_to_mat_np(mm.body_iquat[i])
        ten_mine = mine @ np.diag(np.asarray(m.body_inertia[i])) @ mine.T
        ten_theirs = theirs @ np.diag(mm.body_inertia[i]) @ theirs.T
        np.testing.assert_allclose(ten_mine, ten_theirs, rtol=1e-4, atol=1e-7)


def test_names():
    m = load_model(f"{REF}/test/pendulum.xml")
    assert m.names.body_id("sphere") >= 1
    assert m.names.body_id("cube") >= 1
    assert m.names.body_id("nonexistent") == -1


def test_collision_pairs_pendulum():
    # floor plane vs 3 swinging bodies = 3 pairs (plane-sphere, plane-box,
    # plane-cylinder); bodies also pair among themselves (different roots)
    m = load_model(f"{REF}/test/pendulum.xml")
    assert m.npair >= 3
    # no pair has two planes
    gt = np.asarray(m.geom_type)
    for a, b in zip(np.asarray(m.pair_geom1), np.asarray(m.pair_geom2)):
        assert not (gt[a] == 0 and gt[b] == 0)
