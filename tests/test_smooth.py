"""Smooth dynamics kernels vs the C MuJoCo oracle at random states."""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mujoco_sim_tpu.models.compile import load_model
from mujoco_sim_tpu.ops import smooth
from tests.oracle import oracle_model

REF = "/root/reference/model"
MODELS = [
    f"{REF}/test/pendulum.xml",
    f"{REF}/test/ball.xml",
    f"{REF}/test/cup.xml",
    f"{REF}/test/box.xml",
]


def random_state(mm, rng, scale=0.5):
    qpos = mm.qpos0.copy()
    qvel = rng.standard_normal(mm.nv) * scale
    for j in range(mm.njnt):
        t = mm.jnt_type[j]
        adr = mm.jnt_qposadr[j]
        if t == mujoco.mjtJoint.mjJNT_FREE:
            qpos[adr:adr + 3] += rng.standard_normal(3) * scale
            q = rng.standard_normal(4)
            qpos[adr + 3:adr + 7] = q / np.linalg.norm(q)
        elif t == mujoco.mjtJoint.mjJNT_BALL:
            q = rng.standard_normal(4)
            qpos[adr:adr + 4] = q / np.linalg.norm(q)
        else:
            qpos[adr] += rng.standard_normal() * scale
    return qpos, qvel


@pytest.mark.parametrize("path", MODELS)
def test_kinematics_and_dynamics_vs_mujoco(path, rng):
    mm = oracle_model(path)
    dd = mujoco.MjData(mm)
    m = load_model(path)

    for trial in range(3):
        qpos, qvel = random_state(mm, rng)
        dd.qpos[:] = qpos
        dd.qvel[:] = qvel
        mujoco.mj_forward(mm, dd)

        kin = smooth.kinematics(m, jnp.asarray(qpos))
        np.testing.assert_allclose(np.asarray(kin["xpos"]), dd.xpos,
                                   atol=1e-7, err_msg="xpos")
        # quaternions have sign gauge; compare rotation matrices
        np.testing.assert_allclose(
            np.asarray(kin["xmat"]).reshape(-1, 9), dd.xmat,
            atol=1e-7, err_msg="xmat")
        np.testing.assert_allclose(np.asarray(kin["xipos"]), dd.xipos,
                                   atol=1e-7, err_msg="xipos")
        np.testing.assert_allclose(np.asarray(kin["geom_xpos"]), dd.geom_xpos,
                                   atol=1e-7, err_msg="geom_xpos")
        np.testing.assert_allclose(np.asarray(kin["xanchor"]), dd.xanchor,
                                   atol=1e-7, err_msg="xanchor")
        np.testing.assert_allclose(np.asarray(kin["xaxis"]), dd.xaxis,
                                   atol=1e-7, err_msg="xaxis")

        com = smooth.com_pos(m, kin)
        np.testing.assert_allclose(np.asarray(com["subtree_com"]),
                                   dd.subtree_com, atol=1e-7,
                                   err_msg="subtree_com")
        np.testing.assert_allclose(np.asarray(com["cdof"]), dd.cdof,
                                   atol=1e-7, err_msg="cdof")

        vel = smooth.com_vel(m, com, jnp.asarray(qvel))
        np.testing.assert_allclose(np.asarray(vel["cvel"]), dd.cvel,
                                   atol=1e-7, err_msg="cvel")

        qM = smooth.crb(m, com)
        fullM = np.zeros((mm.nv, mm.nv))
        mujoco.mj_fullM(mm, dd, fullM)
        np.testing.assert_allclose(np.asarray(qM), fullM, atol=1e-6,
                                   err_msg="qM")

        qfrc_bias = smooth.rne(m, com, vel, jnp.asarray(qvel))
        np.testing.assert_allclose(np.asarray(qfrc_bias), dd.qfrc_bias,
                                   atol=1e-6, err_msg="qfrc_bias")
