"""Spatial/quaternion math vs the C MuJoCo mju_* oracle."""

import mujoco
import numpy as np
import pytest

from mujoco_sim_tpu.ops import math as m


def rand_quat(rng, n=32):
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_vs_mujoco(rng):
    qa, qb = rand_quat(rng), rand_quat(rng)
    got = np.asarray(m.quat_mul(qa, qb))
    for i in range(len(qa)):
        want = np.zeros(4)
        mujoco.mju_mulQuat(want, qa[i], qb[i])
        np.testing.assert_allclose(got[i], want, atol=1e-12)


def test_rot_vec_quat_vs_mujoco(rng):
    q = rand_quat(rng)
    v = rng.standard_normal((len(q), 3))
    got = np.asarray(m.rot_vec_quat(v, q))
    for i in range(len(q)):
        want = np.zeros(3)
        mujoco.mju_rotVecQuat(want, v[i], q[i])
        np.testing.assert_allclose(got[i], want, atol=1e-12)


def test_quat_to_mat_roundtrip(rng):
    q = rand_quat(rng)
    # canonical sign for comparison
    q = q * np.where(q[:, :1] < 0, -1.0, 1.0)
    mat = np.asarray(m.quat_to_mat(q))
    for i in range(len(q)):
        want = np.zeros(9)
        mujoco.mju_quat2Mat(want, q[i])
        np.testing.assert_allclose(mat[i].ravel(), want, atol=1e-12)
    back = np.asarray(m.mat_to_quat(mat))
    np.testing.assert_allclose(back, q, atol=1e-9)


def test_quat_integrate_vs_mujoco(rng):
    q = rand_quat(rng)
    w = rng.standard_normal((len(q), 3))
    dt = 0.005
    got = np.asarray(m.quat_integrate(q, w, dt))
    for i in range(len(q)):
        want = q[i].copy()
        mujoco.mju_quatIntegrate(want, w[i], dt)
        np.testing.assert_allclose(got[i], want, atol=1e-12)


def test_quat_sub_vs_mujoco(rng):
    qa, qb = rand_quat(rng), rand_quat(rng)
    got = np.asarray(m.quat_sub(qa, qb))
    for i in range(len(qa)):
        want = np.zeros(3)
        mujoco.mju_subQuat(want, qa[i], qb[i])
        np.testing.assert_allclose(got[i], want, atol=1e-9)


def test_motion_force_cross(rng):
    # v x* f == standard dual cross identity: d/dt (I v) terms
    v = rng.standard_normal(6)
    f = rng.standard_normal(6)
    got = np.asarray(m.force_cross(v, f))
    want = np.concatenate(
        [
            np.cross(v[:3], f[:3]) + np.cross(v[3:], f[3:]),
            np.cross(v[:3], f[3:]),
        ]
    )
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_spatial_inertia_force_of_motion(rng):
    mass = np.array(2.5)
    diag = np.abs(rng.standard_normal(3)) + 1.0
    inertia = np.diag(diag)
    com = rng.standard_normal(3)
    si = np.asarray(m.spatial_inertia(mass, inertia, com))
    assert si.shape == (6, 6)
    np.testing.assert_allclose(si, si.T, atol=1e-12)
    # Pure linear acceleration a through origin: force = m*a, torque = c x m*a
    a = np.array([0.0, 0.0, 1.0])
    f = si @ np.concatenate([np.zeros(3), a])
    np.testing.assert_allclose(f[3:], mass * a, atol=1e-12)
    np.testing.assert_allclose(f[:3], np.cross(com, mass * a), atol=1e-12)
