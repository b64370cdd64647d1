"""Pallas SAT kernel vs the XLA reference-face depth query.

The kernel (ops/pallas_sat.py) replaces collision._hull_ref_face_depth on
the TPU backend; here it runs in pallas interpret mode on CPU and must
reproduce the XLA path exactly — separation, reference-face normal,
per-vertex depths, the lowest-index tie-breaks of the K-smallest
selection, and the mesh-mesh lateral overlap filter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_sim_tpu.ops.collision import _hull_ref_face_depth
from mujoco_sim_tpu.ops.pallas_sat import hull_ref_face_depth


def _random_case(rng, N, V, F, mask=True):
    pts = rng.standard_normal((N, V, 3))
    n = rng.standard_normal((N, F, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    d = rng.uniform(0.3, 1.2, (N, F, 1))
    planes = np.concatenate([n, d], axis=-1)
    if mask:
        vm = (rng.uniform(size=(N, V)) > 0.25).astype(float)
        vm[:, 0] = 1.0  # at least one live vert
    else:
        vm = None
    return jnp.asarray(pts), jnp.asarray(planes), (
        None if vm is None else jnp.asarray(vm))


def _check(pts, planes, vm, lateral=False, slack=0.0):
    dep_x, idx_x, nref_x, sep_x = _hull_ref_face_depth(
        pts, planes, 2, vm, lateral_filter=lateral, lateral_slack=slack)
    dep_p, idx_p, nref_p, sep_p = hull_ref_face_depth(
        pts, planes, 2, vm, lateral_filter=lateral, lateral_slack=slack,
        interpret=True)
    np.testing.assert_allclose(np.asarray(sep_p), np.asarray(sep_x),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(nref_p), np.asarray(nref_x),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dep_p), np.asarray(dep_x),
                               rtol=0, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))


def test_plain(rng):
    pts, planes, _ = _random_case(rng, 50, 12, 20, mask=False)
    _check(pts, planes, None)


def test_masked(rng):
    pts, planes, vm = _random_case(rng, 37, 9, 14)
    _check(pts, planes, vm)


def test_lateral_filter(rng):
    pts, planes, vm = _random_case(rng, 41, 10, 16)
    slack = jnp.asarray(rng.uniform(0.0, 0.3, (41,)))
    _check(pts, planes, vm, lateral=True, slack=slack)


def test_tie_break_matches_argmax(rng):
    # duplicated vertices force exact depth ties; both paths must pick the
    # lowest index (lax.top_k / jnp.argmax convention)
    pts, planes, _ = _random_case(rng, 8, 6, 10, mask=False)
    pts = pts.at[:, 3].set(pts[:, 1])
    _check(pts, planes, None)


def test_under_vmap(rng):
    # the custom_vmap rule flattens (batch, pairs) into the lane axis;
    # results must equal the per-env calls
    B, P, V, F = 3, 5, 8, 12
    pts, planes, vm = _random_case(rng, B * P, V, F)
    pts = pts.reshape(B, P, V, 3)
    planes = planes.reshape(B, P, F, 4)
    vm = vm.reshape(B, P, V)
    slack = jnp.asarray(rng.uniform(0.0, 0.2, (B, P)))

    def f(p, pl_, m, s):
        return hull_ref_face_depth(p, pl_, 2, m, lateral_filter=True,
                                   lateral_slack=s, interpret=True)

    outs_v = jax.vmap(f)(pts, planes, vm, slack)
    for b in range(B):
        outs_1 = f(pts[b], planes[b], vm[b], slack[b])
        for ov, o1 in zip(outs_v, outs_1):
            np.testing.assert_allclose(np.asarray(ov[b]), np.asarray(o1),
                                       rtol=0, atol=1e-12)


def test_collision_gate_off_on_cpu():
    from mujoco_sim_tpu.ops.pallas_sat import use_pallas_sat
    assert jax.default_backend() == "cpu"
    assert not use_pallas_sat()
