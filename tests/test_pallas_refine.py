"""pallas_refine.mtv_query vs the XLA exact-MTV path.

Runs in pallas interpret mode on the CPU backend (the kernel itself is
gated to real TPU in the product path).  The reference is the product's
XLA path (ops/manifold._best_axis coarse pass + refine_rounds_xla),
evaluated on the same unmasked repeat-padded support convention; covers
lane padding, E < K hulls, cylinder-flagged lanes, masked faces, and
the nested vmap(env) o vmap(slot) composition the manifold query uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_sim_tpu.ops import manifold
from mujoco_sim_tpu.ops.pallas_refine import mtv_query


def _rand_hull(rng, V, E, F, cyl=False):
    """Random vertex cloud + edge/face tables + pose for one lane."""
    pts = rng.normal(size=(V, 3)) * 0.3
    q = rng.normal(size=(3, 3))
    R, _ = np.linalg.qr(q)
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    p = rng.normal(size=(3,)) * 0.1
    w = p[None] + pts @ R.T                      # world verts
    vm = np.ones(V)
    he = rng.normal(size=(E, 2, 3)) * 0.3        # local endpoints
    hm = (rng.uniform(size=(E,)) > 0.2).astype(np.float64)
    nf = rng.normal(size=(F, 3))
    nf /= np.linalg.norm(nf, axis=-1, keepdims=True)
    fm = (rng.uniform(size=(F,)) > 0.15).astype(np.float64)
    fm[0] = 1.0                                  # at least one valid face
    cylv = np.array([1.0, 0.2, 0.35]) if cyl else np.zeros(3)
    return dict(w=w, vm=vm, he=he, hm=hm, nf=nf, fm=fm, p=p, R=R, cyl=cylv)


def _one_lane(rng, V, E, F, cylA=False, cylB=False):
    A = _rand_hull(rng, V, E, F, cylA)
    B = _rand_hull(rng, V, E, F, cylB)
    out = {}
    for k, v in A.items():
        out[k + "A"] = v
    for k, v in B.items():
        out[k + "B"] = v
    return out


def _stack(lanes):
    return {k: jnp.asarray(np.stack([ln[k] for ln in lanes]), jnp.float32)
            for k in lanes[0].keys()}


def _ref(b):
    def one(wA, vmA, wB, vmB, heA, hmA, heB, hmB, nfA, fmA, nfB, fmB,
            pA, cylA, pB, cylB, RA, RB):
        A = (wA, vmA, pA, RA[:, 2], cylA)
        B = (wB, vmB, pB, RB[:, 2], cylB)
        axes = jnp.concatenate([nfA, -nfB], axis=0)
        amask = jnp.concatenate([fmA > 0.5, fmB > 0.5])
        depth, n = manifold._best_axis(axes, amask, A, B)
        return manifold.refine_rounds_xla(
            wA, vmA, wB, vmB, heA, hmA, heB, hmB,
            pA, RA[:, 2], cylA, pB, RB[:, 2], cylB, RA, RB, depth, n)

    return jax.vmap(one)(
        b["wA"], b["vmA"], b["wB"], b["vmB"], b["heA"], b["hmA"],
        b["heB"], b["hmB"], b["nfA"], b["fmA"], b["nfB"], b["fmB"],
        b["pA"], b["cylA"], b["pB"], b["cylB"], b["RA"], b["RB"])


def _ker(b, interpret=True):
    return mtv_query(
        b["wA"], b["wB"], b["heA"], b["heB"], b["hmA"], b["hmB"],
        b["nfA"], b["nfB"], b["fmA"], b["fmB"],
        b["RA"], b["RB"], b["pA"], b["pB"], b["cylA"], b["cylB"],
        manifold._K_EDGE, manifold._REFINE_ROUNDS, interpret=interpret)


def _check(b, atol=2e-5):
    dr, nr = _ref(b)
    dk, nk = _ker(b)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dr), atol=atol)
    # the axis pick can legitimately differ only on exact ties; with
    # random hulls ties have measure zero, so the axes must agree
    np.testing.assert_allclose(np.asarray(nk), np.asarray(nr), atol=atol)


@pytest.mark.parametrize("V,E,F,N", [(24, 56, 34, 7), (9, 10, 5, 3),
                                     (74, 216, 144, 2), (40, 90, 60, 130)])
def test_matches_xla(V, E, F, N):
    rng = np.random.default_rng(0)
    b = _stack([_one_lane(rng, V, E, F) for _ in range(N)])
    _check(b)


def test_cylinder_lanes():
    rng = np.random.default_rng(1)
    lanes = [_one_lane(rng, 16, 20, 12, cylA=(i % 2 == 0),
                       cylB=(i % 3 == 0)) for i in range(6)]
    _check(_stack(lanes))


def test_nested_vmap_composes():
    rng = np.random.default_rng(2)
    Ne, S = 3, 4
    lanes = [_one_lane(rng, 12, 14, 10) for _ in range(Ne * S)]
    b = {k: v.reshape((Ne, S) + v.shape[1:])
         for k, v in _stack(lanes).items()}

    def one(ln):
        return _ker(ln)

    dk, nk = jax.vmap(jax.vmap(one))(b)
    flat = {k: v.reshape((Ne * S,) + v.shape[2:]) for k, v in b.items()}
    dr, nr = _ref(flat)
    np.testing.assert_allclose(np.asarray(dk).reshape(-1),
                               np.asarray(dr), atol=2e-5)
    np.testing.assert_allclose(np.asarray(nk).reshape(Ne * S, 3),
                               np.asarray(nr), atol=2e-5)
