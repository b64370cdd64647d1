"""pallas_refine.refine_rounds vs the XLA refinement rounds.

Runs in pallas interpret mode on the CPU backend (the kernel itself is
gated to real TPU in the product path).  The reference is the product's
XLA path (ops/manifold.refine_rounds_xla), evaluated on the same
unmasked repeat-padded support convention; covers lane padding, E < K
hulls, cylinder-flagged lanes, and the nested vmap(env) o vmap(slot)
composition the manifold query uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_sim_tpu.ops import manifold
from mujoco_sim_tpu.ops.pallas_refine import refine_rounds


def _rand_hull(rng, V, E, cyl=False):
    """Random vertex cloud + edge table + pose for one lane."""
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
    cylv = np.array([1.0, 0.2, 0.35]) if cyl else np.zeros(3)
    return w, vm, he, hm, p, R, cylv


def _one_lane(rng, V, E, cylA=False, cylB=False):
    wA, vmA, heA, hmA, pA, RA, cA = _rand_hull(rng, V, E, cylA)
    wB, vmB, heB, hmB, pB, RB, cB = _rand_hull(rng, V, E, cylB)
    n0 = rng.normal(size=(3,))
    n0 /= np.linalg.norm(n0)
    d0 = rng.uniform(0.05, 0.5)
    return dict(wA=wA, vmA=vmA, heA=heA, hmA=hmA, pA=pA, RA=RA, cylA=cA,
                wB=wB, vmB=vmB, heB=heB, hmB=hmB, pB=pB, RB=RB, cylB=cB,
                d0=d0, n0=n0)


def _stack(lanes):
    keys = lanes[0].keys()
    return {k: jnp.asarray(np.stack([ln[k] for ln in lanes]), jnp.float32)
            for k in keys}


def _ref(b):
    def one(wA, vmA, wB, vmB, heA, hmA, heB, hmB, pA, cylA, pB, cylB,
            RA, RB, d0, n0):
        return manifold.refine_rounds_xla(
            wA, vmA, wB, vmB, heA, hmA, heB, hmB,
            pA, RA[:, 2], cylA, pB, RB[:, 2], cylB, RA, RB, d0, n0)

    return jax.vmap(one)(
        b["wA"], b["vmA"], b["wB"], b["vmB"], b["heA"], b["hmA"],
        b["heB"], b["hmB"], b["pA"], b["cylA"], b["pB"], b["cylB"],
        b["RA"], b["RB"], b["d0"], b["n0"])


def _ker(b):
    return refine_rounds(
        b["wA"], b["wB"], b["heA"], b["heB"], b["hmA"], b["hmB"],
        b["RA"], b["RB"], b["pA"], b["pB"], b["cylA"], b["cylB"],
        b["d0"], b["n0"], manifold._K_EDGE, manifold._REFINE_ROUNDS,
        interpret=True)


def _check(b, atol=2e-5):
    dr, nr = _ref(b)
    dk, nk = _ker(b)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dr), atol=atol)
    # the axis pick can legitimately differ only on exact ties; with
    # random hulls ties have measure zero, so the axes must agree
    np.testing.assert_allclose(np.asarray(nk), np.asarray(nr), atol=atol)


@pytest.mark.parametrize("V,E,N", [(24, 56, 7), (9, 10, 3), (40, 90, 130)])
def test_matches_xla(V, E, N):
    rng = np.random.default_rng(0)
    b = _stack([_one_lane(rng, V, E) for _ in range(N)])
    _check(b)


def test_cylinder_lanes():
    rng = np.random.default_rng(1)
    lanes = [_one_lane(rng, 16, 20, cylA=(i % 2 == 0), cylB=(i % 3 == 0))
             for i in range(6)]
    _check(_stack(lanes))


def test_nested_vmap_composes():
    rng = np.random.default_rng(2)
    Ne, S = 3, 4
    lanes = [_one_lane(rng, 12, 14) for _ in range(Ne * S)]
    b = {k: v.reshape((Ne, S) + v.shape[1:])
         for k, v in _stack(lanes).items()}

    def one(ln):
        return refine_rounds(
            ln["wA"], ln["wB"], ln["heA"], ln["heB"], ln["hmA"], ln["hmB"],
            ln["RA"], ln["RB"], ln["pA"], ln["pB"], ln["cylA"], ln["cylB"],
            ln["d0"], ln["n0"], manifold._K_EDGE, manifold._REFINE_ROUNDS,
            interpret=True)

    dk, nk = jax.vmap(jax.vmap(one))(b)
    flat = {k: v.reshape((Ne * S,) + v.shape[2:]) for k, v in b.items()}
    dr, nr = _ref(flat)
    np.testing.assert_allclose(np.asarray(dk).reshape(-1),
                               np.asarray(dr), atol=2e-5)
    np.testing.assert_allclose(np.asarray(nk).reshape(Ne * S, 3),
                               np.asarray(nr), atol=2e-5)
