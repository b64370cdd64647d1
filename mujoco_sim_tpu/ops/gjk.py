"""Point-vs-convex-hull closest-point query (GJK / Gilbert distance).

The hull narrowphase measures a probe point against the hull's face
planes; for points OUTSIDE the hull near an edge/vertex region the
max-plane signed distance UNDERESTIMATES the true Euclidean distance
(it is the distance to the supporting plane, not to the hull), which
made sphere-vs-mesh report phantom penetrations near corners
(ridgeback's arm sphere vs base hull read -5.3 mm while the oracle saw
no contact).  This module computes the exact distance with a 3-slot
simplex GJK:

  point_hull_closest(q, verts, mask, enabled) -> (dist, closest_point)

Single-query form, vmapped/vectorized by callers; supports are one-hot
argmax matmuls (no data-dependent gathers) and the loop is a
lax.while_loop with a hard cap, seeded `done` for disabled lanes so a
batch with no enabled lane exits at the first condition check.

Reference behavior: MuJoCo's convex narrowphase (mjc_Convex via
libccd/GJK) measures true hull distances; tests/test_gjk.py checks
random point-hull queries against mujoco 3.10 mj_geomDistance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12
_TOL = 1e-9
_MAX_IT = 24


def _support(verts, mask, d):
    score = (verts * d[None, :]).sum(-1)
    score = jnp.where(mask > 0.5, score, -1e30)
    oh = jax.nn.one_hot(jnp.argmax(score), verts.shape[0],
                        dtype=verts.dtype)
    return oh @ verts


def _closest_on_segment(q, a, b):
    d = b - a
    t = ((q - a) * d).sum() / jnp.maximum((d * d).sum(), _EPS)
    return a + jnp.clip(t, 0.0, 1.0) * d


def _closest_on_triangle(q, a, b, c):
    """Closest point to q on triangle abc, branchless min-over-candidates:
    the three clamped edge projections plus the (validity-gated) interior
    plane projection.  Ericson's region-test formulation was tried first
    but XLA's FMA contraction perturbs the exactly-zero region
    determinants of degenerate (duplicate-vertex) triangles, flipping the
    tests compiled-vs-eager; distance-based selection cannot misroute."""
    p_ab = _closest_on_segment(q, a, b)
    p_ac = _closest_on_segment(q, a, c)
    p_bc = _closest_on_segment(q, b, c)
    n = jnp.cross(b - a, c - a)
    nn = (n * n).sum()
    qa = q - a
    p_in = q - n * (n * qa).sum() / jnp.maximum(nn, _EPS)
    # interior validity: real triangle + projection inside (barycentric
    # via signed sub-areas against the face normal)
    u = (jnp.cross(c - b, q - b) * n).sum()
    v = (jnp.cross(a - c, q - c) * n).sum()
    w = (jnp.cross(b - a, q - a) * n).sum()
    ok_in = (nn > _EPS) & (u >= 0.0) & (v >= 0.0) & (w >= 0.0)
    big = jnp.asarray(jnp.inf, q.dtype)
    cands = jnp.stack([p_ab, p_ac, p_bc, p_in])
    dists = jnp.linalg.norm(q[None, :] - cands, axis=-1)
    dists = dists.at[3].set(jnp.where(ok_in, dists[3], big))
    k = jnp.argmin(dists)
    oh = jax.nn.one_hot(k, 4, dtype=q.dtype)
    return oh @ cands, dists.min()


def point_hull_closest(q, verts, mask, enabled=None):
    """(dist, point): Euclidean distance from q to the masked vertex
    cloud's convex hull and the closest hull point.  Exact for points
    outside; for q inside the hull returns dist ~0 at some boundary-ish
    point (callers gate on the face-plane sdf to detect containment).

    enabled: optional traced bool; disabled lanes exit the loop at the
    first condition check and return garbage (callers mask)."""
    dtype = verts.dtype

    s0 = _support(verts, mask, q - _center(verts, mask))
    # simplex slots start collapsed on s0; duplicates are handled by the
    # degeneracy-guarded triangle routine

    def cond(st):
        *_, it, done = st
        return (~done) & (it < _MAX_IT)

    def body(st):
        a, b, c, p_best, d_best, it, _ = st
        d = q - p_best
        dn = jnp.maximum(jnp.linalg.norm(d), _EPS)
        w = _support(verts, mask, d)
        # duality gap: the support plane through w bounds the hull, so
        # the distance improvement left is at most (d/|d|).(w - p)
        gap = (d * (w - p_best)).sum() / dn
        done = (gap < _TOL) | (dn <= 2 * _EPS)
        # the new simplex is the best of the three triangles containing w
        # (the earlier drop-min-barycentric heuristic could cycle between
        # faces near edge regions and stall at the iteration cap)
        p1, _ = _closest_on_triangle(q, a, b, w)
        p2, _ = _closest_on_triangle(q, a, c, w)
        p3, _ = _closest_on_triangle(q, b, c, w)
        n1 = jnp.linalg.norm(q - p1)
        n2 = jnp.linalg.norm(q - p2)
        n3 = jnp.linalg.norm(q - p3)
        # argmin tie-breaking (lowest index): a strict-< pick stalled on
        # exact ties, re-selecting the degenerate (a,b,w) triangle forever
        k = jnp.argmin(jnp.stack([n1, n2, n3]))
        pick2 = k == 1
        pick3 = k == 2
        a2 = jnp.where(pick3, b, a)
        b2 = jnp.where(pick2 | pick3, c, b)
        p_new = jnp.where(pick2, p2, jnp.where(pick3, p3, p1))
        d_new = jnp.minimum(jnp.minimum(n1, n2), n3)
        better = d_new < d_best
        p_best = jnp.where(better, p_new, p_best)
        d_best = jnp.where(better, d_new, d_best)
        return (a2, b2, w, p_best, d_best, it + 1, done)

    done0 = jnp.asarray(False) if enabled is None else ~enabled
    st = (s0, s0, s0, s0, jnp.linalg.norm(q - s0), jnp.asarray(0), done0)
    _, _, _, p, dist, _, _ = jax.lax.while_loop(cond, body, st)
    return dist.astype(dtype), p


def _center(verts, mask):
    w = jnp.maximum(mask.sum(), 1.0)
    return (verts * mask[:, None]).sum(0) / w
