"""Collision: static pair list + batched primitive narrowphase.

The reference relies on libmujoco's broadphase/narrowphase inside mj_step1
(SURVEY.md §2.2).  Here broadphase is *compile-time*: the candidate pair list
honoring contype/conaffinity, weld/parent-child filters and <contact><exclude>
is frozen in the model (models/compile.py), and every pair owns fixed contact
slots so shapes never change.  Narrowphase runs vectorized per pair-type
group; inactive slots are masked, not absent.

Contact frame convention matches MuJoCo: normal points from geom1 to geom2,
frame rows = [normal, tangent1, tangent2], pos = midpoint between surfaces.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import (Model, Data, GeomType,
                                          contact_rows_per)
from mujoco_sim_tpu.ops.gjk import point_hull_closest


def _rows_per(m: Model) -> int:
    return contact_rows_per(m.max_condim, m.opt.cone)


def _top_k_small(x: jax.Array, k: int):
    """(values, indices) of the k LARGEST of x along the last axis.

    lax.top_k lowers to a full variadic sort custom-call that costs ~2.5 ms
    per step at 4096 envs on TPU (profiled r2); for the tiny n here
    (candidate lists of 8..64) k argmax/mask passes fuse into the step
    program and are ~100x cheaper.  Ties resolve to the lowest index, same
    as lax.top_k.
    """
    n = x.shape[-1]
    if k >= n:
        # every element is selected; callers mask by value, so identity
        # order suffices (and avoids a hidden sort)
        idx = jnp.broadcast_to(jnp.arange(n), x.shape)
        return x, idx
    iota = jnp.arange(n)
    cur = x
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(cur, axis=-1)
        v = jnp.max(cur, axis=-1)
        vals.append(v)
        idxs.append(i)
        cur = jnp.where(iota == i[..., None], -jnp.inf, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def _make_tangents(n: jax.Array):
    """Two unit tangents orthogonal to n (batch-safe)."""
    # pick the world axis least aligned with n
    a = jnp.where(jnp.abs(n[..., 0:1]) < 0.5,
                  jnp.broadcast_to(jnp.array([1.0, 0, 0], n.dtype), n.shape),
                  jnp.broadcast_to(jnp.array([0.0, 1, 0], n.dtype), n.shape))
    t1 = jnp.cross(n, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _plane_sphere(pp, pR, s1, sp, sR, size2):
    """1 contact: (dist, pos, normal). pp/pR plane frame; sp sphere center."""
    n = pR[..., :, 2]
    h = (n * (sp - pp)).sum(-1)
    r = size2[..., 0]
    dist = h - r
    pos = sp - n * (r + 0.5 * dist)[..., None]
    return dist[..., None], pos[..., None, :], n[..., None, :]


def _plane_capsule(pp, pR, s1, cp, cR, size2):
    """2 contacts at the capsule end-sphere centers."""
    n = pR[..., :, 2]
    axis = cR[..., :, 2]
    r = size2[..., 0]
    hh = size2[..., 1]
    ends = jnp.stack([cp + axis * hh[..., None], cp - axis * hh[..., None]],
                     axis=-2)  # (...,2,3)
    h = (n[..., None, :] * (ends - pp[..., None, :])).sum(-1)
    dist = h - r[..., None]
    pos = ends - n[..., None, :] * (r[..., None] + 0.5 * dist)[..., None]
    nrm = jnp.broadcast_to(n[..., None, :], pos.shape)
    return dist, pos, nrm


def _plane_box(pp, pR, s1, bp, bR, size2):
    """4 deepest corners."""
    n = pR[..., :, 2]
    corners = jnp.asarray(np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]),
        dtype=bp.dtype)  # (8,3)
    pts = bp[..., None, :] + _rotate_rows_fwd(
        bR, corners * size2[..., None, :])
    h = (n[..., None, :] * (pts - pp[..., None, :])).sum(-1)
    # 4 smallest heights
    neg_h, idx = _top_k_small(-h, 4)
    dist = -neg_h
    pos = _select_rows(pts, idx)
    pos = pos - n[..., None, :] * (0.5 * dist)[..., None]
    nrm = jnp.broadcast_to(n[..., None, :], pos.shape)
    return dist, pos, nrm


def _plane_cylinder(pp, pR, s1, cp, cR, size2):
    """4 candidate support points (both rim extremes of both caps)."""
    n = pR[..., :, 2]
    axis = cR[..., :, 2]
    r = size2[..., 0]
    hh = size2[..., 1]
    # downhill direction in cap plane
    proj = (n * axis).sum(-1)
    u = n - axis * proj[..., None]
    un = jnp.linalg.norm(u, axis=-1, keepdims=True)
    # if axis || n, pick arbitrary radial dir
    alt = cR[..., :, 0]
    u = jnp.where(un > 1e-8, u / jnp.maximum(un, 1e-12), alt)
    caps = jnp.stack([cp + axis * hh[..., None], cp - axis * hh[..., None]],
                     axis=-2)
    pts = jnp.concatenate([
        caps - u[..., None, :] * r[..., None, None],
        caps + u[..., None, :] * r[..., None, None],
    ], axis=-2)  # (...,4,3)
    h = (n[..., None, :] * (pts - pp[..., None, :])).sum(-1)
    pos = pts - n[..., None, :] * (0.5 * h)[..., None]
    nrm = jnp.broadcast_to(n[..., None, :], pos.shape)
    return h, pos, nrm


def _plane_ellipsoid(pp, pR, s1, ep, eR, size2):
    n = pR[..., :, 2]
    # support point in -n direction: x = -E^2 R^T n / |E R^T n|
    nl = (eR * n[..., :, None]).sum(-2)        # n in ellipsoid frame
    en = size2 * nl
    denom = jnp.linalg.norm(en, axis=-1, keepdims=True)
    xl = -(size2 * en) / jnp.maximum(denom, 1e-12)
    x = ep + (eR * xl[..., None, :]).sum(-1)
    h = (n * (x - pp)).sum(-1)
    pos = x - n * (0.5 * h)[..., None]
    return h[..., None], pos[..., None, :], n[..., None, :]


def _sphere_sphere(p1, R1, s1, p2, R2, s2):
    d = p2 - p1
    dist_c = jnp.linalg.norm(d, axis=-1)
    n = d / jnp.maximum(dist_c[..., None], 1e-12)
    r1, r2 = s1[..., 0], s2[..., 0]
    dist = dist_c - r1 - r2
    pos = p1 + n * (r1 + 0.5 * dist)[..., None]
    return dist[..., None], pos[..., None, :], n[..., None, :]


def _sphere_capsule(p1, R1, s1, p2, R2, s2):
    axis = R2[..., :, 2]
    hh = s2[..., 1]
    t = jnp.clip(((p1 - p2) * axis).sum(-1), -hh, hh)
    cp = p2 + axis * t[..., None]
    d = cp - p1
    dist_c = jnp.linalg.norm(d, axis=-1)
    n = d / jnp.maximum(dist_c[..., None], 1e-12)
    r1, r2 = s1[..., 0], s2[..., 0]
    dist = dist_c - r1 - r2
    pos = p1 + n * (r1 + 0.5 * dist)[..., None]
    return dist[..., None], pos[..., None, :], n[..., None, :]


def _capsule_capsule(p1, R1, s1, p2, R2, s2):
    """2 contacts from closest points between the two segments (the second
    candidate probes the opposite end for near-parallel capsules)."""
    a1 = R1[..., :, 2]
    a2 = R2[..., :, 2]
    h1 = s1[..., 1]
    h2 = s2[..., 1]
    r1 = s1[..., 0]
    r2 = s2[..., 0]
    # closed-form segment-segment closest parameters (clamped)
    d12 = p2 - p1
    A = jnp.ones_like(h1)                     # a1.a1
    B = (a1 * a2).sum(-1)
    C = (a1 * d12).sum(-1)
    E = (a2 * d12).sum(-1)
    den = jnp.maximum(A - B * B, 1e-9)
    t1 = jnp.clip((C - B * E) / den, -h1, h1)
    t2 = jnp.clip(B * t1 - E, -h2, h2)
    # refine t1 against the clamped t2 (Ericson's closest-segment scheme)
    t1 = jnp.clip(C + B * t2, -h1, h1)

    def contact_at(t1_, t2_):
        q1 = p1 + a1 * t1_[..., None]
        q2 = p2 + a2 * t2_[..., None]
        dd = q2 - q1
        dist_c = jnp.linalg.norm(dd, axis=-1)
        n = dd / jnp.maximum(dist_c[..., None], 1e-12)
        dist = dist_c - r1 - r2
        pos = q1 + n * (r1 + 0.5 * dist)[..., None]
        return dist, pos, n

    dA, posA, nA = contact_at(t1, t2)
    dB, posB, nB = contact_at(-t1, -t2)
    dist = jnp.stack([dA, dB], axis=-1)
    pos = jnp.stack([posA, posB], axis=-2)
    nrm = jnp.stack([nA, nB], axis=-2)
    return dist, pos, nrm


def _capsule_box(p1, R1, s1, p2, R2, s2):
    """3 contacts: sphere-box queries at both capsule ends + midpoint."""
    axis = R1[..., :, 2]
    hh = s1[..., 1]
    outs = []
    for f in (-1.0, 0.0, 1.0):
        c = p1 + axis * (f * hh)[..., None]
        sz = jnp.concatenate([s1[..., 0:1],
                              jnp.zeros_like(s1[..., 1:3])], axis=-1)
        d_, pos_, n_ = _sphere_box(c, R1, sz, p2, R2, s2)
        outs.append((d_, pos_, n_))
    dist = jnp.concatenate([o[0] for o in outs], axis=-1)
    pos = jnp.concatenate([o[1] for o in outs], axis=-2)
    nrm = jnp.concatenate([o[2] for o in outs], axis=-2)
    return dist, pos, nrm


def _sphere_box(p1, R1, s1, p2, R2, s2):
    # sphere center in box frame
    cl = (R2 * (p1 - p2)[..., :, None]).sum(-2)
    clamped = jnp.clip(cl, -s2, s2)
    inside = jnp.all(jnp.abs(cl) < s2, axis=-1)
    # outside: closest point on surface
    d_out = cl - clamped
    dist_out = jnp.linalg.norm(d_out, axis=-1)
    n_out = -d_out / jnp.maximum(dist_out[..., None], 1e-12)  # toward box
    # inside: push out along min-penetration face
    depth = s2 - jnp.abs(cl)
    ax = jnp.argmin(depth, axis=-1)
    sign = jnp.sign(_oh_pick(cl, ax))
    n_in = -(jax.nn.one_hot(ax, 3, dtype=cl.dtype) * sign[..., None])
    dist_in = -_oh_pick(depth, ax)
    surf = jnp.where(inside[..., None],
                     clamped + n_in * dist_in[..., None], clamped)
    nl = jnp.where(inside[..., None], n_in, n_out)
    dist_l = jnp.where(inside, dist_in, dist_out)
    r1 = s1[..., 0]
    dist = dist_l - r1
    # back to world: normal from sphere toward box
    n = (R2 * nl[..., None, :]).sum(-1)
    surf_w = p2 + (R2 * surf[..., None, :]).sum(-1)
    pos = 0.5 * (surf_w + p1 + n * r1[..., None])
    return dist[..., None], pos[..., None, :], n[..., None, :]


def _box_box(p1, R1, s1, p2, R2, s2):
    """8 contacts via full SAT (6 face + 9 edge-edge axes).

    The separating axis is chosen among all 15 (max separation / min
    penetration) with a small bias toward face normals for stable
    face-on-face stacking.  Face axis -> corner candidates of each box
    measured as penetration past the other box's support plane along the
    axis, gated by lateral containment.  Edge-edge axis -> one contact at
    the closest point between the two support edges (the case mj_collideBox
    handles through its cross-axis SAT).
    """
    dtype = p1.dtype
    corners = jnp.asarray(np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]),
        dtype=dtype)
    t = p2 - p1  # (...,3)

    # candidate face axes: columns of R1 and R2 -> (..., 6, 3)
    axes = jnp.concatenate([jnp.swapaxes(R1, -1, -2),
                            jnp.swapaxes(R2, -1, -2)], axis=-2)
    # projection radii of each box onto each axis
    proj1 = jnp.abs((axes[..., :, :, None] * R1[..., None, :, :]).sum(-2))
    ra = (proj1 * s1[..., None, :]).sum(-1)
    proj2 = jnp.abs((axes[..., :, :, None] * R2[..., None, :, :]).sum(-2))
    rb = (proj2 * s2[..., None, :]).sum(-1)
    ta = (axes * t[..., None, :]).sum(-1)
    sep = jnp.abs(ta) - ra - rb          # (...,6), >0 = separated
    k = jnp.argmax(sep, axis=-1)
    sep_face = jnp.max(sep, axis=-1)
    a_k = _oh_pick_rows(axes, k)
    ta_k = _oh_pick(ta, k)
    n = a_k * jnp.sign(ta_k)[..., None]  # points from box1 toward box2
    ra_k = _oh_pick(ra, k)
    rb_k = _oh_pick(rb, k)

    # ---- edge-edge axes: cross(R1[:,i], R2[:,j]), 9 candidates
    e1 = jnp.swapaxes(R1, -1, -2)        # (...,3,3) rows = box1 axes
    e2 = jnp.swapaxes(R2, -1, -2)
    cr = jnp.cross(e1[..., :, None, :], e2[..., None, :, :])  # (...,3,3,3)
    cr = cr.reshape(cr.shape[:-3] + (9, 3))
    crn = jnp.linalg.norm(cr, axis=-1)
    ok = crn > 1e-6                       # near-parallel edges degenerate
    cru = cr / jnp.maximum(crn[..., None], 1e-12)
    ra_e = (jnp.abs((cru[..., :, :, None] * R1[..., None, :, :]).sum(-2))
            * s1[..., None, :]).sum(-1)
    rb_e = (jnp.abs((cru[..., :, :, None] * R2[..., None, :, :]).sum(-2))
            * s2[..., None, :]).sum(-1)
    ta_e = (cru * t[..., None, :]).sum(-1)
    sep_e = jnp.where(ok, jnp.abs(ta_e) - ra_e - rb_e, -1e9)
    ke = jnp.argmax(sep_e, axis=-1)
    sep_edge = jnp.max(sep_e, axis=-1)
    # face bias: the edge axis must beat the best face axis by a margin to
    # be chosen (avoids flip-flopping on near-degenerate configurations)
    edge_wins = sep_edge > sep_face + jnp.asarray(1e-4, dtype)
    a_e = _oh_pick_rows(cru, ke)
    ta_ke = _oh_pick(ta_e, ke)
    n_e = a_e * jnp.sign(ta_ke)[..., None]   # from box1 toward box2
    # support edges: box1 edge along axis i shifted maximally along +n_e,
    # box2 edge along axis j shifted along -n_e
    i_idx = ke // 3
    j_idx = ke % 3
    dir1 = _oh_pick_rows(e1, i_idx)
    dir2 = _oh_pick_rows(e2, j_idx)
    sgn1 = jnp.sign((e1 * n_e[..., None, :]).sum(-1))
    sgn2 = -jnp.sign((e2 * n_e[..., None, :]).sum(-1))
    mask1 = 1.0 - jax.nn.one_hot(i_idx, 3, dtype=dtype)   # off-axis dims
    mask2 = 1.0 - jax.nn.one_hot(j_idx, 3, dtype=dtype)
    c1 = p1 + ((sgn1 * mask1 * s1)[..., :, None] * e1).sum(-2)
    c2 = p2 + ((sgn2 * mask2 * s2)[..., :, None] * e2).sum(-2)
    h1 = _oh_pick(s1, i_idx)
    h2 = _oh_pick(s2, j_idx)
    # closest points between segments (c1 +- h1 dir1), (c2 +- h2 dir2)
    d12 = c2 - c1
    Bd = (dir1 * dir2).sum(-1)
    Cd = (dir1 * d12).sum(-1)
    Ed = (dir2 * d12).sum(-1)
    den = jnp.maximum(1.0 - Bd * Bd, 1e-9)
    t1 = jnp.clip((Cd - Bd * Ed) / den, -h1, h1)
    t2 = jnp.clip(Bd * t1 - Ed, -h2, h2)
    t1 = jnp.clip(Cd + Bd * t2, -h1, h1)
    q1 = c1 + dir1 * t1[..., None]
    q2 = c2 + dir2 * t2[..., None]
    pos_edge = 0.5 * (q1 + q2)
    dist_edge = jnp.where(edge_wins, sep_edge, jnp.asarray(1e9, dtype))

    def corner_candidates(pc, Rc, sc, p_other, R_other, s_other,
                          depth_fn):
        pts = pc[..., None, :] + _rotate_rows_fwd(Rc, corners * sc[..., None, :])
        dist = depth_fn(pts)
        # lateral containment in the other box (slack = 5% of size)
        loc = _rotate_rows(R_other, pts - p_other[..., None, :])
        inside = jnp.abs(loc) <= (s_other * 1.05 + 1e-4)[..., None, :]
        # only require the two axes orthogonal to the contact normal; the
        # normal-axis containment is what `dist` measures.  Approximate by
        # requiring at least 2 of 3 axes inside.
        n_inside = inside.sum(axis=-1)
        ok = n_inside >= 2
        dist = jnp.where(ok, dist, 1e9)
        return dist, pts

    # corners of box2 vs box1's far support plane along n:
    # depth = (c - p1).n - ra  (negative = penetrating past the plane)
    d2c, pts2 = corner_candidates(
        p2, R2, s2, p1, R1, s1,
        lambda pts: ((pts - p1[..., None, :]) * n[..., None, :]).sum(-1)
        - ra_k[..., None])
    # corners of box1 vs box2's near support plane:
    # depth = (p2 - c).n - rb
    d1c, pts1 = corner_candidates(
        p1, R1, s1, p2, R2, s2,
        lambda pts: (n[..., None, :] * (p2[..., None, :] - pts)).sum(-1)
        - rb_k[..., None])
    dist = jnp.concatenate([d2c, d1c], axis=-1)
    # corners are bogus when the separating axis is edge-edge
    dist = jnp.where(edge_wins[..., None], 1e9, dist)
    dist = jnp.concatenate([dist, dist_edge[..., None]], axis=-1)  # (...,17)
    pts = jnp.concatenate([pts2, pts1, pos_edge[..., None, :]], axis=-2)
    nrms = jnp.concatenate(
        [jnp.broadcast_to(n[..., None, :], pts2.shape),
         jnp.broadcast_to(n[..., None, :], pts1.shape),
         n_e[..., None, :]], axis=-2)
    neg, idx = _top_k_small(-dist, 8)
    dist8 = -neg
    pos8 = _select_rows(pts, idx)
    nrm8 = _select_rows(nrms, idx)
    return dist8, pos8, nrm8


def _plane_mesh(pp, pR, s1, mp, mR, verts, vmask, margin=0.0):
    """<= 3 contacts replicating mjc_PlaneConvex's emission rule (probed
    vs mujoco 3.10, scripts/probe_planeconvex.py): only vertices BELOW
    the plane (+margin) emit; c0 = deepest vertex, c1 = below vertex
    furthest from c0, c2 = below vertex furthest from the line (c0, c1).
    A flat 4+-vertex resting face thus gets the oracle's exact 3-point
    support polygon — the r1-r3 4-deepest manifold put a 4th support
    under every resting mesh and drifted the yaw (manip parity 0.16
    rad/50 steps).  verts padded; vmask masks padding."""
    dtype = pp.dtype
    big = jnp.asarray(1e9, dtype)
    n = pR[..., :, 2]
    pts = mp[..., None, :] + _rotate_rows_fwd(mR, verts)
    h = (n[..., None, :] * (pts - pp[..., None, :])).sum(-1)
    h = jnp.where(vmask > 0.5, h, big)
    below = h < jnp.asarray(margin, dtype)
    nbelow = below.sum(axis=-1)
    # c0: deepest vertex (always computed; act masks it when separated)
    i0 = jnp.argmin(h, axis=-1)
    p0 = _oh_pick_rows(pts, i0)
    d0 = _oh_pick(h, i0)
    # c1: furthest below vertex from c0, scanning only STORED indices
    # AFTER c0 (the probed mjc_PlaneConvex rule: its c1 loop starts at
    # i0+1, so a farther below vertex stored BEFORE c0 is never picked)
    dist0 = jnp.linalg.norm(pts - p0[..., None, :], axis=-1)
    after0 = jnp.arange(h.shape[-1]) > i0[..., None]
    below1 = below & after0
    s1c = jnp.where(below1, dist0, -1.0)
    i1 = jnp.argmax(s1c, axis=-1)
    p1 = _oh_pick_rows(pts, i1)
    d1 = jnp.where(below1.sum(axis=-1) >= 1, _oh_pick(h, i1), big)
    # c2: furthest below vertex from the line (c0, c1)
    u = (p1 - p0) / jnp.maximum(
        jnp.linalg.norm(p1 - p0, axis=-1, keepdims=True), 1e-12)
    dv = pts - p0[..., None, :]
    perp = dv - (dv * u[..., None, :]).sum(-1)[..., None] * u[..., None, :]
    ld = jnp.linalg.norm(perp, axis=-1)
    s2c = jnp.where(below, ld, -1.0)
    i2 = jnp.argmax(s2c, axis=-1)
    # c2 needs the (c0, c1) line, so it also needs c1 to exist
    d2 = jnp.where((nbelow >= 3) & (below1.sum(axis=-1) >= 1),
                   _oh_pick(h, i2), big)
    dist = jnp.stack([d0, d1, d2], axis=-1)
    pos = jnp.stack([p0, p1, _oh_pick_rows(pts, i2)], axis=-2)
    pos = pos - n[..., None, :] * (0.5 * dist)[..., None]
    nrm = jnp.broadcast_to(n[..., None, :], pos.shape)
    return dist, pos, nrm


# ---------------------------------------------------------------------------
# Hull (convex mesh) narrowphase: points vs padded face planes.
# Convention reminder: contact normal points geom1 -> geom2; a vertex of
# geom1 penetrating geom2's face F (outward normal nf) gets n = -nf, a vertex
# of geom2 penetrating geom1 gets n = +nf (cf. _box_box SAT orientation).
# ---------------------------------------------------------------------------

def _pts_vs_planes(pts_local, planes):
    """(..., k, 3) x (..., f, 4) -> signed distances (..., k, f).

    Written as broadcast-multiply + reduce over the 3-axis, NOT einsum: XLA
    lowers a K=3 dot_general as a 'convolution fusion' that ran at ~30 GB/s
    on the r2 PR2 trace (443us per call); the elementwise form fuses into
    the downstream min/max reductions on the VPU."""
    prod = pts_local[..., :, None, :] * planes[..., None, :, :3]
    return prod.sum(-1) - planes[..., None, :, 3]


def _rotate_rows(R, pts):
    """world->local: (..., 3, 3) x (..., k, 3) -> R^T pts (..., k, 3)."""
    return (R[..., None, :, :] * pts[..., :, :, None]).sum(-2)


def _rotate_rows_fwd(R, pts):
    """local->world: (..., 3, 3) x (..., k, 3) -> R pts (..., k, 3)."""
    return (R[..., None, :, :] * pts[..., :, None, :]).sum(-1)


def _hull_sdf(pts_local, planes):
    """pts_local (..., k, 3), planes (..., f, 4) -> (sdf (...,k), face idx)."""
    vals = _pts_vs_planes(pts_local, planes)
    sdf = vals.max(axis=-1)
    fidx = vals.argmax(axis=-1)
    return sdf, fidx


def _hull_ref_face_depth(pts_local, planes, k_out, pts_mask=None,
                         lateral_filter=False, lateral_slack=0.0):
    """Vertex depths measured along the face-normal SAT axis.

    The reference face maximizes (over faces) the minimum (over points)
    signed distance — for face-dominated contact this is the true MTV axis,
    so the deepest vertex's depth equals MuJoCo's MPR penetration depth
    (the r1 per-vertex-nearest-face sdf underestimated it: PR2 fingertips
    read -1.06 mm vs the oracle's -1.73 mm).  Edge-edge hull axes are not
    enumerated; depth is a lower bound in that (rarer) case.

    lateral_filter: drop vertices that are laterally OUTSIDE the other
    hull (full-sdf max over faces > their ref-face depth + slack): on
    large flat hulls the far corners tie the MTV plane-depth while
    sitting nowhere near the overlap, spawning phantom manifold points
    (hsrb4s base vs wheel r3 diagnosis; the oracle's single EPA contact
    has no analogue).  lateral_slack (broadcastable to the vert batch)
    keeps NEAR-overlap overhang corners — face-face stacks lean on them
    — while still rejecting far-away corners; callers pass a fraction of
    the other hull's bounding radius.
    Returns (depth (...,k_out), pts idx (...,k_out), nref (...,3) local).

    On the TPU backend the query runs as a fused pallas kernel
    (ops/pallas_sat.py) instead of materializing the (instances, V, F)
    support tensor to HBM; the XLA form below is the CPU/test path and
    the MST_DISABLE_PALLAS A/B reference.
    """
    from mujoco_sim_tpu.ops.pallas_sat import (hull_ref_face_depth,
                                               use_pallas_sat)
    if use_pallas_sat() and pts_local.ndim == 3:
        return hull_ref_face_depth(pts_local, planes, k_out, pts_mask,
                                   lateral_filter, lateral_slack)
    vals = _pts_vs_planes(pts_local, planes)    # (..., V, F)
    if pts_mask is not None:
        vals = jnp.where(pts_mask[..., :, None] > 0.5, vals, 1e9)
    per_face_min = vals.min(axis=-2)            # (..., F) support separation
    sep = per_face_min.max(axis=-1)             # >0 => a face separates
    ref_f = jnp.argmax(per_face_min, axis=-1)
    # one-hot contraction instead of take_along_axis: TPU element gathers on
    # the (V, F) tensor cost ~8 ms/step on PR2 (r2 trace fusion.8608), and
    # recomputing depth from the 4-float plane avoids materializing vals
    oh = jax.nn.one_hot(ref_f, planes.shape[-2], dtype=planes.dtype)
    plane = (oh[..., None] * planes).sum(-2)
    nref = plane[..., :3]
    depth = ((pts_local * nref[..., None, :]).sum(-1)
             - plane[..., 3:4])
    if lateral_filter:
        vert_sdf = vals.max(axis=-1)            # (..., V) true convex sdf
        slack = jnp.asarray(lateral_slack)[..., None] + 1e-4
        keep = vert_sdf <= jnp.maximum(depth, 0.0) + slack
        # edge/vertex-region contacts can have EVERY vert laterally
        # outside (no hull vert inside the other); keep the raw manifold
        # then rather than emitting nothing for a touching pair
        any_keep = keep.any(axis=-1, keepdims=True)
        depth = jnp.where(keep | ~any_keep, depth, 1e9)
    if pts_mask is not None:
        depth = jnp.where(pts_mask > 0.5, depth, 1e9)
    neg, idx = _top_k_small(-depth, k_out)
    out_depth = -neg
    return out_depth, idx, nref, sep


def _face_normal_world(R, planes, fidx):
    # fidx (...,k); planes (...,f,4) -> outward face normals (...,k,3) world
    # (one-hot contraction: element gathers are slow on TPU, r2 trace)
    oh = jax.nn.one_hot(fidx, planes.shape[-2], dtype=planes.dtype)
    nf = (oh[..., :, :, None] * planes[..., None, :, :3]).sum(-2)
    return _rotate_rows_fwd(R, nf)


def _oh_pick(vals, idx):
    """vals (..., n) picked at idx (...,) via one-hot reduce (TPU
    take_along_axis lowers to element gathers — see _pts_vs_planes)."""
    oh = jax.nn.one_hot(idx, vals.shape[-1], dtype=vals.dtype)
    return (vals * oh).sum(-1)


def _oh_pick_rows(rows, idx):
    """rows (..., n, 3) picked at idx (...,) -> (..., 3) via one-hot."""
    oh = jax.nn.one_hot(idx, rows.shape[-2], dtype=rows.dtype)
    return (rows * oh[..., None]).sum(-2)


def _select_rows(pts, idx):
    """pts (..., n, 3) at idx (..., k) -> (..., k, 3) via one-hot reduce
    (elementwise form — see _pts_vs_planes on why not einsum)."""
    oh = jax.nn.one_hot(idx, pts.shape[-2], dtype=pts.dtype)
    return (oh[..., :, :, None] * pts[..., None, :, :]).sum(-2)


def _point_hull_refine(q, sdf, nref_l, verts, planes, vmask,
                       near_window=0.01):
    """Corner/edge-region exact distance for probe points OUTSIDE a hull.

    The max-plane sdf is the distance to the reference face's PLANE; for
    points whose projection leaves the face polygon (edge/vertex Voronoi
    regions) it underestimates the Euclidean hull distance, spawning
    phantom contacts (ridgeback's arm sphere vs base hull read -5.3 mm
    where the oracle saw no contact).  Runs the GJK closest-point query
    (ops/gjk.py) only for outside points that are near-contact AND whose
    face projection exits the hull; all-disabled batches exit the GJK
    while_loop at its first condition check, so face-resting contacts
    pay ~nothing.

    q (..., 3) local probe points, sdf (...,) their max-plane sdf,
    nref_l (..., 3) their reference-face local normal; verts/planes/
    vmask must broadcast against q's batch dims.  near_window bounds the
    plane sdf for which refinement can matter — callers add the probe
    radius (a sphere's plane sdf sits at r + dist).
    Returns (dist (...,), dir (..., 3) unit probe->hull local, enabled).
    """
    qp = q - sdf[..., None] * nref_l
    psdf_qp = _pts_vs_planes(qp[..., None, :], planes)[..., 0, :].max(-1)
    enabled = (sdf > 0.0) & (psdf_qp > 1e-6) & (sdf < jnp.asarray(near_window))
    vq = jnp.vectorize(point_hull_closest,
                       signature='(d),(v,d),(v),()->(),(d)')
    gd, gp = vq(q, verts, vmask, enabled)
    direc = (gp - q) / jnp.maximum(gd, 1e-12)[..., None]
    return gd, direc, enabled


def _local_face_normals(planes, fidx):
    """planes (..., f, 4) at fidx (..., k) -> local outward normals
    (..., k, 3) via one-hot contraction."""
    oh = jax.nn.one_hot(fidx, planes.shape[-2], dtype=planes.dtype)
    return (oh[..., :, :, None] * planes[..., None, :, :3]).sum(-2)


def _sphere_mesh(p1, R1, s1, p2, R2, verts2, planes2, vmask2):
    cl0 = (R2 * (p1 - p2)[..., :, None]).sum(-2)    # (..., 3) local center
    cl = cl0[..., None, :]
    sdf, fidx = _hull_sdf(cl, planes2)              # (..., 1)
    r = s1[..., 0:1]
    dist = sdf - r
    n_w = -_face_normal_world(R2, planes2, fidx)
    nref_l = _local_face_normals(planes2, fidx)     # (..., 1, 3)
    gd, gdir_l, en = _point_hull_refine(cl0, sdf[..., 0],
                                        nref_l[..., 0, :],
                                        verts2, planes2, vmask2,
                                        near_window=r[..., 0] + 0.01)
    dist = jnp.where(en[..., None], gd[..., None] - r, dist)
    n_w = jnp.where(en[..., None, None],
                    _rotate_rows_fwd(R2, gdir_l[..., None, :]), n_w)
    pos = p1[..., None, :] + n_w * (r + 0.5 * dist)[..., None]
    return dist, pos, n_w


def _capsule_mesh(p1, R1, s1, p2, R2, verts2, planes2, vmask2):
    """3 sphere probes along the axis: both ends + the mid point.

    The mid probe supplies side contacts when the capsule lies across a hull
    face/edge (VERDICT r1 #3: end-sphere-only probing missed them); a
    refinement step slides each probe toward its face's deepest axis point,
    and outside-corner-region probes get the exact GJK hull distance
    (_point_hull_refine: the plane sdf spawned phantom contacts there).
    """
    axis = R1[..., :, 2]
    hh = s1[..., 1]
    probes = jnp.stack([p1 + axis * hh[..., None],
                        p1 - axis * hh[..., None],
                        p1], axis=-2)  # (...,3,3)
    cl = _rotate_rows(R2, probes - p2[..., None, :])
    sdf, fidx = _hull_sdf(cl, planes2)
    # refine: move each probe along the capsule axis to the deepest point
    # against its current face plane (linear in the axis parameter), then
    # re-evaluate the sdf there — catches edge contacts between the probes
    oh_f = jax.nn.one_hot(fidx, planes2.shape[-2], dtype=planes2.dtype)
    nf = (oh_f[..., :, :, None] * planes2[..., None, :, :3]).sum(-2)
    axis_l = (R2 * axis[..., :, None]).sum(-2)          # axis in hull frame
    slope = (nf * axis_l[..., None, :]).sum(-1)         # d sdf / d t
    t0 = jnp.stack([hh, -hh, jnp.zeros_like(hh)], axis=-1)
    t_ref = jnp.clip(t0 - jnp.sign(slope) * hh[..., None],
                     -hh[..., None], hh[..., None])
    cl_ref = cl + axis_l[..., None, :] * (t_ref - t0)[..., None]
    sdf_r, fidx_r = _hull_sdf(cl_ref, planes2)
    better = sdf_r < sdf
    sdf = jnp.where(better, sdf_r, sdf)
    fidx = jnp.where(better, fidx_r, fidx)
    t_best = jnp.where(better, t_ref, t0)
    centers = p1[..., None, :] + axis[..., None, :] * t_best[..., None]
    r = s1[..., 0:1]
    dist = sdf - r
    n_w = -_face_normal_world(R2, planes2, fidx)
    cl_best = jnp.where(better[..., None], cl_ref, cl)
    nref_l = _local_face_normals(planes2, fidx)        # (..., 3, 3)
    gd, gdir_l, en = _point_hull_refine(
        cl_best, sdf, nref_l, verts2[..., None, :, :],
        planes2[..., None, :, :], vmask2[..., None, :],
        near_window=r + 0.01)
    dist = jnp.where(en, gd - r, dist)
    n_w = jnp.where(en[..., None], _rotate_rows_fwd(R2, gdir_l), n_w)
    pos = centers + n_w * (r + 0.5 * dist)[..., None]
    return dist, pos, n_w


def _box_mesh(p1, R1, s1, p2, R2, verts2, planes2, vmask2):
    dtype = p1.dtype
    corners = jnp.asarray(np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]),
        dtype=dtype)
    # box corners vs hull planes (shared reference face)
    pts = p1[..., None, :] + _rotate_rows_fwd(R1, corners * s1[..., None, :])
    loc2 = _rotate_rows(R2, pts - p2[..., None, :])
    d_a, top, nref, sep_h = _hull_ref_face_depth(loc2, planes2, 2)
    pos_a = _select_rows(pts, top)
    n_a = -((R2 * nref[..., None, :]).sum(-1))[..., None, :]
    n_a = jnp.broadcast_to(n_a, pos_a.shape)
    # hull verts vs box (point-in-box)
    vw = p2[..., None, :] + _rotate_rows_fwd(R2, verts2)
    loc1 = _rotate_rows(R1, vw - p1[..., None, :])
    # SAT over the BOX's 6 face axes: a separating box face must deactivate
    # the hull-face candidates too (face-only SAT on one hull gave phantom
    # -0.03 contacts on tiago, r2 regression)
    big = jnp.asarray(1e9, dtype)
    lo_min = jnp.where(vmask2[..., :, None] > 0.5, loc1, big).min(axis=-2)
    lo_max = jnp.where(vmask2[..., :, None] > 0.5, loc1, -big).max(axis=-2)
    sep_box = jnp.maximum(lo_min - s1, -lo_max - s1).max(axis=-1)
    depth = s1[..., None, :] - jnp.abs(loc1)
    pen = depth.min(axis=-1)           # >0 inside box
    ax = depth.argmin(axis=-1)
    # one-hot select (per-vert element gather cost 8 ms/step on PR2, r2)
    oh_ax = jax.nn.one_hot(ax, 3, dtype=dtype)
    sign = jnp.sign(jnp.sum(loc1 * oh_ax, axis=-1))
    n_loc = oh_ax * sign[..., None]
    n_w = _rotate_rows_fwd(R1, n_loc)  # outward of box=geom1
    dist_b = jnp.where(vmask2 > 0.5, -pen, 1e9)
    neg2, top2 = _top_k_small(-dist_b, 2)
    d_b = -neg2
    pos_b = _select_rows(vw, top2)
    n_b = _select_rows(n_w, top2)
    # the pair's true separation is at least max over BOTH face sets;
    # lift the hull-face candidate distances by it (kills phantoms, and
    # sharpens depth to the two-set MTV when penetrating)
    sep = jnp.maximum(sep_h, sep_box)
    d_a = jnp.maximum(d_a, sep[..., None])
    dist = jnp.concatenate([d_a, d_b], axis=-1)
    pos = jnp.concatenate([pos_a, pos_b], axis=-2)
    nrm = jnp.concatenate([n_a, n_b], axis=-2)
    return dist, pos, nrm


def _mesh_mesh(p1, R1, verts1, planes1, vmask1,
               p2, R2, verts2, planes2, vmask2, extras=None):
    # lateral slack = 15% of the other hull's bounding radius: keeps the
    # near-overlap overhang corners that support face-face stacks while
    # rejecting far-away corners (phantom lever arms, hsrb4s diagnosis)
    rb1 = jnp.sqrt(((verts1 * verts1).sum(-1) * vmask1).max(-1))
    rb2 = jnp.sqrt(((verts2 * verts2).sum(-1) * vmask2).max(-1))
    # verts of 1 in hull 2 (shared reference face), and verts of 2 in
    # hull 1 — BOTH directions ride ONE ref-face-depth call by stacking
    # along the pair axis (the shared mesh_vert_pad/mesh_face_pad tables
    # make the (V, F) shapes identical): one pallas launch + one staging
    # chain instead of two (the pair was 2 x 92us + staging on the PR2
    # step, r5 profile)
    vw1 = p1[..., None, :] + _rotate_rows_fwd(R1, verts1)
    loc2 = _rotate_rows(R2, vw1 - p2[..., None, :])
    vw2 = p2[..., None, :] + _rotate_rows_fwd(R2, verts2)
    loc1 = _rotate_rows(R1, vw2 - p1[..., None, :])
    locs = jnp.concatenate([loc2, loc1], axis=-3)
    plns = jnp.concatenate([planes2, planes1], axis=-3)
    msks = jnp.concatenate([vmask1, vmask2], axis=-2)
    slk = jnp.concatenate([0.15 * rb2, 0.15 * rb1], axis=-1)
    d2, top2s, nref, sep2 = _hull_ref_face_depth(locs, plns, 2, msks,
                                                 lateral_filter=True,
                                                 lateral_slack=slk)
    P = loc2.shape[-3]
    d_a, d_b = d2[..., :P, :], d2[..., P:, :]
    top, top2 = top2s[..., :P, :], top2s[..., P:, :]
    nref2, nref1 = nref[..., :P, :], nref[..., P:, :]
    sepA, sepB = sep2[..., :P], sep2[..., P:]
    pos_a = _select_rows(vw1, top)
    n_a = -((R2 * nref2[..., None, :]).sum(-1))
    pos_b = _select_rows(vw2, top2)
    n_b = (R1 * nref1[..., None, :]).sum(-1)
    # joint face-SAT over BOTH hulls: one separating face on either side
    # deactivates everything (face-only SAT per side gave phantom contacts).
    # ALL manifold points share the joint-MTV normal (the face with the
    # larger min-support): the losing side's own ref-face normal is a
    # direction the oracle's single EPA contact never reports (hsrb4s r3
    # diagnosis), while its laterally-contained verts are still needed —
    # face-face stacks take their overlap corners from BOTH hulls.
    sep = jnp.maximum(sepA, sepB)
    d_a = jnp.maximum(d_a, sep[..., None])
    d_b = jnp.maximum(d_b, sep[..., None])
    n_mtv = jnp.where((sepA >= sepB)[..., None], n_a, n_b)[..., None, :]
    dist = jnp.concatenate([d_a, d_b], axis=-1)
    pos = jnp.concatenate([pos_a, pos_b], axis=-2)
    nrm = jnp.broadcast_to(n_mtv, pos.shape)

    # ---- deep-pair exact manifold.  The oracle (mujoco 3.10 native
    # GJK/EPA + multiCCD behind mj_step1) resolves a penetrating convex
    # pair with the exact MTV and a contact-feature manifold: face-face
    # -> up to 4 overlap-polygon corners, edge contacts -> clipped
    # segment endpoints, vertex contact -> single EPA point — every
    # point at the SAME depth/normal, on the mid-surface plane (probed,
    # tests/test_manifold.py).  Our 2+2 SAT vertex manifolds diverge
    # from that exactly when penetration is deep (hsrb4s gripper 18 mm,
    # armar6 arms 7.3 cm at start), so pairs beyond the threshold are
    # replaced by ops/manifold.exact_pair_contacts — a complete-SAT
    # exact MTV + Sutherland-Hodgman feature clip.  Both the hull-table
    # selection and the query sit behind a one-iteration while_loop:
    # shallow-contact scenes (PR2 bench, fingertips ~1.7 mm) pay one
    # predicate evaluation.
    # gate on the emitted manifold depth (dist rows), NOT on -sep: the
    # face-only joint SAT cannot prove separation along edge-cross axes,
    # so -sep reads "deep" for corner-region SEPARATED pairs (a -sep
    # gate stayed on for the whole PR2 bench — 6 ms/step of exact-path
    # work with zero deep contacts).  The dist rows are the laterally-
    # contained vertex depths: a separated corner pair has no contained
    # verts, so its rows read 1e9 and the gate stays off.  Pairs that DO
    # read deep but are edge-cross-separated still fire the query; the
    # query's complete-SAT separation certificate (sepd > 0) then CLEARS
    # their phantom SAT rows below — both a parity fix (no phantom
    # contacts) and self-limiting cost (cleared rows read shallow next
    # step only if the bodies actually approach).
    depth_sat = -dist.min(axis=-1)
    deep_thr = jnp.minimum(5e-3, 0.25 * jnp.minimum(rb1, rb2))
    exact_all = (extras is not None and extras.get("exact_all")) or \
        os.environ.get("MST_EXACT_ALL")
    if exact_all:
        # accuracy mode (opt.exact_meshcollide / MST_EXACT_ALL=1):
        # oracle-form manifolds for EVERY contacting mesh pair, not just
        # deep ones — PR2 err50 vs the oracle drops 1.7e-4 -> 7.7e-6
        # (the SAT 2+2 manifolds vs the oracle's single EPA witness on
        # non-aligned shallow pairs); costs the gated exact query
        # whenever any mesh pair touches
        deep_thr = jnp.zeros_like(deep_thr)
    use_exact = depth_sat > deep_thr
    if os.environ.get("MST_FORCE_GATE_OFF"):
        use_exact = jnp.zeros_like(use_exact)
    if extras is None or os.environ.get("MST_DISABLE_EXACT"):
        # MST_DISABLE_EXACT=1: A/B kill switch for the deep-pair exact
        # manifold (compile-time and trajectory comparisons)
        return dist, pos, nrm
    from mujoco_sim_tpu.ops.manifold import exact_pair_contacts

    def take(oh, tab):
        return (oh @ tab.reshape(tab.shape[0], -1)).reshape(
            oh.shape[:-1] + tab.shape[1:])

    P = dist.shape[0]
    D = min(8, P)   # deep-pair budget: exact query runs on <= D slots

    def body(carry):
        dist0, pos0, nrm0, _ = carry
        # ---- deep-pair COMPACTION: the exact query costs ~C x V support
        # reductions per lane; running it masked over all P pairs (x env
        # batch above) measured 37 ms/step on the PR2 bench whenever ONE
        # env had one deep pair.  Deep pairs are rare, so the deepest
        # <= D are one-hot-compacted into D slots, queried there, and
        # scattered back; overflow pairs keep the SAT manifold.
        score = jnp.where(use_exact, depth_sat, -jnp.inf)
        # thread a CARRY dependence into the whole computation: without
        # it nothing in this body depends on the loop carry, XLA's
        # loop-invariant code motion hoists the entire exact query OUT
        # of the one-iteration while, and the gate stops gating (the
        # hoisted query ran unconditionally every PR2 bench step,
        # 8.5 ms vs 2.6 ms device).  0 * finite-sentinel is exact.
        score = score + 0.0 * dist0[:, 0]
        ohs = []
        sc = score
        for _ in range(D):
            k = jnp.argmax(sc)
            oh = jax.nn.one_hot(k, P, dtype=dist.dtype)
            valid = jnp.isfinite(sc.max())
            ohs.append(jnp.where(valid, oh, 0.0))
            sc = jnp.where(oh > 0.5, -jnp.inf, sc)
        OH = jnp.stack(ohs)                              # (D, P)

        def sel(x):
            return (OH @ x.reshape(P, -1)).reshape((D,) + x.shape[1:])

        # full-fidelity hull tables (vert_hi): decimation error rotates
        # the exact MTV at deep penetration (hsrb4s wheel-well, ~9 mm
        # lost off the base hull flipped the axis 3 deg off the oracle).
        # Only the (D, nhull) mesh one-hots and cyl descriptors are
        # selected per lane; the tables themselves ride shared into the
        # query and are gathered inside its gate (r5: the per-lane
        # fpoly/hedge copies were the dominant HBM term at manip batch)
        ohA = OH @ extras['ohA']                         # (D, nhull)
        ohB = OH @ extras['ohB']
        tabs = {k: extras[k] for k in
                ('vert', 'vmask', 'fplane', 'fmask', 'fpoly',
                 'hedge', 'hemask')}
        en = (OH @ use_exact.astype(dist.dtype)) > 0.5   # (D,)
        d4, p4, n1, ok, sepd = jax.vmap(
            exact_pair_contacts,
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None))(
            sel(p1), sel(R1), ohA, take(ohA, extras['cyl']),
            sel(p2), sel(R2), ohB, take(ohB, extras['cyl']), en, tabs)
        # scatter back to pair slots
        okf = ok.astype(dist.dtype)
        hit = (OH.T @ okf) > 0.5                         # (P,)
        d_b = OH.T @ (d4 * okf[:, None])
        p_b = (OH.T @ (p4 * okf[:, None, None]).reshape(D, -1)).reshape(
            P, 4, 3)
        n_b = OH.T @ (n1 * okf[:, None])
        # separation certificate: the complete SAT proved the pair
        # separated even though the contained-vertex rows read deep
        # (edge-cross-region phantoms) — raise the phantom rows to the
        # certified separation lower bound (positive => inactive; a
        # margin-activated row keeps a sound positive dist)
        sep_b = OH.T @ sepd                              # (P,)
        dist0 = jnp.where((sep_b > 0.0)[:, None],
                          jnp.maximum(dist0, sep_b[:, None]), dist0)
        dist1 = jnp.where(hit[:, None], d_b, dist0)
        pos1 = jnp.where(hit[:, None, None], p_b, pos0)
        nrm1 = jnp.where(hit[:, None, None], n_b[:, None, :], nrm0)
        return dist1, pos1, nrm1, jnp.asarray(True)

    dist, pos, nrm, _ = jax.lax.while_loop(
        lambda c: use_exact.any() & ~c[-1], body,
        (dist, pos, nrm, jnp.asarray(False)))
    return dist, pos, nrm


# primitive dispatch: (type1, type2) -> (fn, needs geom2 verts)
_DISPATCH = {
    (GeomType.PLANE, GeomType.SPHERE): (_plane_sphere, False),
    (GeomType.PLANE, GeomType.CAPSULE): (_plane_capsule, False),
    (GeomType.PLANE, GeomType.BOX): (_plane_box, False),
    (GeomType.PLANE, GeomType.CYLINDER): (_plane_cylinder, False),
    (GeomType.PLANE, GeomType.ELLIPSOID): (_plane_ellipsoid, False),
    (GeomType.PLANE, GeomType.MESH): (_plane_mesh, True),
    (GeomType.SPHERE, GeomType.SPHERE): (_sphere_sphere, False),
    (GeomType.SPHERE, GeomType.CAPSULE): (_sphere_capsule, False),
    (GeomType.SPHERE, GeomType.BOX): (_sphere_box, False),
    (GeomType.CAPSULE, GeomType.CAPSULE): (_capsule_capsule, False),
    (GeomType.CAPSULE, GeomType.BOX): (_capsule_box, False),
    (GeomType.BOX, GeomType.BOX): (_box_box, False),
}

# ---------------------------------------------------------------------------
# Heightfield narrowphase: probe points against the triangulated surface.
# Grid layout probed vs the oracle (tests/test_hfield.py): data row 0 =
# min-y, each cell split along the (low,low)->(high,high) diagonal, point
# depth measured against the triangle's plane.  MuJoCo collides per-cell
# prisms with convex geoms instead; on any planar region (flat/ramp) the
# two agree exactly, they differ only across cell edges.
# ---------------------------------------------------------------------------

def _hfield_point_dist(hfdata, nrow, ncol, hfsize, pts):
    """pts (..., k, 3) in hfield LOCAL frame -> (dist (..., k), normal
    (..., k, 3) local).  hfdata (..., R, C) padded; nrow/ncol STATIC
    per-pair numpy counts; hfsize (..., 4)."""
    R_, C_ = hfdata.shape[-2:]
    rx = hfsize[..., None, 0]
    ry = hfsize[..., None, 1]
    zt = hfsize[..., None, 2]
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    nr = jnp.asarray(nrow)[..., None]          # static counts, broadcast
    nc = jnp.asarray(ncol)[..., None]
    gx = (x + rx) / (2.0 * rx) * (nc - 1.0)
    gy = (y + ry) / (2.0 * ry) * (nr - 1.0)
    i0 = jnp.clip(jnp.floor(gx), 0, nc - 2.0).astype(jnp.int32)
    j0 = jnp.clip(jnp.floor(gy), 0, nr - 2.0).astype(jnp.int32)
    fx = gx - i0
    fy = gy - j0
    flat = hfdata.reshape(hfdata.shape[:-2] + (R_ * C_,))

    def take(jj, ii):
        idx = jj * C_ + ii
        return jnp.take_along_axis(flat, idx, axis=-1) * zt

    z00 = take(j0, i0)
    z10 = take(j0, i0 + 1)
    z01 = take(j0 + 1, i0)
    z11 = take(j0 + 1, i0 + 1)
    lowtri = fx >= fy                      # (low,low)-(high,high) diagonal
    surf = jnp.where(lowtri,
                     z00 + fx * (z10 - z00) + fy * (z11 - z10),
                     z00 + fx * (z11 - z01) + fy * (z01 - z00))
    cw = 2.0 * rx / (nc - 1.0)             # world cell extents
    ch = 2.0 * ry / (nr - 1.0)
    dzdx = jnp.where(lowtri, z10 - z00, z11 - z01) / cw
    dzdy = jnp.where(lowtri, z11 - z10, z01 - z00) / ch
    n = jnp.stack([-dzdx, -dzdy, jnp.ones_like(dzdx)], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    dist = (z - surf) * n[..., 2]          # signed distance to the plane
    inside = (jnp.abs(x) <= rx) & (jnp.abs(y) <= ry)
    dist = jnp.where(inside, dist, jnp.asarray(1e9, pts.dtype))
    return dist, n


def _hfield_probe(hp, hR, hfdata, nrow, ncol, hfsize, pts_world, radius):
    """shared tail: world probe points with an inflation radius ->
    (dist, pos, nrm) world."""
    loc = _rotate_rows(hR, pts_world - hp[..., None, :])
    dist, n_loc = _hfield_point_dist(hfdata, nrow, ncol, hfsize, loc)
    nrm = _rotate_rows_fwd(hR, n_loc)
    dist = dist - radius
    pos = pts_world - nrm * (radius + 0.5 * dist)[..., None]
    return dist, pos, nrm


def _hfield_sphere(hp, hR, hfdata, nrow, ncol, hfsize, sp, sR, size2):
    d, pos, nrm = _hfield_probe(hp, hR, hfdata, nrow, ncol, hfsize,
                                sp[..., None, :], size2[..., 0:1])
    return d, pos, nrm


def _hfield_capsule(hp, hR, hfdata, nrow, ncol, hfsize, cp, cR, size2):
    axis = cR[..., :, 2]
    r = size2[..., 0:1]
    hh = size2[..., 1:2]
    ends = jnp.stack([cp + axis * hh, cp - axis * hh, cp], axis=-2)
    return _hfield_probe(hp, hR, hfdata, nrow, ncol, hfsize, ends, r)


def _hfield_ellipsoid(hp, hR, hfdata, nrow, ncol, hfsize, ep, eR, size2):
    # support point along the hfield's -z axis (plane-ellipsoid style)
    up = hR[..., :, 2]
    u_loc = (eR * up[..., :, None]).sum(-2)                  # R2^T up
    s = size2
    denom = jnp.sqrt(((s * u_loc) ** 2).sum(-1) + 1e-30)
    p_loc = -(s * s * u_loc) / denom[..., None]
    p = ep + (eR[..., :, :] * p_loc[..., None, :]).sum(-1)
    return _hfield_probe(hp, hR, hfdata, nrow, ncol, hfsize,
                         p[..., None, :], jnp.zeros_like(s[..., 0:1]))


def _pick4(d, pos, nrm):
    neg, idx = _top_k_small(-d, 4)
    oh = jax.nn.one_hot(idx, d.shape[-1], dtype=d.dtype)
    return (-neg, (oh[..., None] * pos[..., None, :, :]).sum(-2),
            (oh[..., None] * nrm[..., None, :, :]).sum(-2))


def _hfield_box(hp, hR, hfdata, nrow, ncol, hfsize, bp, bR, size2):
    corners = jnp.asarray(np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
         for sz in (-1, 1)]), dtype=bp.dtype)                # (8, 3)
    pw = bp[..., None, :] + _rotate_rows_fwd(
        bR, corners * size2[..., None, :])
    d, pos, nrm = _hfield_probe(hp, hR, hfdata, nrow, ncol, hfsize, pw,
                                jnp.zeros_like(size2[..., 0:1]))
    return _pick4(d, pos, nrm)


def _hfield_mesh(hp, hR, hfdata, nrow, ncol, hfsize, mp, mR, verts, vmask):
    pw = mp[..., None, :] + _rotate_rows_fwd(mR, verts)
    d, pos, nrm = _hfield_probe(hp, hR, hfdata, nrow, ncol, hfsize, pw,
                                jnp.zeros_like(mp[..., 0:1]))
    d = jnp.where(vmask > 0.5, d, 1e9)
    return _pick4(d, pos, nrm)


_DISPATCH_HF = {
    (GeomType.HFIELD, GeomType.SPHERE): (_hfield_sphere, False),
    (GeomType.HFIELD, GeomType.CAPSULE): (_hfield_capsule, False),
    (GeomType.HFIELD, GeomType.ELLIPSOID): (_hfield_ellipsoid, False),
    (GeomType.HFIELD, GeomType.BOX): (_hfield_box, False),
    (GeomType.HFIELD, GeomType.MESH): (_hfield_mesh, True),
}

# hull dispatch (two-level top-P groups): needs planes of geom2 (+1 for m-m)
_DISPATCH_MESH = {
    (GeomType.SPHERE, GeomType.MESH): _sphere_mesh,
    (GeomType.CAPSULE, GeomType.MESH): _capsule_mesh,
    (GeomType.BOX, GeomType.MESH): _box_mesh,
    (GeomType.MESH, GeomType.MESH): _mesh_mesh,
}


_AABB_CACHE: dict = {}


def _geom_aabb_static(m: Model):
    """Static per-geom local AABB pieces for the mesh-group prefilter.

    Returns numpy (aabb_c (ngeom, 3) local center, C (ngeom, 3, 3) such
    that the dynamic half extents are C @ geom_size + base (spawn-time
    size overrides ride through d.geom_size), base (ngeom, 3)).  Hull-
    backed geoms (mesh, cylinder prisms) take the FULL undecimated hull
    AABB (mesh_vert_hi): the candidate SAT runs on the decimated hulls
    (subsets), so a full-hull AABB prune can never drop a pair the SAT
    could activate.  Types that never reach a mesh group (plane, hfield)
    get +inf extents.
    """
    lay = m.layout
    got = _AABB_CACHE.get(lay)
    if got is not None:
        return got
    ngeom = m.ngeom
    aabb_c = np.zeros((ngeom, 3))
    C = np.zeros((ngeom, 3, 3))
    base = np.zeros((ngeom, 3))
    hull_aabb = np.asarray(lay.hull_aabb)      # static (nhull, 2, 3)
    for g0 in range(ngeom):
        t = GeomType(int(lay.geom_type[g0]))
        h = int(lay.geom_hullid[g0])
        if t in (GeomType.MESH, GeomType.CYLINDER) and h >= 0:
            aabb_c[g0] = hull_aabb[h, 0]
            base[g0] = hull_aabb[h, 1]
        elif t == GeomType.SPHERE:
            C[g0, :, 0] = 1.0
        elif t == GeomType.CAPSULE:
            C[g0, :, 0] = 1.0
            C[g0, 2, 1] = 1.0
        elif t == GeomType.CYLINDER:
            C[g0, 0, 0] = C[g0, 1, 0] = C[g0, 2, 1] = 1.0
        elif t in (GeomType.BOX, GeomType.ELLIPSOID):
            C[g0] = np.eye(3)
        else:
            base[g0] = 1e9
    got = (aabb_c, C, base)
    _AABB_CACHE[lay] = got
    return got


def collision(m: Model, d: Data) -> Data:
    """Narrowphase -> candidates -> top-K compaction into the fixed contact
    budget.  Primitive groups process all pairs; mesh groups prefilter to
    the top-P closest pairs by bound distance (two-level, shapes static)."""
    if m.npair == 0 or m.ncon_max == 0:
        return d
    from mujoco_sim_tpu.ops.colgroups import build_groups, EXPENSIVE

    lay = m.layout
    dtype = d.qpos.dtype
    BIG = jnp.asarray(1e9, dtype)

    # per-group candidate blocks, concatenated in the (contiguous, ordered)
    # cand_adr layout at the end — scatters don't fuse on TPU
    blk_dist, blk_pos, blk_nrm, blk_act, blk_selp = [], [], [], [], []

    from mujoco_sim_tpu.ops.colgroups import pair_key
    keys = [pair_key(GeomType(lay.geom_type[a]), GeomType(lay.geom_type[b]))[0]
            for a, b in zip(lay.pair_geom1, lay.pair_geom2)]
    groups, ncand = build_groups(keys)
    assert ncand == m.ncand, (ncand, m.ncand)
    cursor = 0
    body_act = d.body_active
    # size/rbound are Data leaves so spawn-time geometry overrides apply
    # without retracing (runtime/sim.py spawn; mj_ros.cpp:941-966)
    rbound = d.geom_rbound.astype(dtype)
    margin_all = jnp.asarray(m.pair_margin, dtype)
    if m.opt.override_contacts:
        # mjENBL_OVERRIDE: o_margin replaces every pair's margin
        margin_all = jnp.broadcast_to(m.opt.o_margin.astype(dtype),
                                      margin_all.shape)
    sizes = d.geom_size.astype(dtype)

    # per-geom dynamic payload, built once and shared by every mesh group:
    # [xpos(3) | xmat(9) | size(3) | body_active(1)] -> (ngeom, 16).  Mesh
    # groups select rows with chained one-hot matmuls (see below) instead of
    # per-field traced-index gathers or a big per-pair concat.
    geom_pay = jnp.concatenate([
        d.geom_xpos.astype(dtype),
        d.geom_xmat.astype(dtype).reshape(m.ngeom, 9),
        sizes,
        body_act[lay.geom_bodyid].astype(dtype)[:, None],
    ], axis=1)

    # per-geom world AABB for the mesh-group prefilter (shared by all
    # expensive groups; ~3 ops total)
    if any(k in EXPENSIVE for k in keys):
        aabb_c, aabb_C, aabb_base = _geom_aabb_static(m)
        xmat = d.geom_xmat.astype(dtype)
        half = ((jnp.asarray(aabb_C, dtype)
                 * sizes[:, None, :]).sum(-1) + jnp.asarray(aabb_base, dtype))
        geom_ew = (jnp.abs(xmat) * half[:, None, :]).sum(-1)       # (ngeom,3)
        geom_cw = d.geom_xpos.astype(dtype) + (
            xmat * jnp.asarray(aabb_c, dtype)[:, None, :]).sum(-1)

    for g in groups:
        assert g.cand_adr == cursor, (g.cand_adr, cursor)
        cursor += g.ncand
        key = g.key
        sel = g.pair_idx
        if key not in EXPENSIVE:
            ncap = g.cap
            g1 = lay.pair_geom1[sel]
            g2 = lay.pair_geom2[sel]
            p1, R1 = d.geom_xpos[g1], d.geom_xmat[g1]
            p2, R2 = d.geom_xpos[g2], d.geom_xmat[g2]
            s1 = sizes[g1]
            s2 = sizes[g2]
            if key[0] == GeomType.HFIELD:
                fn, needs_mesh = _DISPATCH_HF[key]
                hid = lay.geom_hfieldid[g1]                # static
                hfdata = jnp.asarray(m.hfield_data, dtype)[hid]
                hfsize = jnp.asarray(m.hfield_size, dtype)[hid]
                nrow, ncol = lay.hf_nrow[hid], lay.hf_ncol[hid]
                if needs_mesh:
                    verts = jnp.asarray(m.mesh_vert_pad, dtype)[
                        lay.geom_hullid[g2]]
                    vmask = jnp.asarray(m.mesh_vert_mask, dtype)[
                        lay.geom_hullid[g2]]
                    dist, pos, nrm = fn(p1, R1, hfdata, nrow, ncol, hfsize,
                                        p2, R2, verts, vmask)
                else:
                    dist, pos, nrm = fn(p1, R1, hfdata, nrow, ncol, hfsize,
                                        p2, R2, s2)
            else:
                fn, needs_mesh = _DISPATCH[key]
                if needs_mesh:
                    verts = jnp.asarray(m.mesh_vert_pad, dtype)[
                        lay.geom_hullid[g2]]
                    vmask = jnp.asarray(m.mesh_vert_mask, dtype)[
                        lay.geom_hullid[g2]]
                    if fn is _plane_mesh:
                        # mjc_PlaneConvex's below-plane test includes the
                        # pair margin (probed; see _plane_mesh)
                        dist, pos, nrm = fn(p1, R1, s1, p2, R2, verts,
                                            vmask,
                                            margin=margin_all[sel][:, None])
                    else:
                        dist, pos, nrm = fn(p1, R1, s1, p2, R2, verts,
                                            vmask)
                else:
                    dist, pos, nrm = fn(p1, R1, s1, p2, R2, s2)
            marg = margin_all[sel][..., None]
            act = dist < marg
            b1 = lay.geom_bodyid[g1]
            b2 = lay.geom_bodyid[g2]
            act = act & body_act[b1][..., None] & body_act[b2][..., None]
            selp_blk = None
        else:
            fn = _DISPATCH_MESH[key]
            ncap = g.cap
            P = g.top_p
            npg = len(sel)
            pg1 = lay.pair_geom1[sel]
            pg2 = lay.pair_geom2[sel]
            if P >= npg:
                # every pair owns a slot: selection is the identity constant
                ohp = jnp.asarray(np.eye(npg), dtype)
            else:
                # ---- candidate selection, r4 redesign.  A pair can only
                # activate if its TRUE distance < margin; the world-AABB
                # per-axis gap lower-bounds true distance, so AABB-separated
                # pairs are pruned outright (the r3 bounding-sphere test
                # left 42-66 of 883 PR2 mesh-mesh pairs "close" at all
                # times — elongated link hulls make spheres hopeless).  The
                # survivors (typically << P) are rank-compacted into the P
                # slots with one cumsum (candidate order; the solver is
                # order-invariant).  Only when MORE than P survive does the
                # deepest-first serial-argmax top-P run, inside a gated
                # one-iteration while (the former always-on 32-pass chain
                # was ~105us/step + ~130 dispatch-bound HLO ops per group).
                c1 = geom_cw[pg1]
                c2 = geom_cw[pg2]
                mrg = margin_all[sel]
                gap = jnp.abs(c2 - c1) - (geom_ew[pg1] + geom_ew[pg2])
                alive = (body_act[lay.geom_bodyid[pg1]]
                         & body_act[lay.geom_bodyid[pg2]])
                active = (gap < mrg[:, None]).all(-1) & alive
                cnt = active.sum()
                ranks = jnp.cumsum(active.astype(jnp.int32)) * active
                oh_fast = (ranks[None, :] ==
                           jnp.arange(1, P + 1, dtype=jnp.int32)[:, None]
                           ).astype(dtype)
                bd = (jnp.linalg.norm(c2 - c1, axis=-1)
                      - rbound[pg1] - rbound[pg2] - mrg)
                score = jnp.where(active, bd, BIG)

                def fb_body(carry):
                    oh0, _ = carry
                    # carry term defeats XLA LICM (a carry-independent body
                    # is hoisted out of the one-iteration while and runs
                    # unconditionally — see the deep-pair gate below)
                    sc = score + 0.0 * oh0[0, 0]
                    _, selp = _top_k_small(-sc, P)
                    return (jax.nn.one_hot(selp, npg, dtype=dtype),
                            jnp.asarray(True))

                ohp, _ = jax.lax.while_loop(
                    lambda c: (cnt > P) & ~c[1], fb_body,
                    (oh_fast, jnp.asarray(False)))
            # The selected pairs' payload comes from chained one-hot
            # matmuls, all with STATIC 0/1 right-hand sides:
            #   ohp (P, npairs_g)         traced top-P selection
            #   T = ohp @ S               S = [pair->geom1 | pair->geom2 |
            #                                  margin] constants
            #   sel_i = A_i @ geom_pay    per-geom dynamic payload (16 cols)
            #   oh_hull = A_2 @ G2H       geom->hull constant
            # replacing per-field traced-index gathers (~1.9 ms/step on the
            # r2 PR2 trace) and the earlier (nenv, npairs, 83) payload
            # concat (~0.5 ms/step, r2 trace concatenate.1873).
            nhull = m.mesh_vert_pad.shape[0]  # meshes + cyl prisms
            is_mm = key == (GeomType.MESH, GeomType.MESH)
            S = np.zeros((npg, 2 * m.ngeom))
            S[np.arange(npg), pg1] = 1.0
            S[np.arange(npg), m.ngeom + pg2] = 1.0
            T = ohp @ jnp.asarray(S, dtype)
            A1 = T[:, :m.ngeom]                             # (P, ngeom)
            A2 = T[:, m.ngeom:]
            marg = ohp @ margin_all[sel][:, None]           # traced leaf
            sel1 = A1 @ geom_pay                            # (P, 16)
            sel2 = A2 @ geom_pay
            p1, p2 = sel1[:, 0:3], sel2[:, 0:3]
            R1 = sel1[:, 3:12].reshape(P, 3, 3)
            R2 = sel2[:, 3:12].reshape(P, 3, 3)
            s1 = sel1[:, 12:15]
            alive_sel = (sel1[:, 15] > 0.5) & (sel2[:, 15] > 0.5)

            G2H = np.zeros((m.ngeom, nhull))
            hg = lay.geom_hullid >= 0
            G2H[np.nonzero(hg)[0], lay.geom_hullid[hg]] = 1.0
            G2H = jnp.asarray(G2H, dtype)

            def hull_tables(oh):
                """Hull tables at selected pairs via the (P, nhull) one-hot:
                the (P, nhull) x (nhull, V*3) matmul rides the MXU instead
                of element gathers (r2 trace)."""
                def take(tab):
                    tab = jnp.asarray(tab, dtype)
                    return (oh @ tab.reshape(nhull, -1)).reshape(
                        oh.shape[:-1] + tab.shape[1:])
                return (take(m.mesh_vert_pad), take(m.mesh_face_pad),
                        take(m.mesh_vert_mask))

            ohB_hull = A2 @ G2H
            verts2, planes2, vmask2 = hull_tables(ohB_hull)
            if is_mm:
                ohA_hull = A1 @ G2H
                verts1, planes1, vmask1 = hull_tables(ohA_hull)
                # static merged-face/edge tables for the deep-pair exact
                # manifold; per-pair selection happens INSIDE its gate so
                # shallow scenes never materialize the (P, F, 16, 3)
                # polygon tables
                extras = dict(
                    vert=jnp.asarray(m.mesh_vert_hi, dtype),
                    vmask=jnp.asarray(m.mesh_vert_hi_mask, dtype),
                    fplane=jnp.asarray(m.mesh_fplane, dtype),
                    fmask=jnp.asarray(m.mesh_fmask, dtype),
                    fpoly=jnp.asarray(m.mesh_fpoly, dtype),
                    hedge=jnp.asarray(m.mesh_hedge, dtype),
                    hemask=jnp.asarray(m.mesh_hedge_mask, dtype),
                    cyl=jnp.asarray(m.mesh_cyl, dtype),
                    ohA=ohA_hull, ohB=ohB_hull,
                    exact_all=bool(m.opt.exact_meshcollide))
                dist, pos, nrm = fn(p1, R1, verts1, planes1, vmask1,
                                    p2, R2, verts2, planes2, vmask2,
                                    extras=extras)
            else:
                dist, pos, nrm = fn(p1, R1, s1, p2, R2, verts2, planes2,
                                    vmask2)
            act = (dist < marg) & alive_sel[..., None]
            selp_blk = ohp

        blk_dist.append(dist.reshape(-1))
        blk_pos.append(pos.reshape(-1, 3))
        blk_nrm.append(nrm.reshape(-1, 3))
        blk_act.append(act.reshape(-1))
        blk_selp.append(selp_blk)

    cand_dist = jnp.concatenate(blk_dist)
    cand_pos = jnp.concatenate(blk_pos)
    cand_nrm = jnp.concatenate(blk_nrm)
    cand_act = jnp.concatenate(blk_act)
    assert cand_dist.shape[0] == m.ncand

    # per-candidate pair attributes.  Primitive groups have STATIC pair ids
    # (lay.cand_pairid); mesh groups pick pairs dynamically, so their
    # attribute segments are re-selected with a small one-hot matmul — no
    # dynamic element gathers anywhere (each cost 85-170us/step on PR2, r2
    # trace fusion.8611+).
    npair_ = len(lay.pair_geom1)
    if m.opt.override_contacts:
        # mjENBL_OVERRIDE: o_margin/o_solref/o_solimp replace the mixed
        # per-pair contact parameters (gap is not overridden)
        marg_col = (jnp.broadcast_to(m.opt.o_margin.astype(dtype),
                                     (npair_,))
                    - jnp.asarray(m.pair_gap, dtype))[:, None]
        solref_cols = jnp.broadcast_to(m.opt.o_solref.astype(dtype),
                                       (npair_, 2))
        solimp_cols = jnp.broadcast_to(m.opt.o_solimp.astype(dtype),
                                       (npair_, 5))
    else:
        marg_col = jnp.asarray(m.pair_margin - m.pair_gap, dtype)[:, None]
        solref_cols = jnp.asarray(m.pair_solref, dtype)
        solimp_cols = jnp.asarray(m.pair_solimp, dtype)
    pair_attrs = jnp.concatenate([
        jnp.asarray(lay.pair_geom1, dtype)[:, None],
        jnp.asarray(lay.pair_geom2, dtype)[:, None],
        marg_col,
        jnp.asarray(lay.pair_condim, dtype)[:, None],
        jnp.asarray(m.pair_friction, dtype),
        solref_cols,
        solimp_cols,
    ], axis=1)                                      # (npair, 4+5+2+5)
    attr_blocks = []
    for g, selp_blk in zip(groups, blk_selp):
        base = pair_attrs[g.pair_idx]               # static gather
        if g.key in EXPENSIVE:
            sel_attr = selp_blk @ base              # (P, nattr) via one-hot
            attr_blocks.append(jnp.repeat(sel_attr, g.cap, axis=0))
        else:
            attr_blocks.append(jnp.repeat(base, g.cap, axis=0))
    cand_attr = jnp.concatenate(attr_blocks, axis=0)   # (ncand, nattr)

    # ---- compaction into the K contact slots, as ONE one-hot matmul over
    # the candidates (the previous K-argmax-pass top-K + ~15 dynamic
    # gathers dominated PR2 step time).  Two static variants:
    #   small scenes (ncand <= 2K): depth-ordered argmax passes — cheap at
    #     this size and keeps the deepest-first slot order;
    #   large scenes: cumulative-rank selection — slot order becomes
    #     candidate order (the solver is order-invariant), and if MORE than
    #     K candidates are active the later ones drop
    #     (runtime/health.contact_saturated flags this).
    K = m.ncon_max
    act_i = cand_act.astype(jnp.int32)
    if m.ncand <= 2 * K:
        score = jnp.where(cand_act, cand_dist, BIG)
        _, idx = _top_k_small(-score, K)
        oh = (idx[:, None] == jnp.arange(m.ncand, dtype=idx.dtype)[None, :])
        valid = (oh & cand_act[None, :]).any(axis=1)
    else:
        rank = jnp.cumsum(act_i) * act_i             # 1..n for active, 0 else
        oh = (rank[None, :] == jnp.arange(1, K + 1, dtype=jnp.int32)[:, None])
        valid = oh.any(axis=1)
    ohf = oh.astype(dtype)

    dist_k = ohf @ cand_dist
    pos_k = ohf @ cand_pos
    nrm_k = ohf @ cand_nrm
    attr_k = ohf @ cand_attr
    # empty slots got all-zero rows; give them a unit normal and dim 1
    nrm_k = jnp.where(valid[:, None], nrm_k,
                      jnp.asarray([0.0, 0.0, 1.0], dtype))
    t1k, t2k = _make_tangents(nrm_k)
    frame = jnp.stack([nrm_k, t1k, t2k], axis=-2)

    con = d.contact.replace(
        dist=dist_k,
        pos=pos_k,
        frame=frame,
        active=valid,
        geom1=jnp.round(attr_k[:, 0]).astype(jnp.int32),
        geom2=jnp.round(attr_k[:, 1]).astype(jnp.int32),
        includemargin=attr_k[:, 2],
        dim=jnp.maximum(jnp.round(attr_k[:, 3]).astype(jnp.int32), 1),
        friction=attr_k[:, 4:9],
        solref=attr_k[:, 9:11],
        solimp=attr_k[:, 11:16],
        efc_address=jnp.asarray(
            m.contact_efcadr
            + np.arange(K) * _rows_per(m), jnp.int32),
    )
    ncon = jnp.sum(act_i).astype(jnp.int32)
    return d.replace(contact=con, ncon=ncon)
