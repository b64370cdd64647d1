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

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import Model, Data, GeomType
from mujoco_sim_tpu.ops import math as mm


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
    h = jnp.einsum("...i,...i->...", n, sp - pp)
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
    h = jnp.einsum("...i,...ki->...k", n, ends - pp[..., None, :])
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
    pts = bp[..., None, :] + jnp.einsum(
        "...ij,...kj->...ki", bR, corners * size2[..., None, :])
    h = jnp.einsum("...i,...ki->...k", n, pts - pp[..., None, :])
    # 4 smallest heights
    neg_h, idx = jax.lax.top_k(-h, 4)
    dist = -neg_h
    pos = jnp.take_along_axis(pts, idx[..., None], axis=-2)
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
    proj = jnp.einsum("...i,...i->...", n, axis)
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
    h = jnp.einsum("...i,...ki->...k", n, pts - pp[..., None, :])
    pos = pts - n[..., None, :] * (0.5 * h)[..., None]
    nrm = jnp.broadcast_to(n[..., None, :], pos.shape)
    return h, pos, nrm


def _plane_ellipsoid(pp, pR, s1, ep, eR, size2):
    n = pR[..., :, 2]
    # support point in -n direction: x = -E^2 R^T n / |E R^T n|
    nl = jnp.einsum("...ji,...j->...i", eR, n)  # n in ellipsoid frame
    en = size2 * nl
    denom = jnp.linalg.norm(en, axis=-1, keepdims=True)
    xl = -(size2 * en) / jnp.maximum(denom, 1e-12)
    x = ep + jnp.einsum("...ij,...j->...i", eR, xl)
    h = jnp.einsum("...i,...i->...", n, x - pp)
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
    t = jnp.clip(jnp.einsum("...i,...i->...", p1 - p2, axis),
                 -hh, hh)
    cp = p2 + axis * t[..., None]
    d = cp - p1
    dist_c = jnp.linalg.norm(d, axis=-1)
    n = d / jnp.maximum(dist_c[..., None], 1e-12)
    r1, r2 = s1[..., 0], s2[..., 0]
    dist = dist_c - r1 - r2
    pos = p1 + n * (r1 + 0.5 * dist)[..., None]
    return dist[..., None], pos[..., None, :], n[..., None, :]


def _sphere_box(p1, R1, s1, p2, R2, s2):
    # sphere center in box frame
    cl = jnp.einsum("...ji,...j->...i", R2, p1 - p2)
    clamped = jnp.clip(cl, -s2, s2)
    inside = jnp.all(jnp.abs(cl) < s2, axis=-1)
    # outside: closest point on surface
    d_out = cl - clamped
    dist_out = jnp.linalg.norm(d_out, axis=-1)
    n_out = -d_out / jnp.maximum(dist_out[..., None], 1e-12)  # toward box
    # inside: push out along min-penetration face
    depth = s2 - jnp.abs(cl)
    ax = jnp.argmin(depth, axis=-1)
    sign = jnp.sign(jnp.take_along_axis(cl, ax[..., None], axis=-1))[..., 0]
    n_in = -(jax.nn.one_hot(ax, 3, dtype=cl.dtype) * sign[..., None])
    dist_in = -jnp.take_along_axis(depth, ax[..., None], axis=-1)[..., 0]
    surf = jnp.where(inside[..., None],
                     clamped + n_in * dist_in[..., None], clamped)
    nl = jnp.where(inside[..., None], n_in, n_out)
    dist_l = jnp.where(inside, dist_in, dist_out)
    r1 = s1[..., 0]
    dist = dist_l - r1
    # back to world: normal from sphere toward box
    n = jnp.einsum("...ij,...j->...i", R2, nl)
    surf_w = p2 + jnp.einsum("...ij,...j->...i", R2, surf)
    pos = 0.5 * (surf_w + p1 + n * r1[..., None])
    return dist[..., None], pos[..., None, :], n[..., None, :]


def _box_box(p1, R1, s1, p2, R2, s2):
    """8 contacts via face-axis SAT + corner candidates.

    The separating axis is chosen among the 6 face normals (max separation /
    min penetration); all contacts share that normal, giving stable
    face-face stacking.  Corner candidates of each box are measured as
    penetration past the other box's support plane along the axis, gated by
    lateral containment.  Edge-edge axes land in a later round.
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
    proj1 = jnp.abs(jnp.einsum("...ai,...ij->...aj", axes, R1))  # (...,6,3)
    ra = jnp.einsum("...aj,...j->...a", proj1, s1)
    proj2 = jnp.abs(jnp.einsum("...ai,...ij->...aj", axes, R2))
    rb = jnp.einsum("...aj,...j->...a", proj2, s2)
    ta = jnp.einsum("...ai,...i->...a", axes, t)
    sep = jnp.abs(ta) - ra - rb          # (...,6), >0 = separated
    k = jnp.argmax(sep, axis=-1)
    a_k = jnp.take_along_axis(axes, k[..., None, None].repeat(3, -1),
                              axis=-2)[..., 0, :]
    ta_k = jnp.take_along_axis(ta, k[..., None], axis=-1)[..., 0]
    n = a_k * jnp.sign(ta_k)[..., None]  # points from box1 toward box2
    ra_k = jnp.take_along_axis(ra, k[..., None], axis=-1)[..., 0]
    rb_k = jnp.take_along_axis(rb, k[..., None], axis=-1)[..., 0]

    def corner_candidates(pc, Rc, sc, p_other, R_other, s_other,
                          depth_fn):
        pts = pc[..., None, :] + jnp.einsum("...ij,...kj->...ki", Rc,
                                            corners * sc[..., None, :])
        dist = depth_fn(pts)
        # lateral containment in the other box (slack = 5% of size)
        loc = jnp.einsum("...ji,...kj->...ki", R_other,
                         pts - p_other[..., None, :])
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
        lambda pts: jnp.einsum("...ki,...i->...k", pts - p1[..., None, :], n)
        - ra_k[..., None])
    # corners of box1 vs box2's near support plane:
    # depth = (p2 - c).n - rb
    d1c, pts1 = corner_candidates(
        p1, R1, s1, p2, R2, s2,
        lambda pts: jnp.einsum("...i,...ki->...k", n,
                               p2[..., None, :] - pts)
        - rb_k[..., None])
    dist = jnp.concatenate([d2c, d1c], axis=-1)
    pts = jnp.concatenate([pts2, pts1], axis=-2)
    neg, idx = jax.lax.top_k(-dist, 8)
    dist8 = -neg
    pos8 = jnp.take_along_axis(pts, idx[..., None], axis=-2)
    nrm8 = jnp.broadcast_to(n[..., None, :], pos8.shape)
    return dist8, pos8, nrm8


def _plane_mesh(pp, pR, s1, mp, mR, verts):
    """4 deepest hull vertices vs plane.  verts: (..., nvert, 3) padded."""
    n = pR[..., :, 2]
    pts = mp[..., None, :] + jnp.einsum("...ij,...kj->...ki", mR, verts)
    h = jnp.einsum("...i,...ki->...k", n, pts - pp[..., None, :])
    neg_h, idx = jax.lax.top_k(-h, 4)
    dist = -neg_h
    pos = jnp.take_along_axis(pts, idx[..., None], axis=-2)
    pos = pos - n[..., None, :] * (0.5 * dist)[..., None]
    nrm = jnp.broadcast_to(n[..., None, :], pos.shape)
    return dist, pos, nrm


# dispatch table: (type1, type2) -> (fn, ncon, needs_mesh)
_DISPATCH = {
    (GeomType.PLANE, GeomType.SPHERE): (_plane_sphere, 1, False),
    (GeomType.PLANE, GeomType.CAPSULE): (_plane_capsule, 2, False),
    (GeomType.PLANE, GeomType.BOX): (_plane_box, 4, False),
    (GeomType.PLANE, GeomType.CYLINDER): (_plane_cylinder, 4, False),
    (GeomType.PLANE, GeomType.ELLIPSOID): (_plane_ellipsoid, 1, False),
    (GeomType.PLANE, GeomType.MESH): (_plane_mesh, 4, True),
    (GeomType.SPHERE, GeomType.SPHERE): (_sphere_sphere, 1, False),
    (GeomType.SPHERE, GeomType.CAPSULE): (_sphere_capsule, 1, False),
    (GeomType.SPHERE, GeomType.BOX): (_sphere_box, 1, False),
    (GeomType.BOX, GeomType.BOX): (_box_box, 8, False),
}


def _cand_layout(m: Model):
    """Static candidate addresses per pair, mirroring compile's cand table."""
    lay = m.layout
    adr = np.zeros(m.npair, dtype=int)
    cursor = 0
    for pi in range(m.npair):
        adr[pi] = cursor
        t1 = GeomType(lay.geom_type[lay.pair_geom1[pi]])
        t2 = GeomType(lay.geom_type[lay.pair_geom2[pi]])
        key = (t1, t2)
        cursor += _DISPATCH[key][1]
    assert cursor == m.ncand
    return adr


def collision(m: Model, d: Data) -> Data:
    """Narrowphase ALL pairs -> candidates -> top-K compaction into the
    fixed contact budget (shapes static, content dynamic)."""
    if m.npair == 0 or m.ncon_max == 0:
        return d
    lay = m.layout
    dtype = d.qpos.dtype
    BIG = jnp.asarray(1e9, dtype)

    cand_dist = jnp.full((m.ncand,), BIG, dtype)
    cand_pos = jnp.zeros((m.ncand, 3), dtype)
    cand_nrm = jnp.zeros((m.ncand, 3), dtype).at[:, 2].set(1.0)
    cand_act = jnp.zeros((m.ncand,), bool)

    keys = [(GeomType(lay.geom_type[a]), GeomType(lay.geom_type[b]))
            for a, b in zip(lay.pair_geom1, lay.pair_geom2)]
    pair_cand_adr = _cand_layout(m)
    body_act = d.body_active

    for key in sorted(set(keys), key=lambda k: (int(k[0]), int(k[1]))):
        fn, ncap, needs_mesh = _DISPATCH[key]
        sel = np.nonzero([k == key for k in keys])[0]
        g1 = lay.pair_geom1[sel]
        g2 = lay.pair_geom2[sel]
        p1, R1 = d.geom_xpos[g1], d.geom_xmat[g1]
        p2, R2 = d.geom_xpos[g2], d.geom_xmat[g2]
        s1 = jnp.asarray(m.geom_size, dtype)[g1]
        s2 = jnp.asarray(m.geom_size, dtype)[g2]
        if needs_mesh:
            counts = lay.mesh_vertnum[lay.geom_dataid[g2]]
            maxv = int(counts.max())
            vert_idx = np.zeros((len(sel), maxv), dtype=int)
            vmask = np.zeros((len(sel), maxv), dtype=bool)
            for i, g in enumerate(g2):
                did = lay.geom_dataid[g]
                nvv = lay.mesh_vertnum[did]
                adr = lay.mesh_vertadr[did]
                vert_idx[i, :nvv] = adr + np.arange(nvv)
                vmask[i, :nvv] = True
            verts = jnp.asarray(m.mesh_vert, dtype)[vert_idx]
            # padding verts pushed far along +z so they never win deepest-k
            verts = jnp.where(jnp.asarray(vmask)[..., None], verts,
                              jnp.asarray([0.0, 0.0, 1e6], dtype))
            dist, pos, nrm = fn(p1, R1, s1, p2, R2, verts)
        else:
            dist, pos, nrm = fn(p1, R1, s1, p2, R2, s2)

        margin = jnp.asarray(m.pair_margin, dtype)[sel][..., None]
        act = dist < margin
        b1 = lay.geom_bodyid[g1]
        b2 = lay.geom_bodyid[g2]
        act = act & body_act[b1][..., None] & body_act[b2][..., None]

        flat = (pair_cand_adr[sel][:, None] + np.arange(ncap)).reshape(-1)
        cand_dist = cand_dist.at[flat].set(dist.reshape(-1))
        cand_pos = cand_pos.at[flat].set(pos.reshape(-1, 3))
        cand_nrm = cand_nrm.at[flat].set(nrm.reshape(-1, 3))
        cand_act = cand_act.at[flat].set(act.reshape(-1))

    # ---- top-K compaction by penetration depth (active first)
    K = m.ncon_max
    score = jnp.where(cand_act, cand_dist, BIG)
    _, idx = jax.lax.top_k(-score, K)

    cp = jnp.asarray(lay.cand_pairid)  # (ncand,)
    sel_pair = cp[idx]
    nrm_k = cand_nrm[idx]
    t1k, t2k = _make_tangents(nrm_k)
    frame = jnp.stack([nrm_k, t1k, t2k], axis=-2)

    con = d.contact.replace(
        dist=cand_dist[idx],
        pos=cand_pos[idx],
        frame=frame,
        active=cand_act[idx],
        geom1=jnp.asarray(lay.pair_geom1, jnp.int32)[sel_pair],
        geom2=jnp.asarray(lay.pair_geom2, jnp.int32)[sel_pair],
        includemargin=jnp.asarray(m.pair_margin - m.pair_gap, dtype)[sel_pair],
        friction=jnp.asarray(m.pair_friction, dtype)[sel_pair],
        solref=jnp.asarray(m.pair_solref, dtype)[sel_pair],
        solimp=jnp.asarray(m.pair_solimp, dtype)[sel_pair],
        dim=jnp.asarray(lay.pair_condim, jnp.int32)[sel_pair],
        efc_address=jnp.asarray(
            m.contact_efcadr
            + np.arange(K) * max(1, 2 * (m.max_condim - 1)), jnp.int32),
    )
    ncon = jnp.sum(cand_act.astype(jnp.int32)).astype(jnp.int32)
    return d.replace(contact=con, ncon=ncon)
