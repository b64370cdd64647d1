"""Batched ray-geom intersection (mj_ray equivalent) for rangefinders.

Each primitive intersector works in the geom's LOCAL frame on a dense
(R rays x n geoms) grid and returns the smallest non-negative ray
parameter, or +INF on a miss.  Geoms are grouped by STATIC type at trace
time (`ray_all`), so the jitted step never branches on data.  Convex
meshes are intersected against their compile-time hull half-spaces
(zero-padding rows are neutral: n=0, d=1e9); heightfields against the
triangulated surface grid used by the hfield narrowphase.

Reference behavior: libmujoco mj_ray driven by the rangefinder sensor
inside mj_step1 (SURVEY §2.2); the reference's own sensor registry is
mj_sim.cpp:973-1014 with libmujoco evaluating the full set for user
worlds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import Model, Data, GeomType

INF = 1e30


def _local(pnt, vec, pos, mat):
    """world rays (R, 3) vs geom frames (n, 3)/(n, 3, 3) ->
    local (R, n, 3) points and directions (R^T form)."""
    rel = pnt[:, None, :] - pos[None]
    p = (mat[None] * rel[..., :, None]).sum(-2)
    v = (mat[None] * vec[:, None, :, None]).sum(-2)
    return p, v


def _quadratic(a, b, c):
    """smallest t >= 0 with a t^2 + 2b t + c = 0, INF on miss."""
    det = b * b - a * c
    ok = (det >= 0.0) & (jnp.abs(a) > 1e-15)
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    t0 = (-b - sq) / jnp.where(jnp.abs(a) > 1e-15, a, 1.0)
    t1 = (-b + sq) / jnp.where(jnp.abs(a) > 1e-15, a, 1.0)
    t = jnp.where(t0 >= 0.0, t0, jnp.where(t1 >= 0.0, t1, INF))
    return jnp.where(ok, t, INF)


def _plane(p, v, size):
    vz = v[..., 2]
    t = -p[..., 2] / jnp.where(jnp.abs(vz) > 1e-15, vz, 1.0)
    x = p[..., 0] + t * v[..., 0]
    y = p[..., 1] + t * v[..., 1]
    ok = (jnp.abs(vz) > 1e-15) & (t >= 0.0)
    ok &= (size[..., 0] <= 0.0) | (jnp.abs(x) <= size[..., 0])
    ok &= (size[..., 1] <= 0.0) | (jnp.abs(y) <= size[..., 1])
    return jnp.where(ok, t, INF)


def _sphere(p, v, size):
    r = size[..., 0]
    a = (v * v).sum(-1)
    b = (p * v).sum(-1)
    c = (p * p).sum(-1) - r * r
    return _quadratic(a, b, c)


def _capsule(p, v, size):
    r, hh = size[..., 0], size[..., 1]
    # infinite cylinder in xy
    a = (v[..., :2] ** 2).sum(-1)
    b = (p[..., :2] * v[..., :2]).sum(-1)
    c = (p[..., :2] ** 2).sum(-1) - r * r
    t_side = _quadratic(a, b, c)
    z = p[..., 2] + t_side * v[..., 2]
    t_side = jnp.where(jnp.abs(z) <= hh, t_side, INF)
    # end spheres
    best = t_side
    for sgn in (1.0, -1.0):
        pc = p - jnp.stack([jnp.zeros_like(hh), jnp.zeros_like(hh),
                            sgn * hh], -1)
        bc = (pc * v).sum(-1)
        cc = (pc * pc).sum(-1) - r * r
        tc = _quadratic(a + v[..., 2] ** 2, bc, cc)
        zc = pc[..., 2] + tc * v[..., 2]
        tc = jnp.where(sgn * zc >= 0.0, tc, INF)
        best = jnp.minimum(best, tc)
    return best


def _cylinder(p, v, size):
    r, hh = size[..., 0], size[..., 1]
    a = (v[..., :2] ** 2).sum(-1)
    b = (p[..., :2] * v[..., :2]).sum(-1)
    c = (p[..., :2] ** 2).sum(-1) - r * r
    t_side = _quadratic(a, b, c)
    z = p[..., 2] + t_side * v[..., 2]
    best = jnp.where(jnp.abs(z) <= hh, t_side, INF)
    vz = v[..., 2]
    safe = jnp.where(jnp.abs(vz) > 1e-15, vz, 1.0)
    for sgn in (1.0, -1.0):
        t = (sgn * hh - p[..., 2]) / safe
        x = p[..., 0] + t * v[..., 0]
        y = p[..., 1] + t * v[..., 1]
        ok = ((jnp.abs(vz) > 1e-15) & (t >= 0.0)
              & (x * x + y * y <= r * r))
        best = jnp.minimum(best, jnp.where(ok, t, INF))
    return best


def _box(p, v, size):
    safe = jnp.where(jnp.abs(v) > 1e-15, v, 1.0)
    t1 = (-size - p) / safe
    t2 = (size - p) / safe
    lo3 = jnp.minimum(t1, t2)
    hi3 = jnp.maximum(t1, t2)
    # rays parallel to an axis: that slab constrains only via |p| <= size
    par = jnp.abs(v) <= 1e-15
    inside = jnp.abs(p) <= size
    lo3 = jnp.where(par, jnp.where(inside, -INF, INF), lo3)
    hi3 = jnp.where(par, jnp.where(inside, INF, -INF), hi3)
    t_in = lo3.max(-1)
    t_out = hi3.min(-1)
    t = jnp.where(t_in >= 0.0, t_in, t_out)
    ok = (t_in <= t_out) & (t_out >= 0.0) & (t < INF / 2)
    return jnp.where(ok, t, INF)


def _ellipsoid(p, v, size):
    # anisotropic scale to the unit sphere preserves the ray parameter
    return _sphere(p / size, v / size,
                   jnp.ones_like(size))


def _hull(p, v, planes):
    """convex half-space intersection.  planes (..., F, 4) [n, d] with
    n.x <= d inside; zero-pad rows (n=0, d=1e9) are neutral."""
    n = planes[..., :3]
    dd = planes[..., 3]
    den = (n * v[..., None, :]).sum(-1)             # (..., F)
    num = dd - (n * p[..., None, :]).sum(-1)
    par_miss = (jnp.abs(den) <= 1e-15) & (num < 0.0)
    tt = num / jnp.where(jnp.abs(den) > 1e-15, den, 1.0)
    t_in = jnp.where(den < -1e-15, tt, -INF).max(-1)
    t_out = jnp.where(den > 1e-15, tt, INF).min(-1)
    t = jnp.maximum(t_in, 0.0)
    ok = (~par_miss.any(-1)) & (t <= t_out) & (t_out < INF / 2)
    return jnp.where(ok, t, INF)


def _hfield(p, v, hfdata, nrow, ncol, hfsize):
    """ray vs the triangulated surface (two tris per cell, split along
    the (low,low)->(high,high) diagonal, same convention as the
    narrowphase).  hfdata (n, R_, C_) padded; nrow/ncol static numpy."""
    R_, C_ = hfdata.shape[-2:]
    rx = hfsize[..., 0]
    ry = hfsize[..., 1]
    zt = hfsize[..., 2]
    nr = jnp.asarray(nrow, p.dtype)
    nc = jnp.asarray(ncol, p.dtype)
    cw = 2.0 * rx / jnp.maximum(nc - 1.0, 1.0)     # cell extents
    ch = 2.0 * ry / jnp.maximum(nr - 1.0, 1.0)
    ii = jnp.arange(C_ - 1)
    jj = jnp.arange(R_ - 1)
    x0 = -rx[..., None] + ii * cw[..., None]       # (n, C_-1)
    y0 = -ry[..., None] + jj * ch[..., None]       # (n, R_-1)
    z = hfdata * zt[..., None, None]               # (n, R_, C_)
    z00 = z[..., :-1, :-1]
    z10 = z[..., :-1, 1:]
    z01 = z[..., 1:, :-1]
    z11 = z[..., 1:, 1:]
    cell_ok = ((ii < np.asarray(ncol)[..., None] - 1)[..., None, :]
               & (jj < np.asarray(nrow)[..., None] - 1)[..., :, None])

    def tri_hit(ax, ay, az, bx, by, bz, cx, cy, cz):
        # Moller-Trumbore on (n, R_-1, C_-1) grids vs rays (Rr, n)
        e1 = jnp.stack([bx - ax, by - ay, bz - az], -1)[None]
        e2 = jnp.stack([cx - ax, cy - ay, cz - az], -1)[None]
        a3 = jnp.stack([jnp.broadcast_to(ax, az.shape),
                        jnp.broadcast_to(ay, az.shape), az], -1)[None]
        o = p[:, :, None, None, :]
        dvec = v[:, :, None, None, :]
        h = jnp.cross(dvec, e2)
        det = (e1 * h).sum(-1)
        safe = jnp.where(jnp.abs(det) > 1e-15, det, 1.0)
        s = o - a3
        u = (s * h).sum(-1) / safe
        q = jnp.cross(s, e1)
        w = (dvec * q).sum(-1) / safe
        t = (e2 * q).sum(-1) / safe
        ok = ((jnp.abs(det) > 1e-15) & (u >= -1e-9) & (w >= -1e-9)
              & (u + w <= 1.0 + 1e-9) & (t >= 0.0) & cell_ok[None])
        return jnp.where(ok, t, INF).min((-1, -2))

    xg = jnp.broadcast_to(x0[..., None, :], z00.shape)
    yg = jnp.broadcast_to(y0[..., :, None], z00.shape)
    cwb = cw[..., None, None]
    chb = ch[..., None, None]
    # lower tri: (x0,y0,z00) (x0+cw,y0,z10) (x0+cw,y0+ch,z11)
    t1 = tri_hit(xg, yg, z00, xg + cwb, yg, z10, xg + cwb, yg + chb, z11)
    # upper tri: (x0,y0,z00) (x0+cw,y0+ch,z11) (x0,y0+ch,z01)
    t2 = tri_hit(xg, yg, z00, xg + cwb, yg + chb, z11, xg, yg + chb, z01)
    return jnp.minimum(t1, t2)


def ray_all(m: Model, d: Data, pnt: jax.Array, vec: jax.Array,
            geom_mask: np.ndarray) -> jax.Array:
    """min distance per ray over all statically-unmasked geoms.

    pnt/vec (R, 3) world rays; geom_mask (R, G) static numpy bool
    (False = geom excluded for that ray).  Inactive (destroyed) bodies
    are masked dynamically.  Returns (R,) distances, INF on miss.
    """
    lay = m.layout
    dtype = pnt.dtype
    gtype = lay.geom_type
    G = len(gtype)
    best = jnp.full((pnt.shape[0],), INF, dtype)
    alive = d.body_active[lay.geom_bodyid].astype(dtype)   # (G,)
    sizes = d.geom_size

    for t in np.unique(gtype):
        idx = np.nonzero(gtype == t)[0]
        sub_mask = geom_mask[:, idx]
        if not sub_mask.any():
            continue
        pos = d.geom_xpos[idx]
        mat = d.geom_xmat[idx]
        size = sizes[idx]
        p, v = _local(pnt, vec, pos, mat)
        tt = GeomType(t)
        if tt == GeomType.PLANE:
            dist = _plane(p, v, size[None])
        elif tt == GeomType.SPHERE:
            dist = _sphere(p, v, size[None])
        elif tt == GeomType.CAPSULE:
            dist = _capsule(p, v, size[None])
        elif tt == GeomType.CYLINDER:
            dist = _cylinder(p, v, size[None])
        elif tt == GeomType.ELLIPSOID:
            dist = _ellipsoid(p, v, size[None])
        elif tt == GeomType.BOX:
            dist = _box(p, v, size[None])
        elif tt == GeomType.MESH:
            planes = jnp.asarray(m.mesh_face_pad, dtype)[
                lay.geom_hullid[idx]]
            dist = _hull(p, v, planes[None])
        elif tt == GeomType.HFIELD:
            hid = lay.geom_hfieldid[idx]
            dist = _hfield(p, v, jnp.asarray(m.hfield_data, dtype)[hid],
                           lay.hf_nrow[hid], lay.hf_ncol[hid],
                           jnp.asarray(m.hfield_size, dtype)[hid])
        else:
            continue
        dist = jnp.where(jnp.asarray(sub_mask) & (alive[idx] > 0.5)[None],
                         dist, INF)
        best = jnp.minimum(best, dist.min(-1))
    return best
