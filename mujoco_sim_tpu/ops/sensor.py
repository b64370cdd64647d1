"""Sensors: force/torque site readout (the only sensor types the reference
surfaces, src/mujoco_sim/mj_sim.cpp:973-1014 / mj_ros.cpp:1933-1966).

The interaction wrench through a site's body is recovered from the subtree
momentum balance:  F_cut = sum_subtree (I cacc + v x* I v) - contacts - xfrc
(gravity rides in cacc via the base-acceleration trick).  Matches
mj_rnePostConstraint-based sensordata.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import Model, Data, SensorType
from mujoco_sim_tpu.ops import math as mm


def _contact_body_wrench(m: Model, d: Data, origin: jax.Array):
    """Per-body spatial wrench from active contacts (c-frame origin).

    Reconstructs each contact's world force/torque from its pyramidal row
    forces: normal = sum of rows, tangent_i = mu_i*(f+ - f-), rotational
    axes contribute torque.  Wrench applied positively to geom2's body,
    negatively to geom1's.
    """
    dtype = d.qpos.dtype
    K = m.ncon_max
    out = jnp.zeros((m.nbody, 6), dtype)
    if K == 0:
        return out
    from mujoco_sim_tpu.models.model import ConeType, contact_rows_per
    mc = m.max_condim
    nrows = contact_rows_per(mc, m.opt.cone)
    con = d.contact
    lay = m.layout
    gb = jnp.asarray(lay.geom_bodyid)
    b1 = gb[con.geom1]
    b2 = gb[con.geom2]
    # row forces per slot: (K, nrows)
    adr = np.arange(K)[:, None] * nrows + m.contact_efcadr \
        + np.arange(nrows)[None, :]
    f_rows = d.efc_force[adr.reshape(-1)].reshape(K, nrows)
    n = con.frame[:, 0]
    if mc == 1:
        force = f_rows[:, 0:1] * n
        torque_local = jnp.zeros((K, 3), dtype)
    elif m.opt.cone == int(ConeType.ELLIPTIC):
        # elliptic layout: rows = [normal, t1, t2, tors, r1, r2] directly
        fn = f_rows[:, 0]
        ft = f_rows[:, 1:]
        force = fn[:, None] * n + ft[:, 0:1] * con.frame[:, 1]
        if mc >= 3:
            force = force + ft[:, 1:2] * con.frame[:, 2]
        torque_local = jnp.zeros((K, 3), dtype)
        if mc >= 4:
            torque_local = torque_local + ft[:, 2:3] * n
        if mc >= 6:
            torque_local = (torque_local + ft[:, 3:4] * con.frame[:, 1]
                            + ft[:, 4:5] * con.frame[:, 2])
    else:
        naxes = mc - 1
        f_plus = f_rows[:, 0::2][:, :naxes]
        f_minus = f_rows[:, 1::2][:, :naxes]
        fn = (f_plus + f_minus).sum(axis=1)
        mu = con.friction[:, :naxes]
        ft = mu * (f_plus - f_minus)  # per friction axis
        force = fn[:, None] * n
        # translational friction axes: t1, t2
        force = force + ft[:, 0:1] * con.frame[:, 1]
        if naxes >= 2:
            force = force + ft[:, 1:2] * con.frame[:, 2]
        torque_local = jnp.zeros((K, 3), dtype)
        if naxes >= 3:  # torsional about n
            torque_local = torque_local + ft[:, 2:3] * n
        if naxes >= 5:  # rolling
            torque_local = (torque_local + ft[:, 3:4] * con.frame[:, 1]
                            + ft[:, 4:5] * con.frame[:, 2])
    act = con.active[:, None].astype(dtype)
    force = force * act
    torque_local = torque_local * act
    # wrench about each body's c-frame origin
    for sign, b in ((1.0, b2), (-1.0, b1)):
        r = con.pos - origin[b]
        tau = torque_local + jnp.cross(r, force)
        w = jnp.concatenate([tau, force], axis=-1) * sign
        out = out.at[b].add(w)
    return out


def _point_in_site(m: Model, site: int, p_local):
    """Is the contact point inside the site's zone volume (touch sensor)?"""
    lay = m.layout
    from mujoco_sim_tpu.models.model import GeomType
    t = int(lay.site_type[site])
    s = lay.site_size[site]
    x, y, z = p_local[..., 0], p_local[..., 1], p_local[..., 2]
    if t == int(GeomType.BOX):
        return ((jnp.abs(x) <= s[0]) & (jnp.abs(y) <= s[1])
                & (jnp.abs(z) <= s[2]))
    if t == int(GeomType.CAPSULE):
        zz = jnp.clip(z, -s[1], s[1])
        return x * x + y * y + (z - zz) ** 2 <= s[0] * s[0]
    if t == int(GeomType.CYLINDER):
        return (x * x + y * y <= s[0] * s[0]) & (jnp.abs(z) <= s[1])
    if t == int(GeomType.ELLIPSOID):
        return ((x / s[0]) ** 2 + (y / s[1]) ** 2 + (z / s[2]) ** 2) <= 1.0
    return (p_local * p_local).sum(-1) <= s[0] * s[0]   # sphere default


def _contact_normal_forces(m: Model, d: Data):
    """(K,) normal-force magnitude per contact slot (touch sensor)."""
    dtype = d.qpos.dtype
    from mujoco_sim_tpu.models.model import ConeType, contact_rows_per
    K = m.ncon_max
    mc = m.max_condim
    nrows = contact_rows_per(mc, m.opt.cone)
    adr = np.arange(K)[:, None] * nrows + m.contact_efcadr \
        + np.arange(nrows)[None, :]
    f_rows = d.efc_force[adr.reshape(-1)].reshape(K, nrows)
    if mc == 1 or m.opt.cone == int(ConeType.ELLIPTIC):
        fn = f_rows[:, 0]
    else:
        naxes = mc - 1
        fn = (f_rows[:, 0::2][:, :naxes] + f_rows[:, 1::2][:, :naxes]).sum(1)
    return fn * d.contact.active.astype(dtype)


def sensors(m: Model, d: Data) -> Data:
    """mj_sensorPos/Vel/Acc equivalent over the full supported mjtSensor
    surface (all stages evaluated post-forward, so every quantity is
    available).  Sensor ids/addresses are Layout constants, so the loop
    unrolls into static slices."""
    if m.nsensor == 0:
        return d
    lay = m.layout
    dtype = d.qpos.dtype
    out = jnp.zeros(m.nsensordata, dtype)
    from mujoco_sim_tpu.engine import _cinert, _com_dict
    from mujoco_sim_tpu.models.model import ObjType

    com = _com_dict(m, d)
    origin = com["origin"]
    types = set(int(t) for t in lay.sensor_type)

    # subtree momentum balance: only for force/torque sensors
    ft_types = {int(SensorType.FORCE), int(SensorType.TORQUE)}
    if types & ft_types:
        cinert = _cinert(m, d)
        cacc = _body_cacc(m, d, com)
        Iv = jnp.einsum("buv,bv->bu", cinert, d.cvel)
        f_body = (jnp.einsum("buv,bv->bu", cinert, cacc)
                  + mm.force_cross(d.cvel, Iv))
        f_ext = _contact_body_wrench(m, d, origin)
        xfrc = d.xfrc_applied
        r = d.xipos - origin
        tau_x = xfrc[:, :3] + jnp.cross(r, xfrc[:, 3:])
        f_ext = f_ext + jnp.concatenate([tau_x, xfrc[:, 3:]], axis=-1)
        f_net = f_body - f_ext
    if int(SensorType.ACCELEROMETER) in types:
        cacc_a = _body_cacc(m, d, com)
    if int(SensorType.TOUCH) in types:
        fn_con = _contact_normal_forces(m, d)
        gb = jnp.asarray(lay.geom_bodyid)
        con_b1 = gb[d.contact.geom1]
        con_b2 = gb[d.contact.geom2]
    rf_rows = [k for k in range(m.nsensor)
               if int(lay.sensor_type[k]) == int(SensorType.RANGEFINDER)]
    if rf_rows:
        # mj_ray semantics: ray from the site along its +Z axis, the
        # site's own body excluded, invisible (alpha=0, no material)
        # geoms skipped, -1 on miss (engine_ray.c behavior probed via
        # mujoco.mj_ray in tests/test_raycast.py)
        from mujoco_sim_tpu.ops import raycast
        sids = lay.sensor_objid[np.asarray(rf_rows)]
        pnt = d.site_xpos[sids]
        vec = d.site_xmat[sids][..., :, 2]
        geom_mask = (np.asarray(lay.geom_bodyid)[None, :]
                     != np.asarray(lay.site_bodyid)[sids][:, None])
        geom_mask &= ~np.asarray(lay.geom_invisible)[None, :]
        rf_dist = raycast.ray_all(m, d, pnt, vec, geom_mask)
        rf_val = jnp.where(rf_dist > raycast.INF / 2,
                           jnp.asarray(-1.0, dtype), rf_dist)
        rf_index = {k: i for i, k in enumerate(rf_rows)}

    def body_vel_at(bodyid, point):
        """world-frame (angvel, linvel) of a body-fixed point (cvel frame
        is the body's c-frame origin)."""
        cv = d.cvel[bodyid]
        ang, lin = cv[:3], cv[3:]
        return ang, lin + jnp.cross(ang, point - origin[bodyid])

    def frame_of(objtype, objid):
        """(pos, R, quat_fn, bodyid) of a frame-sensor object."""
        if objtype == int(ObjType.SITE):
            b = int(lay.site_bodyid[objid])
            q = lambda: mm.quat_mul(d.xquat[b],
                                    m.site_quat.astype(dtype)[objid])
            return d.site_xpos[objid], d.site_xmat[objid], q, b
        if objtype == int(ObjType.GEOM):
            b = int(lay.geom_bodyid[objid])
            q = lambda: mm.quat_mul(d.xquat[b],
                                    m.geom_quat.astype(dtype)[objid])
            return d.geom_xpos[objid], d.geom_xmat[objid], q, b
        if objtype == int(ObjType.XBODY):
            return (d.xpos[objid], mm.quat_to_mat(d.xquat[objid]),
                    lambda: d.xquat[objid], objid)
        # BODY: inertial frame
        q = lambda: mm.quat_mul(d.xquat[objid],
                                m.body_iquat.astype(dtype)[objid])
        return d.xipos[objid], d.ximat[objid], q, objid

    for k in range(m.nsensor):
        st = int(lay.sensor_type[k])
        obj = int(lay.sensor_objid[k])
        adr = int(lay.sensor_adr[k])
        dim = int(lay.sensor_dim[k])
        cutoff = float(lay.sensor_cutoff[k])
        S = SensorType

        if st in (int(S.FORCE), int(S.TORQUE)):
            bodyid = int(lay.site_bodyid[obj])
            sub = _subtree_mask(m, bodyid)
            F = jnp.einsum("b,bu->u", jnp.asarray(sub, dtype), f_net)
            rr = d.site_xpos[obj] - origin[bodyid]
            Rt = d.site_xmat[obj].T
            val = (Rt @ F[3:] if st == int(S.FORCE)
                   else Rt @ (F[:3] - jnp.cross(rr, F[3:])))
        elif st == int(S.CLOCK):
            val = d.time[None] if d.time.ndim == 0 else d.time
        elif st == int(S.JOINTPOS):
            val = d.qpos[int(lay.jnt_qposadr[obj])][None]
        elif st == int(S.JOINTVEL):
            val = d.qvel[int(lay.jnt_dofadr[obj])][None]
        elif st == int(S.BALLQUAT):
            q = d.qpos[int(lay.jnt_qposadr[obj]) + np.arange(4)]
            val = mm.quat_normalize(q)
        elif st == int(S.BALLANGVEL):
            val = d.qvel[int(lay.jnt_dofadr[obj]) + np.arange(3)]
        elif st == int(S.TENDONPOS):
            val = d.ten_length[obj][None]
        elif st == int(S.TENDONVEL):
            val = d.ten_velocity[obj][None]
        elif st == int(S.ACTUATORPOS):
            val = d.actuator_length[obj][None]
        elif st == int(S.ACTUATORVEL):
            val = d.actuator_velocity[obj][None]
        elif st == int(S.ACTUATORFRC):
            val = d.actuator_force[obj][None]
        elif st == int(S.RANGEFINDER):
            val = rf_val[rf_index[k]][None]
        elif st in (int(S.JOINTLIMITPOS), int(S.JOINTLIMITVEL),
                    int(S.JOINTLIMITFRC)):
            # value of the joint's limit efc row when active, else 0
            # (mjSENS_JOINTLIMIT* scan of d->efc in mj_sensorPos/Vel/Acc)
            rng = m.jnt_range.astype(dtype)[obj]
            margin = m.jnt_margin.astype(dtype)[obj]
            q = d.qpos[int(lay.jnt_qposadr[obj])]
            dist_lo = q - rng[0]
            dist_hi = rng[1] - q
            lower = dist_lo < dist_hi
            dist = jnp.where(lower, dist_lo, dist_hi)
            sign = jnp.where(lower, 1.0, -1.0).astype(dtype)
            from mujoco_sim_tpu.models.model import DisableBit
            limit_on = not (m.opt.disableflags & int(DisableBit.LIMIT))
            active = ((dist < margin)
                      & jnp.asarray(bool(lay.jnt_limited[obj]) and limit_on))
            if st == int(S.JOINTLIMITPOS):
                v_ = dist - margin
            elif st == int(S.JOINTLIMITVEL):
                v_ = sign * d.qvel[int(lay.jnt_dofadr[obj])]
            else:
                pos_in_list = np.nonzero(lay.lim_jntid == obj)[0]
                v_ = (d.efc_force[int(lay.lim_efcadr[pos_in_list[0]])]
                      if len(pos_in_list) else jnp.asarray(0.0, dtype))
            val = jnp.where(active, v_, 0.0)[None]
        elif st in (int(S.TENDONLIMITPOS), int(S.TENDONLIMITVEL),
                    int(S.TENDONLIMITFRC)):
            rng = m.ten_range.astype(dtype)[obj]
            margin = m.ten_margin.astype(dtype)[obj]
            length = d.ten_length[obj]
            dist_lo = length - rng[0]
            dist_hi = rng[1] - length
            lower = dist_lo < dist_hi
            dist = jnp.where(lower, dist_lo, dist_hi)
            sign = jnp.where(lower, 1.0, -1.0).astype(dtype)
            from mujoco_sim_tpu.models.model import DisableBit
            limit_on = not (m.opt.disableflags & int(DisableBit.LIMIT))
            active = ((dist < margin)
                      & jnp.asarray(bool(lay.ten_limited[obj]) and limit_on))
            if st == int(S.TENDONLIMITPOS):
                v_ = dist - margin
            elif st == int(S.TENDONLIMITVEL):
                v_ = sign * d.ten_velocity[obj]
            else:
                pos_in_list = np.nonzero(lay.tlim_tenid == obj)[0]
                v_ = (d.efc_force[int(lay.tlim_efcadr[pos_in_list[0]])]
                      if len(pos_in_list) else jnp.asarray(0.0, dtype))
            val = jnp.where(active, v_, 0.0)[None]
        elif st == int(S.MAGNETOMETER):
            val = d.site_xmat[obj].T @ m.opt.magnetic.astype(dtype)
        elif st == int(S.GYRO):
            b = int(lay.site_bodyid[obj])
            ang, _ = body_vel_at(b, d.site_xpos[obj])
            val = d.site_xmat[obj].T @ ang
        elif st == int(S.VELOCIMETER):
            b = int(lay.site_bodyid[obj])
            _, lin = body_vel_at(b, d.site_xpos[obj])
            val = d.site_xmat[obj].T @ lin
        elif st == int(S.ACCELEROMETER):
            # mj_objectAcceleration: spatial acc at the site point + the
            # rotating-frame correction ang x lin, in the site frame
            b = int(lay.site_bodyid[obj])
            ca = cacc_a[b]
            rr = d.site_xpos[obj] - origin[b]
            a_lin = ca[3:] + jnp.cross(ca[:3], rr)
            ang, lin = body_vel_at(b, d.site_xpos[obj])
            val = d.site_xmat[obj].T @ (a_lin + jnp.cross(ang, lin))
        elif st == int(S.TOUCH):
            b = int(lay.site_bodyid[obj])
            onb = (con_b1 == b) | (con_b2 == b)
            p_loc = (d.site_xmat[obj].T
                     @ (d.contact.pos - d.site_xpos[obj])[..., None])[..., 0]
            inz = _point_in_site(m, obj, p_loc)
            val = jnp.maximum(
                (fn_con * (onb & inz).astype(dtype)).sum(), 0.0)[None]
        elif st in (int(S.FRAMEPOS), int(S.FRAMEQUAT), int(S.FRAMEXAXIS),
                    int(S.FRAMEYAXIS), int(S.FRAMEZAXIS),
                    int(S.FRAMELINVEL), int(S.FRAMEANGVEL)):
            ot = int(lay.sensor_objtype[k])
            pos, R, quat_fn, b = frame_of(ot, obj)
            refid = int(lay.sensor_refid[k])
            ref = (frame_of(int(lay.sensor_reftype[k]), refid)
                   if refid >= 0 else None)
            if st == int(S.FRAMEPOS):
                val = (ref[1].T @ (pos - ref[0]) if ref is not None
                       else pos)
            elif st == int(S.FRAMEQUAT):
                q = quat_fn()
                if ref is not None:
                    q = mm.quat_mul(mm.quat_inv(ref[2]()), q)
                val = mm.quat_normalize(q)
            elif st in (int(S.FRAMEXAXIS), int(S.FRAMEYAXIS),
                        int(S.FRAMEZAXIS)):
                axis = R[:, st - int(S.FRAMEXAXIS)]
                val = ref[1].T @ axis if ref is not None else axis
            elif st == int(S.FRAMEANGVEL):
                ang, _ = body_vel_at(b, pos)
                if ref is not None:
                    ang_r, _ = body_vel_at(ref[3], ref[0])
                    ang = ref[1].T @ (ang - ang_r)
                val = ang
            else:
                _, lin = body_vel_at(b, pos)
                if ref is not None:
                    # relative to the (moving, rotating) ref frame,
                    # expressed in it: R_r^T (v - v_r - w_r x (p - p_r))
                    ang_r, lin_r = body_vel_at(ref[3], ref[0])
                    lin = ref[1].T @ (lin - lin_r
                                      - jnp.cross(ang_r, pos - ref[0]))
                val = lin
        elif st in (int(S.SUBTREECOM), int(S.SUBTREELINVEL),
                    int(S.SUBTREEANGMOM)):
            sub = jnp.asarray(_subtree_mask(m, obj), dtype)
            mass = d.body_mass.astype(dtype) * sub
            M = jnp.maximum(mass.sum(), 1e-12)
            com_s = (mass[:, None] * d.xipos).sum(0) / M
            ang_b = d.cvel[:, :3]
            v_b = (d.cvel[:, 3:]
                   + jnp.cross(ang_b, d.xipos - origin))  # v at body com
            v_com = (mass[:, None] * v_b).sum(0) / M
            if st == int(S.SUBTREECOM):
                val = com_s
            elif st == int(S.SUBTREELINVEL):
                val = v_com
            else:
                # L about the subtree com: sum I_i w_i + m r x v (relative)
                RI = d.ximat * d.body_inertia.astype(dtype)[..., None, :]
                Iw = ((RI[..., :, None, :] * d.ximat[..., None, :, :]
                       ).sum(-1) @ ang_b[..., None])[..., 0]
                rel_r = d.xipos - com_s
                rel_v = v_b - v_com
                val = (sub[:, None] * (Iw + mass[:, None]
                                       * jnp.cross(rel_r, rel_v))).sum(0)
        else:
            continue            # unsupported type defensively left zero

        val = val.reshape(dim).astype(dtype)
        if cutoff > 0 and st not in (int(S.BALLQUAT), int(S.FRAMEQUAT)):
            if st in (int(S.TOUCH), int(S.RANGEFINDER)):
                # POSITIVE datatype: top clamp only (a -1 miss survives)
                val = jnp.minimum(val, cutoff)
            else:
                val = jnp.clip(val, -cutoff, cutoff)
        out = out.at[adr:adr + dim].set(val)
    return d.replace(sensordata=out)


def _subtree_mask(m: Model, bodyid: int) -> np.ndarray:
    lay = m.layout
    mask = np.zeros(m.nbody)
    for b in range(m.nbody):
        i = b
        while i > 0:
            if i == bodyid:
                mask[b] = 1.0
                break
            i = int(lay.body_parentid[i])
        if bodyid == 0:
            mask[b] = 1.0
    return mask


def _body_cacc(m: Model, d: Data, com: dict):
    """Body spatial accelerations including qacc and gravity (c-frame)."""
    dtype = d.qpos.dtype
    g = jnp.asarray(m.opt.gravity, dtype)
    a0 = jnp.concatenate([jnp.zeros(3, dtype), -g])
    contrib = d.cdof_dot * d.qvel[:, None] + d.cdof * d.qacc[:, None]
    # ancestor-or-self dof prefix sum as one constant-mask matmul
    # (see smooth._tree_masks)
    mask = jnp.asarray(m.ancestor_mask, dtype)       # (nbody, nv)
    return a0 + mask @ contrib
