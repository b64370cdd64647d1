"""Constraint row assembly: equality, dof friction, limits, contacts.

Implements MuJoCo's soft-constraint model (impedance d(r) from solimp,
reference acceleration from solref, regularization R = (1-d)/d * diagApprox)
with *static* row layout: every potential row owns a fixed slot
(models/compile.py assigns addresses); inactive rows are masked.

The reference depends on these semantics through mj_step: joint-couple
equality for mimic joints (pr2.xml:398-411), weld equality for multi-instance
'_ref' sync (mj_sim.cpp:933-938), joint limits, and contacts (SURVEY §2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import Model, Data, EqType, JointType, DisableBit
from mujoco_sim_tpu.ops import math as mm

_MINIMP, _MAXIMP = 0.0001, 0.9999


def impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
    """Constraint impedance d(r) (MuJoCo getimpedance)."""
    d0, d1, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                 solimp[..., 2], solimp[..., 3],
                                 solimp[..., 4])
    flat = 0.5 * (d0 + d1)
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    mid = jnp.clip(mid, 0.0001, 0.9999)
    power = jnp.maximum(power, 1.0)
    # two power curves meeting at the midpoint (MuJoCo sigmoid)
    y_lo = mid * jnp.power(x / mid, power)
    y_hi = 1.0 - (1.0 - mid) * jnp.power((1.0 - x) / (1.0 - mid), power)
    y = jnp.where(x <= mid, y_lo, y_hi)
    imp = d0 + y * (d1 - d0)
    imp = jnp.where(width <= 1e-12, flat, imp)
    return jnp.clip(imp, _MINIMP, _MAXIMP)


def kbi(solref: jax.Array, solimp: jax.Array, pos: jax.Array, dtype):
    """(stiffness k, damping b, impedance imp) per row (MuJoCo mj_assignRef)."""
    imp = impedance(solimp, pos)
    dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
    tc = solref[..., 0]
    dr = solref[..., 1]
    b_std = 2.0 / jnp.maximum(dmax * tc, 1e-12)
    k_std = 1.0 / jnp.maximum(dmax * dmax * tc * tc * dr * dr, 1e-12)
    k = jnp.where(tc > 0, k_std, -solref[..., 0])
    b = jnp.where(tc > 0, b_std, -solref[..., 1])
    return k, b, imp


def _point_jacobian(m: Model, d: Data, point: jax.Array, body_id,
                    origin: jax.Array):
    """Translational Jacobian (3, nv) of a world point on body_id.

    v(point) = cdof_lin + cdof_ang x (point - O), masked by dof ancestry.
    Batched over leading axes of point/body_id.
    """
    dtype = d.qpos.dtype
    cdof = d.cdof  # (nv, 6)
    ang, lin = cdof[:, :3], cdof[:, 3:]
    r = point - origin  # (...,3)
    # J[..., 3, nv]
    jac = lin.T[None] + jnp.cross(ang[None, :, :],
                                  r[..., None, :]).swapaxes(-1, -2)
    mask = jnp.asarray(m.ancestor_mask, dtype)[body_id]  # (..., nv)
    return jac * mask[..., None, :]


def _rot_jacobian(m: Model, d: Data, body_id):
    dtype = d.qpos.dtype
    ang = d.cdof[:, :3]  # (nv, 3)
    mask = jnp.asarray(m.ancestor_mask, dtype)[body_id]
    return ang.T[None] * mask[..., None, :]  # (..., 3, nv)


def make_constraint(m: Model, d: Data, com: dict) -> Data:
    """Fill efc_* rows (mj_makeConstraint equivalent)."""
    lay = m.layout
    dtype = d.qpos.dtype
    nefc, nv = m.nefc_max, m.nv
    if nefc == 0:
        return d

    efc_J = jnp.zeros((nefc, nv), dtype)
    efc_pos = jnp.zeros((nefc,), dtype)
    efc_margin = jnp.zeros((nefc,), dtype)
    efc_solref = jnp.zeros((nefc, 2), dtype)
    efc_solimp = jnp.zeros((nefc, 5), dtype)
    efc_diag = jnp.ones((nefc,), dtype)
    efc_floss = jnp.zeros((nefc,), dtype)
    efc_active = jnp.zeros((nefc,), bool)
    efc_type = jnp.zeros((nefc,), jnp.int32)
    efc_floss_row = jnp.zeros((nefc,), bool)

    origin = com["origin"]
    binv = jnp.asarray(m.body_invweight0, dtype)
    dinv = jnp.asarray(m.dof_invweight0, dtype)
    disable = m.opt.disableflags

    # ---------------- equality ----------------
    if m.neq and not (disable & int(DisableBit.EQUALITY)):
        for k in range(m.neq):
            et = int(lay.eq_type[k])
            adr = int(lay.eq_efcadr[k])
            o1, o2 = int(lay.eq_obj1id[k]), int(lay.eq_obj2id[k])
            data = jnp.asarray(m.eq_data, dtype)[k]
            solref = jnp.asarray(m.eq_solref, dtype)[k]
            solimp = jnp.asarray(m.eq_solimp, dtype)[k]
            active = jnp.asarray(m.eq_active0)[k] & d.body_active[
                lay.jnt_bodyid[o1] if et == int(EqType.JOINT) else o1]
            if et == int(EqType.JOINT):
                qa1 = int(lay.jnt_qposadr[o1])
                da1 = int(lay.jnt_dofadr[o1])
                q1 = d.qpos[qa1] - jnp.asarray(m.qpos0, dtype)[qa1]
                if o2 >= 0:
                    qa2 = int(lay.jnt_qposadr[o2])
                    da2 = int(lay.jnt_dofadr[o2])
                    dx = d.qpos[qa2] - jnp.asarray(m.qpos0, dtype)[qa2]
                else:
                    dx = jnp.asarray(0.0, dtype)
                powers = jnp.stack([dx ** i for i in range(5)])
                poly = jnp.dot(data[:5], powers)
                dpoly = jnp.dot(data[1:5] * jnp.arange(1, 5, dtype=dtype),
                                jnp.stack([dx ** i for i in range(4)]))
                pos = q1 - poly
                row = jnp.zeros((nv,), dtype).at[da1].set(1.0)
                if o2 >= 0:
                    row = row.at[da2].set(-dpoly)
                efc_J = efc_J.at[adr].set(row)
                efc_pos = efc_pos.at[adr].set(pos)
                efc_solref = efc_solref.at[adr].set(solref)
                efc_solimp = efc_solimp.at[adr].set(solimp)
                diag = dinv[da1] + (dinv[da2] if o2 >= 0 else 0.0)
                efc_diag = efc_diag.at[adr].set(diag)
                efc_active = efc_active.at[adr].set(active)
                efc_type = efc_type.at[adr].set(0)
            elif et == int(EqType.CONNECT):
                anchor1 = data[0:3]
                anchor2 = data[3:6]
                p1 = d.xpos[o1] + mm.rot_vec_quat(anchor1, d.xquat[o1])
                p2 = d.xpos[o2] + mm.rot_vec_quat(anchor2, d.xquat[o2])
                J1 = _point_jacobian(m, d, p1[None], np.array([o1]),
                                     origin[o1][None])[0]
                J2 = _point_jacobian(m, d, p2[None], np.array([o2]),
                                     origin[o2][None])[0]
                rows = J1 - J2
                pos = p1 - p2
                efc_J = efc_J.at[adr:adr + 3].set(rows)
                efc_pos = efc_pos.at[adr:adr + 3].set(pos)
                efc_solref = efc_solref.at[adr:adr + 3].set(solref)
                efc_solimp = efc_solimp.at[adr:adr + 3].set(solimp)
                diag = binv[o1, 0] + binv[o2, 0]
                efc_diag = efc_diag.at[adr:adr + 3].set(diag)
                efc_active = efc_active.at[adr:adr + 3].set(active)
            else:  # WELD
                anchor = data[0:3]
                relpose_p = data[3:6]
                relpose_q = data[6:10]
                torquescale = data[10]
                # pos: anchor point on body2 vs its target under body1
                p2 = d.xpos[o2] + mm.rot_vec_quat(anchor, d.xquat[o2])
                target = d.xpos[o1] + mm.rot_vec_quat(
                    relpose_p + mm.rot_vec_quat(anchor, relpose_q),
                    d.xquat[o1])
                J2 = _point_jacobian(m, d, p2[None], np.array([o2]),
                                     origin[o2][None])[0]
                J1 = _point_jacobian(m, d, target[None], np.array([o1]),
                                     origin[o1][None])[0]
                rows_p = J2 - J1
                pos_p = p2 - target
                # rot: q_err = (q1 * relpose_q)^-1 * q2, 3D log * torquescale
                q_target = mm.quat_mul(d.xquat[o1], relpose_q)
                q_err = mm.quat_mul(mm.quat_inv(q_target), d.xquat[o2])
                q_err = q_err * jnp.where(q_err[0] < 0, -1.0, 1.0)
                pos_r = q_err[1:] * torquescale
                Jr2 = _rot_jacobian(m, d, np.array([o2]))[0]
                Jr1 = _rot_jacobian(m, d, np.array([o1]))[0]
                # rotate angular jacobian into target frame (3 rows)
                Rt = mm.quat_to_mat(q_target).T
                rows_r = 0.5 * (Rt @ (Jr2 - Jr1)) * torquescale
                efc_J = efc_J.at[adr:adr + 3].set(rows_p)
                efc_J = efc_J.at[adr + 3:adr + 6].set(rows_r)
                efc_pos = efc_pos.at[adr:adr + 3].set(pos_p)
                efc_pos = efc_pos.at[adr + 3:adr + 6].set(pos_r)
                efc_solref = efc_solref.at[adr:adr + 6].set(solref)
                efc_solimp = efc_solimp.at[adr:adr + 6].set(solimp)
                efc_diag = efc_diag.at[adr:adr + 3].set(
                    binv[o1, 0] + binv[o2, 0])
                efc_diag = efc_diag.at[adr + 3:adr + 6].set(
                    (binv[o1, 1] + binv[o2, 1]) * torquescale * torquescale)
                efc_active = efc_active.at[adr:adr + 6].set(active)

    # ---------------- dof friction loss ----------------
    if len(lay.fri_dofid) and not (disable & int(DisableBit.FRICTIONLOSS)):
        dofs = lay.fri_dofid
        adrs = lay.fri_efcadr
        efc_J = efc_J.at[adrs, dofs].set(1.0)
        efc_floss = efc_floss.at[adrs].set(
            jnp.asarray(m.dof_frictionloss, dtype)[dofs])
        efc_solref = efc_solref.at[adrs].set(
            jnp.asarray(m.opt.o_solref, dtype))
        efc_solimp = efc_solimp.at[adrs].set(
            jnp.asarray(m.opt.o_solimp, dtype))
        efc_diag = efc_diag.at[adrs].set(dinv[dofs])
        efc_active = efc_active.at[adrs].set(True)
        efc_floss_row = efc_floss_row.at[adrs].set(True)
        efc_type = efc_type.at[adrs].set(1)

    # ---------------- joint limits (hinge/slide) ----------------
    if len(lay.lim_jntid) and not (disable & int(DisableBit.LIMIT)):
        jids = lay.lim_jntid
        adrs = lay.lim_efcadr
        qadr = lay.jnt_qposadr[jids]
        dadr = lay.jnt_dofadr[jids]
        rng = jnp.asarray(m.jnt_range, dtype)[jids]
        margin = jnp.asarray(m.jnt_margin, dtype)[jids]
        q = d.qpos[qadr]
        dist_lo = q - rng[:, 0]
        dist_hi = rng[:, 1] - q
        lower = dist_lo < dist_hi
        dist = jnp.where(lower, dist_lo, dist_hi)
        sign = jnp.where(lower, 1.0, -1.0).astype(dtype)
        efc_J = efc_J.at[adrs, dadr].set(sign)
        efc_pos = efc_pos.at[adrs].set(dist - margin)
        efc_margin = efc_margin.at[adrs].set(margin)
        efc_solref = efc_solref.at[adrs].set(
            jnp.asarray(m.jnt_solref, dtype)[jids])
        efc_solimp = efc_solimp.at[adrs].set(
            jnp.asarray(m.jnt_solimp, dtype)[jids])
        efc_diag = efc_diag.at[adrs].set(dinv[dadr])
        active = (dist < margin) & d.body_active[lay.jnt_bodyid[jids]]
        efc_active = efc_active.at[adrs].set(active)
        efc_type = efc_type.at[adrs].set(2)

    # ---------------- contacts (pyramidal, vectorized over the K budget) ----
    if m.ncon_max and not (disable & int(DisableBit.CONTACT)):
        con = d.contact
        K = m.ncon_max
        mc = m.max_condim
        nrows_per = max(1, 2 * (mc - 1))
        gb = jnp.asarray(lay.geom_bodyid)
        b1 = gb[con.geom1]
        b2 = gb[con.geom2]
        pos_c = con.pos            # (K, 3)
        frame = con.frame          # (K, 3, 3) rows n,t1,t2
        o1 = d.subtree_com[jnp.asarray(lay.body_rootid)[b1]]
        o2 = d.subtree_com[jnp.asarray(lay.body_rootid)[b2]]
        Jp2 = _point_jacobian(m, d, pos_c, b2, o2)
        Jp1 = _point_jacobian(m, d, pos_c, b1, o1)
        Jdiff = Jp2 - Jp1          # (K, 3, nv)
        Jn = jnp.einsum("si,siv->sv", frame[:, 0], Jdiff)
        fric_axes = [
            jnp.einsum("si,siv->sv", frame[:, 1], Jdiff),
            jnp.einsum("si,siv->sv", frame[:, 2], Jdiff),
        ]
        if mc >= 4:
            Jrdiff = _rot_jacobian(m, d, b2) - _rot_jacobian(m, d, b1)
            fric_axes.append(jnp.einsum("si,siv->sv", frame[:, 0], Jrdiff))
            if mc >= 6:
                fric_axes.append(
                    jnp.einsum("si,siv->sv", frame[:, 1], Jrdiff))
                fric_axes.append(
                    jnp.einsum("si,siv->sv", frame[:, 2], Jrdiff))
        pen = con.dist - con.includemargin
        invw = binv[b1, 0] + binv[b2, 0]

        if mc == 1:
            rows = Jn[:, None, :]                      # (K,1,nv)
            diag_rows = invw[:, None]
            row_act = con.active[:, None]
        else:
            axes = jnp.stack(fric_axes[: mc - 1], axis=1)   # (K, mc-1, nv)
            mu = con.friction[:, : mc - 1]                  # (K, mc-1)
            frictionless = (con.dim == 1)
            mu_eff = jnp.where(frictionless[:, None], 0.0, mu)
            plus = Jn[:, None, :] + mu_eff[..., None] * axes
            minus = Jn[:, None, :] - mu_eff[..., None] * axes
            rows = jnp.stack([plus, minus], axis=2).reshape(K, nrows_per, -1)
            dr = invw[:, None] * 2.0 * mu_eff * mu_eff * (1.0 + mu_eff * mu_eff)
            dr = jnp.where(frictionless[:, None], invw[:, None], dr)
            diag_rows = jnp.repeat(dr, 2, axis=1)
            # rows for friction axes beyond the contact's condim are masked;
            # frictionless contacts keep only the first +- pair (mu=0)
            axis_of_row = np.repeat(np.arange(mc - 1), 2)  # (nrows_per,)
            row_act = con.active[:, None] & (
                jnp.asarray(axis_of_row)[None, :]
                < jnp.maximum(con.dim - 1, 1)[:, None])
        adrs = np.arange(K)[:, None] * nrows_per + m.contact_efcadr \
            + np.arange(nrows_per)[None, :]
        flat = adrs.reshape(-1)
        efc_J = efc_J.at[flat].set(rows.reshape(K * nrows_per, -1))
        efc_pos = efc_pos.at[flat].set(
            jnp.repeat(pen, nrows_per).reshape(-1))
        efc_margin = efc_margin.at[flat].set(
            jnp.repeat(con.includemargin, nrows_per))
        efc_solref = efc_solref.at[flat].set(
            jnp.repeat(con.solref, nrows_per, axis=0))
        efc_solimp = efc_solimp.at[flat].set(
            jnp.repeat(con.solimp, nrows_per, axis=0))
        efc_diag = efc_diag.at[flat].set(diag_rows.reshape(-1))
        efc_active = efc_active.at[flat].set(row_act.reshape(-1))
        efc_type = efc_type.at[flat].set(3)

    # ---------------- aref / D / R ----------------
    k, b, imp = kbi(efc_solref, efc_solimp, efc_pos, dtype)
    vel = efc_J @ d.qvel
    aref = -b * vel - k * imp * efc_pos
    R = jnp.maximum((1.0 - imp) / jnp.maximum(imp, _MINIMP) * efc_diag,
                    1e-12)
    D = 1.0 / R
    return d.replace(
        efc_J=efc_J, efc_D=jnp.where(efc_active, D, 0.0),
        efc_R=R, efc_aref=aref,
        efc_frictionloss=efc_floss,
        efc_floss_active=efc_floss_row,
        efc_active=efc_active, efc_type=efc_type,
    )
