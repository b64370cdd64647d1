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


def sensors(m: Model, d: Data) -> Data:
    if m.nsensor == 0:
        return d
    lay = m.layout
    dtype = d.qpos.dtype
    out = jnp.zeros(m.nsensordata, dtype)
    from mujoco_sim_tpu.engine import _cinert, _com_dict

    cinert = _cinert(m, d)
    com = _com_dict(m, d)
    origin = com["origin"]
    cacc = _body_cacc(m, d, com)
    Iv = jnp.einsum("buv,bv->bu", cinert, d.cvel)
    f_body = jnp.einsum("buv,bv->bu", cinert, cacc) + mm.force_cross(d.cvel, Iv)
    # external forces on each body: contacts + xfrc_applied
    f_ext = _contact_body_wrench(m, d, origin)
    xfrc = d.xfrc_applied
    r = d.xipos - origin
    tau_x = xfrc[:, :3] + jnp.cross(r, xfrc[:, 3:])
    f_ext = f_ext + jnp.concatenate([tau_x, xfrc[:, 3:]], axis=-1)
    f_net = f_body - f_ext

    for k in range(m.nsensor):
        st = int(lay.sensor_type[k])
        site = int(lay.sensor_objid[k])
        adr = int(lay.sensor_adr[k])
        bodyid = int(lay.site_bodyid[site])
        sub = _subtree_mask(m, bodyid)
        F = jnp.einsum("b,bu->u", jnp.asarray(sub, dtype), f_net)
        O = origin[bodyid]
        rr = d.site_xpos[site] - O
        torque_site = F[:3] - jnp.cross(rr, F[3:])
        force_site = F[3:]
        Rt = d.site_xmat[site].T
        if st == int(SensorType.FORCE):
            out = out.at[adr:adr + 3].set(Rt @ force_site)
        elif st == int(SensorType.TORQUE):
            out = out.at[adr:adr + 3].set(Rt @ torque_site)
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
    lay = m.layout
    dtype = d.qpos.dtype
    g = jnp.asarray(m.opt.gravity, dtype)
    a0 = jnp.concatenate([jnp.zeros(3, dtype), -g])
    contrib = d.cdof_dot * d.qvel[:, None] + d.cdof * d.qacc[:, None]
    own = jnp.zeros((m.nbody, 6), dtype).at[lay.dof_bodyid].add(contrib)
    cacc = jnp.zeros((m.nbody, 6), dtype).at[0].set(a0)
    from mujoco_sim_tpu.ops.smooth import _subsets_by_joint
    for bid, _ in _subsets_by_joint(m):
        parent = lay.body_parentid[bid]
        cacc = cacc.at[bid].set(cacc[parent] + own[bid])
    return cacc
