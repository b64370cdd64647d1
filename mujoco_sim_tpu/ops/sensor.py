"""Sensors: force/torque site readout (the only sensor types the reference
surfaces, src/mujoco_sim/mj_sim.cpp:973-1014 / mj_ros.cpp:1933-1966)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import Model, Data, SensorType


def sensors(m: Model, d: Data) -> Data:
    if m.nsensor == 0:
        return d
    lay = m.layout
    dtype = d.qpos.dtype
    out = jnp.zeros(m.nsensordata, dtype)
    # force/torque: interaction wrench transmitted through the site's body
    # from its subtree; computed from accumulated inertial forces:
    # f_site = sum_{b in subtree} (I_b cacc_b + v x* I_b v - xfrc_b)
    from mujoco_sim_tpu.ops import math as mm
    from mujoco_sim_tpu.engine import _cinert, _com_dict

    cinert = _cinert(m, d)
    com = _com_dict(m, d)
    # body accelerations incl. qacc and gravity
    cacc = _body_cacc(m, d, com)
    Iv = jnp.einsum("buv,bv->bu", cinert, d.cvel)
    f_body = jnp.einsum("buv,bv->bu", cinert, cacc) + mm.force_cross(d.cvel, Iv)

    for k in range(m.nsensor):
        st = int(lay.sensor_type[k])
        site = int(lay.sensor_objid[k])
        adr = int(lay.sensor_adr[k])
        bodyid = int(lay.site_bodyid[site])
        # subtree mask of this body
        sub = _subtree_mask(m, bodyid)
        F = jnp.einsum("b,bu->u", jnp.asarray(sub, dtype), f_body)
        # translate wrench from c-frame origin to site, rotate to site frame
        O = com["origin"][bodyid]
        r = d.site_xpos[site] - O
        torque_site = F[:3] - jnp.cross(r, F[3:])
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
    import jax.numpy as jnp
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
