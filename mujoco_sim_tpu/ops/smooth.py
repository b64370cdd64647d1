"""Smooth (unconstrained) dynamics kernels: FK, COM frame, CRB, RNEA.

TPU-native re-implementation of the MuJoCo pipeline stages the reference
calls through mj_step1/mj_forward/mj_mulM/mj_inverse (SURVEY.md §2.2;
reference call sites: src/mj_main.cpp:83, src/mujoco_sim/mj_sim.cpp:1057,
src/mujoco_sim/mj_hw_interface.cpp:61).

Design: single-env functions (vmap for the env axis).  Tree structure is
baked in as *static* numpy index arrays (Model.layout), so every
(level, joint-slot, joint-type) subgroup becomes a fully vectorized,
branch-free gather/compute/scatter; the O(nv^2) work (mass matrix, bias
projection) is expressed as einsums that XLA maps onto the MXU.

Quantities match MuJoCo's c-frame convention (world orientation, origin at
the subtree COM of each body's root) so cdof/cvel/qM are directly
oracle-comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import Model, JointType
from mujoco_sim_tpu.ops import math as mm


_PLAN_CACHE: dict = {}


def _subsets_by_joint(m: Model):
    """Static iteration plan: per level, per joint slot, per joint type.

    Returns list of (level_bodies, slots) with all arrays static numpy.
    Cached per Layout (rebuilt plans dominate trace time on big models).
    """
    lay = m.layout
    cached = _PLAN_CACHE.get(lay)
    if cached is not None:
        return cached
    plan = []
    for level in m.body_levels:
        bid = np.asarray(level, dtype=int)
        maxslots = int(lay.body_jntnum[bid].max()) if len(bid) else 0
        slots = []
        for k in range(maxslots):
            has = lay.body_jntnum[bid] > k
            bsub = bid[has]
            jsub = lay.body_jntadr[bsub] + k
            groups = []
            for jt in (JointType.FREE, JointType.BALL, JointType.SLIDE,
                       JointType.HINGE):
                sel = lay.jnt_type[jsub] == int(jt)
                if sel.any():
                    groups.append((int(jt), bsub[sel], jsub[sel]))
            slots.append(groups)
        plan.append((bid, slots))
    _PLAN_CACHE[lay] = plan
    return plan


def kinematics(m: Model, qpos: jax.Array, mocap_pos=None, mocap_quat=None):
    """Forward kinematics: body/geom/site frames (mj_kinematics equivalent).

    Mocap bodies take their pose from (mocap_pos, mocap_quat) directly — the
    '_ref' twin mechanism of the reference's multi-instance sync
    (mj_sim.cpp:847-960)."""
    lay = m.layout
    dtype = qpos.dtype
    nb = m.nbody

    xpos = jnp.zeros((nb, 3), dtype)
    xquat = jnp.zeros((nb, 4), dtype).at[:, 0].set(1.0)
    xanchor = jnp.zeros((m.njnt, 3), dtype)
    xaxis = jnp.zeros((m.njnt, 3), dtype)

    for bid, slots in _subsets_by_joint(m):
        parent = lay.body_parentid[bid]
        pq = xquat[parent]
        p = xpos[parent] + mm.rot_vec_quat(m.body_pos[bid].astype(dtype), pq)
        q = mm.quat_mul(pq, m.body_quat[bid].astype(dtype))
        # local working copies indexed by position-in-level
        pos_of = {int(b): i for i, b in enumerate(bid)}
        for groups in slots:
            for jt, bsub, jsub in groups:
                sel = np.array([pos_of[int(b)] for b in bsub])
                ps, qs = p[sel], q[sel]
                jpos = m.jnt_pos[jsub].astype(dtype)
                jaxis = m.jnt_axis[jsub].astype(dtype)
                anchor = ps + mm.rot_vec_quat(jpos, qs)
                axis_w = mm.rot_vec_quat(jaxis, qs)
                if jt == int(JointType.FREE):
                    qadr = lay.jnt_qposadr[jsub]
                    pnew = qpos[qadr[:, None] + np.arange(3)]
                    qnew = mm.quat_normalize(qpos[qadr[:, None] + 3 + np.arange(4)])
                    anchor = pnew
                    axis_w = jnp.broadcast_to(
                        jnp.array([0.0, 0.0, 1.0], dtype), axis_w.shape)
                elif jt == int(JointType.BALL):
                    qadr = lay.jnt_qposadr[jsub]
                    qloc = mm.quat_normalize(qpos[qadr[:, None] + np.arange(4)])
                    qnew = mm.quat_mul(qs, qloc)
                    pnew = anchor - mm.rot_vec_quat(jpos, qnew)
                    # xaxis stays the pre-rotation axis (MuJoCo convention)
                elif jt == int(JointType.SLIDE):
                    qadr = lay.jnt_qposadr[jsub]
                    val = qpos[qadr] - m.jnt_ref[jsub].astype(dtype)
                    pnew = ps + axis_w * val[:, None]
                    qnew = qs
                else:  # HINGE
                    qadr = lay.jnt_qposadr[jsub]
                    angle = qpos[qadr] - m.jnt_ref[jsub].astype(dtype)
                    qloc = mm.axis_angle_to_quat(jaxis, angle)
                    qnew = mm.quat_mul(qs, qloc)
                    pnew = anchor - mm.rot_vec_quat(jpos, qnew)
                p = p.at[sel].set(pnew)
                q = q.at[sel].set(qnew)
                xanchor = xanchor.at[jsub].set(anchor)
                xaxis = xaxis.at[jsub].set(axis_w)
        q = mm.quat_normalize(q)
        # mocap override (static subset of this level's bodies)
        if mocap_pos is not None and m.nmocap:
            mids = lay.body_mocapid[bid]
            is_mc = mids >= 0
            if is_mc.any():
                sel = np.nonzero(is_mc)[0]
                p = p.at[sel].set(mocap_pos[mids[sel]])
                q = q.at[sel].set(mm.quat_normalize(mocap_quat[mids[sel]]))
        xpos = xpos.at[bid].set(p)
        xquat = xquat.at[bid].set(q)

    xmat = mm.quat_to_mat(xquat)
    xipos = xpos + mm.rot_vec_quat(m.body_ipos.astype(dtype), xquat)
    ximat = mm.quat_to_mat(mm.quat_mul(xquat, m.body_iquat.astype(dtype)))
    geom_q = mm.quat_mul(xquat[lay.geom_bodyid], m.geom_quat.astype(dtype))
    geom_xpos = (xpos[lay.geom_bodyid]
                 + mm.rot_vec_quat(m.geom_pos.astype(dtype),
                                   xquat[lay.geom_bodyid]))
    geom_xmat = mm.quat_to_mat(geom_q)
    site_q = mm.quat_mul(xquat[lay.site_bodyid], m.site_quat.astype(dtype))
    site_xpos = (xpos[lay.site_bodyid]
                 + mm.rot_vec_quat(m.site_pos.astype(dtype),
                                   xquat[lay.site_bodyid]))
    site_xmat = mm.quat_to_mat(site_q)
    return dict(xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
                xanchor=xanchor, xaxis=xaxis, geom_xpos=geom_xpos,
                geom_xmat=geom_xmat, site_xpos=site_xpos, site_xmat=site_xmat)


def com_pos(m: Model, kin: dict, mass=None, inertia=None):
    """Subtree COM, c-frame body inertias, dof axes (mj_comPos equivalent).

    mass/inertia default to the compiled model values; the engine passes the
    Data-resident copies so spawn-time inertial overrides (runtime/sim.py)
    take effect without retracing."""
    lay = m.layout
    xipos = kin["xipos"]
    ximat = kin["ximat"]
    dtype = xipos.dtype
    mass = (jnp.asarray(m.body_mass, dtype) if mass is None
            else mass.astype(dtype))
    body_inertia = (jnp.asarray(m.body_inertia, dtype) if inertia is None
                    else inertia.astype(dtype))

    # subtree com: backward accumulation over levels
    mom = mass[:, None] * xipos
    smass = mass
    sub_mom = mom
    sub_mass = smass
    for bid, _ in reversed(_subsets_by_joint(m)):
        parent = lay.body_parentid[bid]
        # scatter-add children into parents (segment-sum via .at.add)
        sub_mom = sub_mom.at[parent].add(sub_mom[bid])
        sub_mass = sub_mass.at[parent].add(sub_mass[bid])
    subtree_com = sub_mom / jnp.maximum(sub_mass, 1e-12)[:, None]

    # c-frame origin per body: subtree_com of its root
    origin = subtree_com[lay.body_rootid]

    # spatial inertia of each body about its c-frame origin
    # R diag(I) R^T as mul+reduce (K=3 einsums conv-lower on TPU, r2 trace)
    RI = ximat * body_inertia[..., None, :]
    inert_world = (RI[..., :, None, :] * ximat[..., None, :, :]).sum(-1)
    cinert = mm.spatial_inertia(mass, inert_world, xipos - origin)

    # cdof
    cdof = jnp.zeros((m.nv, 6), dtype)
    jnt_body = lay.jnt_bodyid
    for jt in (JointType.FREE, JointType.BALL, JointType.SLIDE,
               JointType.HINGE):
        jsel = np.nonzero(lay.jnt_type == int(jt))[0]
        if len(jsel) == 0:
            continue
        dadr = lay.jnt_dofadr[jsel]
        b = jnt_body[jsel]
        O = origin[b]
        anchor = kin["xanchor"][jsel]
        if jt == JointType.SLIDE:
            ax = kin["xaxis"][jsel]
            col = jnp.concatenate([jnp.zeros_like(ax), ax], axis=-1)
            cdof = cdof.at[dadr].set(col)
        elif jt == JointType.HINGE:
            ax = kin["xaxis"][jsel]
            lin = jnp.cross(ax, O - anchor)
            cdof = cdof.at[dadr].set(jnp.concatenate([ax, lin], axis=-1))
        elif jt == JointType.BALL:
            R = kin["xmat"][b]  # child frame columns: local-frame qvel
            for i in range(3):
                ax = R[:, :, i]
                lin = jnp.cross(ax, O - anchor)
                cdof = cdof.at[dadr + i].set(
                    jnp.concatenate([ax, lin], axis=-1))
        else:  # FREE: 3 world translations + 3 local-frame rotations @ origin
            e = jnp.eye(3, dtype=dtype)
            zero = jnp.zeros((len(jsel), 3), dtype)
            for i in range(3):
                col = jnp.concatenate(
                    [zero, jnp.broadcast_to(e[i], (len(jsel), 3))], axis=-1)
                cdof = cdof.at[dadr + i].set(col)
            R = kin["xmat"][b]
            for i in range(3):
                ax = R[:, :, i]
                lin = jnp.cross(ax, O - anchor)
                cdof = cdof.at[dadr + 3 + i].set(
                    jnp.concatenate([ax, lin], axis=-1))
    return dict(subtree_com=subtree_com, cinert=cinert, cdof=cdof,
                origin=origin)


def com_vel(m: Model, com: dict, qvel: jax.Array):
    """Body spatial velocities + cdof time-derivatives (mj_comVel)."""
    lay = m.layout
    cdof = com["cdof"]
    dtype = cdof.dtype
    nb = m.nbody
    cvel = jnp.zeros((nb, 6), dtype)
    cdof_dot = jnp.zeros((m.nv, 6), dtype)

    for bid, slots in _subsets_by_joint(m):
        parent = lay.body_parentid[bid]
        v = cvel[parent]
        pos_of = {int(b): i for i, b in enumerate(bid)}
        for groups in slots:
            for jt, bsub, jsub in groups:
                sel = np.array([pos_of[int(b)] for b in bsub])
                dadr = lay.jnt_dofadr[jsub]
                ndof = {int(JointType.FREE): 6, int(JointType.BALL): 3,
                        int(JointType.SLIDE): 1, int(JointType.HINGE): 1}[jt]
                vs = v[sel]
                # all dofs of one joint use the pre-joint velocity for the
                # apparent rate of their axes (MuJoCo mj_comVel convention);
                # free joints: rotation axes additionally see the joint's own
                # translation velocity
                if jt == int(JointType.FREE):
                    contrib = jnp.zeros_like(vs)
                    for i in range(3):
                        d_i = dadr + i
                        cdof_dot = cdof_dot.at[d_i].set(
                            mm.motion_cross(vs, cdof[d_i]))
                        contrib = contrib + cdof[d_i] * qvel[d_i][:, None]
                    vs_rot = vs + contrib
                    for i in range(3, 6):
                        d_i = dadr + i
                        cdof_dot = cdof_dot.at[d_i].set(
                            mm.motion_cross(vs_rot, cdof[d_i]))
                        contrib = contrib + cdof[d_i] * qvel[d_i][:, None]
                    v = v.at[sel].set(vs + contrib)
                else:
                    contrib = jnp.zeros_like(vs)
                    for i in range(ndof):
                        d_i = dadr + i
                        ax = cdof[d_i]
                        cdof_dot = cdof_dot.at[d_i].set(mm.motion_cross(vs, ax))
                        contrib = contrib + ax * qvel[d_i][:, None]
                    v = v.at[sel].set(vs + contrib)
        cvel = cvel.at[bid].set(v)
    return dict(cvel=cvel, cdof_dot=cdof_dot)


_ANC_CACHE: dict = {}


def _dof_ancestor_upper(m: Model):
    """Upper-triangular ancestor-or-self dof mask (cached per Layout)."""
    lay = m.layout
    got = _ANC_CACHE.get(lay)
    if got is not None:
        return got
    A = np.zeros((m.nv, m.nv), dtype=bool)
    for j in range(m.nv):
        i = j
        while i >= 0:
            A[i, j] = True
            i = lay.dof_parentid[i]
    Au = np.triu(A)
    _ANC_CACHE[lay] = Au
    return Au


def crb(m: Model, com: dict):
    """Dense joint-space inertia matrix via composite-rigid-body (mj_crb).

    M_ij = cdof_i^T IC_{body(j)} cdof_j for i ancestor-or-self of j, where
    IC is the subtree composite inertia.  Batched over envs this becomes one
    big MXU einsum instead of MuJoCo's sparse CPU recursion.
    """
    lay = m.layout
    cinert = com["cinert"]
    cdof = com["cdof"]
    dtype = cdof.dtype

    IC = cinert
    for bid, _ in reversed(_subsets_by_joint(m)):
        parent = lay.body_parentid[bid]
        IC = IC.at[parent].add(IC[bid])

    # F_j = IC_{body(j)} @ cdof_j
    F = jnp.einsum("juv,jv->ju", IC[lay.dof_bodyid], cdof)
    W = cdof @ F.T  # (nv, nv): W_ij = cdof_i . F_j
    Au = jnp.asarray(_dof_ancestor_upper(m))
    Wu = jnp.where(Au, W, 0.0)
    qM = Wu + Wu.T - jnp.diag(jnp.diag(Wu))
    qM = qM + jnp.diag(m.dof_armature.astype(dtype))
    return qM


def rne(m: Model, com: dict, vel: dict, qvel: jax.Array,
        gravity_on=True):
    """Bias force C(q,qvel)·qvel + gravity (mj_rne with qacc=0)."""
    lay = m.layout
    cdof, cinert = com["cdof"], com["cinert"]
    cvel, cdof_dot = vel["cvel"], vel["cdof_dot"]
    dtype = cdof.dtype

    # qacc=0 spatial accelerations: a_b = a_parent + sum cdof_dot_d qvel_d,
    # with the gravity trick a_world = [0; -g]
    g = m.opt.gravity.astype(dtype)
    a0 = jnp.concatenate([jnp.zeros(3, dtype), -g]) if gravity_on else jnp.zeros(6, dtype)
    cacc = jnp.zeros((m.nbody, 6), dtype).at[0].set(a0)
    # per-body sum of cdof_dot * qvel over own dofs
    dof_contrib = cdof_dot * qvel[:, None]
    own = jnp.zeros((m.nbody, 6), dtype).at[lay.dof_bodyid].add(dof_contrib)
    for bid, _ in _subsets_by_joint(m):
        parent = lay.body_parentid[bid]
        cacc = cacc.at[bid].set(cacc[parent] + own[bid])

    # per-body bias force: f = I a + v x* (I v)
    Iv = jnp.einsum("buv,bv->bu", cinert, cvel)
    f = jnp.einsum("buv,bv->bu", cinert, cacc) + mm.force_cross(cvel, Iv)
    # project through ancestors: qfrc_bias_d = cdof_d . sum_{b in subtree} f_b
    mask = jnp.asarray(m.ancestor_mask, dtype)  # (nbody, nv)
    qfrc_bias = jnp.einsum("du,bu,bd->d", cdof, f, mask)
    return qfrc_bias


def mul_m(m: Model, qM: jax.Array, vec: jax.Array) -> jax.Array:
    """M @ v (mj_mulM equivalent, used by the computed-torque controller;
    reference: src/mujoco_sim/mj_sim.cpp:1057)."""
    return qM @ vec


def factor_chol(qM: jax.Array) -> jax.Array:
    # ops/linalg unrolled/blocked kernels: XLA's "Cholesky" custom-call costs
    # ~2.5 ms at (4096, 6, 6) on TPU (r2 trace); the unrolled form fuses into
    # the step program and is ~1000x cheaper at robot-sim sizes
    from mujoco_sim_tpu.ops import linalg
    return linalg.cholesky(qM)


def solve_chol(L: jax.Array, rhs: jax.Array) -> jax.Array:
    from mujoco_sim_tpu.ops import linalg
    return linalg.cho_solve(L, rhs)
