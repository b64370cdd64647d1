"""Passive forces: joint springs, dampers, gravity compensation (mj_passive).

Gravity compensation implements the reference's disable_gravity-per-body
behavior, which it realizes by setting body gravcomp in the composed scene
XML (reference: src/mujoco_sim/mj_sim.cpp:301-310).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import Model, JointType, DisableBit
from mujoco_sim_tpu.ops import math as mm


def spring_damper(m: Model, qpos: jax.Array, qvel: jax.Array, ten=None):
    """(qfrc_spring, qfrc_damper).  ten = (length, velocity, J) from
    ops/tendon.py (spatial-aware); None falls back to the static fixed-
    tendon form."""
    lay = m.layout
    dtype = qpos.dtype
    qfrc_spring = jnp.zeros(m.nv, dtype)

    for jt in (JointType.FREE, JointType.BALL, JointType.SLIDE,
               JointType.HINGE):
        jsel = np.nonzero(lay.jnt_type == int(jt))[0]
        if len(jsel) == 0:
            continue
        stiff = jnp.asarray(m.jnt_stiffness, dtype)[jsel]
        qadr = lay.jnt_qposadr[jsel]
        dadr = lay.jnt_dofadr[jsel]
        if jt in (JointType.SLIDE, JointType.HINGE):
            disp = qpos[qadr] - jnp.asarray(m.qpos_spring, dtype)[qadr]
            qfrc_spring = qfrc_spring.at[dadr].add(-stiff * disp)
        elif jt == JointType.BALL:
            q = qpos[qadr[:, None] + np.arange(4)]
            qref = jnp.asarray(m.qpos_spring, dtype)[qadr[:, None] + np.arange(4)]
            rot = mm.quat_sub(q, qref)  # local-frame 3D displacement
            for i in range(3):
                qfrc_spring = qfrc_spring.at[dadr + i].add(
                    -stiff * rot[:, i])
        else:  # FREE
            pos = qpos[qadr[:, None] + np.arange(3)]
            pref = jnp.asarray(m.qpos_spring, dtype)[qadr[:, None] + np.arange(3)]
            for i in range(3):
                qfrc_spring = qfrc_spring.at[dadr + i].add(
                    -stiff * (pos[:, i] - pref[:, i]))
            q = qpos[qadr[:, None] + 3 + np.arange(4)]
            qref = jnp.asarray(m.qpos_spring, dtype)[qadr[:, None] + 3 + np.arange(4)]
            rot = mm.quat_sub(q, qref)
            for i in range(3):
                qfrc_spring = qfrc_spring.at[dadr + 3 + i].add(
                    -stiff * rot[:, i])

    qfrc_damper = -jnp.asarray(m.dof_damping, dtype) * qvel

    if m.ntendon:
        # tendon spring (with 3.x deadband springlength) + damper,
        # projected through the moment rows (mj_passive tendon terms)
        if ten is not None:
            length, vel, Wv = ten
        else:
            Wq = jnp.asarray(lay.ten_Wq, dtype)
            Wv = jnp.asarray(lay.ten_Wv, dtype)
            length = Wq @ qpos
            vel = Wv @ qvel
        sl = m.ten_springlength.astype(dtype)
        excess = jnp.where(length > sl[:, 1], length - sl[:, 1],
                           jnp.where(length < sl[:, 0], length - sl[:, 0],
                                     0.0))
        frc_s = -m.ten_stiffness.astype(dtype) * excess
        frc_d = -m.ten_damping.astype(dtype) * vel
        qfrc_spring = qfrc_spring + frc_s @ Wv
        qfrc_damper = qfrc_damper + frc_d @ Wv

    return qfrc_spring, qfrc_damper


def gravcomp(m: Model, com: dict, xipos: jax.Array,
             mass=None) -> jax.Array:
    """Anti-gravity force per body scaled by body_gravcomp."""
    dtype = xipos.dtype
    g = jnp.asarray(m.opt.gravity, dtype)
    mass = jnp.asarray(m.body_mass, dtype) if mass is None else mass
    f = (-mass.astype(dtype)
         * jnp.asarray(m.body_gravcomp, dtype))[:, None] * g
    r = xipos - com["origin"]
    tau_o = jnp.cross(r, f)
    F = jnp.concatenate([tau_o, f], axis=-1)
    mask = jnp.asarray(m.ancestor_mask, dtype)
    return jnp.einsum("du,bu,bd->d", com["cdof"], F, mask)


def fluid(m: Model, com: dict, xipos: jax.Array, cvel: jax.Array,
          ximat: jax.Array, mass: jax.Array, inertia: jax.Array):
    """Inertia-box fluid drag (mj_passive's fluid model): per body, an
    equivalent box r_i = sqrt(3(I_j+I_k-I_i)/(2m)) sees
      viscous:  f = -3 pi d eta v,  tau = -pi d^3 eta w,  d = 2(r0+r1+r2)/3
      density:  f_i = -2 rho r_j r_k |v_i| v_i,
                tau_i = -(rho/2) r_i (r_j^4 + r_k^4) |w_i| w_i
    in the body's INERTIAL frame, with the wind subtracted from v.  All
    coefficients probed against mujoco 3.10 qfrc_passive (r3).
    Returns qfrc (nv,).
    """
    dtype = xipos.dtype
    lay = m.layout
    origin = com["origin"]
    cdof = com["cdof"]
    eta = m.opt.viscosity.astype(dtype)
    rho = m.opt.density.astype(dtype)
    wind = m.opt.wind.astype(dtype)
    msafe = jnp.maximum(mass.astype(dtype), 1e-12)
    I = inertia.astype(dtype)
    Isum = I.sum(-1, keepdims=True)
    r = jnp.sqrt(jnp.maximum(3.0 * (Isum - 2.0 * I) / (2.0 * msafe[:, None]),
                             1e-24))                     # (nbody, 3)
    # body velocity at xipos, world frame
    w_world = cvel[:, :3]
    v_world = cvel[:, 3:] + jnp.cross(w_world, xipos - origin)
    # into the inertial frame (ximat columns = frame axes)
    w_l = (ximat * w_world[:, :, None]).sum(-2)
    v_l = (ximat * (v_world - wind)[:, :, None]).sum(-2)
    diam = 2.0 * r.sum(-1) / 3.0
    f_l = -3.0 * jnp.pi * eta * diam[:, None] * v_l
    tau_l = -jnp.pi * eta * (diam ** 3)[:, None] * w_l
    r4 = r ** 4
    rj = jnp.roll(r, -1, axis=-1)
    rk = jnp.roll(r, -2, axis=-1)
    r4j = jnp.roll(r4, -1, axis=-1)
    r4k = jnp.roll(r4, -2, axis=-1)
    f_l = f_l - 2.0 * rho * rj * rk * jnp.abs(v_l) * v_l
    tau_l = tau_l - 0.5 * rho * r * (r4j + r4k) * jnp.abs(w_l) * w_l
    live = (mass > 1e-12).astype(dtype)[:, None]
    f_w = (ximat * f_l[:, None, :]).sum(-1) * live
    tau_w = (ximat * tau_l[:, None, :]).sum(-1) * live
    # project through the body point/angular jacobians
    ang, lin = cdof[:, :3], cdof[:, 3:]
    maskbv = jnp.asarray(m.ancestor_mask, dtype)         # (nbody, nv)
    rr = xipos - origin
    # qfrc_i = sum_b mask * [ang_i . tau_b + (lin_i + ang_i x r_b) . f_b]
    lin_at = (lin[None] + jnp.cross(ang[None, :, :], rr[:, None, :]))
    qfrc = (maskbv * ((ang[None] * tau_w[:, None, :]).sum(-1)
                      + (lin_at * f_w[:, None, :]).sum(-1))).sum(0)
    return qfrc


def passive(m: Model, com: dict, qpos: jax.Array, qvel: jax.Array,
            xipos: jax.Array, mass=None, ten=None, fluid_state=None):
    """(qfrc_passive, qfrc_spring, qfrc_damper, qfrc_gravcomp)."""
    dtype = qpos.dtype
    if m.opt.disableflags & int(DisableBit.PASSIVE):
        z = jnp.zeros(m.nv, dtype)
        return z, z, z, z
    qfrc_spring, qfrc_damper = spring_damper(m, qpos, qvel, ten=ten)
    qfrc_gravcomp = gravcomp(m, com, xipos, mass)
    qfrc_fluid = jnp.zeros(m.nv, dtype)
    if m.opt.has_fluid and fluid_state is not None:
        cvel, ximat, inertia = fluid_state
        qfrc_fluid = fluid(m, com, xipos, cvel, ximat, mass, inertia)
    return (qfrc_spring + qfrc_damper + qfrc_gravcomp + qfrc_fluid,
            qfrc_spring, qfrc_damper, qfrc_gravcomp)
