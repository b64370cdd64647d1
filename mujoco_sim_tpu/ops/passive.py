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


def passive(m: Model, com: dict, qpos: jax.Array, qvel: jax.Array,
            xipos: jax.Array, mass=None, ten=None):
    """(qfrc_passive, qfrc_spring, qfrc_damper, qfrc_gravcomp)."""
    dtype = qpos.dtype
    if m.opt.disableflags & int(DisableBit.PASSIVE):
        z = jnp.zeros(m.nv, dtype)
        return z, z, z, z
    qfrc_spring, qfrc_damper = spring_damper(m, qpos, qvel, ten=ten)
    qfrc_gravcomp = gravcomp(m, com, xipos, mass)
    return (qfrc_spring + qfrc_damper + qfrc_gravcomp,
            qfrc_spring, qfrc_damper, qfrc_gravcomp)
