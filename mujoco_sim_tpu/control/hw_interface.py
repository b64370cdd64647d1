"""Hardware-interface contract: joint read/write like ros_control RobotHW.

Equivalent of MjHWInterface (reference: src/mujoco_sim/mj_hw_interface.cpp):
read() reports (position, velocity, effort) per controlled joint where
effort comes from inverse dynamics (mj_inverse, mj_hw_interface.cpp:59-71);
write() routes commands into the controller buffers by mode
(mj_hw_interface.cpp:73-91: velocity -> MjSim::dq, effort/position-PID ->
MjSim::ddq).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import Model, Data
from mujoco_sim_tpu.control.controllers import PDState


class ControlMode(enum.IntEnum):
    EFFORT = 0      # computed-torque ddq command
    VELOCITY = 1    # direct qvel override
    POSITION = 2    # PD on position -> ddq


def joint_dofs(m: Model, joint_names) -> np.ndarray:
    lay = m.layout
    out = []
    for jn in joint_names:
        j = m.names.joint_id(jn)
        if j < 0:
            raise KeyError(f"unknown joint {jn}")
        out.append(int(lay.jnt_dofadr[j]))
    return np.asarray(out, dtype=int)


def read(m: Model, d: Data, dof_ids: np.ndarray):
    """(position, velocity, effort) arrays for the given dofs.

    effort = qfrc_inverse-style feedback: M qacc + bias - passive - constraint
    evaluated at the current state (the reference calls mj_inverse per read,
    mj_hw_interface.cpp:61).
    """
    lay = m.layout
    qadr = lay.jnt_qposadr[lay.dof_jntid[dof_ids]]
    pos = d.qpos[qadr]
    vel = d.qvel[dof_ids]
    qfrc_inv = (d.qM @ d.qacc + d.qfrc_bias - d.qfrc_passive
                - d.qfrc_constraint)
    eff = qfrc_inv[dof_ids]
    return pos, vel, eff


def write(st: PDState, dof_ids: np.ndarray, commands: jax.Array,
          mode: ControlMode) -> PDState:
    """Route per-joint commands into the controller buffers."""
    if mode == ControlMode.VELOCITY:
        return st.replace(dq=st.dq.at[dof_ids].set(commands))
    return st.replace(ddq=st.ddq.at[dof_ids].set(commands))
