"""Controller transforms: computed-torque PD, velocity override, odom base.

Pure-functional equivalents of the reference's control path
(MjSim::controller, src/mujoco_sim/mj_sim.cpp:1055-1077; MjSim::set_odom_vels,
mj_sim.cpp:1079-1154; ROS effort_controllers PID upstream of it,
model/ontology/box/box.yaml:5-13).  In the reference the controller runs as
mjcb_control inside mj_step1 and HW write lands between step1/step2
(src/mj_main.cpp:83-108); here the same data flow is
``d = step1(m, d); d = apply_control(...); d = step2(m, d)`` or the fused
:func:`mujoco_sim_tpu.engine.step` for pure rollouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import Model, Data
from mujoco_sim_tpu.utils.struct import pytree, field, static

_MJMINVAL = 1e-15


@pytree
class PDState:
    """Per-dof PID integrator state + command buffers (MjSim tau/ddq/dq)."""

    ddq: jax.Array        # (nv,) desired accelerations (effort-mode dofs)
    dq: jax.Array         # (nv,) desired velocities (velocity-mode dofs)
    err_int: jax.Array    # (nv,) integrated position error


def make_pd_state(m: Model, dtype=None) -> PDState:
    dtype = dtype or jnp.asarray(m.qpos0).dtype
    z = jnp.zeros(m.nv, dtype)
    return PDState(ddq=z, dq=z, err_int=z)


@pytree
class PDConfig:
    """Computed-torque PD(+I) on joint position for 1-dof joints.

    kp/kd/ki and masks are per-dof arrays; dof_qposadr maps each dof to its
    qpos entry (valid for hinge/slide dofs, which is what ros_control
    position interfaces drive in the reference).
    """

    kp: jax.Array
    kd: jax.Array
    ki: jax.Array
    ctrl_mask: jax.Array      # (nv,) 1.0 where computed-torque-controlled
    dof_qposadr: jax.Array = field(default=None)  # (nv,) i32


def pd_config_for_joints(m: Model, joint_names, kp=100.0, kd=10.0, ki=0.0,
                         dtype=None) -> PDConfig:
    """Build a PDConfig controlling the named (1-dof) joints."""
    dtype = dtype or jnp.asarray(m.qpos0).dtype
    lay = m.layout
    mask = np.zeros(m.nv)
    kpv = np.zeros(m.nv)
    kdv = np.zeros(m.nv)
    kiv = np.zeros(m.nv)
    dof_qposadr = np.zeros(m.nv, dtype=int)
    for jn in joint_names:
        j = m.names.joint_id(jn) if hasattr(m.names, "joint_id") else -1
        if j < 0:
            j = list(m.names.joint).index(jn)
        dof = int(lay.jnt_dofadr[j])
        mask[dof] = 1.0
        kpv[dof] = kp
        kdv[dof] = kd
        kiv[dof] = ki
        dof_qposadr[dof] = int(lay.jnt_qposadr[j])
    # harmless defaults for uncontrolled dofs
    for v in range(m.nv):
        if mask[v] == 0:
            dof_qposadr[v] = int(lay.jnt_qposadr[lay.dof_jntid[v]])
    return PDConfig(kp=jnp.asarray(kpv, dtype), kd=jnp.asarray(kdv, dtype),
                    ki=jnp.asarray(kiv, dtype),
                    ctrl_mask=jnp.asarray(mask, dtype),
                    dof_qposadr=jnp.asarray(dof_qposadr, jnp.int32))


def pd_accel(cfg: PDConfig, st: PDState, d: Data, qpos_des: jax.Array,
             dt) -> PDState:
    """PID on position error -> desired acceleration (per controlled dof).

    Mirrors the net law of ros effort PID feeding MjHWInterface::write
    (reference: mj_hw_interface.cpp:73-91 routes cmds into MjSim::ddq).
    qpos_des: (nv,) desired position per dof (dof-indexed).
    """
    q = d.qpos[cfg.dof_qposadr]
    err = qpos_des - q
    err_int = st.err_int + err * dt
    ddq = (cfg.kp * err + cfg.kd * (0.0 - d.qvel) + cfg.ki * err_int)
    ddq = ddq * cfg.ctrl_mask
    return st.replace(ddq=ddq, err_int=err_int * cfg.ctrl_mask)


def apply_control(m: Model, d: Data, st: PDState,
                  ctrl_mask: jax.Array) -> tuple[Data, PDState]:
    """The MjSim::controller law:

    tau = M @ ddq;  tau[controlled] += qfrc_bias[controlled];
    qfrc_applied = tau;  qvel overridden where |dq| > mjMINVAL.
    (reference: mj_sim.cpp:1055-1077)
    """
    tau = d.qM @ st.ddq
    tau = tau + d.qfrc_bias * ctrl_mask
    qvel = jnp.where(jnp.abs(st.dq) > _MJMINVAL, st.dq, d.qvel)
    d = d.replace(qfrc_applied=tau, qvel=qvel)
    # buffers are consumed (reference zeroes ddq/dq after applying)
    st = st.replace(ddq=jnp.zeros_like(st.ddq), dq=jnp.zeros_like(st.dq))
    return d, st


class OdomConfig:
    """Odom joint dof/qpos indices for one robot's injected base joints.

    Host-side static config (presence is a compile-time fact).  Order:
    lin x,y,z then ang x,y,z; -1 where the joint wasn't injected (reference
    naming: <robot>_{lin,ang}_odom_{x,y,z}_joint, mj_sim.cpp:337-420).
    """

    def __init__(self, dof_ids: np.ndarray, qpos_ids: np.ndarray,
                 present: np.ndarray):
        self.dof_ids = dof_ids
        self.qpos_ids = qpos_ids
        self.present = present


def odom_config(m: Model, robot: str) -> OdomConfig:
    lay = m.layout
    names = m.names
    dof_ids = np.full(6, -1)
    qpos_ids = np.zeros(6, dtype=int)
    present = np.zeros(6, dtype=bool)
    order = ["lin_odom_x_joint", "lin_odom_y_joint", "lin_odom_z_joint",
             "ang_odom_x_joint", "ang_odom_y_joint", "ang_odom_z_joint"]
    for i, suffix in enumerate(order):
        j = names.joint_id(f"{robot}_{suffix}")
        if j >= 0:
            dof_ids[i] = int(lay.jnt_dofadr[j])
            qpos_ids[i] = int(lay.jnt_qposadr[j])
            present[i] = True
    return OdomConfig(dof_ids, qpos_ids, present)


def set_odom_vels(m: Model, d: Data, cfg: OdomConfig,
                  cmd_vel: jax.Array) -> Data:
    """Base velocity control: body-frame cmd_vel -> world-frame odom qvel.

    cmd_vel: (6,) [vx, vy, vz, wx, wy, wz] in the robot base frame.
    Linear part rotated by Rz(thz)Ry(thy)Rx(thx) of the current odom hinge
    angles; angular passes through (reference: mj_sim.cpp:1079-1154).
    """
    dtype = d.qpos.dtype
    zero = jnp.asarray(0.0, dtype)
    # current odom angles (0 where hinge absent; static presence)
    thx = d.qpos[int(cfg.qpos_ids[3])] if cfg.present[3] else zero
    thy = d.qpos[int(cfg.qpos_ids[4])] if cfg.present[4] else zero
    thz = d.qpos[int(cfg.qpos_ids[5])] if cfg.present[5] else zero
    cx, sx = jnp.cos(thx), jnp.sin(thx)
    cy, sy = jnp.cos(thy), jnp.sin(thy)
    cz, sz = jnp.cos(thz), jnp.sin(thz)
    R = jnp.stack([
        jnp.stack([cy * cz, sx * sy * cz - cx * sz, cx * sy * cz + sx * sz]),
        jnp.stack([cy * sz, sx * sy * sz + cx * cz, cx * sy * sz - sx * cz]),
        jnp.stack([-sy, sx * cy, cx * cy]),
    ])
    lin_world = R @ cmd_vel[:3]
    new_vals = jnp.concatenate([lin_world, cmd_vel[3:6]])
    ids = cfg.dof_ids[cfg.present]          # static subset
    sel = np.nonzero(cfg.present)[0]
    return d.replace(qvel=d.qvel.at[ids].set(new_vals[sel]))
