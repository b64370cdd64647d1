"""Simulation runtime: masked spawn/destroy, reset, name allocation.

Replaces the reference's reload-and-transplant scene mutation
(MjRos::spawn_objects -> MjSim::add_data -> load_tmp_model -> add_old_state,
SURVEY.md §3.3) with pre-allocated padded slots toggled by Data.body_active
masks: the behavioral contract — survivors' state preserved exactly, spawn
atomic w.r.t. stepping, destroy returns final states — holds with ZERO
retracing of the jitted step.

Capacity planning: the scene is composed with N spawnable instances per
object class (models/scene.py ``instances=``); spawn claims a free slot,
destroy releases it.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.model import Model, Data, JointType


class NameAllocator:
    """The reference's name-uniquing behavior (add_index/check_index,
    src/mujoco_sim/mj_ros.cpp:137-187): requested names get a numeric
    suffix; existing trailing digits are replaced; collisions bump a global
    per-class counter until unique."""

    def __init__(self, existing=()):
        self.known = set(existing)
        self.unique_index = 0

    def allocate(self, requested: str) -> str:
        name = requested
        while True:
            m_ = re.search(r"(\d+)$", name)
            if m_ is None or name.endswith("_"):
                candidate = f"{name}_{self.unique_index}"
            else:
                candidate = name[: m_.start(1)] + str(self.unique_index)
            if candidate not in self.known:
                self.known.add(candidate)
                return candidate
            self.unique_index += 1

    def release(self, name: str):
        self.known.discard(name)


@dataclasses.dataclass
class SpawnSlot:
    """One pre-allocated object instance (a subtree rooted at root_body)."""

    root_body: int                 # body id of the instance root
    bodies: np.ndarray             # all body ids in the subtree
    free_jnt: int                  # free joint id of the root (-1 if none)
    qpos_adr: int                  # its qpos address
    dof_adr: int
    in_use: bool = False
    public_name: str = ""


def subtree_bodies(m: Model, root: int) -> np.ndarray:
    lay = m.layout
    out = [root]
    for b in range(root + 1, m.nbody):
        i = b
        while i > root:
            i = int(lay.body_parentid[i])
        if i == root:
            out.append(b)
    return np.asarray(sorted(set(out)), dtype=int)


class Simulation:
    """Host-side stateful wrapper over (Model, Data) providing the service
    surface of the reference node: spawn/destroy/reset (mj_ros.cpp:859-1518,
    569-609).  Data itself stays a pure pytree; this class orchestrates."""

    def __init__(self, m: Model, spawnable: dict[str, list[str]] | None = None,
                 dtype=None):
        """spawnable: class name -> list of pre-allocated root body names
        (e.g. {"pr2": ["1_pr2", "2_pr2"]}); those start inactive."""
        self.m = m
        self.d = engine.make_data(m, dtype)
        self.names = NameAllocator(m.names.body)
        self.slots: dict[str, list[SpawnSlot]] = {}
        self.by_public_name: dict[str, SpawnSlot] = {}
        self._joint_inits: dict[str, float] = {}
        lay = m.layout
        inactive = []
        for cls, roots in (spawnable or {}).items():
            lst = []
            for rn in roots:
                bid = m.names.body_id(rn)
                if bid < 0:
                    raise KeyError(f"spawn slot body {rn} not in model")
                bodies = subtree_bodies(m, bid)
                fj = -1
                qa = da = -1
                if lay.body_jntnum[bid] > 0:
                    j0 = int(lay.body_jntadr[bid])
                    if lay.jnt_type[j0] == int(JointType.FREE):
                        fj = j0
                        qa = int(lay.jnt_qposadr[j0])
                        da = int(lay.jnt_dofadr[j0])
                lst.append(SpawnSlot(bid, bodies, fj, qa, da))
                inactive.extend(bodies.tolist())
            self.slots[cls] = lst
        if inactive:
            ba = np.ones(m.nbody, dtype=bool)
            ba[np.asarray(inactive)] = False
            self.d = self.d.replace(body_active=jnp.asarray(ba))

    # ------------------------------------------------------------------
    def set_joint_inits(self, joint_inits: dict[str, float]):
        self._joint_inits = dict(joint_inits)

    def spawn(self, object_class: str, requested_name: str = "",
              pose: Optional[np.ndarray] = None,
              velocity: Optional[np.ndarray] = None) -> str:
        """Claim a free slot; returns the allocated unique name.

        pose: (7,) [x y z qw qx qy qz]; velocity: (6,) [v w] — applied to
        the slot's free joint (reference sets them from the request,
        mj_ros.cpp:1340-1412).
        """
        slots = self.slots.get(object_class)
        if not slots:
            raise KeyError(f"no spawn slots for class {object_class}")
        slot = next((s for s in slots if not s.in_use), None)
        if slot is None:
            raise RuntimeError(f"all {object_class} slots in use")
        name = self.names.allocate(requested_name or object_class)
        slot.in_use = True
        slot.public_name = name
        self.by_public_name[name] = slot

        d = self.d
        ba = d.body_active.at[jnp.asarray(slot.bodies)].set(True)
        d = d.replace(body_active=ba)
        if slot.free_jnt >= 0 and pose is not None:
            pose = jnp.asarray(pose, d.qpos.dtype)
            d = d.replace(qpos=jax.lax.dynamic_update_slice(
                d.qpos, pose, (slot.qpos_adr,)))
        if slot.free_jnt >= 0 and velocity is not None:
            vel = jnp.asarray(velocity, d.qvel.dtype)
            d = d.replace(qvel=jax.lax.dynamic_update_slice(
                d.qvel, vel, (slot.dof_adr,)))
        self.d = d
        return name

    def destroy(self, name: str) -> dict:
        """Release a slot; returns the final state of the destroyed object
        (the reference's DestroyObject response, mj_ros.cpp:1430-1507)."""
        slot = self.by_public_name.pop(name, None)
        if slot is None:
            raise KeyError(f"unknown object {name}")
        d = self.d
        state = {}
        if slot.free_jnt >= 0:
            state["pose"] = np.asarray(
                d.qpos[slot.qpos_adr:slot.qpos_adr + 7])
            state["velocity"] = np.asarray(
                d.qvel[slot.dof_adr:slot.dof_adr + 6])
        ba = d.body_active.at[jnp.asarray(slot.bodies)].set(False)
        # park the body far away + zero velocity so its (inactive) contacts
        # never win top-k and its state stays finite
        if slot.free_jnt >= 0:
            park = jnp.asarray(
                [0.0, 0.0, -1000.0 - 10.0 * slot.root_body, 1, 0, 0, 0],
                d.qpos.dtype)
            d = d.replace(qpos=jax.lax.dynamic_update_slice(
                d.qpos, park, (slot.qpos_adr,)))
            d = d.replace(qvel=jax.lax.dynamic_update_slice(
                d.qvel, jnp.zeros(6, d.qvel.dtype), (slot.dof_adr,)))
        self.d = d.replace(body_active=ba)
        self.names.release(name)
        slot.in_use = False
        slot.public_name = ""
        return state

    # ------------------------------------------------------------------
    def reset(self, robot_joint_names: dict[str, list[str]] | None = None):
        """reset_robot semantics (mj_ros.cpp:569-609): robot joints to
        joint_inits (default 0), velocities/accelerations zeroed, then
        forward.  Non-robot state (spawned objects) is preserved."""
        m, d = self.m, self.d
        lay = m.layout
        qpos, qvel = d.qpos, d.qvel
        for robot, joints in (robot_joint_names or {}).items():
            for jn in joints:
                j = m.names.joint_id(jn)
                if j < 0:
                    continue
                qa = int(lay.jnt_qposadr[j])
                da = int(lay.jnt_dofadr[j])
                init = self._joint_inits.get(jn, 0.0)
                qpos = qpos.at[qa].set(init)
                qvel = qvel.at[da].set(0.0)
        d = d.replace(qpos=qpos, qvel=qvel,
                      qacc=jnp.zeros_like(d.qacc),
                      time=jnp.zeros_like(d.time))
        self.d = jax.jit(engine.forward)(m, d)
        return self.d

    def reset_full(self):
        """Full reset to qpos0 (fresh mj_makeData equivalent)."""
        active = self.d.body_active
        self.d = engine.make_data(self.m, self.d.qpos.dtype)
        self.d = self.d.replace(body_active=active)
        return self.d

    def step(self, n: int = 1):
        step = jax.jit(engine.step)
        for _ in range(n):
            self.d = step(self.m, self.d)
        return self.d
