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
    geoms: np.ndarray = None       # geom ids of the subtree
    in_use: bool = False
    public_name: str = ""


def _rbound_of(gtype: int, s: np.ndarray) -> float:
    """Bounding radius by geom type (matches models/compile.py:451-469)."""
    from mujoco_sim_tpu.models.model import GeomType as GT
    t = GT(gtype)
    if t == GT.SPHERE:
        return float(s[0])
    if t == GT.CAPSULE:
        return float(s[0] + s[1])
    if t == GT.CYLINDER:
        return float(np.sqrt(s[0] ** 2 + s[1] ** 2))
    if t == GT.BOX:
        return float(np.linalg.norm(s))
    if t == GT.ELLIPSOID:
        return float(s.max())
    return 0.0


def _mass_inertia_of(gtype: int, s: np.ndarray, density: float):
    """(mass, diagonal inertia) from geometry + density (the MJCF compiler's
    behavior the reference relies on when the request has no inertial,
    mj_ros.cpp:941-966 building a plain <geom>)."""
    from mujoco_sim_tpu.models.model import GeomType as GT
    t = GT(gtype)
    if t == GT.SPHERE:
        r = float(s[0])
        mass = density * 4.0 / 3.0 * np.pi * r ** 3
        i = 0.4 * mass * r * r
        return mass, np.array([i, i, i])
    if t == GT.BOX:
        sx, sy, sz = float(s[0]), float(s[1]), float(s[2])
        mass = density * 8.0 * sx * sy * sz
        return mass, mass / 3.0 * np.array(
            [sy * sy + sz * sz, sx * sx + sz * sz, sx * sx + sy * sy])
    if t == GT.CYLINDER:
        r, h = float(s[0]), float(s[1])
        mass = density * np.pi * r * r * (2.0 * h)
        ixy = mass * (3.0 * r * r + 4.0 * h * h) / 12.0
        return mass, np.array([ixy, ixy, 0.5 * mass * r * r])
    if t == GT.CAPSULE:
        r, h = float(s[0]), float(s[1])
        m_cyl = density * np.pi * r * r * (2.0 * h)
        m_sph = density * 4.0 / 3.0 * np.pi * r ** 3
        mass = m_cyl + m_sph
        iz = 0.5 * m_cyl * r * r + 0.4 * m_sph * r * r
        ixy = (m_cyl * (3.0 * r * r + 4.0 * h * h) / 12.0
               + m_sph * (0.4 * r * r + h * h + 0.75 * h * r))
        return mass, np.array([ixy, ixy, iz])
    if t == GT.ELLIPSOID:
        a, b, c = float(s[0]), float(s[1]), float(s[2])
        mass = density * 4.0 / 3.0 * np.pi * a * b * c
        return mass, 0.2 * mass * np.array(
            [b * b + c * c, a * a + c * c, a * a + b * b])
    raise ValueError(f"cannot derive inertia for geom type {t}")


_JNT_WIDTHS = {int(JointType.FREE): (7, 6), int(JointType.BALL): (4, 3),
               int(JointType.SLIDE): (1, 1), int(JointType.HINGE): (1, 1)}


def transplant_state(old_m: Model, old_d: Data, new_m: Model,
                     new_d: Data) -> Data:
    """Name-matched exact state transplant across a model recompile (the
    reference's `add_old_state`, mj_sim.cpp:465-558): every joint, body,
    geom and actuator present in BOTH models carries its state over
    bit-exactly (numpy copies, no arithmetic); entities only in the new
    model keep their compiled defaults.  Copied state mirrors the
    reference's list — time, qpos/qvel/qacc/qacc_warmstart/qfrc_applied
    (by joint), xfrc_applied + active mask + runtime mass/inertia (by
    body), runtime geom size/rbound/rgba (by geom), ctrl/act (by
    actuator), mocap pose (by mocap body)."""
    lo, ln = old_m.layout, new_m.layout
    out = {k: np.array(getattr(new_d, k)) for k in
           ("qpos", "qvel", "qacc", "qacc_warmstart", "qfrc_applied",
            "xfrc_applied", "body_active", "body_mass", "body_inertia",
            "geom_size", "geom_rbound", "geom_rgba", "ctrl", "act",
            "mocap_pos", "mocap_quat")}
    olds = {k: np.asarray(getattr(old_d, k)) for k in out}
    for jname in old_m.names.joint:
        j_o = old_m.names.joint_id(jname)
        j_n = new_m.names.joint_id(jname)
        if j_o < 0 or j_n < 0:
            continue
        nq_w, nv_w = _JNT_WIDTHS[int(lo.jnt_type[j_o])]
        qa_o, qa_n = int(lo.jnt_qposadr[j_o]), int(ln.jnt_qposadr[j_n])
        da_o, da_n = int(lo.jnt_dofadr[j_o]), int(ln.jnt_dofadr[j_n])
        out["qpos"][qa_n:qa_n + nq_w] = olds["qpos"][qa_o:qa_o + nq_w]
        for k in ("qvel", "qacc", "qacc_warmstart", "qfrc_applied"):
            out[k][da_n:da_n + nv_w] = olds[k][da_o:da_o + nv_w]
    for bname in old_m.names.body:
        b_o = old_m.names.body_id(bname)
        b_n = new_m.names.body_id(bname)
        if b_o <= 0 or b_n <= 0:    # skip world
            continue
        for k in ("xfrc_applied", "body_active", "body_mass",
                  "body_inertia"):
            out[k][b_n] = olds[k][b_o]
        mo, mn = int(lo.body_mocapid[b_o]), int(ln.body_mocapid[b_n])
        if mo >= 0 and mn >= 0:
            out["mocap_pos"][mn] = olds["mocap_pos"][mo]
            out["mocap_quat"][mn] = olds["mocap_quat"][mo]
    for gname in old_m.names.geom:
        if not gname:
            continue
        g_o = old_m.names.geom_id(gname)
        g_n = new_m.names.geom_id(gname)
        if g_o < 0 or g_n < 0:
            continue
        for k in ("geom_size", "geom_rbound", "geom_rgba"):
            out[k][g_n] = olds[k][g_o]
    for aname in old_m.names.actuator:
        a_o = old_m.names.actuator_id(aname)
        a_n = new_m.names.actuator_id(aname)
        if a_o < 0 or a_n < 0:
            continue
        out["ctrl"][a_n] = olds["ctrl"][a_o]
        out["act"][a_n] = olds["act"][a_o]
    leaves = {k: jnp.asarray(v, getattr(new_d, k).dtype)
              for k, v in out.items()}
    return new_d.replace(time=old_d.time, **leaves)


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
                geoms = np.nonzero(np.isin(lay.geom_bodyid, bodies))[0]
                lst.append(SpawnSlot(bid, bodies, fj, qa, da, geoms))
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
              velocity: Optional[np.ndarray] = None,
              size: Optional[np.ndarray] = None,
              rgba: Optional[np.ndarray] = None,
              inertial: Optional[dict] = None,
              density: float = 1000.0) -> str:
        """Claim a free slot; returns the allocated unique name.

        pose: (7,) [x y z qw qx qy qz]; velocity: (6,) [v w] — applied to
        the slot's free joint.  size/rgba/inertial parameterize the slot's
        geometry per request like the reference's spawn building a geom from
        ObjectInfo (mj_ros.cpp:941-966,1340-1412): geom size/rbound/rgba and
        body mass/inertia are Data leaves, so this never retraces the step.
        size applies to single-geom slots (primitive classes); inertial is
        {"m": float, "ixx"/"iyy"/"izz": float} (com offsets unsupported);
        without inertial, mass/inertia follow geometry at `density` (the
        MJCF-compiler default the reference inherits).  Mesh-hull collision
        shapes are compile-time; resizing mesh slots is rejected.
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

        m, d = self.m, self.d
        lay = m.layout
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
        if size is not None:
            if slot.geoms is None or len(slot.geoms) != 1:
                raise ValueError(
                    f"size override requires a single-geom slot; "
                    f"class {object_class} has {len(slot.geoms or [])} geoms")
            g = int(slot.geoms[0])
            gtype = int(lay.geom_type[g])
            from mujoco_sim_tpu.models.model import GeomType as GT
            if gtype == int(GT.MESH):
                raise ValueError("mesh slots cannot be resized at runtime")
            s3 = np.zeros(3)
            s3[: len(np.atleast_1d(size))] = np.atleast_1d(size)
            d = d.replace(
                geom_size=d.geom_size.at[g].set(
                    jnp.asarray(s3, d.geom_size.dtype)),
                geom_rbound=d.geom_rbound.at[g].set(_rbound_of(gtype, s3)))
            if inertial is not None:
                mass = float(inertial["m"])
                inert = np.array([inertial.get("ixx", 0.0),
                                  inertial.get("iyy", 0.0),
                                  inertial.get("izz", 0.0)])
                if not inert.any():
                    _, inert = _mass_inertia_of(gtype, s3, density)
                    inert *= mass / max(_mass_inertia_of(
                        gtype, s3, density)[0], 1e-12)
            else:
                mass, inert = _mass_inertia_of(gtype, s3, density)
            b = slot.root_body
            d = d.replace(
                body_mass=d.body_mass.at[b].set(mass),
                body_inertia=d.body_inertia.at[b].set(
                    jnp.asarray(inert, d.body_inertia.dtype)))
        elif inertial is not None:
            b = slot.root_body
            d = d.replace(body_mass=d.body_mass.at[b].set(
                float(inertial["m"])))
            inert = np.array([inertial.get("ixx", 0.0),
                              inertial.get("iyy", 0.0),
                              inertial.get("izz", 0.0)])
            if inert.any():
                d = d.replace(body_inertia=d.body_inertia.at[b].set(
                    jnp.asarray(inert, d.body_inertia.dtype)))
        if rgba is not None and slot.geoms is not None and len(slot.geoms):
            d = d.replace(geom_rgba=d.geom_rgba.at[
                jnp.asarray(slot.geoms)].set(
                jnp.asarray(rgba, d.geom_rgba.dtype)))
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
        # restore compiled defaults so the next spawn starts clean
        m = self.m
        if slot.geoms is not None and len(slot.geoms):
            gs = jnp.asarray(slot.geoms)
            d = d.replace(
                geom_size=d.geom_size.at[gs].set(
                    jnp.asarray(np.asarray(m.geom_size)[slot.geoms],
                                d.geom_size.dtype)),
                geom_rbound=d.geom_rbound.at[gs].set(
                    jnp.asarray(np.asarray(m.geom_rbound)[slot.geoms],
                                d.geom_rbound.dtype)),
                geom_rgba=d.geom_rgba.at[gs].set(
                    jnp.asarray(np.asarray(m.geom_rgba)[slot.geoms],
                                d.geom_rgba.dtype)))
        bs = jnp.asarray(slot.bodies)
        d = d.replace(
            body_mass=d.body_mass.at[bs].set(
                jnp.asarray(np.asarray(m.body_mass)[slot.bodies],
                            d.body_mass.dtype)),
            body_inertia=d.body_inertia.at[bs].set(
                jnp.asarray(np.asarray(m.body_inertia)[slot.bodies],
                            d.body_inertia.dtype)))
        self.d = d.replace(body_active=ba)
        self.names.release(name)
        slot.in_use = False
        slot.public_name = ""
        return state

    # ------------------------------------------------------------------
    def hot_swap(self, new_m: Model,
                 spawnable: dict[str, list[str]] | None = None):
        """Swap to a RECOMPILED model, transplanting survivors' state
        exactly — the slow path behind runtime loading of unregistered
        assets.

        The reference mutates the live scene by save -> modify XML ->
        reload -> `add_old_state` name-matched state transplant -> swap
        the global (m, d) pointers (mj_sim.cpp:465-558,804-845); its
        spawn service uses that path to load arbitrary asset files at
        runtime (mj_ros.cpp:1340-1363).  Our fast path (registered
        classes, masked slots) never retraces; this slow path accepts
        the one retrace of the jitted step in exchange for the same
        capability: every surviving joint/body/geom/actuator keeps its
        state BIT-exactly (numpy copies by name matching, no recompute).

        `spawnable` is the full slot registry for the new model;
        occupied slots are re-claimed by their root-body name and keep
        their public names."""
        old_m, old_d = self.m, self.d
        if old_d.qpos.ndim != 1:
            raise ValueError("hot_swap operates on single-env Data")
        occupied = {public: old_m.names.body[slot.root_body]
                    for public, slot in self.by_public_name.items()}
        joint_inits = self._joint_inits
        dtype = old_d.qpos.dtype
        self.__init__(new_m, spawnable=spawnable, dtype=dtype)
        self._joint_inits = joint_inits
        # re-claim occupied slots by root-body name (public names survive)
        root2slot = {new_m.names.body[s.root_body]: s
                     for lst in self.slots.values() for s in lst}
        for public, rootname in occupied.items():
            slot = root2slot.get(rootname)
            if slot is None:
                continue    # its class shrank away; object is gone
            slot.in_use = True
            slot.public_name = public
            self.by_public_name[public] = slot
            self.names.known.add(public)
        self.d = transplant_state(old_m, old_d, new_m, self.d)
        return self.d

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
