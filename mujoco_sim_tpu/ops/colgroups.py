"""Shared collision group/candidate layout (compile-time + kernel-time).

Pairs are grouped by (type1, type2).  Primitive groups narrowphase ALL their
pairs every step.  Mesh-involving groups (expensive hull math) use two-level
selection: a cheap bound-distance prefilter picks the top-P closest pairs at
runtime, and only those are narrowphased into the group's P*cap candidate
slots.  Both models/compile.py (capacity planning) and ops/collision.py
(kernels) derive the same static layout from this module.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from mujoco_sim_tpu.models.model import GeomType

# candidate contacts per pair by type combo (geom1-type listed first)
PAIR_NCON = {
    (GeomType.PLANE, GeomType.SPHERE): 1,
    (GeomType.PLANE, GeomType.CAPSULE): 2,
    (GeomType.PLANE, GeomType.CYLINDER): 4,
    (GeomType.PLANE, GeomType.BOX): 4,
    (GeomType.PLANE, GeomType.ELLIPSOID): 1,
    (GeomType.PLANE, GeomType.MESH): 4,
    (GeomType.SPHERE, GeomType.SPHERE): 1,
    (GeomType.SPHERE, GeomType.CAPSULE): 1,
    (GeomType.SPHERE, GeomType.BOX): 1,
    (GeomType.BOX, GeomType.BOX): 8,
    (GeomType.SPHERE, GeomType.MESH): 1,
    (GeomType.CAPSULE, GeomType.MESH): 2,
    (GeomType.BOX, GeomType.MESH): 4,
    (GeomType.MESH, GeomType.MESH): 4,
}

# groups that use the top-P prefilter (hull math is per-vertex x per-face)
EXPENSIVE = {
    (GeomType.SPHERE, GeomType.MESH),
    (GeomType.CAPSULE, GeomType.MESH),
    (GeomType.BOX, GeomType.MESH),
    (GeomType.MESH, GeomType.MESH),
}

DEFAULT_TOP_P = 32


@dataclasses.dataclass
class Group:
    key: tuple                 # (GeomType, GeomType)
    pair_idx: np.ndarray       # indices into the model pair list (static)
    cap: int                   # candidates per pair
    top_p: int                 # pairs narrowphased per step (== len for prim)
    cand_adr: int              # first candidate slot
    ncand: int                 # total candidate slots = top_p * cap


def build_groups(pair_keys: list[tuple], top_p: int = DEFAULT_TOP_P):
    """pair_keys[i] = (t1, t2) of model pair i -> ordered Group list."""
    groups = []
    adr = 0
    for key in sorted(set(pair_keys), key=lambda k: (int(k[0]), int(k[1]))):
        idx = np.nonzero([k == key for k in pair_keys])[0]
        cap = PAIR_NCON[key]
        p = min(len(idx), top_p) if key in EXPENSIVE else len(idx)
        g = Group(key=key, pair_idx=idx, cap=cap, top_p=p, cand_adr=adr,
                  ncand=p * cap)
        adr += g.ncand
        groups.append(g)
    return groups, adr
