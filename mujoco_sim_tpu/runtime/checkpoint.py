"""Checkpoint / resume + scene snapshot ("screenshot") service.

The reference's closest analogue is the /mujoco/screenshot service
(src/mujoco_sim/mj_ros.cpp:670-777): live model saved as relocatable MJCF
with meshes, plus mj_printModel/mj_printData dumps; warm-resume exists via
add_old_state's full state transplant incl. qacc_warmstart
(mj_sim.cpp:465-558).  Here: exact-state checkpoints of the Data pytree
(npz) + the same relocatable MJCF snapshot, consumable by the USD exporter.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from mujoco_sim_tpu import engine
from mujoco_sim_tpu.models.model import Model, Data


def _flatten_with_paths(tree):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_state(data: Data, path: str, extra: dict | None = None):
    """Exact Data checkpoint (state + warmstart + masks) -> one .npz."""
    arrays = _flatten_with_paths(data)
    arrays = {f"data/{k}": v for k, v in arrays.items()}
    meta = json.dumps(extra or {})
    np.savez_compressed(path, __meta__=np.frombuffer(
        meta.encode(), dtype=np.uint8), **arrays)


def load_state(m: Model, path: str, dtype=None) -> tuple[Data, dict]:
    """Restore a Data checkpoint into a fresh make_data skeleton."""
    with np.load(path) as z:
        arrays = {k[len("data/"):]: z[k] for k in z.files if
                  k.startswith("data/")}
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z.files else {}
    d = engine.make_data(m, dtype)
    flat, treedef = jax.tree_util.tree_flatten_with_path(d)
    new_leaves = []
    for path_, leaf in flat:
        key = "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                       for p in path_)
        if key in arrays:
            new_leaves.append(jax.numpy.asarray(arrays[key], leaf.dtype))
        else:
            new_leaves.append(leaf)
    d = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(d), new_leaves)
    return d, meta


def screenshot(spec, m: Model, d: Data, out_dir: str,
               name: str = "snapshot") -> dict:
    """Relocatable scene snapshot: MJCF + meshes + model/data dumps + state.

    Returns the file map (the reference returns the xml path in the Trigger
    response message, mj_ros.cpp:770-775).
    """
    from mujoco_sim_tpu.models.export_mjcf import (
        export_mjcf, print_model_txt, print_data_txt)

    os.makedirs(out_dir, exist_ok=True)
    files = {}
    xml = os.path.join(out_dir, f"{name}.xml")
    export_mjcf(spec, xml, model=m, data=d)
    files["xml"] = xml
    mtxt = os.path.join(out_dir, f"{name}.txt")
    print_model_txt(m, mtxt)
    files["model_txt"] = mtxt
    dtxt = os.path.join(out_dir, f"{name}_data.txt")
    print_data_txt(m, d, dtxt)
    files["data_txt"] = dtxt
    st = os.path.join(out_dir, f"{name}_state.npz")
    save_state(d, st, extra={"time": float(d.time)})
    files["state"] = st
    return files
