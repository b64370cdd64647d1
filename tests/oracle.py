"""Helpers to load reference MJCFs into the installed (3.x) MuJoCo oracle.

The reference models target MuJoCo 2.3.7; a few attributes were removed in
3.x (e.g. the 'sensornoise' flag).  We stage a patched copy under /tmp with
symlinks to the original asset directories.
"""

import os
import re
import tempfile

import mujoco

_PATCHES = [
    (re.compile(r'sensornoise="[^"]*"\s*'), ""),
]


def oracle_model(path: str) -> mujoco.MjModel:
    with open(path) as f:
        xml = f.read()
    for pat, rep in _PATCHES:
        xml = pat.sub(rep, xml)
    src_dir = os.path.dirname(os.path.abspath(path))
    tmp = tempfile.mkdtemp(prefix="mst_oracle_")
    for entry in os.listdir(src_dir):
        full = os.path.join(src_dir, entry)
        dst = os.path.join(tmp, entry)
        if not os.path.exists(dst):
            os.symlink(full, dst)
    patched = os.path.join(tmp, "_patched_" + os.path.basename(path))
    with open(patched, "w") as f:
        f.write(xml)
    return mujoco.MjModel.from_xml_path(patched)
