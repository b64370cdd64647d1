"""Probe: per-step qpos divergence + contact-set comparison on a zoo robot."""
import sys

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import mujoco  # noqa: E402

from mujoco_sim_tpu import engine  # noqa: E402
from mujoco_sim_tpu.models.compile import load_model  # noqa: E402
from tests.oracle import oracle_model  # noqa: E402

argv = [a for a in sys.argv[1:] if not a.startswith("--")]
name = argv[0] if argv else "hsrb4s/hsrb4s"
nstep = int(argv[1]) if len(argv) > 1 else 50

path = f"/root/reference/model/test/{name}.xml"
mm = oracle_model(path)
dd = mujoco.MjData(mm)
m = load_model(path)
d = engine.make_data(m)
step = jax.jit(engine.step)


def _gname(mm, gid):
    import mujoco as _mj
    g = mm.geom(gid)
    bname = mm.body(g.bodyid).name
    t = _mj.mjtGeom(g.type).name.replace("mjGEOM_", "").lower()
    return f"{bname}:{t}"


def dump_contacts(tag, mm, dd, m, d):
    print(f"--- {tag}")
    mujoco.mj_forward(mm, dd)
    rows = []
    for i in range(dd.ncon):
        c = dd.contact[i]
        rows.append((c.dist, tuple(np.round(c.pos, 4)),
                     tuple(np.round(c.frame[:3], 3)),
                     _gname(mm, c.geom1), _gname(mm, c.geom2)))
    rows.sort()
    print(f"oracle ncon={dd.ncon}")
    for r in rows:
        print(f"  o {r[0]:+.5f} {r[1]} n={r[2]} {r[3]}|{r[4]}")
    df = jax.jit(engine.forward)(m, d)
    c = df.contact
    dist = np.asarray(c.dist)
    act = np.asarray(c.active) & (dist < 0)
    print(f"ours ncon={int(act.sum())}")
    pos = np.asarray(c.pos)
    nrm = np.asarray(c.frame)[:, 0, :]
    g1 = np.asarray(c.geom1)
    g2 = np.asarray(c.geom2)
    ours = []
    for i in np.nonzero(act)[0]:
        ours.append((float(dist[i]), tuple(np.round(pos[i], 4)),
                     tuple(np.round(nrm[i].reshape(-1)[:3], 3)),
                     _gname(mm, int(g1[i])), _gname(mm, int(g2[i]))))
    ours.sort()
    for r in ours:
        print(f"  u {r[0]:+.5f} {r[1]} n={r[2]} {r[3]}|{r[4]}")


if "--contacts" in sys.argv:
    dump_contacts("step 0", mm, dd, m, d)
    sys.exit(0)

for k in range(nstep):
    mujoco.mj_step(mm, dd)
    d = step(m, d)
    err = np.abs(np.asarray(d.qpos) - dd.qpos)
    if k % 5 == 4 or k == 0:
        j = int(err.argmax())
        print(f"step {k+1:3d} err={err.max():.5f} at qpos[{j}]")
err = np.abs(np.asarray(d.qpos) - dd.qpos)
order = np.argsort(err)[::-1][:8]
for j in order:
    # map qpos index to joint name
    jid = None
    for jn in range(mm.njnt):
        adr = mm.jnt_qposadr[jn]
        if adr <= j:
            jid = jn
    print(f"qpos[{j}] ({mm.joint(jid).name}): ours={float(d.qpos[j]):+.5f} "
          f"oracle={dd.qpos[j]:+.5f} err={err[j]:.5f}")
