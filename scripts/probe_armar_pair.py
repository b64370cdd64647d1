"""Dissect the armar6 arm_t67_r0 x arm_t8_r0 deep pair's feature clip."""
import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import mujoco  # noqa: E402

from mujoco_sim_tpu import engine  # noqa: E402
from mujoco_sim_tpu.models.compile import load_model  # noqa: E402
from mujoco_sim_tpu.ops import manifold as MF  # noqa: E402
from tests.oracle import oracle_model  # noqa: E402

path = "/root/reference/model/test/armar/armar6.xml"
mm = oracle_model(path)
dd = mujoco.MjData(mm)
mujoco.mj_forward(mm, dd)

# oracle contact 0: arm_t67_r0:mesh | arm_t8_r0:mesh
gids = {}
for i in range(dd.ncon):
    c = dd.contact[i]
    b1 = mm.body(int(mm.geom_bodyid[c.geom1])).name
    if b1 == "arm_t67_r0":
        gids = dict(g1=int(c.geom1), g2=int(c.geom2))
        print("oracle", c.dist, np.round(c.pos, 4), np.round(c.frame[:3], 4))

m = load_model(path)
d = engine.make_data(m)
df = jax.jit(engine.forward)(m, d)

lay = m.layout
g1, g2 = gids["g1"], gids["g2"]
h1, h2 = int(lay.geom_hullid[g1]), int(lay.geom_hullid[g2])
print("hulls", h1, h2)

xpos = np.asarray(df.geom_xpos)
xmat = np.asarray(df.geom_xmat)
pA, RA = xpos[g1], xmat[g1].reshape(3, 3)
pB, RB = xpos[g2], xmat[g2].reshape(3, 3)

dt = np.float64
def tabs(h):
    return dict(
        v=np.asarray(m.mesh_vert_hi[h], dt), vm=np.asarray(m.mesh_vert_hi_mask[h], dt),
        fp=np.asarray(m.mesh_fplane[h], dt), fm=np.asarray(m.mesh_fmask[h], dt),
        poly=np.asarray(m.mesh_fpoly[h], dt),
        he=np.asarray(m.mesh_hedge[h], dt),
        hm=np.asarray(m.mesh_hedge_mask[h], dt),
        cyl=np.asarray(m.mesh_cyl[h], dt))

A, B = tabs(h1), tabs(h2)
nh = np.asarray(m.mesh_vert_hi).shape[0]
tables = dict(vert=np.asarray(m.mesh_vert_hi, dt),
              vmask=np.asarray(m.mesh_vert_hi_mask, dt),
              fplane=np.asarray(m.mesh_fplane, dt),
              fmask=np.asarray(m.mesh_fmask, dt),
              fpoly=np.asarray(m.mesh_fpoly, dt),
              hedge=np.asarray(m.mesh_hedge, dt),
              hemask=np.asarray(m.mesh_hedge_mask, dt))
moh1 = np.zeros(nh, dt); moh1[h1] = 1.0
moh2 = np.zeros(nh, dt); moh2[h2] = 1.0
d4, p4, n1, ok, _sep = exact = jax.jit(MF.exact_pair_contacts)(
    pA, RA, moh1, A['cyl'], pB, RB, moh2, B['cyl'],
    np.asarray(True), tables)
print("ours ok", bool(ok), "n", np.round(np.asarray(n1), 4))
for i in range(4):
    if float(d4[i]) < 1e8:
        print("  pt", np.round(np.asarray(p4[i]), 4), float(d4[i]))

# numpy re-derivation of the feature classification
n = np.asarray(n1)
wA = pA + np.asarray(A['v']) @ RA.T
wB = pB + np.asarray(B['v']) @ RB.T
vmA = np.asarray(A['vm']) > 0.5
vmB = np.asarray(B['vm']) > 0.5
projA = wA @ n
projB = wB @ n
sA = projA[vmA].max()
sB = projB[vmB].min()
rbA = np.sqrt((np.asarray(A['v'])[vmA] ** 2).sum(-1).max())
rbB = np.sqrt((np.asarray(B['v'])[vmB] ** 2).sum(-1).max())
print("depth", sA - sB, "rbA", rbA, "rbB", rbB)
winA = MF._FEAT_WINDOW * rbA
winB = MF._FEAT_WINDOW * rbB
featA = vmA & (projA > sA - winA)
featB = vmB & (projB < sB + winB)
print("featA count", featA.sum(), "featB count", featB.sum())
print("A feature verts:", np.round(wA[featA], 4))
print("B feature verts:", np.round(wB[featB], 4))
# best aligned faces
nfA = np.asarray(A['fp'])[:, :3] @ RA.T
nfB = np.asarray(B['fp'])[:, :3] @ RB.T
fmA = np.asarray(A['fm']) > 0.5
fmB = np.asarray(B['fm']) > 0.5
print("A best face cos", (nfA[fmA] @ n).max(), " B best face cos", (nfB[fmB] @ -n).max(),
      "thresh", MF._COS_FACE)
# oracle witness supports
a_star = wA[vmA][projA[vmA].argmax()]
b_star = wB[vmB][projB[vmB].argmin()]
print("a* =", np.round(a_star, 4), " b* =", np.round(b_star, 4),
      " mid =", np.round(0.5 * (a_star + b_star), 4))
