"""Tendon lengths and moment rows (mj_tendon equivalent).

Fixed tendons are a STATIC linear form (length = W_q qpos, moment = W_v);
spatial tendons are straight site chains whose length is the sum of
segment norms and whose moment row is the exact analytic derivative
sum_i u_i . (Jp_{i+1} - Jp_i) over the chain's point jacobians.  Wrap
geoms/pulleys are rejected at parse (models/mjcf.py).

Shared by the engine's per-step stage and set_const's qpos0 invweight
computation (reference behavior: libmujoco mj_tendon inside mj_step1,
SURVEY §2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import Model


def tendon_quantities(m: Model, qpos: jax.Array, site_xpos: jax.Array,
                      cdof: jax.Array, origin_body: jax.Array):
    """(ten_length (ntendon,), ten_J (ntendon, nv)).

    origin_body: (nbody, 3) c-frame origin per body
    (subtree_com[body_rootid]).
    """
    lay = m.layout
    dtype = qpos.dtype
    length = jnp.asarray(lay.ten_Wq, dtype) @ qpos
    J = jnp.asarray(lay.ten_Wv, dtype) + jnp.zeros((), dtype)

    sp = lay.ten_sp_rows
    if len(sp):
        chain = lay.ten_sp_sites           # (n_sp, P) padded with 0
        smask = jnp.asarray(lay.ten_sp_mask, dtype)   # (n_sp, P)
        pts = site_xpos[chain]             # static gather (n_sp, P, 3)
        seg = pts[:, 1:] - pts[:, :-1]
        segmask = smask[:, 1:] * smask[:, :-1]
        slen = jnp.sqrt((seg * seg).sum(-1) + 1e-30)
        L_sp = (slen * segmask).sum(-1)
        u = seg / jnp.maximum(slen, 1e-12)[..., None]

        bod = lay.site_bodyid[chain]       # static (n_sp, P)
        ang, lin = cdof[:, :3], cdof[:, 3:]
        r = pts - origin_body[bod]         # (n_sp, P, 3)
        # point jacobian of each chain site: (n_sp, P, 3, nv)
        Jp = (lin.T[None, None]
              + jnp.cross(ang[None, None, :, :],
                          r[..., None, :]).swapaxes(-1, -2))
        Jp = Jp * jnp.asarray(m.ancestor_mask, dtype)[bod][..., None, :]
        dJ = Jp[:, 1:] - Jp[:, :-1]        # (n_sp, P-1, 3, nv)
        J_sp = ((u * segmask[..., None])[..., None] * dJ).sum((1, 2))
        length = length.at[jnp.asarray(sp)].set(L_sp)
        J = J.at[jnp.asarray(sp)].set(J_sp)
    return length, J
