"""Noslip post-solver: sequential friction-force polish after the main solve.

MuJoCo's noslip pass (option noslip_iterations/noslip_tolerance; the
reference's only controller demo world enables it,
/root/reference/model/ontology/scene.xml:2-3) reruns a modified Gauss-Seidel
over the FRICTION rows only, pretending those rows have no softness: normal
forces stay fixed, friction forces are adjusted to null the slip velocity,
subject to their box/cone bounds.  This suppresses the slow drift the
regularized solver leaves.

Formulation here (pyramidal cones): for each contact friction axis the
pyramid pair (f+, f-) moves by (+delta, -delta) — a pure tangential change
that keeps the normal component fixed — with delta chosen to zero the
tangential acceleration residual and clipped to keep both forces >= 0.
Dof-friction-loss rows do the 1D update clamped to [-floss, +floss].
Updates run in efc-row order, sequentially (Gauss-Seidel like the oracle),
for noslip_iterations sweeps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.models.model import Model, Data
from mujoco_sim_tpu.ops import linalg

_PLAN_CACHE: dict = {}


def _plan(m: Model):
    """Static update list: friction-loss rows then contact pyramid pairs."""
    key = (m.layout, "noslip", m.opt.cone, m.contact_efcadr)
    got = _PLAN_CACHE.get(key)
    if got is not None:
        return got
    lay = m.layout
    rows_p, rows_m, kinds, con_k, con_a = [], [], [], [], []
    for adr in lay.fri_efcadr:
        rows_p.append(int(adr))
        rows_m.append(int(adr))   # unused for floss rows
        kinds.append(0)
        con_k.append(0)
        con_a.append(0)
    from mujoco_sim_tpu.models.model import ConeType, contact_rows_per
    mc = m.max_condim
    nrows_per = contact_rows_per(mc, m.opt.cone)
    elliptic = m.opt.cone == int(ConeType.ELLIPTIC)
    if mc > 1:
        for k in range(m.ncon_max):
            base = m.contact_efcadr + k * nrows_per
            for a in range(mc - 1):
                if elliptic:
                    # friction row a (1D update bounded by the per-axis
                    # cone box |f_a| <= mu_a * f_normal, normal force fixed)
                    rows_p.append(base + 1 + a)
                    rows_m.append(base)          # the contact's normal row
                    kinds.append(2)
                else:
                    rows_p.append(base + 2 * a)
                    rows_m.append(base + 2 * a + 1)
                    kinds.append(1)
                con_k.append(k)
                con_a.append(a)
    plan = (np.asarray(rows_p, dtype=int), np.asarray(rows_m, dtype=int),
            np.asarray(kinds, dtype=int), np.asarray(con_k, dtype=int),
            np.asarray(con_a, dtype=int))
    _PLAN_CACHE[key] = plan
    return plan


def noslip(m: Model, d: Data) -> Data:
    """Apply the noslip sweeps; returns d with qacc/efc_force/qfrc_constraint
    updated.  No-op when the model has no friction rows."""
    rows_p, rows_m, kinds, con_k, con_a = _plan(m)
    if len(rows_p) == 0:
        return d
    dtype = d.qpos.dtype
    J = d.efc_J
    aref = d.efc_aref
    # B = M^-1 J^T for the updated rows only (static gather of rows)
    Jp = J[rows_p]                      # (nupd, nv)
    Jm = J[rows_m]
    is_pair = jnp.asarray(kinds == 1)
    is_ell = jnp.asarray(kinds == 2)
    Jd = jnp.where(is_pair[:, None], Jp - Jm, Jp)       # update direction
    Bd = linalg.cho_solve_mat(d.qLD, Jd.T)              # (nv, nupd)
    Add = jnp.einsum("un,nu->u", Jd, Bd)                # row curvatures
    arefd = jnp.where(is_pair, aref[rows_p] - aref[rows_m], aref[rows_p])
    act = d.efc_active[rows_p]
    floss = d.efc_frictionloss[rows_p]
    # per-axis friction coefficient for elliptic updates (static gather)
    mu_upd = d.contact.friction[con_k, con_a]

    fp0 = d.efc_force[rows_p]
    fm0 = d.efc_force[rows_m]
    qacc0 = d.qacc

    xs_const = (Jd, Bd.T, Add, arefd, act, is_pair, is_ell, floss, mu_upd)

    def sweep(qacc, fp, fm):
        def step(qacc, xs):
            (Jd_i, Bd_i, Add_i, aref_i, act_i, pair_i, ell_i, floss_i,
             mu_i, fp_i, fm_i) = xs
            res = Jd_i @ qacc - aref_i
            delta = -res / jnp.maximum(Add_i, 1e-12)
            # bounds: floss box / pyramid pair nonnegativity / elliptic
            # per-axis cone box (|f_a| <= mu_a f_n, normal f_n = fm fixed)
            lo = jnp.where(pair_i, -fp_i,
                           jnp.where(ell_i, -mu_i * fm_i - fp_i,
                                     -floss_i - fp_i))
            hi = jnp.where(pair_i, fm_i,
                           jnp.where(ell_i, mu_i * fm_i - fp_i,
                                     floss_i - fp_i))
            delta = jnp.clip(delta, lo, hi)
            delta = jnp.where(act_i, delta, 0.0)
            qacc = qacc + Bd_i * delta
            return qacc, (fp_i + delta,
                          jnp.where(pair_i, fm_i - delta, fm_i))
        qacc, (fp, fm) = jax.lax.scan(step, qacc, xs_const + (fp, fm))
        return qacc, fp, fm

    qacc, fp, fm = qacc0, fp0, fm0
    for _ in range(m.opt.noslip_iterations):
        qacc, fp, fm = sweep(qacc, fp, fm)

    efc_force = d.efc_force.at[jnp.asarray(rows_p)].set(fp)
    pair_sel = np.nonzero(kinds == 1)[0]     # static numpy selection
    if len(pair_sel):
        efc_force = efc_force.at[jnp.asarray(rows_m[pair_sel])].set(
            fm[jnp.asarray(pair_sel)])
    qfrc_constraint = J.T @ efc_force
    return d.replace(qacc=qacc, efc_force=efc_force,
                     qfrc_constraint=qfrc_constraint)
