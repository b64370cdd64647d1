"""Constraint solver: projected Newton on the primal soft-constraint problem.

Solves  min_a  0.5 (a - a_smooth)' M (a - a_smooth) + sum_i c_i(J_i a - aref_i)

with per-row costs matching MuJoCo's convex formulation:
  equality rows     : 0.5 D x^2                  (two-sided)
  friction-loss rows: Huber(x; R*floss)          (linear tails +- floss)
  limit/contact rows: 0.5 D x^2 for x < 0 else 0 (one-sided)

The optimum is the same as MuJoCo's Newton solver (same convex program), so
single-env trajectories converge to the oracle's; the implementation is
batched dense Cholesky + einsums (MXU) instead of sparse CPU recursions.
Exact-ish line search via a few 1D Newton steps on the piecewise-quadratic
restriction, like the reference solver's exact search.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_sim_tpu.models.model import Model, Data, DisableBit
from mujoco_sim_tpu.ops import smooth


def _row_force_and_curv(m, d, x):
    """c'(x) and c''(x) per row given jar x (vectorized, masked)."""
    D = d.efc_D  # zeroed for inactive rows
    floss = d.efc_frictionloss
    is_floss = d.efc_floss_active
    one_sided = (d.efc_type >= 2)
    quad = D * x
    # one-sided: zero cost for x >= 0
    f = jnp.where(one_sided & (x >= 0), 0.0, quad)
    curv = jnp.where(one_sided & (x >= 0), 0.0, D)
    # friction loss: clamp to +-floss (linear tails)
    f = jnp.where(is_floss, jnp.clip(quad, -floss, floss), f)
    curv = jnp.where(is_floss & (jnp.abs(quad) >= floss), 0.0, curv)
    return f, curv


def solve(m: Model, d: Data) -> Data:
    dtype = d.qpos.dtype
    M = d.qM
    a_smooth = d.qacc_smooth
    J = d.efc_J
    aref = d.efc_aref

    warm = not (m.opt.disableflags & int(DisableBit.WARMSTART))
    a0 = d.qacc_warmstart if warm else a_smooth
    # guard: warmstart of wrong scale falls back to smooth
    a0 = jnp.where(jnp.any(jnp.isnan(a0)), a_smooth, a0)

    def cost_terms(a):
        x = J @ a - aref
        f, curv = _row_force_and_curv(m, d, x)
        return x, f, curv

    def grad_hess(a):
        x, f, curv = cost_terms(a)
        grad = M @ (a - a_smooth) + J.T @ f
        JTDJ = jnp.einsum("iv,i,iw->vw", J, curv, J)
        H = M + JTDJ
        return grad, H, x

    def line_search(a, p):
        Jp = J @ p
        Mp = M @ p
        pMp = p @ Mp
        pM_da = p @ (M @ (a - a_smooth))
        x0 = J @ a - aref

        def phi_d(alpha):
            x = x0 + alpha * Jp
            f, curv = _row_force_and_curv(m, d, x)
            d1 = pM_da + alpha * pMp + f @ Jp
            d2 = pMp + curv @ (Jp * Jp)
            return d1, d2

        # scale for the 1D Newton termination (gradient units)
        d1_0, _ = phi_d(jnp.asarray(0.0, dtype))
        gtol = 1e-8 * jnp.maximum(1.0, jnp.abs(d1_0))
        # curvature floor relative to the direction's M-curvature keeps the
        # 1D Newton step bounded in f32 (unguarded division overflowed)
        curv_floor = 1e-8 * jnp.maximum(pMp, 1e-12)

        def cond(carry):
            alpha, it, d1 = carry
            return ((it < m.opt.ls_iterations) & (jnp.abs(d1) > gtol)
                    & jnp.isfinite(d1))

        def body(carry):
            alpha, it, _ = carry
            d1, d2 = phi_d(alpha)
            step = d1 / jnp.maximum(d2, curv_floor)
            alpha_new = jnp.clip(alpha - step, 0.0, 8.0)
            return (alpha_new, it + 1, d1)

        alpha, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(1.0, dtype), jnp.asarray(0, jnp.int32),
             jnp.asarray(1e30, dtype)))
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        return jnp.clip(alpha, 0.0, 8.0)

    def total_cost(a):
        x = J @ a - aref
        D = d.efc_D
        floss = d.efc_frictionloss
        is_floss = d.efc_floss_active
        one_sided = (d.efc_type >= 2)
        quad = 0.5 * D * x * x
        c = jnp.where(one_sided & (x >= 0), 0.0, quad)
        # Huber tails for friction loss
        lin = floss * jnp.abs(x) - 0.5 * jnp.where(
            D > 0, floss * floss / jnp.maximum(D, 1e-12), 0.0)
        c = jnp.where(is_floss & (jnp.abs(D * x) >= floss), lin, c)
        da = a - a_smooth
        return 0.5 * da @ (M @ da) + jnp.sum(c)

    def newton_body(carry):
        a, it, prev_cost, _ = carry
        grad, H, _ = grad_hess(a)
        # small relative ridge keeps H SPD under f32 rounding
        ridge = 1e-7 * jnp.trace(H) / H.shape[0]
        H = H + ridge * jnp.eye(H.shape[0], dtype=H.dtype)
        from mujoco_sim_tpu.ops import linalg
        L = linalg.cholesky(H)
        p = -smooth.solve_chol(L, grad)
        p = jnp.where(jnp.isfinite(p), p, 0.0)
        alpha = line_search(a, p)
        a_new = a + alpha * p
        new_cost = total_cost(a_new)
        improved = prev_cost - new_cost
        done = improved < m.opt.tolerance * jnp.maximum(1.0, jnp.abs(new_cost))
        return a_new, it + 1, new_cost, done

    def newton_cond(carry):
        a, it, cost, done = carry
        return (it < m.opt.solver_iterations) & jnp.logical_not(done)

    # best-of-two init like the reference solver: warmstart vs smooth
    c_warm = total_cost(a0)
    c_smooth = total_cost(a_smooth)
    take_warm = c_warm <= c_smooth
    a0 = jnp.where(take_warm, a0, a_smooth)
    c0 = jnp.where(take_warm, c_warm, c_smooth)

    a, _, _, _ = jax.lax.while_loop(
        newton_cond, newton_body,
        (a0, jnp.asarray(0, jnp.int32), c0, jnp.asarray(False)))

    x, f, _ = cost_terms(a)
    efc_force = -f
    qfrc_constraint = J.T @ efc_force
    return d.replace(qacc=a, qfrc_constraint=qfrc_constraint,
                     efc_force=efc_force)
