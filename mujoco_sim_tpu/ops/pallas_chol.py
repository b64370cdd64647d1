"""Pallas TPU kernel: fused batched Cholesky factor + solve.

The robot-sim step solves small SPD systems constantly: qacc_smooth
(M x = qfrc), the Euler/implicitfast velocity update ((M + h B) x = rhs),
and the Newton direction (H p = -g) on EVERY solver iteration.  The XLA
path (ops/linalg.py blocked/unrolled kernels) is numerically solid but
costs ~400 tiny HLO ops per factor+solve — on the dispatch-bound PR2
flagship step (r4 profile: 3718 ops, ~0.5us/op) the three chains are a
large slice of the op tail, and inside the Newton while they execute per
iteration.

This kernel lays the batch on the 128-lane axis ((n, n, B) layout) and
runs the textbook column Cholesky + forward/backward substitution as ONE
fused op in VMEM: n^3/3 * B true-f32 VPU flops (~10 MFLOP at n=49,
B=256), no HBM round-trips between columns.  True f32 matters: the
Newton Hessian carries efc_D ~ 1e9 rows, and bf16-input matmuls NaN the
factor (r4 diagnosis; the XLA path needs jax.default_matmul_precision
"highest" for the same reason).

Like ops/pallas_sat.py, the public wrapper is a jax.custom_vmap whose
batching rule flattens (env, ...) into the lane axis, and
use_pallas_chol() gates it to the real TPU backend (CPU tests take the
XLA path; MST_DISABLE_PCHOL=1 is the A/B kill switch).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _make_kernel(n: int):
    def kernel(a_ref, b_ref, x_ref, scratch_a, scratch_y):
        # a (n, n, L)  b (n, L) -> x (n, L); scratch_a holds the factor
        # in progress, scratch_y the forward-substituted rhs.
        scratch_a[...] = a_ref[...]
        scratch_y[...] = b_ref[...]
        eps = jnp.asarray(1e-30, a_ref.dtype)
        # column Cholesky fused with the forward substitution
        for j in range(n):
            piv = jnp.sqrt(jnp.maximum(scratch_a[j, j, :], eps))   # (L,)
            inv = 1.0 / piv
            col = scratch_a[j:, j, :] * inv[None, :]               # (n-j, L)
            scratch_a[j:, j, :] = col
            yj = scratch_y[j, :] * inv
            scratch_y[j, :] = yj
            if j + 1 < n:
                t = col[1:]                                         # (m, L)
                scratch_a[j + 1:, j + 1:, :] = (
                    scratch_a[j + 1:, j + 1:, :]
                    - t[:, None, :] * t[None, :, :])
                scratch_y[j + 1:, :] = scratch_y[j + 1:, :] - t * yj[None, :]
        # backward substitution: L^T x = y (column-oriented, descending)
        for j in range(n - 1, -1, -1):
            xj = scratch_y[j, :] / scratch_a[j, j, :]
            x_ref[j, :] = xj
            if j:
                # y[i] -= L[j, i] * x[j] for i < j (row j of L)
                scratch_y[:j, :] = (scratch_y[:j, :]
                                    - scratch_a[j, :j, :] * xj[None, :])
    return kernel


@functools.lru_cache(maxsize=None)
def _build(n: int, interpret: bool):
    kernel = _make_kernel(n)

    def single(A, b):
        """A (N, n, n) SPD, b (N, n) -> x (N, n) with (A x = b)."""
        N = A.shape[0]
        pad = (-N) % _LANES
        if pad:
            # padded lanes factor the identity (no NaNs leak across lanes)
            eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (pad, n, n))
            A = jnp.concatenate([A, eye], axis=0)
            b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)], axis=0)
        Np = N + pad
        At = jnp.transpose(A, (1, 2, 0))
        bt = jnp.transpose(b, (1, 0))
        x = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, Np), A.dtype),
            grid=(Np // _LANES,),
            in_specs=[pl.BlockSpec((n, n, _LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((n, _LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, _LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n, n, _LANES), A.dtype),
                            pltpu.VMEM((n, _LANES), A.dtype)],
            interpret=interpret,
        )(At, bt)
        return jnp.transpose(x, (1, 0))[:N]

    fn = custom_vmap(single)

    @fn.def_vmap
    def _rule(axis_size, in_batched, A, b):
        args = []
        for a, bt in zip((A, b), in_batched):
            if not bt:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            args.append(a.reshape((axis_size * a.shape[1],) + a.shape[2:]))
        x = single(*args)
        nrow = A.shape[1] if in_batched[0] else A.shape[0]
        return x.reshape(axis_size, nrow, x.shape[-1]), True

    return fn


def chol_solve(A, b, interpret=False):
    """Fused SPD solve x = A^-1 b.

    A (..., n, n), b (..., n); leading dims are flattened onto the lane
    axis.  Semantics match linalg.cholesky + linalg.cho_solve with the
    same 1e-30 pivot floor.
    """
    n = A.shape[-1]
    lead = A.shape[:-2]
    A2 = A.reshape((-1, n, n)) if lead else A[None]
    b2 = b.reshape((-1, n)) if lead else b[None]
    fn = _build(n, bool(interpret))
    x = fn(A2, b2)
    return x.reshape(lead + (n,)) if lead else x[0]


def use_pallas_chol() -> bool:
    """Trace-time gate: real TPU backend only (MST_DISABLE_PCHOL=1 is the
    A/B kill switch; CPU tests take the XLA path)."""
    if os.environ.get("MST_DISABLE_PCHOL"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False
