"""Pallas TPU kernel: fused hull support extents (min & max) per axis.

The exact deep-pair manifold (ops/manifold.py) evaluates hull support
extents along ~324 candidate axes per lane, twice per refinement round.
As XLA ops the (C, V) axis-vertex product is materialized in HBM and
re-read by the separate min and max reductions — at manip config-5
batch (4096 envs x 8 deep slots) those writes + re-reads measured
~11.5 ms of the 85 ms step (r5 profile: 4 x 1446us multiply_reduce +
5 x 1141us reduce_min/max).  A single +-axes max-only reduction avoids
the materialization but doubles the product compute and measured slower
(71.2k -> 62.4k env-steps/s @1024).

Here the product lives only in VMEM: one kernel computes the product
block and BOTH reductions per 128-lane batch tile.  HBM traffic drops
to the (C, 3) axes + (V, 3) verts reads and the two (C,) outputs —
~10x less than the XLA form.

Like ops/pallas_chol.py, the public wrapper is a jax.custom_vmap whose
batching rule flattens leading axes onto the lane axis (composes for
the manifold's nested vmap(env) o vmap(slot)), and use_pallas_support()
gates it to the real TPU backend (CPU tests take the XLA path;
MST_DISABLE_PSUPPORT=1 is the A/B kill switch).
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


def _make_kernel(C: int, V: int):
    def kernel(axes_ref, w_ref, mn_ref, mx_ref):
        # axes (C, 3, L)  w (V, 3, L) -> mn/mx (C, L).  The dot over the
        # 3-axis is an explicit 3-term accumulation: a broadcast product
        # + sum would stage a (C, V, 3, L) intermediate on the kernel
        # VMEM stack (25 MB at C=324 — over the 16 MB scoped limit);
        # per-term peak here is one (C, V, L) array (~3 MB).
        a0, a1, a2 = axes_ref[:, 0, :], axes_ref[:, 1, :], axes_ref[:, 2, :]
        w0, w1, w2 = w_ref[:, 0, :], w_ref[:, 1, :], w_ref[:, 2, :]
        p = (a0[:, None, :] * w0[None, :, :]
             + a1[:, None, :] * w1[None, :, :]
             + a2[:, None, :] * w2[None, :, :])
        mx_ref[...] = p.max(axis=1)
        mn_ref[...] = p.min(axis=1)
    return kernel


@functools.lru_cache(maxsize=None)
def _build(C: int, V: int, interpret: bool):
    kernel = _make_kernel(C, V)

    def call(at, wt, L):
        """at (C, 3, L), wt (V, 3, L) -> (mn (C, L), mx (C, L))."""
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((C, L), at.dtype),
                       jax.ShapeDtypeStruct((C, L), at.dtype)],
            grid=(L // _LANES,),
            in_specs=[pl.BlockSpec((C, 3, _LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((V, 3, _LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((C, _LANES), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((C, _LANES), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)],
            interpret=interpret,
        )(at, wt)

    # XLA stages the whole custom-call result in scoped VMEM; at big
    # flattened batch (manip: 32768 lanes) the (C, N) outputs blow the
    # 16 MB limit, so the lane axis is chunked per pallas_call.  Budget
    # 8 MB of staged inputs+outputs per chunk: the r5 40 MB budget OOMed
    # the scoped staging at PR2 hull sizes (C=288 face axes, V=80,
    # 2048 lanes -> 24.3 MB "allocating on stack for body custom-call").
    bytes_per_lane = 4 * (5 * C + 3 * V)
    chunk = max(_LANES,
                (8 * 2 ** 20 // bytes_per_lane) // _LANES * _LANES)

    def single(axes, w):
        """axes (N, C, 3), w (N, V, 3) -> (mn (N, C), mx (N, C))."""
        N = axes.shape[0]
        pad = (-N) % _LANES
        if pad:
            axes = jnp.concatenate(
                [axes, jnp.zeros((pad, C, 3), axes.dtype)], axis=0)
            w = jnp.concatenate(
                [w, jnp.zeros((pad, V, 3), w.dtype)], axis=0)
        Np = N + pad
        at = jnp.transpose(axes, (1, 2, 0))          # (C, 3, Np)
        wt = jnp.transpose(w, (1, 2, 0))             # (V, 3, Np)
        mns, mxs = [], []
        for lo in range(0, Np, chunk):
            L = min(chunk, Np - lo)
            mn_c, mx_c = call(at[:, :, lo:lo + L], wt[:, :, lo:lo + L], L)
            mns.append(mn_c)
            mxs.append(mx_c)
        mn = mns[0] if len(mns) == 1 else jnp.concatenate(mns, axis=-1)
        mx = mxs[0] if len(mxs) == 1 else jnp.concatenate(mxs, axis=-1)
        return (jnp.transpose(mn, (1, 0))[:N],
                jnp.transpose(mx, (1, 0))[:N])

    fn = custom_vmap(single)

    @fn.def_vmap
    def _rule(axis_size, in_batched, axes, w):
        args = []
        for a, bt in zip((axes, w), in_batched):
            if not bt:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            args.append(a.reshape((axis_size * a.shape[1],) + a.shape[2:]))
        # recurse through fn (not single) so NESTED vmaps — the manifold
        # query runs under vmap(env) o vmap(slot) — keep flattening onto
        # the lane axis instead of batching the pallas_call itself
        mn, mx = fn(*args)
        return (mn.reshape(axis_size, -1, C),
                mx.reshape(axis_size, -1, C)), (True, True)

    return fn


def support_minmax(axes, w, interpret=False):
    """Vertex-cloud support extents: (min, max) of axes @ w^T per axis.

    axes (..., C, 3) need not be padded; C and V are rounded up to
    sublane multiples here (extra axes are zero -> extents 0; extra
    verts repeat vertex 0, matching the vert_hi repeat-pad convention,
    so they never move min/max).
    """
    C, V = axes.shape[-2], w.shape[-2]
    Cp = -(-C // 8) * 8
    Vp = -(-V // 8) * 8
    if Cp != C:
        zshape = axes.shape[:-2] + (Cp - C, 3)
        axes = jnp.concatenate([axes, jnp.zeros(zshape, axes.dtype)],
                               axis=-2)
    if Vp != V:
        rep = jnp.broadcast_to(w[..., :1, :], w.shape[:-2] + (Vp - V, 3))
        w = jnp.concatenate([w, rep], axis=-2)
    lead = axes.shape[:-2]
    a2 = axes.reshape((-1, Cp, 3)) if lead else axes[None]
    w2 = w.reshape((-1, Vp, 3)) if lead else w[None]
    fn = _build(Cp, Vp, bool(interpret))
    mn, mx = fn(a2, w2)
    if lead:
        return (mn.reshape(lead + (Cp,))[..., :C],
                mx.reshape(lead + (Cp,))[..., :C])
    return mn[0, :C], mx[0, :C]


def use_pallas_support() -> bool:
    """Trace-time gate: real TPU backend only (MST_DISABLE_PSUPPORT=1 is
    the A/B kill switch; CPU tests take the XLA path)."""
    if os.environ.get("MST_DISABLE_PSUPPORT"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False
