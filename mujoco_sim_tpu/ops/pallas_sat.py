"""Pallas TPU kernel for the hull face-SAT reference-face depth query.

ops/collision._hull_ref_face_depth is the hot op of the mesh narrowphase
(the implicit convex narrowphase behind mj_step1, SURVEY.md §2.2): it
materializes the (instances, V, F) support-distance tensor to HBM between
the broadcast-multiply and the min/max/argmax reductions — ~125 MB of
traffic per PR2 step at 256 envs, ~250us of the 2.4 ms device step.  This
kernel keeps the (V, F, 128) tile in VMEM with instances (env x pair) on
the 128-lane axis and fuses the whole query:

    support distances -> per-face min -> SAT separation + reference face
    -> per-vertex depth along the reference normal -> lateral overlap
    filter (mesh-mesh manifolds) -> K smallest depths

Numerics match the XLA path bit-for-bit on non-tied inputs, including the
lowest-index tie-breaks of argmax/argmin (tests/test_pallas_sat.py runs
the kernel in interpret mode on CPU against ops/collision's XLA form).

The public wrapper is a jax.custom_vmap: collision() runs per-env under
jax.vmap (parallel/mesh.py:48), and the batching rule flattens
(envs, pairs) into one instance axis so the lane dimension is fully
occupied instead of padding each env's pair list to 128.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9
_LANES = 128


def _make_kernel(V: int, F: int, K: int, lateral: bool):
    def kernel(pts_ref, pln_ref, msk_ref, slk_ref,
               dep_ref, idx_ref, plane_ref, sep_ref):
        # pts (V, 3, L)  pln (F, 4, L)  msk (V, L)  slk (1, L)
        px = pts_ref[:, 0, :]                               # (V, L)
        py = pts_ref[:, 1, :]
        pz = pts_ref[:, 2, :]
        n0 = pln_ref[:, 0, :]                               # (F, L)
        n1 = pln_ref[:, 1, :]
        n2 = pln_ref[:, 2, :]
        nd = pln_ref[:, 3, :]
        msk = msk_ref[:]
        big = jnp.asarray(_BIG, px.dtype)
        e = lambda a, ax: jnp.expand_dims(a, ax)
        vals = (e(px, 1) * e(n0, 0) + e(py, 1) * e(n1, 0)
                + e(pz, 1) * e(n2, 0) - e(nd, 0))           # (V, F, L)
        vals = jnp.where(msk[:, None, :] > 0.5, vals, big)
        pfm = vals.min(axis=0)                              # (F, L)
        sep = pfm.max(axis=0)                               # (L,)
        # argmax over F via compare + iota-min (ties -> lowest index,
        # matching jnp.argmax in the XLA path)
        fio = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
        hit = pfm >= sep[None, :]
        ref_f = jnp.min(jnp.where(hit, fio, F), axis=0)     # (L,)
        oh = (fio == ref_f[None, :]).astype(vals.dtype)     # (F, L)
        rn0 = (oh * n0).sum(axis=0)                         # (L,)
        rn1 = (oh * n1).sum(axis=0)
        rn2 = (oh * n2).sum(axis=0)
        rnd = (oh * nd).sum(axis=0)
        depth = (px * rn0[None, :] + py * rn1[None, :]
                 + pz * rn2[None, :] - rnd[None, :])        # (V, L)
        if lateral:
            # drop vertices laterally outside the other hull: their true
            # convex sdf (max over faces) exceeds their ref-plane depth
            # + slack (see collision._hull_ref_face_depth's docstring)
            vert_sdf = vals.max(axis=1)                     # (V, L)
            keep = vert_sdf <= (jnp.maximum(depth, 0.0)
                                + slk_ref[0, :][None, :] + 1e-4)
            # mosaic has no bool reductions; any() via float max
            any_keep = keep.astype(depth.dtype).max(axis=0) > 0.5
            depth = jnp.where(keep | ~any_keep[None, :], depth, big)
        depth = jnp.where(msk > 0.5, depth, big)
        vio = jax.lax.broadcasted_iota(jnp.int32, (V, 1), 0)
        cur = depth
        for k in range(K):
            dk = cur.min(axis=0)                            # (L,)
            hitv = cur <= dk[None, :]
            ik = jnp.min(jnp.where(hitv, vio, V), axis=0)
            dep_ref[k, :] = dk
            idx_ref[k, :] = ik
            # exclusion sentinel must beat already-filtered 1e9 entries or
            # the next pass re-picks the same index (XLA path uses -inf on
            # the negated values)
            cur = jnp.where(vio == ik[None, :], jnp.asarray(jnp.inf, cur.dtype),
                            cur)
        plane_ref[0, :] = rn0
        plane_ref[1, :] = rn1
        plane_ref[2, :] = rn2
        plane_ref[3, :] = rnd
        sep_ref[0, :] = sep
    return kernel


@functools.lru_cache(maxsize=None)
def _build(V: int, F: int, K: int, lateral: bool, interpret: bool):
    kernel = _make_kernel(V, F, K, lateral)

    def single(pts, planes, vmask, slack):
        """pts (N, V, 3), planes (N, F, 4), vmask (N, V), slack (N,) ->
        (depth (N, K), vidx (N, K) i32, nref (N, 3), sep (N,))."""
        N = pts.shape[0]
        pad = (-N) % _LANES
        if pad:
            pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)))
            planes = jnp.pad(planes, ((0, pad), (0, 0), (0, 0)))
            vmask = jnp.pad(vmask, ((0, pad), (0, 0)))
            slack = jnp.pad(slack, ((0, pad),))
        Np = N + pad
        tp = jnp.transpose(pts, (1, 2, 0))
        tpl = jnp.transpose(planes, (1, 2, 0))
        tm = jnp.transpose(vmask, (1, 0))
        ts = slack[None, :]
        dep, idx, plane, sep = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((K, Np), pts.dtype),
                       jax.ShapeDtypeStruct((K, Np), jnp.int32),
                       jax.ShapeDtypeStruct((4, Np), pts.dtype),
                       jax.ShapeDtypeStruct((1, Np), pts.dtype)),
            grid=(Np // _LANES,),
            in_specs=[pl.BlockSpec((V, 3, _LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((F, 4, _LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((V, _LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, _LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((K, _LANES), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((K, _LANES), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((4, _LANES), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, _LANES), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(tp, tpl, tm, ts)
        dep = jnp.transpose(dep, (1, 0))[:N]
        idx = jnp.transpose(idx, (1, 0))[:N]
        plane = jnp.transpose(plane, (1, 0))[:N]
        sep = sep[0, :N]
        return dep, idx, plane[:, :3], sep

    fn = custom_vmap(single)

    @fn.def_vmap
    def _rule(axis_size, in_batched, pts, planes, vmask, slack):
        # flatten (batch, N) into one instance axis: full lane occupancy
        # instead of per-env padding to 128
        args = []
        for a, b in zip((pts, planes, vmask, slack), in_batched):
            if not b:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            args.append(a.reshape((axis_size * a.shape[1],) + a.shape[2:]))
        dep, idx, nref, sep = single(*args)
        n = pts.shape[1] if in_batched[0] else pts.shape[0]
        out = (dep.reshape(axis_size, n, -1),
               idx.reshape(axis_size, n, -1),
               nref.reshape(axis_size, n, 3),
               sep.reshape(axis_size, n))
        return out, (True, True, True, True)

    return fn


def hull_ref_face_depth(pts_local, planes, k_out, pts_mask=None,
                        lateral_filter=False, lateral_slack=0.0,
                        interpret=False):
    """Drop-in pallas form of collision._hull_ref_face_depth.

    pts_local (N, V, 3), planes (N, F, 4), pts_mask (N, V) or None,
    lateral_slack scalar or (N,).  Returns (depth (N, k_out),
    vert idx (N, k_out), nref (N, 3) local, sep (N,)).
    """
    N, V = pts_local.shape[-3], pts_local.shape[-2]
    F = planes.shape[-2]
    dtype = pts_local.dtype
    if pts_mask is None:
        pts_mask = jnp.ones(pts_local.shape[:-1], dtype)
    slack = jnp.broadcast_to(jnp.asarray(lateral_slack, dtype),
                             pts_local.shape[:-2])
    fn = _build(V, F, int(k_out), bool(lateral_filter), bool(interpret))
    return fn(pts_local, planes, pts_mask.astype(dtype), slack)


def use_pallas_sat() -> bool:
    """Trace-time gate: real TPU backend only (tests force CPU and take the
    XLA path; MST_DISABLE_PALLAS=1 is the kill switch for A/B timing)."""
    if os.environ.get("MST_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False
