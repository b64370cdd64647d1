"""Prototype: pallas hull face-SAT kernel vs ops/collision.py's XLA path.

The XLA version materializes the (E, P, V, F) support-distance tensor to
HBM between the mul-reduce and the min/max reductions (~220 MB/step of
traffic on PR2).  The kernel keeps it in VMEM with instances (env x pair)
on the 128-lane axis.

Usage: python benchmarks/pallas_sat_proto.py [E] [P]
"""

import os
import sys
import time
from functools import partial

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, F, K = 32, 60, 2


def make_kernel(V, F, K):
    def kernel(pts_ref, pln_ref, msk_ref, dep_ref, idx_ref, plane_ref,
               sep_ref):
        # pts (V, 3, 128)  pln (F, 4, 128)  msk (V, 128)
        px = pts_ref[:, 0, :]                               # (V, 128)
        py = pts_ref[:, 1, :]
        pz = pts_ref[:, 2, :]
        n0 = pln_ref[:, 0, :]                               # (F, 128)
        n1 = pln_ref[:, 1, :]
        n2 = pln_ref[:, 2, :]
        nd = pln_ref[:, 3, :]
        msk = msk_ref[:]
        e = lambda a, ax: jnp.expand_dims(a, ax)
        vals = (e(px, 1) * e(n0, 0) + e(py, 1) * e(n1, 0)
                + e(pz, 1) * e(n2, 0) - e(nd, 0))           # (V, F, 128)
        big = jnp.asarray(1e9, vals.dtype)
        vals = jnp.where(msk[:, None, :] > 0.5, vals, big)
        pfm = vals.min(axis=0)                              # (F, 128)
        sep = pfm.max(axis=0)                               # (128,)
        # argmax over F via compare + iota-min (ties -> lowest index)
        fio = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
        hit = pfm >= sep[None, :]
        ref_f = jnp.min(jnp.where(hit, fio, F), axis=0)     # (128,)
        oh = (fio == ref_f[None, :]).astype(vals.dtype)     # (F, 128)
        rn0 = (oh * n0).sum(axis=0)                         # (128,)
        rn1 = (oh * n1).sum(axis=0)
        rn2 = (oh * n2).sum(axis=0)
        rnd = (oh * nd).sum(axis=0)
        depth = (px * rn0[None, :] + py * rn1[None, :]
                 + pz * rn2[None, :] - rnd[None, :])        # (V, 128)
        depth = jnp.where(msk > 0.5, depth, big)
        vio = jax.lax.broadcasted_iota(jnp.int32, (V, 1), 0)
        cur = depth
        for k in range(K):
            dk = cur.min(axis=0)                            # (128,)
            hitv = cur <= dk[None, :]
            ik = jnp.min(jnp.where(hitv, vio, V), axis=0)
            dep_ref[k, :] = dk
            idx_ref[k, :] = ik
            cur = jnp.where(vio == ik[None, :], big, cur)
        plane_ref[0, :] = rn0
        plane_ref[1, :] = rn1
        plane_ref[2, :] = rn2
        plane_ref[3, :] = rnd
        sep_ref[0, :] = sep
    return kernel


@partial(jax.jit, static_argnames=("K",))
def sat_pallas(pts, planes, vmask, K=2):
    """pts (N, V, 3), planes (N, F, 4), vmask (N, V) ->
    (depth (N, K), vidx (N, K), plane (N, 4), sep (N,))."""
    N, V_, _ = pts.shape
    F_ = planes.shape[1]
    pad = (-N) % 128
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0), (0, 0)))
        planes = jnp.pad(planes, ((0, pad), (0, 0), (0, 0)),
                         constant_values=1.0)
        vmask = jnp.pad(vmask, ((0, pad), (0, 0)), constant_values=1.0)
    Np = N + pad
    tp = jnp.transpose(pts, (1, 2, 0))
    tpl = jnp.transpose(planes, (1, 2, 0))
    tm = jnp.transpose(vmask, (1, 0))
    dep, idx, plane, sep = pl.pallas_call(
        make_kernel(V_, F_, K),
        out_shape=(jax.ShapeDtypeStruct((K, Np), pts.dtype),
                   jax.ShapeDtypeStruct((K, Np), jnp.int32),
                   jax.ShapeDtypeStruct((4, Np), pts.dtype),
                   jax.ShapeDtypeStruct((1, Np), pts.dtype)),
        grid=(Np // 128,),
        in_specs=[pl.BlockSpec((V_, 3, 128), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((F_, 4, 128), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((V_, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((K, 128), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((K, 128), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((4, 128), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 128), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
    )(tp, tpl, tm)
    dep = jnp.transpose(dep, (1, 0))[:N]
    idx = jnp.transpose(idx, (1, 0))[:N]
    plane = jnp.transpose(plane, (1, 0))[:N]
    sep = sep[0, :N]
    return dep, idx, plane, sep


def xla_ref(pts, planes, vmask):
    from mujoco_sim_tpu.ops.collision import _hull_ref_face_depth
    return _hull_ref_face_depth(pts, planes, 2, vmask)


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    N = E * P
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((N, V, 3)).astype(np.float32))
    n = rng.standard_normal((N, F, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    planes = jnp.asarray(np.concatenate(
        [n, rng.uniform(0.5, 1.5, (N, F, 1)).astype(np.float32)], axis=-1))
    vmask = jnp.asarray(
        (rng.uniform(size=(N, V)) > 0.1).astype(np.float32))

    dep_p, idx_p, plane_p, sep_p = jax.block_until_ready(
        sat_pallas(pts, planes, vmask))
    dep_x, idx_x, nref_x, sep_x = jax.block_until_ready(
        jax.jit(xla_ref)(pts, planes, vmask))
    print("depth err:", float(jnp.abs(dep_p - dep_x).max()),
          "sep err:", float(jnp.abs(sep_p - sep_x).max()),
          "idx mismatch:", int((idx_p != idx_x).sum()),
          "nref err:", float(jnp.abs(plane_p[:, :3] - nref_x).max()))

    def many(f, unpack):
        @jax.jit
        def g(pts):
            def body(c, _):
                outs = f(c, planes, vmask)
                d = unpack(outs)
                # cheap feedback so iterations are serialized
                return c + 1e-20 * d.sum(), ()
            c, _ = jax.lax.scan(body, pts, None, length=50)
            return c
        return g

    # kernel-only timing on PRE-TRANSPOSED inputs isolates the lane-last
    # layout-change cost from the kernel itself
    tp = jnp.transpose(jnp.pad(pts, ((0, (-N) % 128), (0, 0), (0, 0))),
                       (1, 2, 0))
    tpl = jnp.transpose(jnp.pad(planes, ((0, (-N) % 128), (0, 0), (0, 0)),
                                constant_values=1.0), (1, 2, 0))
    tm = jnp.transpose(jnp.pad(vmask, ((0, (-N) % 128), (0, 0)),
                               constant_values=1.0), (1, 0))
    Np = tp.shape[-1]

    @jax.jit
    def kernel_only(tp):
        def body(c, _):
            dep, idx, plane, sep = pl.pallas_call(
                make_kernel(V, F, 2),
                out_shape=(jax.ShapeDtypeStruct((2, Np), tp.dtype),
                           jax.ShapeDtypeStruct((2, Np), jnp.int32),
                           jax.ShapeDtypeStruct((4, Np), tp.dtype),
                           jax.ShapeDtypeStruct((1, Np), tp.dtype)),
                grid=(Np // 128,),
                in_specs=[pl.BlockSpec((V, 3, 128), lambda i: (0, 0, i),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((F, 4, 128), lambda i: (0, 0, i),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((V, 128), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=(pl.BlockSpec((2, 128), lambda i: (0, i),
                                        memory_space=pltpu.VMEM),
                           pl.BlockSpec((2, 128), lambda i: (0, i),
                                        memory_space=pltpu.VMEM),
                           pl.BlockSpec((4, 128), lambda i: (0, i),
                                        memory_space=pltpu.VMEM),
                           pl.BlockSpec((1, 128), lambda i: (0, i),
                                        memory_space=pltpu.VMEM)),
            )(tp, tpl, tm)
            return c + 1e-20 * dep.sum(), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), tp.dtype), None, length=50)
        return c

    g_p = many(lambda a, b, c: sat_pallas(a, b, c), lambda o: o[0])
    g_x = many(lambda a, b, c: xla_ref(a, b, c), lambda o: o[0])
    for name, g, arg in (("pallas", g_p, pts), ("xla   ", g_x, pts),
                         ("kernel", kernel_only, tp)):
        jax.block_until_ready(g(arg))
        best = 1e9
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(g(arg))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best/50*1e6:.1f} us/call (N={N})")


if __name__ == "__main__":
    main()
