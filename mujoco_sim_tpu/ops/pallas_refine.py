"""Pallas TPU kernel: fused edge-cross refinement rounds for the exact MTV.

The exact deep-pair manifold (ops/manifold.py:_mtv) follows its coarse
face-normal SAT with _REFINE_ROUNDS rounds of: select the _K_EDGE edges
nearest each hull's support plane, cross every A-edge direction with
every B-edge direction, and re-minimize the support gap over the 256
normalized cross axes.  As XLA ops the round materializes the
(lanes, 16, 16, 3) cross table in a lane-hostile layout (622us/step of
pure copies at manip 1024, r5 profile), stages (lanes, 256, 3) axis
transposes around the support kernel (534us of reshapes), and runs the
K serial argmin passes as 4 unrolled loops (856us) plus their one-hot
copies (470us).

Here ONE kernel per 128-lane tile runs both rounds end to end in VMEM:
support extents along the current axis, per-hull top-K edge selection
(serial argmin over the masked edge scores, local-frame scoring exactly
as ops/manifold._topk_edge_dirs), world edge directions, the 16x16
cross table, normalization, the support scan over both hulls (analytic
cylinder overrides included), and the first-minimum axis pick with the
fwd-before-rev tie order of ops/manifold._best_axis.  HBM traffic per
round drops to the per-lane inputs (verts, edge tables, poses) and the
(1 + 3, L) outputs.

Like ops/pallas_support.py the public wrapper is a jax.custom_vmap whose
batching rule flattens leading axes onto the lane axis (the manifold
query runs under vmap(env) o vmap(slot)), and use_pallas_refine() gates
it to the real TPU backend (CPU tests run interpret-mode comparisons;
MST_DISABLE_PREFINE=1 is the A/B kill switch).
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
_VCHUNK = 64        # verts per support-product chunk: (256, 64, 128) f32
                    # = 8.4 MB VMEM peak


def _make_kernel(V: int, E: int, K: int, rounds: int):
    C = K * K
    inf = float("inf")   # python scalar: jnp.float32(...) outside the
                         # kernel body is a captured constant pallas rejects

    def topk_dirs(he, hm, r9, p3, n3, s, sign):
        """World directions of the K edges nearest the support plane.
        he: list of 6 (E, L) endpoint-component slices (j*3+c); returns
        3 (K, L) world direction components."""
        # local-frame scoring: nloc = R^T n, pe = he . nloc + p.n
        nloc = [r9[0 * 3 + c] * n3[0] + r9[1 * 3 + c] * n3[1]
                + r9[2 * 3 + c] * n3[2] for c in range(3)]
        pn = p3[0] * n3[0] + p3[1] * n3[1] + p3[2] * n3[2]
        pe0 = (he[0] * nloc[0][None] + he[1] * nloc[1][None]
               + he[2] * nloc[2][None] + pn[None])
        pe1 = (he[3] * nloc[0][None] + he[4] * nloc[1][None]
               + he[5] * nloc[2][None] + pn[None])
        d0 = jnp.where(sign > 0, s[None] - pe0, pe0 - s[None])
        d1 = jnp.where(sign > 0, s[None] - pe1, pe1 - s[None])
        score = jnp.maximum(d0, d1)
        score = jnp.where(hm > 0.5, score, inf)
        iota = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
        dls = [[], [], []]
        for _ in range(K):
            mn = score.min(axis=0)                             # (L,)
            ridx = jnp.where(score <= mn[None], iota, E).min(axis=0)
            oh = (iota == ridx[None]).astype(jnp.float32)      # (E, L)
            ok = jnp.isfinite(mn)
            for c in range(3):
                dl = ((he[3 + c] - he[c]) * oh).sum(axis=0)
                dls[c].append(jnp.where(ok, dl, 0.0))
            score = jnp.where(oh > 0.5, inf, score)
        dl = [jnp.stack(dls[c]) for c in range(3)]             # (K, L)
        # world: d_c = sum_j R[c, j] dl_j
        return [r9[c * 3 + 0][None] * dl[0] + r9[c * 3 + 1][None] * dl[1]
                + r9[c * 3 + 2][None] * dl[2] for c in range(3)]

    def scan_minmax(u, w):
        """u: 3 x (C, L) unit axes; w: 3 x (V, L) verts -> (min, max)
        support products, chunked over V to bound the VMEM peak."""
        mx = jnp.full(u[0].shape, -inf)
        mn = jnp.full(u[0].shape, inf)
        for lo in range(0, V, _VCHUNK):
            hi = min(lo + _VCHUNK, V)
            p = (u[0][:, None, :] * w[0][None, lo:hi, :]
                 + u[1][:, None, :] * w[1][None, lo:hi, :]
                 + u[2][:, None, :] * w[2][None, lo:hi, :])
            mx = jnp.maximum(mx, p.max(axis=1))
            mn = jnp.minimum(mn, p.min(axis=1))
        return mn, mx

    def cyl_override(u, aw, cen, cyl, mn, mx):
        """Analytic cylinder support extents along axes u (flag in
        cyl[0], radius cyl[1], half-height cyl[2])."""
        da = u[0] * aw[0][None] + u[1] * aw[1][None] + u[2] * aw[2][None]
        dperp = jnp.sqrt(jnp.clip(1.0 - da * da, 0.0, None))
        ext = cyl[2][None] * jnp.abs(da) + cyl[1][None] * dperp
        dc = (u[0] * cen[0][None] + u[1] * cen[1][None]
              + u[2] * cen[2][None])
        is_cyl = (cyl[0] > 0.5)[None]
        return (jnp.where(is_cyl, dc - ext, mn),
                jnp.where(is_cyl, dc + ext, mx))

    def kernel(wa_ref, wb_ref, hea_ref, heb_ref, hma_ref, hmb_ref,
               ra_ref, rb_ref, pa_ref, pb_ref, cyla_ref, cylb_ref,
               d0_ref, n0_ref, d_out, n_out):
        wa = [wa_ref[c] for c in range(3)]                     # (V, L)
        wb = [wb_ref[c] for c in range(3)]
        hea = [hea_ref[c] for c in range(6)]                   # (E, L)
        heb = [heb_ref[c] for c in range(6)]
        hma = hma_ref[...]
        hmb = hmb_ref[...]
        ra = [ra_ref[c] for c in range(9)]                     # (L,)
        rb = [rb_ref[c] for c in range(9)]
        pa = [pa_ref[c] for c in range(3)]
        pb = [pb_ref[c] for c in range(3)]
        cyla = [cyla_ref[c] for c in range(3)]
        cylb = [cylb_ref[c] for c in range(3)]
        awa = [ra[2], ra[5], ra[8]]                            # R[:, 2]
        awb = [rb[2], rb[5], rb[8]]
        depth = d0_ref[0]                                      # (L,)
        n = [n0_ref[c] for c in range(3)]

        for _ in range(rounds):
            # support extents of each hull along the current axis
            pna = n[0][None] * wa[0] + n[1][None] * wa[1] + n[2][None] * wa[2]
            pnb = n[0][None] * wb[0] + n[1][None] * wb[1] + n[2][None] * wb[2]
            sA = pna.max(axis=0)
            sB = pnb.min(axis=0)
            daA = n[0] * awa[0] + n[1] * awa[1] + n[2] * awa[2]
            extA = (cyla[2] * jnp.abs(daA)
                    + cyla[1] * jnp.sqrt(jnp.clip(1.0 - daA * daA, 0.0,
                                                  None)))
            dcA = n[0] * pa[0] + n[1] * pa[1] + n[2] * pa[2]
            sA = jnp.where(cyla[0] > 0.5, dcA + extA, sA)
            daB = n[0] * awb[0] + n[1] * awb[1] + n[2] * awb[2]
            extB = (cylb[2] * jnp.abs(daB)
                    + cylb[1] * jnp.sqrt(jnp.clip(1.0 - daB * daB, 0.0,
                                                  None)))
            dcB = n[0] * pb[0] + n[1] * pb[1] + n[2] * pb[2]
            sB = jnp.where(cylb[0] > 0.5, dcB - extB, sB)

            dA = topk_dirs(hea, hma, ra, pa, n, sA, 1.0)       # 3 x (K, L)
            dB = topk_dirs(heb, hmb, rb, pb, n, sB, -1.0)

            # 16x16 cross table -> (C, L)
            def outer(x, y):
                return (x[:, None, :] * y[None, :, :]).reshape(C, -1)

            cr = [outer(dA[1], dB[2]) - outer(dA[2], dB[1]),
                  outer(dA[2], dB[0]) - outer(dA[0], dB[2]),
                  outer(dA[0], dB[1]) - outer(dA[1], dB[0])]
            crn = jnp.sqrt(cr[0] * cr[0] + cr[1] * cr[1] + cr[2] * cr[2])
            valid = crn > 1e-12
            inv = 1.0 / jnp.maximum(crn, 1e-12)
            u = [cr[c] * inv for c in range(3)]

            mnA, mxA = scan_minmax(u, wa)
            mnA, mxA = cyl_override(u, awa, pa, cyla, mnA, mxA)
            mnB, mxB = scan_minmax(u, wb)
            mnB, mxB = cyl_override(u, awb, pb, cylb, mnB, mxB)
            fwd = mxA - mnB                    # penetration along +axis
            rev = mxB - mnA                    # penetration along -axis
            comb = jnp.where(valid, jnp.minimum(fwd, rev), inf)
            depthR = comb.min(axis=0)                          # (L,)
            iota = jax.lax.broadcasted_iota(jnp.int32, comb.shape, 0)
            ridx = jnp.where(comb <= depthR[None], iota, C).min(axis=0)
            ohc = (iota == ridx[None]).astype(jnp.float32)     # (C, L)
            fsel = (ohc * fwd).sum(axis=0)
            rsel = (ohc * rev).sum(axis=0)
            # fwd precedes rev in _best_axis's interleaved argmin order
            sgn = jnp.where(fsel <= rsel, 1.0, -1.0)
            nR = [sgn * (ohc * u[c]).sum(axis=0) for c in range(3)]
            better = depthR < depth
            depth = jnp.where(better, depthR, depth)
            n = [jnp.where(better, nR[c], n[c]) for c in range(3)]

        d_out[0] = depth
        for c in range(3):
            n_out[c] = n[c]

    return kernel


@functools.lru_cache(maxsize=None)
def _build(V: int, E: int, K: int, rounds: int, interpret: bool):
    kernel = _make_kernel(V, E, K, rounds)

    def call(args, L):
        specs = [pl.BlockSpec(a.shape[:-1] + (_LANES,),
                              (lambda i, nd=a.ndim: (0,) * (nd - 1) + (i,)),
                              memory_space=pltpu.VMEM) for a in args]
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((1, L), jnp.float32),
                       jax.ShapeDtypeStruct((3, L), jnp.float32)],
            grid=(L // _LANES,),
            in_specs=specs,
            out_specs=[pl.BlockSpec((1, _LANES), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((3, _LANES), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)],
            interpret=interpret,
        )(*args)

    # chunk the lane axis per pallas_call: XLA stages the custom-call
    # operands/results in scoped VMEM (see ops/pallas_support.py)
    bytes_per_lane = 4 * (6 * V + 14 * E + 32)
    chunk = max(_LANES,
                (40 * 2 ** 20 // bytes_per_lane) // _LANES * _LANES)

    def single(wa, wb, hea, heb, hma, hmb, ra, rb, pa, pb, cyla, cylb,
               d0, n0):
        """Leading axis N = flattened lanes; shapes per lane:
        wa/wb (V, 3), hea/heb (E, 2, 3), hma/hmb (E,), ra/rb (3, 3),
        pa/pb (3,), cyla/cylb (3,), d0 (), n0 (3,)."""
        N = wa.shape[0]
        pad = (-N) % _LANES

        def prep(x, shape):
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
            # lanes to the minor axis
            x = jnp.moveaxis(x, 0, -1)
            return x.reshape(shape + (N + pad,))

        args = [prep(jnp.transpose(wa, (0, 2, 1)), (3, V)),
                prep(jnp.transpose(wb, (0, 2, 1)), (3, V)),
                prep(jnp.transpose(hea, (0, 2, 3, 1)), (6, E)),
                prep(jnp.transpose(heb, (0, 2, 3, 1)), (6, E)),
                prep(hma, (E,)),
                prep(hmb, (E,)),
                prep(ra, (9,)),
                prep(rb, (9,)),
                prep(pa, (3,)),
                prep(pb, (3,)),
                prep(cyla, (3,)),
                prep(cylb, (3,)),
                prep(d0[:, None], (1,)),
                prep(n0, (3,))]
        Np = N + pad
        ds, ns = [], []
        for lo in range(0, Np, chunk):
            L = min(chunk, Np - lo)
            d_c, n_c = call([a[..., lo:lo + L] for a in args], L)
            ds.append(d_c)
            ns.append(n_c)
        d = ds[0] if len(ds) == 1 else jnp.concatenate(ds, axis=-1)
        nn = ns[0] if len(ns) == 1 else jnp.concatenate(ns, axis=-1)
        return d[0, :N], jnp.transpose(nn, (1, 0))[:N]

    fn = custom_vmap(single)

    @fn.def_vmap
    def _rule(axis_size, in_batched, *args):
        flat = []
        for a, bt in zip(args, in_batched):
            if not bt:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            flat.append(a.reshape((axis_size * a.shape[1],) + a.shape[2:])
                        if a.ndim > 1 else a.reshape(axis_size))
        d, nn = fn(*flat)
        return (d.reshape(axis_size, -1), nn.reshape(axis_size, -1, 3)), \
            (True, True)

    return fn


def refine_rounds(wA, wB, heA, heB, hmA, hmB, RA, RB, pA, pB,
                  cylA, cylB, depth0, n0, K, rounds, interpret=False):
    """Run `rounds` edge-cross refinement rounds; returns (depth, n).

    Single-lane shapes: wA/wB (V, 3) world verts (repeat-padded), heA/heB
    (E, 2, 3) LOCAL edge endpoints, hmA/hmB (E,) masks, RA/RB (3, 3),
    pA/pB (3,), cylA/cylB (3,) [flag, radius, halfheight], depth0 (),
    n0 (3,).  Composable with (nested) vmap over any leading axes.
    """
    V, E = wA.shape[-2], heA.shape[-3]
    Vp = -(-V // 8) * 8
    Ep = -(-E // 8) * 8

    def padv(w):
        if Vp == V:
            return w
        rep = jnp.broadcast_to(w[..., :1, :], w.shape[:-2] + (Vp - V, 3))
        return jnp.concatenate([w, rep], axis=-2)

    def pade(he, hm):
        if Ep == E:
            return he, hm
        z = jnp.zeros(he.shape[:-3] + (Ep - E, 2, 3), he.dtype)
        zm = jnp.zeros(hm.shape[:-1] + (Ep - E,), hm.dtype)
        return (jnp.concatenate([he, z], axis=-3),
                jnp.concatenate([hm, zm], axis=-1))

    wA, wB = padv(wA), padv(wB)
    heA, hmA = pade(heA, hmA)
    heB, hmB = pade(heB, hmB)
    fn = _build(Vp, Ep, int(K), int(rounds), bool(interpret))
    args = (wA, wB, heA, heB, hmA, hmB, RA, RB, pA, pB, cylA, cylB,
            depth0, n0)
    lead = wA.shape[:-2]
    if not lead:
        args = tuple(a[None] for a in args)
        d, nn = fn(*args)
        return d[0], nn[0]
    flat = tuple(a.reshape((-1,) + a.shape[len(lead):]) for a in args)
    d, nn = fn(*flat)
    return d.reshape(lead), nn.reshape(lead + (3,))


def use_pallas_refine() -> bool:
    """Trace-time gate: real TPU backend only (MST_DISABLE_PREFINE=1 is
    the A/B kill switch; CPU tests run interpret-mode comparisons)."""
    if os.environ.get("MST_DISABLE_PREFINE"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False
