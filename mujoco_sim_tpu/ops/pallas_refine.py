"""Pallas TPU kernel: the exact-MTV query (coarse SAT + edge-cross rounds).

The exact deep-pair manifold (ops/manifold.py:_mtv) computes the exact
minimum-translation vector as a coarse face-normal SAT over both hulls'
merged-face normals followed by _REFINE_ROUNDS rounds of: select the
_K_EDGE edges nearest each hull's support plane, cross every A-edge
direction with every B-edge direction, and re-minimize the support gap
over the 256 normalized cross axes.

As XLA ops this was the dominant cost of the contact-rich manip step
(r5 profile, 1024 envs x 8 deep slots): the round materialized a
(lanes, 16, 16, 3) cross table in a lane-hostile layout (622us/step of
pure copies), staged (lanes, C, 3) axis transposes around the support
kernel (534us of reshapes), and ran the K argmin passes as 4 unrolled
loops (856us) plus their one-hot copies (470us).  Worse, the coarse
pass's pallas_call staging co-lived with the round kernels' inside the
gated while body and overflowed XLA's 16 MB scoped-VMEM budget at PR2
hull sizes (C=288 face axes, V=80) — a compile-time failure of the
flagship step.

Here ONE kernel per 128-lane tile runs the WHOLE query in VMEM: the
coarse masked face-normal scan, then both refinement rounds end to end
(support extents along the current axis, per-hull top-K edge selection
with local-frame scoring exactly as ops/manifold._topk_edge_dirs, world
edge directions, the 16x16 cross table, normalization, the support
scan over both hulls with analytic cylinder overrides, and the
first-minimum axis pick with the fwd-before-rev tie order of
ops/manifold._best_axis).  HBM traffic per lane drops to the hull/edge/
face tables and a 4-float result, and no other custom call shares the
gate's scoped staging.

Mosaic notes (learned here the hard way):
- mixed None+slice indexing (w[c][None, lo:hi, :]) lowers to a gather
  the TPU backend rejects — use lax.slice_in_dim;
- loops (rounds, vert chunks) must be lax.fori_loops reading from refs:
  unrolled python loops get no stack live-range reuse and OOM the
  scoped VMEM (the vert chunks alone peaked 12.6 MB at V=80);
- every per-lane vector in a loop carry (and, for safety, throughout)
  is kept 2-D (1, L) — 1-D (L,) carries crash the Mosaic layout pass
  (layout.h Check failed: arr.size() >= layout_rank);
- the kernel's own stack still peaks ~20 MB at PR2 sizes, over the
  default 16 MB limit — raised via CompilerParams.vmem_limit_bytes
  (v5e has 128 MB VMEM/core).

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
_VCHUNK = 32        # verts per support-product chunk: (C, 32, 128) f32


def _rows(x, n):
    """Split a (n, L) array into n (1, L) row slices (2-D everywhere —
    see the Mosaic notes in the module docstring)."""
    return [jax.lax.slice_in_dim(x, c, c + 1, axis=0) for c in range(n)]


def _make_kernel(V: int, E: int, F: int, K: int, rounds: int):
    C = K * K
    inf = float("inf")   # python scalar: jnp.float32(...) outside the
                         # kernel body is a captured constant pallas rejects

    def topk_dirs(he, hm, r9, p3, n3, s, sign):
        """World directions of the K edges nearest the support plane.
        he: list of 6 (E, L) endpoint-component slices (j*3+c); n3/p3
        lists of (1, L); s (1, L); returns 3 (K, L) world direction
        components."""
        # local-frame scoring: nloc = R^T n, pe = he . nloc + p.n
        nloc = [r9[0 * 3 + c] * n3[0] + r9[1 * 3 + c] * n3[1]
                + r9[2 * 3 + c] * n3[2] for c in range(3)]      # (1, L)
        pn = p3[0] * n3[0] + p3[1] * n3[1] + p3[2] * n3[2]
        pe0 = he[0] * nloc[0] + he[1] * nloc[1] + he[2] * nloc[2] + pn
        pe1 = he[3] * nloc[0] + he[4] * nloc[1] + he[5] * nloc[2] + pn
        d0 = (s - pe0) if sign > 0 else (pe0 - s)
        d1 = (s - pe1) if sign > 0 else (pe1 - s)
        score = jnp.maximum(d0, d1)
        score = jnp.where(hm > 0.5, score, inf)
        iota = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
        dls = [[], [], []]
        for _ in range(K):
            mn = score.min(axis=0, keepdims=True)              # (1, L)
            ridx = jnp.where(score <= mn, iota, E).min(axis=0,
                                                       keepdims=True)
            oh = (iota == ridx).astype(jnp.float32)            # (E, L)
            ok = jnp.isfinite(mn)
            for c in range(3):
                dl = ((he[3 + c] - he[c]) * oh).sum(axis=0, keepdims=True)
                dls[c].append(jnp.where(ok, dl, 0.0))
            score = jnp.where(oh > 0.5, inf, score)
        dl = [jnp.concatenate(dls[c], axis=0) for c in range(3)]  # (K, L)
        # world: d_c = sum_j R[c, j] dl_j
        return [r9[c * 3 + 0] * dl[0] + r9[c * 3 + 1] * dl[1]
                + r9[c * 3 + 2] * dl[2] for c in range(3)]

    def kernel(wa_ref, wb_ref, hea_ref, heb_ref, hma_ref, hmb_ref,
               nfa_ref, nfb_ref, fma_ref, fmb_ref,
               ra_ref, rb_ref, pa_ref, pb_ref, cyla_ref, cylb_ref,
               d_out, n_out):
        wa = [wa_ref[c] for c in range(3)]                     # (V, L)
        wb = [wb_ref[c] for c in range(3)]
        hea = [hea_ref[c] for c in range(6)]                   # (E, L)
        heb = [heb_ref[c] for c in range(6)]
        hma = hma_ref[...]
        hmb = hmb_ref[...]
        ra = _rows(ra_ref[...], 9)                             # (1, L)
        rb = _rows(rb_ref[...], 9)
        pa = _rows(pa_ref[...], 3)
        pb = _rows(pb_ref[...], 3)
        cyla = _rows(cyla_ref[...], 3)
        cylb = _rows(cylb_ref[...], 3)
        awa = [ra[2], ra[5], ra[8]]                            # R[:, 2]
        awb = [rb[2], rb[5], rb[8]]

        def scan_minmax(u, w_ref):
            """u: 3 x (C', L) unit axes; w_ref (3, V, L) vert ref ->
            (min, max) support products, V chunks as a fori_loop."""
            def chunk_body(i, carry):
                mn, mx = carry
                wc = [w_ref[c, pl.ds(i * _VCHUNK, _VCHUNK)][None]
                      for c in range(3)]
                p = (u[0][:, None, :] * wc[0] + u[1][:, None, :] * wc[1]
                     + u[2][:, None, :] * wc[2])
                return (jnp.minimum(mn, p.min(axis=1)),
                        jnp.maximum(mx, p.max(axis=1)))

            return jax.lax.fori_loop(
                0, V // _VCHUNK, chunk_body,
                (jnp.full(u[0].shape, inf), jnp.full(u[0].shape, -inf)))

        def cyl_override(u, aw, cen, cyl, mn, mx):
            """Analytic cylinder support extents along axes u (flag in
            cyl[0], radius cyl[1], half-height cyl[2])."""
            da = u[0] * aw[0] + u[1] * aw[1] + u[2] * aw[2]
            dperp = jnp.sqrt(jnp.clip(1.0 - da * da, 0.0, None))
            ext = cyl[2] * jnp.abs(da) + cyl[1] * dperp
            dc = u[0] * cen[0] + u[1] * cen[1] + u[2] * cen[2]
            is_cyl = cyl[0] > 0.5
            return (jnp.where(is_cyl, dc - ext, mn),
                    jnp.where(is_cyl, dc + ext, mx))

        def best_gap(u, valid):
            """Best (smallest) support gap over +-axes u (3 x (C', L),
            validity (C', L)); returns (depth (1, L), n 3 x (1, L)) with
            the fwd-before-rev first-minimum tie order of
            ops/manifold._best_axis."""
            mnA, mxA = scan_minmax(u, wa_ref)
            mnA, mxA = cyl_override(u, awa, pa, cyla, mnA, mxA)
            mnB, mxB = scan_minmax(u, wb_ref)
            mnB, mxB = cyl_override(u, awb, pb, cylb, mnB, mxB)
            fwd = mxA - mnB                    # penetration along +axis
            rev = mxB - mnA                    # penetration along -axis
            comb = jnp.where(valid, jnp.minimum(fwd, rev), inf)
            depthR = comb.min(axis=0, keepdims=True)           # (1, L)
            iota = jax.lax.broadcasted_iota(jnp.int32, comb.shape, 0)
            ridx = jnp.where(comb <= depthR, iota,
                             comb.shape[0]).min(axis=0, keepdims=True)
            ohc = (iota == ridx).astype(jnp.float32)           # (C', L)
            fsel = (ohc * fwd).sum(axis=0, keepdims=True)
            rsel = (ohc * rev).sum(axis=0, keepdims=True)
            sgn = jnp.where(fsel <= rsel, 1.0, -1.0)
            nR = [sgn * (ohc * u[c]).sum(axis=0, keepdims=True)
                  for c in range(3)]
            return depthR, nR

        # ---- coarse pass: both hulls' merged-face normals (A's as-is,
        # B's negated — matching _mtv's concat([nfA, -nfB]) axis order)
        nfa = nfa_ref[...]                                     # (3, F, L)
        nfb = nfb_ref[...]
        uc = [jnp.concatenate([nfa[c], -nfb[c]], axis=0) for c in range(3)]
        vc = jnp.concatenate([fma_ref[...], fmb_ref[...]], axis=0) > 0.5
        depth, n = best_gap(uc, vc)

        def round_body(_, carry):
            depth, n0c, n1c, n2c = carry                       # (1, L)
            n = [n0c, n1c, n2c]
            # support extents of each hull along the current axis
            pna = n[0] * wa[0] + n[1] * wa[1] + n[2] * wa[2]   # (V, L)
            pnb = n[0] * wb[0] + n[1] * wb[1] + n[2] * wb[2]
            sA = pna.max(axis=0, keepdims=True)                # (1, L)
            sB = pnb.min(axis=0, keepdims=True)
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

            dA = topk_dirs(hea, hma, ra, pa, n, sA, 1.0)   # 3 x (K, L)
            dB = topk_dirs(heb, hmb, rb, pb, n, sB, -1.0)

            # 16x16 cross table -> (C, L)
            def outer(x, y):
                return (x[:, None, :] * y[None, :, :]).reshape(C, -1)

            cr = [outer(dA[1], dB[2]) - outer(dA[2], dB[1]),
                  outer(dA[2], dB[0]) - outer(dA[0], dB[2]),
                  outer(dA[0], dB[1]) - outer(dA[1], dB[0])]
            crn = jnp.sqrt(cr[0] * cr[0] + cr[1] * cr[1] + cr[2] * cr[2])
            valid = crn > 1e-12
            invn = 1.0 / jnp.maximum(crn, 1e-12)
            u = [cr[c] * invn for c in range(3)]

            depthR, nR = best_gap(u, valid)
            better = depthR < depth
            depth = jnp.where(better, depthR, depth)
            n = [jnp.where(better, nR[c], n[c]) for c in range(3)]
            return depth, n[0], n[1], n[2]

        depth, nn0, nn1, nn2 = jax.lax.fori_loop(
            0, rounds, round_body, (depth, n[0], n[1], n[2]))
        d_out[...] = depth
        n_out[...] = jnp.concatenate([nn0, nn1, nn2], axis=0)

    return kernel


@functools.lru_cache(maxsize=None)
def _build(V: int, E: int, F: int, K: int, rounds: int, interpret: bool):
    kernel = _make_kernel(V, E, F, K, rounds)

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
            # v5e has 128 MB VMEM/core; the default 16 MB scoped limit
            # rejects the kernel stack at large-hull sizes (PR2: V=74,
            # E=216, F=144)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2 ** 20),
            interpret=interpret,
        )(*args)

    # chunk the lane axis per pallas_call: XLA stages the custom-call
    # operands/results in scoped VMEM, so each call's staging must stay
    # well under the 16 MB scoped limit
    bytes_per_lane = 4 * (6 * V + 14 * E + 8 * F + 32)
    chunk = max(_LANES,
                (8 * 2 ** 20 // bytes_per_lane) // _LANES * _LANES)

    def single(wa, wb, hea, heb, hma, hmb, nfa, nfb, fma, fmb,
               ra, rb, pa, pb, cyla, cylb):
        """Leading axis N = flattened lanes; shapes per lane:
        wa/wb (V, 3), hea/heb (E, 2, 3), hma/hmb (E,), nfa/nfb (F, 3)
        world face normals, fma/fmb (F,) face masks, ra/rb (3, 3),
        pa/pb (3,), cyla/cylb (3,)."""
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
                prep(jnp.transpose(nfa, (0, 2, 1)), (3, F)),
                prep(jnp.transpose(nfb, (0, 2, 1)), (3, F)),
                prep(fma, (F,)),
                prep(fmb, (F,)),
                prep(ra, (9,)),
                prep(rb, (9,)),
                prep(pa, (3,)),
                prep(pb, (3,)),
                prep(cyla, (3,)),
                prep(cylb, (3,))]
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
            flat.append(a.reshape((axis_size * a.shape[1],) + a.shape[2:]))
        d, nn = fn(*flat)
        return (d.reshape(axis_size, -1), nn.reshape(axis_size, -1, 3)), \
            (True, True)

    return fn


def mtv_query(wA, wB, heA, heB, hmA, hmB, nfA, nfB, fmA, fmB,
              RA, RB, pA, pB, cylA, cylB, K, rounds, interpret=False):
    """Exact-MTV query: coarse face-normal SAT + `rounds` edge-cross
    refinement rounds in one fused kernel; returns (depth, n).

    Single-lane shapes: wA/wB (V, 3) world verts (repeat-padded), heA/heB
    (E, 2, 3) LOCAL edge endpoints, hmA/hmB (E,) masks, nfA/nfB (F, 3)
    WORLD merged-face normals, fmA/fmB (F,) face masks, RA/RB (3, 3),
    pA/pB (3,), cylA/cylB (3,) [flag, radius, halfheight].  Composable
    with (nested) vmap over any leading axes.
    """
    V, E, F = wA.shape[-2], heA.shape[-3], nfA.shape[-2]
    # V pads to a _VCHUNK multiple (the in-kernel support scan reads
    # fixed-size ref chunks); repeat-padding keeps extents exact
    Vp = -(-V // _VCHUNK) * _VCHUNK
    Ep = -(-E // 8) * 8
    Fp = -(-F // 8) * 8

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

    def padf(nf, fm):
        if Fp == F:
            return nf, fm
        z = jnp.zeros(nf.shape[:-2] + (Fp - F, 3), nf.dtype)
        zm = jnp.zeros(fm.shape[:-1] + (Fp - F,), fm.dtype)
        return (jnp.concatenate([nf, z], axis=-2),
                jnp.concatenate([fm, zm], axis=-1))

    wA, wB = padv(wA), padv(wB)
    heA, hmA = pade(heA, hmA)
    heB, hmB = pade(heB, hmB)
    nfA, fmA = padf(nfA, fmA)
    nfB, fmB = padf(nfB, fmB)
    fn = _build(Vp, Ep, Fp, int(K), int(rounds), bool(interpret))
    args = (wA, wB, heA, heB, hmA, hmB, nfA, nfB, fmA, fmB,
            RA, RB, pA, pB, cylA, cylB)
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
