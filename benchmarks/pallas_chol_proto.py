"""Prototype: batch-parallel pallas Cholesky vs ops/linalg.py on the chip.

Layout experiment: envs ride the 128-lane axis ((n, n, B) blocks), the
column loop is a static python unroll of right-looking updates entirely in
VMEM — the XLA blocked version round-trips each small op through HBM.

Usage: python benchmarks/pallas_chol_proto.py [nv] [nenv]
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_chol_kernel(n: int):
    def kernel(a_ref, o_ref, s_ref):
        # a_ref/o_ref (n, n, 128); right-looking factorization in scratch
        s_ref[:] = a_ref[:]
        for j in range(n):
            piv = jax.lax.rsqrt(jnp.maximum(s_ref[j, j, :], 1e-30))
            col = s_ref[:, j, :] * piv[None]          # (n, 128)
            o_ref[:, j, :] = jnp.where(
                (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) >= j),
                col, 0.0)
            if j + 1 < n:
                sub = col[j + 1:, :]                  # (n-j-1, 128)
                s_ref[j + 1:, j + 1:, :] = (
                    s_ref[j + 1:, j + 1:, :]
                    - sub[:, None, :] * sub[None, :, :])
    return kernel


def chol_pallas(A):  # A (B, n, n) f32, B % 128 == 0
    B, n, _ = A.shape
    At = jnp.transpose(A, (1, 2, 0))                  # (n, n, B)
    out = pl.pallas_call(
        make_chol_kernel(n),
        out_shape=jax.ShapeDtypeStruct((n, n, B), A.dtype),
        grid=(B // 128,),
        in_specs=[pl.BlockSpec((n, n, 128), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, 128), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, n, 128), A.dtype)],
    )(At)
    return jnp.transpose(out, (2, 0, 1))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 49
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    from mujoco_sim_tpu.ops import linalg

    rng = np.random.default_rng(0)
    M = rng.standard_normal((B, n, n)).astype(np.float32)
    A = jnp.asarray(M @ np.transpose(M, (0, 2, 1))
                    + 3 * n * np.eye(n, dtype=np.float32))

    f_ref = jax.jit(linalg.cholesky)
    f_pal = jax.jit(chol_pallas)
    Lr = jax.block_until_ready(f_ref(A))
    Lp = jax.block_until_ready(f_pal(A))
    err = float(jnp.abs(Lr - Lp).max())
    print(f"n={n} B={B} max |L_ref - L_pallas| = {err:.3e}")

    # tunnel RTT is ~30 ms: time 100 chained factorizations inside one jit
    def many(f):
        @jax.jit
        def g(A):
            def body(c, _):
                L = f(c)
                # feed result back (keep SPD-ish): A' = L L^T + n I
                c2 = L @ jnp.swapaxes(L, -1, -2)
                return c2, ()
            c, _ = jax.lax.scan(body, A, None, length=100)
            return c
        return g
    for name, f in (("xla ", f_ref), ("pall", f_pal)):
        g = many(f)
        jax.block_until_ready(g(A))
        best = 1e9
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(g(A))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: best {best*1e4:.1f} us/iter (100 iters incl. L L^T rebuild)")


if __name__ == "__main__":
    main()
