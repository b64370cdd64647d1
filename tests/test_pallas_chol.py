"""pallas fused Cholesky-solve vs the XLA blocked kernels (interpret
mode on CPU; the real-TPU path is exercised by the bench/driver)."""

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_sim_tpu.ops import linalg
from mujoco_sim_tpu.ops.pallas_chol import chol_solve


def _spd(rng, n, scale=1.0):
    A = rng.standard_normal((n, n))
    return (A @ A.T + n * np.eye(n)) * scale


def test_matches_xla_path():
    rng = np.random.default_rng(0)
    n, N = 49, 130                     # force lane padding (130 -> 256)
    A = np.stack([_spd(rng, n) for _ in range(N)]).astype(np.float32)
    b = rng.standard_normal((N, n)).astype(np.float32)
    x = np.asarray(chol_solve(jnp.asarray(A), jnp.asarray(b),
                              interpret=True))
    L = linalg.cholesky(jnp.asarray(A))
    x_ref = np.asarray(linalg.cho_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(x, x_ref, rtol=2e-5, atol=2e-5)


def test_ill_conditioned_stiff_rows():
    """Newton Hessians carry efc_D ~ 1e9-1e12 rows; the factor must stay
    finite and solve the dominant subspace accurately."""
    rng = np.random.default_rng(1)
    n, N = 12, 4
    A = np.stack([_spd(rng, n) for _ in range(N)]).astype(np.float32)
    A[:, 0, 0] += 1e9
    b = rng.standard_normal((N, n)).astype(np.float32)
    x = np.asarray(chol_solve(jnp.asarray(A), jnp.asarray(b),
                              interpret=True))
    assert np.isfinite(x).all()
    r = np.einsum("bij,bj->bi", A, x) - b
    assert np.abs(r).max() < 1e-2, np.abs(r).max()


def test_under_vmap():
    rng = np.random.default_rng(2)
    n, B, E = 7, 3, 5
    A = np.stack([[_spd(rng, n) for _ in range(B)]
                  for _ in range(E)]).astype(np.float32)
    b = rng.standard_normal((E, B, n)).astype(np.float32)
    f = jax.vmap(lambda Ai, bi: chol_solve(Ai, bi, interpret=True))
    x = np.asarray(f(jnp.asarray(A), jnp.asarray(b)))
    L = linalg.cholesky(jnp.asarray(A))
    x_ref = np.asarray(linalg.cho_solve(L, jnp.asarray(b)))
    np.testing.assert_allclose(x, x_ref, rtol=2e-5, atol=2e-5)
