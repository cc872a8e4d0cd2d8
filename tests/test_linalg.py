"""Unrolled small-matrix solver correctness vs the library path."""

import jax
import jax.numpy as jnp
import numpy as np

from pointfoot_tpu.ops import linalg


def _rand_pd(rng, B, n):
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    return A @ A.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32)


def test_chol_solve_matches_library():
    rng = np.random.default_rng(0)
    for n in (3, 6, 12, 18):
        A = jnp.asarray(_rand_pd(rng, 32, n))
        b = jnp.asarray(rng.normal(size=(32, n)).astype(np.float32))
        x = linalg.chol_solve(A, b)
        x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   rtol=2e-3, atol=2e-3)


def test_chol_solve_matrix():
    rng = np.random.default_rng(1)
    A = jnp.asarray(_rand_pd(rng, 8, 6))
    B = jnp.asarray(rng.normal(size=(8, 6, 4)).astype(np.float32))
    X = linalg.chol_solve_matrix(A, B)
    np.testing.assert_allclose(np.asarray(A @ X), np.asarray(B),
                               rtol=2e-3, atol=2e-3)


def test_cholesky_unrolled_factor():
    rng = np.random.default_rng(2)
    A = jnp.asarray(_rand_pd(rng, 4, 12))
    L = linalg.cholesky_unrolled(A)
    np.testing.assert_allclose(
        np.asarray(L @ jnp.swapaxes(L, -1, -2)), np.asarray(A),
        rtol=2e-3, atol=2e-3)


def test_chol_solve_differentiable():
    rng = np.random.default_rng(3)
    A = jnp.asarray(_rand_pd(rng, 1, 6)[0])
    b = jnp.asarray(rng.normal(size=6).astype(np.float32))
    g = jax.grad(lambda b_: jnp.sum(linalg.chol_solve(A, b_) ** 2))(b)
    assert np.isfinite(np.asarray(g)).all()
