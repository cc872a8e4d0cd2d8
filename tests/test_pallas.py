"""Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np


def _rand_pd(rng, B, n):
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    return A @ A.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32)


def test_pallas_chol_solve_matches_xla():
    from pointfoot_tpu.ops.pallas.cholesky import pallas_chol_solve

    rng = np.random.default_rng(0)
    for B, n in ((128, 12), (200, 6), (64, 18)):
        A = jnp.asarray(_rand_pd(rng, B, n))
        b = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
        x = pallas_chol_solve(A, b, interpret=True)
        x_ref = jnp.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   rtol=3e-3, atol=3e-3)


def test_pallas_chol_solve_padding_path():
    """Non-multiple-of-128 batch exercises the identity-padding logic."""
    from pointfoot_tpu.ops.pallas.cholesky import pallas_chol_solve

    rng = np.random.default_rng(1)
    A = jnp.asarray(_rand_pd(rng, 37, 12))
    b = jnp.asarray(rng.normal(size=(37, 12)).astype(np.float32))
    x = pallas_chol_solve(A, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("bij,bj->bi", A, x)), np.asarray(b),
        rtol=3e-3, atol=3e-3)
