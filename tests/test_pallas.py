"""Pallas kernel tests (interpret mode on CPU)."""

import jax
import pytest
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


def _xla_srb_lqr(F, c, L, Xd, Ud, XTd, x0, f_ff, T):
    """Reference: sequential Riccati + gain rollout (mirrors srb_plan)."""
    from pointfoot_tpu.mpc import riccati

    def one(F1, c1, L1, Xd1, Ud1, XTd1, x01, fff1):
        n = F1.shape[0]
        X = jnp.diag(Xd1)
        U = jnp.diag(Ud1)
        Fs = jnp.broadcast_to(F1, (T, n, n))
        cs = jnp.broadcast_to(c1, (T, n))
        Ls = jnp.broadcast_to(L1, (T,) + L1.shape)
        Xs = jnp.broadcast_to(X, (T, n, n))
        Us = jnp.broadcast_to(U, (T,) + U.shape)
        Ps, ps = riccati.sequential_lqr_value(Fs, cs, Ls, Xs, Us,
                                              jnp.diag(XTd1))

        def rollout(x, t):
            K, d = riccati.lqr_gains_from_value(F1, c1, L1, U, Ps[t + 1],
                                                ps[t + 1])
            du = -K @ x - d
            f = fff1 + du
            return F1 @ x + c1 + L1 @ du, f

        _, fs = jax.lax.scan(rollout, x01, jnp.arange(T))
        return fs

    return jax.vmap(one)(F, c, L, Xd, Ud, XTd, x0, f_ff)


@pytest.mark.slow
def test_pallas_srb_lqr_matches_xla():
    from pointfoot_tpu.ops.pallas.riccati import pallas_srb_lqr

    rng = np.random.default_rng(0)
    B, n, m, T = 8, 12, 6, 5
    F = np.tile(np.eye(n, dtype=np.float32), (B, 1, 1))
    F[:, 0:3, 6:9] += 0.02 * np.eye(3)
    F[:, 3:6, 9:12] += 0.02 * np.eye(3)
    F += 0.01 * rng.normal(size=(B, n, n)).astype(np.float32)
    c = 0.05 * rng.normal(size=(B, n)).astype(np.float32)
    L = 0.1 * rng.normal(size=(B, n, m)).astype(np.float32)
    Xd = np.abs(rng.normal(size=(B, n))).astype(np.float32) + 0.5
    Ud = np.abs(rng.normal(size=(B, m))).astype(np.float32) * 0.01 + 0.005
    XTd = 2.0 * Xd
    x0 = rng.normal(size=(B, n)).astype(np.float32)
    f_ff = rng.normal(size=(B, m)).astype(np.float32)

    ref = _xla_srb_lqr(*map(jnp.asarray, (F, c, L, Xd, Ud, XTd, x0, f_ff)), T)
    got = pallas_srb_lqr(*map(jnp.asarray, (F, c, L, Xd, Ud, XTd, x0, f_ff)),
                         horizon=T, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


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
