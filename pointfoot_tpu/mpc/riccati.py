"""Horizon-parallel LQR/Riccati via `lax.associative_scan`.

The sequential Riccati recursion in mpc/ilqr.py costs O(T) dependent steps.
This module implements the associative reformulation of the LQR backward
pass (Särkkä & García-Fernández, "Temporal Parallelization of Dynamic
Programming and Linear Quadratic Control", public method): each time step is
summarized by an element e = (A, b, C, eta, J) and adjacent elements combine
associatively, so the whole backward pass runs in O(log T) depth on TPU —
the genuine analogue of sequence parallelism for this workload (SURVEY.md §5
"long-context" accounting).

For the affine step  x' = F x + c + L u  with control cost 0.5 u'U u and
stage state cost 0.5 x'X x (terminal 0.5 x'XT x), the per-step element is

    A = F,  b = c,  C = L U^-1 L',  eta = 0,  J = X

plus a terminal pure-cost element (A=0, J=XT).  Combination (i earlier):

    Mij  = (I + C_i J_j)^-1
    A_ij = A_j Mij A_i
    b_ij = A_j Mij (b_i + C_i eta_j) + b_j
    C_ij = A_j Mij C_i A_j' + C_j
    Nij  = (I + J_j C_i)^-1
    eta_ij = A_i' Nij (eta_j - J_j b_i) + eta_i
    J_ij   = A_i' Nij J_j A_i + J_i

The value function at t is V_t(x) = 0.5 x'J x - eta'x after combining the
suffix elements t..T; `parallel_lqr_value` is verified elementwise against
`sequential_lqr_value` in tests/test_mpc.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pointfoot_tpu.ops import linalg as linalg_ops


class LQRElement(NamedTuple):
    A: jax.Array  # (..., n, n)
    b: jax.Array  # (..., n)
    C: jax.Array  # (..., n, n)
    eta: jax.Array  # (..., n)
    J: jax.Array  # (..., n, n)


def _combine(elem_i: LQRElement, elem_j: LQRElement) -> LQRElement:
    """Associative combination; elem_i earlier in time than elem_j."""
    Ai, bi, Ci, etai, Ji = elem_i
    Aj, bj, Cj, etaj, Jj = elem_j
    n = Ai.shape[-1]
    I = jnp.broadcast_to(jnp.eye(n, dtype=Ai.dtype), Ai.shape)
    AjT = jnp.swapaxes(Aj, -1, -2)
    AiT = jnp.swapaxes(Ai, -1, -2)
    M = jnp.linalg.solve(I + Ci @ Jj, I)
    N = jnp.linalg.solve(I + Jj @ Ci, I)
    A = Aj @ M @ Ai
    b = (Aj @ M @ (bi[..., None] + Ci @ etaj[..., None]))[..., 0] + bj
    C = Aj @ M @ Ci @ AjT + Cj
    eta = (AiT @ N @ (etaj - (Jj @ bi[..., None])[..., 0])[..., None])[..., 0] + etai
    J = AiT @ N @ Jj @ Ai + Ji
    return LQRElement(A, b, C, eta, J)


def make_elements(F, c, L, X, U, XT) -> LQRElement:
    """Stack per-step elements (T+1 including the terminal cost element)."""
    T, n, _ = F.shape
    m = L.shape[-1]
    Uinv = jnp.linalg.solve(
        U, jnp.broadcast_to(jnp.eye(m, dtype=U.dtype), U.shape))
    C = L @ Uinv @ jnp.swapaxes(L, -1, -2)
    zero_n = jnp.zeros((1, n, n), F.dtype)
    return LQRElement(
        A=jnp.concatenate([F, zero_n]),
        b=jnp.concatenate([c, jnp.zeros((1, n), F.dtype)]),
        C=jnp.concatenate([C, zero_n]),
        eta=jnp.zeros((T + 1, n), F.dtype),
        J=jnp.concatenate([X, XT[None]]),
    )


def parallel_lqr_value(elements: LQRElement) -> Tuple[jax.Array, jax.Array]:
    """(P_t, p_t) for all t via O(log T)-depth associative scan.

    V_t(x) = 0.5 x'P_t x - p_t'x + const.
    """
    rev = jax.tree.map(lambda a: jnp.flip(a, axis=0), elements)
    # reversed ordering: scan prefix of reversed = suffix of original; the
    # combine must see (earlier, later) = (element closer to t, closer to T),
    # i.e. with reversed inputs the accumulated prefix is the LATER part.
    scanned = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), rev)
    P = jnp.flip(scanned.J, axis=0)
    p = jnp.flip(scanned.eta, axis=0)
    return P, p


def sequential_lqr_value(F, c, L, X, U, XT):
    """Reference sequential Riccati for the same problem (tests + latency-
    optimal short horizons).  Same value convention as parallel_lqr_value."""

    def step(carry, inp):
        P, p = carry
        F_t, c_t, L_t, X_t, U_t = inp
        G = U_t + L_t.T @ P @ L_t
        H = L_t.T @ P @ F_t
        K = linalg_ops.chol_solve_matrix(G, H)
        FKL = F_t - L_t @ K
        P_new = X_t + F_t.T @ P @ FKL
        P_new = 0.5 * (P_new + P_new.T)
        p_new = FKL.T @ (p - P @ c_t)
        return (P_new, p_new), (P_new, p_new)

    init = (XT, jnp.zeros(XT.shape[-1], XT.dtype))
    (_, _), (Ps, ps) = jax.lax.scan(
        step, init, (F, c, L, X, U), reverse=True)
    Ps = jnp.concatenate([Ps, XT[None]])
    ps = jnp.concatenate([ps, jnp.zeros((1, XT.shape[-1]), XT.dtype)])
    return Ps, ps


def lqr_gains_from_value(F, c, L, U, P_next, p_next):
    """Feedback gains from next-step value: u* = -K x - d."""
    G = U + jnp.swapaxes(L, -1, -2) @ P_next @ L
    H = jnp.swapaxes(L, -1, -2) @ P_next @ F
    K = linalg_ops.chol_solve_matrix(G, H)
    d = linalg_ops.chol_solve(
        G, (jnp.swapaxes(L, -1, -2) @ (P_next @ c[..., None]
                                       - p_next[..., None]))[..., 0])
    return K, d


# --------------------------------------------------------------------------
# Full LQT form (Särkkä & García-Fernández): cross term u'Mx and linear
# costs q'x, r'u — everything the iLQR backward pass produces.  Reduced to
# the canonical element via completion of squares so the SAME associative
# combine runs in O(log T) depth.  Value convention here: V_t(x) =
# 0.5 x'P_t x + p_t'x + const.
# --------------------------------------------------------------------------


def make_elements_lqt(F, c, L, X, q, U, r, M, XT, qT) -> LQRElement:
    """Elements for stage cost 0.5x'Xx + q'x + 0.5u'Uu + r'u + u'Mx.

    Completion of squares u = ũ − U⁻¹(Mx + r) folds the cross/linear
    control terms into effective dynamics and state cost:

        F̃ = F − LU⁻¹M,  c̃ = c − LU⁻¹r,  X̃ = X − M'U⁻¹M,  q̃ = q − M'U⁻¹r

    then the canonical element applies with eta = −q̃ (the module's value
    convention is V = 0.5x'Jx − eta'x).  Terminal: J = XT, eta = −qT.
    """
    T, n, _ = F.shape
    m = U.shape[-1]
    Uinv = jnp.linalg.solve(
        U, jnp.broadcast_to(jnp.eye(m, dtype=U.dtype), U.shape))
    LT = jnp.swapaxes(L, -1, -2)
    MT = jnp.swapaxes(M, -1, -2)
    LUi = L @ Uinv
    F_eff = F - LUi @ M
    c_eff = c - (LUi @ r[..., None])[..., 0]
    X_eff = X - MT @ Uinv @ M
    q_eff = q - (MT @ Uinv @ r[..., None])[..., 0]
    C = LUi @ LT
    zero_n = jnp.zeros((1, n, n), F.dtype)
    return LQRElement(
        A=jnp.concatenate([F_eff, zero_n]),
        b=jnp.concatenate([c_eff, jnp.zeros((1, n), F.dtype)]),
        C=jnp.concatenate([C, zero_n]),
        eta=jnp.concatenate([-q_eff, -qT[None]]),
        J=jnp.concatenate([X_eff, XT[None]]),
    )


def parallel_lqt_value(F, c, L, X, q, U, r, M, XT, qT):
    """(P_t, p_t) for all t, O(log T) depth; V_t = 0.5x'P_t x + p_t'x."""
    P, eta = parallel_lqr_value(make_elements_lqt(F, c, L, X, q, U, r, M,
                                                  XT, qT))
    return P, -eta


def sequential_lqt_value(F, c, L, X, q, U, r, M, XT, qT):
    """Reference sequential recursion for the full LQT (same convention)."""

    def step(carry, inp):
        P, p = carry
        F_t, c_t, L_t, X_t, q_t, U_t, r_t, M_t = inp
        G = U_t + L_t.T @ P @ L_t
        K = linalg_ops.chol_solve_matrix(G, L_t.T @ P @ F_t + M_t)
        d = linalg_ops.chol_solve(G, L_t.T @ (P @ c_t + p) + r_t)
        P_new = X_t + F_t.T @ P @ F_t - K.T @ G @ K
        P_new = 0.5 * (P_new + P_new.T)
        p_new = q_t + F_t.T @ (P @ c_t + p) - K.T @ (G @ d)
        return (P_new, p_new), (P_new, p_new)

    (_, _), (Ps, ps) = jax.lax.scan(
        step, (XT, qT), (F, c, L, X, q, U, r, M), reverse=True)
    Ps = jnp.concatenate([Ps, XT[None]])
    ps = jnp.concatenate([ps, qT[None]])
    return Ps, ps


def lqt_gains_from_value(F, c, L, U, r, M, P_next, p_next):
    """u* = −Kx − d from the next-step LQT value (broadcasts over time)."""
    LT = jnp.swapaxes(L, -1, -2)
    G = U + LT @ P_next @ L
    K = linalg_ops.chol_solve_matrix(G, LT @ P_next @ F + M)
    d = linalg_ops.chol_solve(
        G, (LT @ (P_next @ c[..., None] + p_next[..., None]))[..., 0] + r)
    return K, d


def parallel_backward_pass(fx, fu, cx, cu, cxx, cuu, cux, cxT, cxxT, reg):
    """Drop-in replacement for ilqr.backward_pass with O(log T) depth.

    Maps the iLQR derivative tensors onto the LQT problem in DEVIATION
    form (δx' = fx δx + fu δu, no affine drift) and reads the gains
    (K_t, k_t) off the suffix value functions.  Returns the same
    (Ks, ks, dV) triple; parity with the sequential pass is pinned in
    tests/test_mpc.py (builder queue #5 / VERDICT round-1 item 10).

    CAVEAT (regularization semantics): the regularizer is folded into the
    WHOLE value recursion (cuu + reg·I everywhere), whereas the sequential
    pass regularizes only the gain solve and propagates the value with the
    unregularized Quu.  The two are identical as reg -> 0 and differ by
    O(reg) per step at large reg — use the parallel pass with small/fixed
    regularization (well-conditioned problems, long horizons), not inside
    aggressive LM reg-escalation schedules.
    """
    T, n = fx.shape[0], fx.shape[-1]
    m = fu.shape[-1]
    cuu_reg = cuu + reg * jnp.eye(m, dtype=cuu.dtype)
    c_zero = jnp.zeros((T, n), fx.dtype)
    Ps, ps = parallel_lqt_value(
        fx, c_zero, fu, cxx, cx, cuu_reg, cu, cux, cxxT, cxT)
    Ks, ks = lqt_gains_from_value(
        fx, c_zero, fu, cuu_reg, cu, cux, Ps[1:], ps[1:])
    # expected-improvement terms (same bookkeeping as the sequential pass):
    # Qu_t = cu + fu'p_{t+1};  Quu_t = cuu + fu'P_{t+1}fu (unregularized)
    fuT = jnp.swapaxes(fu, -1, -2)
    Qu = cu + (fuT @ ps[1:][..., None])[..., 0]
    Quu = cuu + fuT @ Ps[1:] @ fu
    # iLQR convention: k = -d (u = u_prev + k), so dV1 = k·Qu = -d·Qu
    dV = jnp.stack([
        -jnp.einsum("tm,tm->", ks, Qu),
        0.5 * jnp.einsum("tm,tmk,tk->", ks, Quu, ks),
    ])
    return -Ks, -ks, dV
