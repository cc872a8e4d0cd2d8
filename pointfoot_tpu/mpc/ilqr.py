"""Batched iLQR with regularized Riccati backward pass and line search.

Design (all shapes static; `vmap` over scenarios batches every matrix op
into MXU-friendly batched GEMMs):

* generic over a smooth discrete dynamics `f(x, u) -> x'` and stage cost
  `c(x, u, t)`; derivatives via `jax.jacobian`/`jax.hessian` composed under
  vmap — no hand-derived gradients to maintain (the win of a differentiable
  simulator, cf. SURVEY.md §2.7);
* backward pass: time-reversed `lax.scan` computing gains (K, k) with
  Levenberg-Marquardt regularization on Q_uu; the horizon-parallel
  associative-scan variant lives in mpc/riccati.py;
* forward pass: parallel line search — ALL candidate step sizes rolled out
  in one extra batch dimension and the best accepted per scenario
  (cheaper on TPU than sequential backtracking: one fused rollout instead
  of data-dependent control flow).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pointfoot_tpu.ops import linalg as linalg_ops


@dataclass(frozen=True)
class ILQRConfig:
    horizon: int = 50
    iterations: int = 10
    reg_init: float = 1e-6
    reg_min: float = 1e-8
    reg_max: float = 1e8
    alphas: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)
    # O(log T)-depth associative-scan backward pass (mpc/riccati.py, full
    # Sarkka LQT elements with cross/linear terms) — wins at long horizons
    # where the sequential scan's T dependent steps dominate
    parallel_backward: bool = False


class ILQRSolution(NamedTuple):
    xs: jax.Array  # (T+1, n) optimal state trajectory
    us: jax.Array  # (T, m) optimal controls
    cost: jax.Array  # () final total cost
    gains_K: jax.Array  # (T, m, n) feedback gains (for receding-horizon use)
    improved: jax.Array  # () bool — last iteration found a better trajectory


def _rollout(dyn, x0, us):
    def step(x, u):
        x1 = dyn(x, u)
        return x1, x1

    _, xs = jax.lax.scan(step, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)


def _total_cost(cost_fn, xs, us, T):
    ts = jnp.arange(T + 1)
    cs = jax.vmap(cost_fn)(xs, jnp.concatenate([us, jnp.zeros_like(us[:1])]),
                           ts)
    return jnp.sum(cs)


def _linearize(dyn, cost_fn, xs, us, T):
    """Derivatives along the trajectory, batched over time via vmap.

    Dynamics jacobian and cost gradient/hessian are each computed ONCE over
    the concatenated z = (x, u) and sliced into blocks — one jacfwd and one
    hessian pass instead of seven separate derivative evaluations.
    """
    n = xs.shape[-1]
    m = us.shape[-1]

    def dyn_z(z):
        return dyn(z[:n], z[n:])

    def cost_z(z, t):
        return cost_fn(z[:n], z[n:], t)

    zs = jnp.concatenate([xs[:-1], us], axis=-1)
    fz = jax.vmap(jax.jacobian(dyn_z))(zs)  # (T, n, n+m)
    fx, fu = fz[..., :n], fz[..., n:]

    ts = jnp.arange(T)
    gz = jax.vmap(jax.grad(cost_z))(zs, ts)  # (T, n+m)
    cx, cu = gz[..., :n], gz[..., n:]
    Hz = jax.vmap(jax.hessian(cost_z))(zs, ts)  # (T, n+m, n+m)
    cxx = Hz[..., :n, :n]
    cuu = Hz[..., n:, n:]
    cux = Hz[..., n:, :n]

    # terminal expansion
    tT = jnp.asarray(T)
    zT = jnp.concatenate([xs[-1], jnp.zeros_like(us[0])])
    cxT = jax.grad(cost_z)(zT, tT)[:n]
    cxxT = jax.hessian(cost_z)(zT, tT)[:n, :n]
    return fx, fu, cx, cu, cxx, cuu, cux, cxT, cxxT


def backward_pass(fx, fu, cx, cu, cxx, cuu, cux, cxT, cxxT, reg):
    """Time-reversed Riccati scan -> gains (K, k) and expected improvement."""
    n = fx.shape[-1]
    m = fu.shape[-1]

    def step(carry, inp):
        Vx, Vxx = carry
        fx_t, fu_t, cx_t, cu_t, cxx_t, cuu_t, cux_t = inp
        Qx = cx_t + fx_t.T @ Vx
        Qu = cu_t + fu_t.T @ Vx
        Qxx = cxx_t + fx_t.T @ Vxx @ fx_t
        Quu = cuu_t + fu_t.T @ Vxx @ fu_t
        Qux = cux_t + fu_t.T @ Vxx @ fx_t
        Quu_reg = Quu + reg * jnp.eye(m, dtype=Quu.dtype)
        k = -linalg_ops.chol_solve(Quu_reg, Qu)
        K = -linalg_ops.chol_solve_matrix(Quu_reg, Qux)
        Vx_new = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
        Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
        dV = jnp.array([k @ Qu, 0.5 * k @ (Quu @ k)])
        return (Vx_new, Vxx_new), (K, k, dV)

    (_, _), (Ks, ks, dVs) = jax.lax.scan(
        step, (cxT, cxxT), (fx, fu, cx, cu, cxx, cuu, cux), reverse=True)
    dV = jnp.sum(dVs, axis=0)
    return Ks, ks, dV


def _forward_pass(dyn, cost_fn, xs, us, Ks, ks, alphas, T):
    """Parallel line search: roll out all alphas, pick the best."""

    def rollout_alpha(alpha):
        def step(x, inp):
            x_ref, u_ref, K, k = inp
            u = u_ref + alpha * k + K @ (x - x_ref)
            x1 = dyn(x, u)
            return x1, (x1, u)

        _, (xs1, us1) = jax.lax.scan(
            step, xs[0], (xs[:-1], us, Ks, ks))
        xs_new = jnp.concatenate([xs[:1], xs1], axis=0)
        cost = _total_cost(cost_fn, xs_new, us1, T)
        return xs_new, us1, cost

    xs_all, us_all, costs = jax.vmap(rollout_alpha)(jnp.asarray(alphas))
    best = jnp.argmin(costs)
    return (jax.tree.map(lambda a: a[best], (xs_all, us_all)),
            costs[best])


@partial(jax.jit, static_argnames=("dyn", "cost_fn", "cfg"))
def ilqr_solve(dyn: Callable, cost_fn: Callable, x0: jax.Array,
               us_init: jax.Array, cfg: ILQRConfig) -> ILQRSolution:
    """Solve one trajectory-optimization problem (single scenario).

    Batch over scenarios with `jax.vmap(lambda x0, us: ilqr_solve(...))`.
    """
    T = cfg.horizon
    xs = _rollout(dyn, x0, us_init)
    cost = _total_cost(cost_fn, xs, us_init, T)
    alphas = jnp.asarray(cfg.alphas)

    def iteration(carry, _):
        xs, us, cost, reg, improved_prev = carry
        fx, fu, cx, cu, cxx, cuu, cux, cxT, cxxT = _linearize(
            dyn, cost_fn, xs, us, T)
        if cfg.parallel_backward:
            from pointfoot_tpu.mpc.riccati import parallel_backward_pass

            Ks, ks, dV = parallel_backward_pass(
                fx, fu, cx, cu, cxx, cuu, cux, cxT, cxxT, reg)
        else:
            Ks, ks, dV = backward_pass(
                fx, fu, cx, cu, cxx, cuu, cux, cxT, cxxT, reg)
        (xs_new, us_new), cost_new = _forward_pass(
            dyn, cost_fn, xs, us, Ks, ks, alphas, T)
        improved = cost_new < cost - 1e-9
        # LM-style regularization schedule
        reg = jnp.where(improved,
                        jnp.maximum(reg * 0.5, cfg.reg_min),
                        jnp.minimum(reg * 10.0, cfg.reg_max))
        xs = jnp.where(improved, xs_new, xs)
        us = jnp.where(improved, us_new, us)
        cost = jnp.where(improved, cost_new, cost)
        return (xs, us, cost, reg, improved), Ks

    (xs, us, cost, _, improved), Ks_hist = jax.lax.scan(
        iteration, (xs, us_init, cost, jnp.asarray(cfg.reg_init), False),
        None, length=cfg.iterations)
    return ILQRSolution(xs=xs, us=us, cost=cost, gains_K=Ks_hist[-1],
                        improved=improved)
