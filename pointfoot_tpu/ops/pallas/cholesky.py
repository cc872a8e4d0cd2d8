"""Batched small-matrix Cholesky solve as a Pallas TPU kernel.

The physics velocity solve and the Riccati/QP factorizations are thousands
of independent tiny (n<=18) SPD solves.  The XLA path (ops/linalg.py) already
unrolls them into fused elementwise ops; this kernel goes one step further
and pins the whole factor+solve in VMEM with the BATCH on the lane axis:

* layout: A is staged as (n*n, B) and b as (n, B) — each (i, j) entry of the
  matrix is a row of 128-lane batches, so every Cholesky operation is one
  VPU op over 128 scenarios;
* the factorization/substitution loops are fully unrolled at trace time
  (n static), giving a straight-line kernel with no control flow;
* grid over B/BLOCK blocks; one HBM read of A,b and one write of x per
  block — the bandwidth lower bound.

`pallas_chol_solve` handles padding to the 128-lane block size and falls
back to the unrolled XLA path on CPU (tests run the kernel via
`interpret=True` for exactness checks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointfoot_tpu.ops import linalg

_BLOCK = 128


def _chol_solve_kernel(n: int, a_ref, b_ref, x_ref):
    """Unrolled Cholesky factor + solve over one lane-block of scenarios.

    a_ref: (n*n, BLOCK) — A[i, j] at row i*n+j;  b_ref/x_ref: (n, BLOCK).
    """
    L = {}
    for j in range(n):
        s = a_ref[j * n + j, :]
        for k in range(j):
            s = s - L[(j, k)] * L[(j, k)]
        d = jnp.sqrt(jnp.maximum(s, 1e-12))
        L[(j, j)] = d
        inv_d = pl.reciprocal(d, approx=False)
        for i in range(j + 1, n):
            s = a_ref[i * n + j, :]
            for k in range(j):
                s = s - L[(i, k)] * L[(j, k)]
            L[(i, j)] = s * inv_d
    # forward substitution L y = b
    y = {}
    for i in range(n):
        s = b_ref[i, :]
        for k in range(i):
            s = s - L[(i, k)] * y[k]
        y[i] = s / L[(i, i)]
    # back substitution L^T x = y
    x = {}
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[(k, i)] * x[k]
        x[i] = s / L[(i, i)]
    for i in range(n):
        x_ref[i, :] = x[i]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_chol_solve_lanes(A_t: jax.Array, b_t: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """Lane-layout entry: A_t (n*n, B), b_t (n, B) -> x_t (n, B).

    Callers that can produce the batch-minor layout directly (e.g.
    `dynamics.step_batched` assembling via ``vmap(..., out_axes=2)``) skip
    the HBM transpose round-trip entirely — this is the round-1 queue item
    "assemble A in the (n*n, B) lane layout".
    """
    nn, B = A_t.shape
    n = b_t.shape[0]
    assert nn == n * n
    Bp = ((B + _BLOCK - 1) // _BLOCK) * _BLOCK
    if Bp != B:
        # pad with identity systems to keep the factorization well-defined
        pad = Bp - B
        eye_flat = jnp.eye(n, dtype=A_t.dtype).reshape(n * n)
        A_t = jnp.concatenate(
            [A_t, jnp.tile(eye_flat[:, None], (1, pad))], axis=1)
        b_t = jnp.concatenate([b_t, jnp.zeros((n, pad), b_t.dtype)], axis=1)

    kernel = functools.partial(_chol_solve_kernel, n)
    x_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, Bp), A_t.dtype),
        grid=(Bp // _BLOCK,),
        in_specs=[
            pl.BlockSpec((n * n, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, _BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A_t, b_t)
    return x_t[:, :B]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_chol_solve(A: jax.Array, b: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """Solve A x = b for a batch of SPD systems: A (B, n, n), b (B, n).

    Uses the Pallas lane-batched kernel on TPU (or interpret mode for
    tests); matches `linalg.chol_solve` to float32 roundoff.
    """
    B, n, _ = A.shape
    A_t = jnp.moveaxis(A.reshape(B, n * n), 0, 1)  # (n*n, B)
    b_t = jnp.moveaxis(b, 0, 1)  # (n, B)
    x_t = pallas_chol_solve_lanes(A_t, b_t, interpret=interpret)
    return jnp.moveaxis(x_t, 0, 1)


def chol_solve_best(A: jax.Array, b: jax.Array) -> jax.Array:
    """Dispatch: Pallas kernel on TPU for large batches, XLA unroll else."""
    B = A.shape[0]
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and B >= _BLOCK:
        return pallas_chol_solve(A, b)
    return linalg.chol_solve(A, b)
