"""Pallas TPU kernels for the hot small-matrix factorizations."""

from pointfoot_tpu.ops.pallas.cholesky import pallas_chol_solve

__all__ = ["pallas_chol_solve"]
