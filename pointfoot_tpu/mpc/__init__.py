"""Batched MPC / trajectory optimization (SQP/iLQR) — the TPU north star.

No reference counterpart (the reference is RL-only); demanded by
BASELINE.json north_star: the reward scales of the PointFoot task become
stage costs of a receding-horizon iLQR solver over the differentiable
physics step, batched over thousands of scenarios per chip.  The Riccati
backward pass runs either as a `lax.scan` (sequential, minimal latency at
short horizons), as a `lax.associative_scan` (horizon-parallel, the genuine
TPU analogue of sequence parallelism — SURVEY.md §5), or with Pallas
batched small-matrix kernels for the factorizations (ops/pallas/).
"""

from pointfoot_tpu.mpc.ilqr import ILQRConfig, ilqr_solve
from pointfoot_tpu.mpc.costs import pointfoot_stage_cost, CostWeights
from pointfoot_tpu.mpc.controller import MPCController
from pointfoot_tpu.mpc.gait import (
    GaitConfig, SteppingController, TunedStack, heading_command,
    make_controller)

__all__ = ["ILQRConfig", "ilqr_solve", "pointfoot_stage_cost", "CostWeights",
           "MPCController", "GaitConfig", "SteppingController", "TunedStack",
           "heading_command", "make_controller"]
