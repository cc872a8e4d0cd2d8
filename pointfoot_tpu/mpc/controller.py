"""Receding-horizon MPC controller over the differentiable physics step.

Runs iLQR at the reference's 50 Hz control rate (policy dt 0.02 s,
pointfoot_rough_config.py:95,197) with warm-started control trajectories:
each control tick shifts the previous solution one step and re-solves a few
iterations.  Batched over scenarios with vmap — the BASELINE.json target is
>=4096 scenarios at real-time rate on one chip.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from pointfoot_tpu.mpc.costs import (
    CostWeights, pointfoot_stage_cost, state_to_vec, vec_to_state)
from pointfoot_tpu.mpc.ilqr import ILQRConfig, ilqr_solve
from pointfoot_tpu.physics import dynamics
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState, RobotModel


class MPCState(NamedTuple):
    us_warm: jax.Array  # (B, T, m) warm-start control trajectory
    last_cost: jax.Array  # (B,)


class MPCController:
    """Batched receding-horizon torque controller for a legged robot."""

    def __init__(self, model: RobotModel, params: PhysicsParams,
                 height_fn: Callable, default_qpos,
                 weights: CostWeights = CostWeights(),
                 cfg: ILQRConfig = ILQRConfig(horizon=25, iterations=3),
                 dt: float = 0.02, substeps: int = 1):
        self.model = model
        self.params = params  # single-env params used inside the planner
        self.height_fn = height_fn
        self.default_qpos = jnp.asarray(default_qpos)
        self.weights = weights
        self.cfg = cfg
        self.dt = dt
        self.substeps = substeps
        self.nj = model.nj
        self.nx = 12 + 2 * model.nj

        template = PhysicsState.default(model, default_qpos)
        self._template = template

        def dyn(x, u):
            phys = vec_to_state(x, template, self.nj)
            u_clip = jnp.clip(u, -model.effort_limit, model.effort_limit)
            for _ in range(substeps):
                phys = dynamics.step(model, params, phys, u_clip, height_fn,
                                     dt / substeps)
            return state_to_vec(phys)

        self.dyn = dyn

    def init(self, batch: int) -> MPCState:
        return MPCState(
            us_warm=jnp.zeros((batch, self.cfg.horizon, self.nj)),
            last_cost=jnp.full((batch,), jnp.inf),
        )

    @partial(jax.jit, static_argnums=0)
    def plan(self, phys: PhysicsState, command: jax.Array,
             mpc_state: MPCState):
        """One 50 Hz control tick for a batch of scenarios.

        phys: batched PhysicsState (B, ...); command: (B, 3).
        Returns (torque (B, nj), new MPCState, cost (B,)).
        """
        cost_builder = lambda cmd: pointfoot_stage_cost(
            self.model, self.weights, self.default_qpos, cmd,
            self.cfg.horizon)

        def solve_one(p, cmd, us_warm):
            x0 = state_to_vec(p)
            sol = ilqr_solve(self.dyn, cost_builder(cmd), x0, us_warm,
                             self.cfg)
            return sol

        sols = jax.vmap(solve_one)(phys, command, mpc_state.us_warm)
        torque = sols.us[:, 0]
        # shift warm start: drop first, repeat last
        us_shift = jnp.concatenate(
            [sols.us[:, 1:], sols.us[:, -1:]], axis=1)
        return torque, MPCState(us_warm=us_shift, last_cost=sols.cost), sols.cost
