"""Gait / stepping layer over the SRB force planner: point-foot biped MPC.

A point foot gives the biped a line-segment support region, so standing SRB
balance is structurally impossible — bipeds balance by STEPPING (which is
what the RL policy learns).  This module adds the classic
Raibert-heuristic stepping stack (MIT Mini-Cheetah controller lineage,
public method) on top of mpc/srb.py:

* gait clock: phase in [0, 1), two legs offset by half a period; a leg is
  in stance while its local phase < duty;
* footstep targets: p_des = p_hip_proj + v T_st/2 + k_v (v - v_cmd)
  (the Raibert heuristic), capped to a reachable radius;
* swing trajectory: linear xy blend liftoff -> target with a sin-profile
  apex; swing legs tracked with task-space PD mapped through J^T;
* stance legs: SRB ground-reaction forces (srb_plan with the scheduled
  contact mask) realized via tau = C_j - J^T f.

Everything is batched (vmap over scenarios) and jit-safe; `GaitState` is a
small pytree carried across control ticks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pointfoot_tpu.mpc.srb import (
    SRBConfig, _foot_ancestors, _project_cone, srb_problem)
from pointfoot_tpu.mpc import riccati
from pointfoot_tpu.ops import quat as quat_ops
from pointfoot_tpu.physics import dynamics
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState, RobotModel


@dataclass(frozen=True)
class GaitConfig:
    period: float = 0.4  # [s] full gait cycle
    duty: float = 0.55  # stance fraction per leg
    swing_height: float = 0.07  # [m] apex
    k_raibert: float = 0.04  # velocity-error foot placement gain
    step_reach: float = 0.25  # [m] max step offset from hip
    kp_cart: float = 300.0  # swing task-space stiffness
    kd_cart: float = 8.0


class GaitState(NamedTuple):
    phase: jax.Array  # (B,) gait clock in [0, 1)
    liftoff_pos: jax.Array  # (B, nf, 3) foot position at last liftoff
    target_pos: jax.Array  # (B, nf, 3) current step target


def _leg_phase(phase, leg_offset):
    return jnp.mod(phase + leg_offset, 1.0)


class SteppingController:
    """Biped walking: SRB stance forces + Raibert swing stepping."""

    def __init__(self, model: RobotModel, params_single: PhysicsParams,
                 feet_idx, default_qpos, srb_cfg: SRBConfig = SRBConfig(),
                 gait_cfg: GaitConfig = GaitConfig(), dt: float = 0.02):
        self.model = model
        self.params = params_single
        self.feet_idx = tuple(feet_idx)
        self.nf = len(self.feet_idx)
        self.default_qpos = jnp.asarray(default_qpos)
        self.srb = srb_cfg
        self.gait = gait_cfg
        self.dt = dt
        # leg phase offsets: alternating for a biped (0, 0.5, ...)
        self.offsets = jnp.asarray(
            [i / self.nf for i in range(self.nf)], jnp.float32)
        # hip anchor in base frame per foot: joint anchor of the leg's first
        # joint (abad) projected later
        self._hip_joint = tuple(
            _foot_ancestors(model, c)[0] for c in self.feet_idx)

    def init(self, batch: int, phys: PhysicsState) -> GaitState:
        fp = jax.vmap(lambda p: self._foot_positions(p)[0])(phys)
        return GaitState(
            phase=jnp.zeros(batch),
            liftoff_pos=fp,
            target_pos=fp,
        )

    # ------------------------------------------------------------------

    def _foot_positions(self, phys: PhysicsState):
        kin = dynamics.forward_kinematics(self.model, phys, self.params)
        pts, hips = [], []
        for k, cidx in enumerate(self.feet_idx):
            b = self.model.collision_body[cidx]
            pts.append(kin.body_pos[b]
                       + kin.body_rot[b] @ self.model.collision_offset[cidx])
            j = self._hip_joint[k]
            hips.append(kin.joint_anchor[j])
        return jnp.stack(pts), jnp.stack(hips), kin

    def _swing_torque(self, phys, kin, cidx, p_des, v_des):
        """Task-space PD on the swing foot through the leg Jacobian."""
        b = self.model.collision_body[cidx]
        p = kin.body_pos[b] + kin.body_rot[b] @ self.model.collision_offset[cidx]
        S = dynamics.motion_subspaces(self.model, kin, phys.base_pos)
        body_vel = dynamics.body_spatial_velocities(self.model, phys, S)
        from pointfoot_tpu.ops import spatial

        rel = p - phys.base_pos
        v_p = spatial.point_velocity(body_vel[b], rel)
        f = (self.gait.kp_cart * (p_des - p)
             + self.gait.kd_cart * (v_des - v_p))
        tau = jnp.zeros(self.model.nj)
        for j in _foot_ancestors(self.model, cidx):
            col = S[6 + j, 3:] + jnp.cross(S[6 + j, :3], rel)
            tau = tau.at[j].add(col @ f)
        return tau

    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def control(self, phys: PhysicsState, command: jax.Array,
                gait: GaitState) -> Tuple[jax.Array, GaitState]:
        """One 50 Hz tick: returns (torques (B, nj), new GaitState)."""
        g = self.gait

        def one(p, cmd, phase, liftoff, target):
            foot_pos, hips, kin = self._foot_positions(p)
            leg_ph = _leg_phase(phase, self.offsets)  # (nf,)
            stance = (leg_ph < g.duty).astype(jnp.float32)

            new_phase = jnp.mod(phase + self.dt / g.period, 1.0)
            new_leg_ph = _leg_phase(new_phase, self.offsets)
            new_stance = (new_leg_ph < g.duty).astype(jnp.float32)
            just_lifted = (stance > 0.5) & (new_stance < 0.5)

            # Raibert footstep target (world), terrain-relative z from hips
            yaw = quat_ops.yaw(p.base_quat)
            v = p.base_lin_vel
            v_cmd_w = quat_ops.rotate(
                quat_ops.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), yaw),
                jnp.asarray([cmd[0], cmd[1], 0.0]))
            T_st = g.duty * g.period
            offset = (v * T_st / 2 + g.k_raibert * (v - v_cmd_w))
            offset = offset.at[2].set(0.0)
            norm = jnp.linalg.norm(offset[:2])
            offset = offset * jnp.minimum(
                1.0, g.step_reach / jnp.maximum(norm, 1e-6))
            hip_proj = hips.at[:, 2].set(foot_pos[:, 2])
            tgt = hip_proj + offset[None, :]

            new_liftoff = jnp.where(just_lifted[:, None], foot_pos, liftoff)
            new_target = jnp.where(just_lifted[:, None], tgt, target)

            # SRB stance forces with the CURRENT stance mask (all-stance
            # fallback if airborne)
            ct = jnp.where(jnp.sum(stance) > 0, stance, jnp.ones_like(stance))
            prob = srb_problem(self.model, p, self.params, foot_pos, ct, cmd,
                               self.srb, kin=kin)
            F, c_tot, L, Xd, Ud, XTd, x0, f_ff = prob
            T = self.srb.horizon
            n, m = F.shape[0], L.shape[1]
            U = jnp.diag(Ud)
            Ps, ps = riccati.sequential_lqr_value(
                jnp.broadcast_to(F, (T, n, n)),
                jnp.broadcast_to(c_tot, (T, n)),
                jnp.broadcast_to(L, (T, n, m)),
                jnp.broadcast_to(jnp.diag(Xd), (T, n, n)),
                jnp.broadcast_to(U, (T, m, m)), jnp.diag(XTd))
            K, d = riccati.lqr_gains_from_value(F, c_tot, L, U, Ps[1], ps[1])
            f0 = f_ff + (-K @ x0 - d)
            f0 = _project_cone(f0.reshape(self.nf, 3)[None], self.srb)[0]

            # stance torques: bias comp + J^T f + damping
            S = dynamics.motion_subspaces(self.model, kin, p.base_pos)
            body_vel = dynamics.body_spatial_velocities(self.model, p, S)
            C = dynamics.bias_forces(self.model, self.params, kin, S, p.qvel,
                                     body_vel, p.base_pos)
            nj = self.model.nj
            tau = jnp.zeros(nj)
            stance_mask_j = jnp.zeros(nj)
            swing_mask_j = jnp.zeros(nj)
            for k, cidx in enumerate(self.feet_idx):
                b = self.model.collision_body[cidx]
                pfo = (kin.body_pos[b]
                       + kin.body_rot[b] @ self.model.collision_offset[cidx])
                rel = pfo - p.base_pos
                for j in _foot_ancestors(self.model, cidx):
                    col = S[6 + j, 3:] + jnp.cross(S[6 + j, :3], rel)
                    tau = tau.at[j].add(ct[k] * stance[k] * (-col @ f0[k]))
                    stance_mask_j = stance_mask_j.at[j].add(stance[k])
                    swing_mask_j = swing_mask_j.at[j].add(1.0 - stance[k])
            stance_mask_j = jnp.minimum(stance_mask_j, 1.0)
            swing_mask_j = jnp.minimum(swing_mask_j, 1.0)
            tau = tau + stance_mask_j * (
                C[6:] - self.srb.kd_stance * p.qvel)

            # swing torques: task-space PD along the swing trajectory
            for k, cidx in enumerate(self.feet_idx):
                s_ph = jnp.clip((leg_ph[k] - g.duty) / (1.0 - g.duty), 0, 1)
                p_lo = new_liftoff[k]
                p_tg = new_target[k]
                p_des = p_lo + (p_tg - p_lo) * s_ph
                z_base = p_lo[2] + (p_tg[2] - p_lo[2]) * s_ph
                p_des = p_des.at[2].set(
                    z_base + g.swing_height * jnp.sin(jnp.pi * s_ph))
                v_des = (p_tg - p_lo) / ((1.0 - g.duty) * g.period)
                v_des = v_des.at[2].set(0.0)
                tau_sw = self._swing_torque(p, kin, cidx, p_des, v_des)
                tau = tau + (1.0 - stance[k]) * tau_sw
            # gravity bias for swing-leg joints too
            tau = tau + swing_mask_j * (1.0 - stance_mask_j) * C[6:] * 0.0
            tau = jnp.clip(tau, -self.model.effort_limit,
                           self.model.effort_limit)
            return tau, new_phase, new_liftoff, new_target

        tau, phase, liftoff, target = jax.vmap(one)(
            phys, command, gait.phase, gait.liftoff_pos, gait.target_pos)
        return tau, GaitState(phase=phase, liftoff_pos=liftoff,
                              target_pos=target)
