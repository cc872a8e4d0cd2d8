"""MPC state vectorization + stage costs from the PointFoot reward scales.

The 24-d MPC state chart is x = [base_pos(3), rotvec(3), qpos(nj),
base_lin_vel(3), base_ang_vel(3), qvel(nj)] — the quaternion is charted as a
rotation vector so iLQR's additive updates stay on the manifold (small-angle
exactness is all a 50-step horizon needs).

Stage costs re-use the reference reward semantics as penalties
(BASELINE.json north_star "cfg reward scales become stage costs"): velocity
tracking, upright orientation, base height, vertical/roll-pitch velocity
damping, control effort, joint-velocity damping.  Weights default to the
pointfoot_rough scale magnitudes (pointfoot_rough_config.py:131-154),
sign-flipped into costs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pointfoot_tpu.ops import quat as quat_ops
from pointfoot_tpu.physics.model import PhysicsState, RobotModel


def state_to_vec(phys: PhysicsState) -> jax.Array:
    return jnp.concatenate([
        phys.base_pos,
        quat_ops.to_rotvec(phys.base_quat),
        phys.qpos,
        phys.base_lin_vel,
        phys.base_ang_vel,
        phys.qvel,
    ], axis=-1)


def vec_to_state(x: jax.Array, template: PhysicsState, nj: int) -> PhysicsState:
    return PhysicsState(
        base_pos=x[..., 0:3],
        base_quat=quat_ops.from_rotvec(x[..., 3:6]),
        qpos=x[..., 6:6 + nj],
        base_lin_vel=x[..., 6 + nj:9 + nj],
        base_ang_vel=x[..., 9 + nj:12 + nj],
        qvel=x[..., 12 + nj:12 + 2 * nj],
        contact_force=template.contact_force,
    )


@dataclass(frozen=True)
class CostWeights:
    """Stage-cost weights (defaults from pointfoot_rough reward scales)."""

    tracking_lin_vel: float = 10.0
    tracking_ang_vel: float = 5.0
    lin_vel_z: float = 0.5
    ang_vel_xy: float = 0.05
    orientation: float = 5.0
    base_height: float = 10.0
    torques: float = 2.5e-4
    qvel: float = 1e-4
    qpos_home: float = 0.1  # stay near default joint pose
    terminal_scale: float = 5.0
    base_height_target: float = 0.62
    tracking_sigma: float = 0.25


def pointfoot_stage_cost(model: RobotModel, weights: CostWeights,
                         default_qpos, command, horizon: int):
    """Build `cost_fn(x, u, t)` for ilqr_solve.

    `command` = (vx, vy, wz) desired base-frame velocities (the reference
    command triple, cfg commands :78-90).  Terminal step (t == horizon) is
    the state cost scaled by `terminal_scale`, no control term.
    """
    nj = model.nj
    w = weights
    cmd = jnp.asarray(command)

    def cost_fn(x, u, t):
        pos = x[0:3]
        rotvec = x[3:6]
        qpos = x[6:6 + nj]
        lin = x[6 + nj:9 + nj]
        ang = x[9 + nj:12 + nj]
        qvel = x[12 + nj:12 + 2 * nj]
        q = quat_ops.from_rotvec(rotvec)
        v_body = quat_ops.rotate_inverse(q, lin)
        w_body = quat_ops.rotate_inverse(q, ang)
        g_proj = quat_ops.rotate_inverse(q, jnp.asarray([0.0, 0.0, -1.0]))

        c = 0.0
        # tracking terms: quadratic (exp-of-error rewards linearize poorly)
        c += w.tracking_lin_vel * jnp.sum((v_body[:2] - cmd[:2]) ** 2)
        c += w.tracking_ang_vel * (w_body[2] - cmd[2]) ** 2
        c += w.lin_vel_z * v_body[2] ** 2
        c += w.ang_vel_xy * jnp.sum(w_body[:2] ** 2)
        c += w.orientation * jnp.sum(g_proj[:2] ** 2)
        c += w.base_height * (pos[2] - w.base_height_target) ** 2
        c += w.qpos_home * jnp.sum((qpos - default_qpos) ** 2)
        c += w.qvel * jnp.sum(qvel**2)
        ctrl_cost = w.torques * jnp.sum(u**2)
        return jnp.where(t >= horizon, w.terminal_scale * c, c + ctrl_cost)

    return cost_fn
