"""Single-rigid-body (SRB) MPC: the real-time 50 Hz planning layer.

Full-model iLQR over the articulated dynamics (mpc/ilqr.py) is the
high-fidelity trajectory optimizer; its per-tick cost (thousands of
jacobian-of-physics evaluations per scenario) puts 4096-scenario real-time
out of reach on one chip.  Production legged MPC plans with a reduced model
instead (MIT Cheetah convex MPC lineage): the robot is a single rigid body
with frozen world-frame inertia, controls are ground-reaction forces at the
stance feet, and the resulting time-varying LQR solves in ONE Riccati sweep
— a few hundred FLOPs per step, which is what lets thousands of scenarios
re-plan at 50 Hz on one TPU chip (BASELINE.json's ">=4096-scenario MPC at
real-time rate" target).

State  x = [p(3), rotvec(3), v(3), w(3)]  (world frame)
Input  u = [f_1(3), ..., f_nf(3)]         world foot forces
Dynamics (dt-discretized, inertia/foot positions frozen over the horizon):
    p'  = p + dt v
    th' = th + dt w
    v'  = v + dt (sum f_i / m + g)
    w'  = w + dt I^-1 sum r_i x f_i
Cost: velocity/height/orientation tracking from the task reward scales +
force regularization; swing feet are removed from the force set by zeroing
their columns (contact mask).  Torques: tau = sum J_i^T f_i on stance legs,
PD to the default pose on swing legs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pointfoot_tpu.mpc import riccati
from pointfoot_tpu.ops import quat as quat_ops
from pointfoot_tpu.ops import spatial
from pointfoot_tpu.physics import dynamics
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState, RobotModel


@dataclass(frozen=True)
class SRBConfig:
    # 12 steps x 20 ms = 240 ms lookahead (MIT convex-MPC uses ~10 steps)
    horizon: int = 12
    dt: float = 0.02
    w_vel: float = 10.0
    w_height: float = 50.0
    w_orient: float = 30.0
    w_omega: float = 2.0
    w_pos: float = 0.0
    w_force_normal: float = 1e-4
    w_force_tangent: float = 5e-3  # soft friction-cone: tangential force »
    mu: float = 0.7
    height_target: float = 0.62
    f_max: float = 400.0
    kp_swing: float = 40.0
    kd_swing: float = 1.5
    kp_stance: float = 5.0  # light posture hold against joint-space drift
    kd_stance: float = 1.0


class SRBPlan(NamedTuple):
    forces: jax.Array  # (T, nf, 3) planned world foot forces
    xs: jax.Array  # (T+1, 12) planned SRB states


def _srb_matrices(mass, inertia_w_inv, foot_rel, contact, cfg: SRBConfig):
    """Time-invariant (over the horizon) dynamics matrices F, L."""
    n = 12
    nf = foot_rel.shape[0]
    m = nf * 3
    dt = cfg.dt
    F = jnp.eye(n)
    F = F.at[0:3, 6:9].add(dt * jnp.eye(3))
    F = F.at[3:6, 9:12].add(dt * jnp.eye(3))
    L = jnp.zeros((n, m))
    for i in range(nf):
        gate = contact[i]
        L = L.at[6:9, 3 * i:3 * i + 3].set(
            gate * dt / mass * jnp.eye(3))
        L = L.at[9:12, 3 * i:3 * i + 3].set(
            gate * dt * inertia_w_inv @ spatial.skew(foot_rel[i]))
    return F, L


def srb_problem(model: RobotModel, phys: PhysicsState, params: PhysicsParams,
                foot_pos: jax.Array, contact: jax.Array, command: jax.Array,
                cfg: SRBConfig, kin=None, height_ref=None):
    """Assemble the per-scenario LQR problem (F, c_tot, L, Xd, Ud, XTd,
    x0, f_ff) — shared by the XLA and Pallas solvers.

    height_ref: optional world-z base-height reference (terrain-following
    callers pass local-ground + cfg.height_target); None keeps the
    flat-ground absolute cfg.height_target.
    """
    mass = jnp.sum(model.mass) + params.added_mass
    # world-frame inertia about the CoM (frozen)
    if kin is None:
        kin = dynamics.forward_kinematics(model, phys, params)
    com = jnp.sum(model.mass[:, None] * kin.com_w, axis=0) / jnp.sum(model.mass)
    I_w = _srb_inertia(model, kin, com)
    from pointfoot_tpu.ops import linalg as linalg_ops

    I_inv = linalg_ops.inv3(I_w + 1e-6 * jnp.eye(3))

    foot_rel = foot_pos - com
    F, L = _srb_matrices(mass, I_inv, foot_rel, contact, cfg)
    n = 12

    # gravity enters as the affine drift c
    c = jnp.zeros(n).at[8].add(-9.81 * cfg.dt)

    # reference state: current pos, zero tilt, commanded velocity
    yaw = quat_ops.yaw(phys.base_quat)
    cmd_world = quat_ops.rotate(
        quat_ops.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), yaw),
        jnp.asarray([command[0], command[1], 0.0]))
    h_ref = cfg.height_target if height_ref is None else height_ref
    x_ref = jnp.concatenate([
        phys.base_pos.at[2].set(h_ref) * jnp.asarray([0.0, 0.0, 1.0]),
        jnp.zeros(3).at[2].set(0.0),
        cmd_world,
        jnp.zeros(3).at[2].set(command[2]),
    ])

    Xd = jnp.asarray(
        [cfg.w_pos, cfg.w_pos, cfg.w_height,
         cfg.w_orient, cfg.w_orient, 0.0,
         cfg.w_vel, cfg.w_vel, cfg.w_vel,
         cfg.w_omega, cfg.w_omega, cfg.w_vel])
    Ud = jnp.tile(jnp.asarray(
        [cfg.w_force_tangent, cfg.w_force_tangent, cfg.w_force_normal]),
        foot_rel.shape[0])

    # current SRB state (deviation form: x - x_ref; positions relative)
    x0 = jnp.concatenate([
        (phys.base_pos * jnp.asarray([0.0, 0.0, 1.0])),
        quat_ops.to_rotvec(
            quat_ops.mul(phys.base_quat, quat_ops.conjugate(
                quat_ops.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), yaw)))),
        phys.base_lin_vel,
        phys.base_ang_vel,
    ]) - x_ref

    f_ff = _static_ff(foot_rel, contact, mass)
    c_tot = c + L @ f_ff  # drift with feedforward applied (now ~zero)
    return F, c_tot, L, Xd, Ud, 5.0 * Xd, x0, f_ff


def _srb_inertia(model, kin, com):
    """Whole-robot world-frame rotational inertia about the CoM.

    A trunk-only variant was measured as a band-aid for a 50 Hz quadruped
    loop (it hides the swing-leg reaction moment the SRB model cannot
    see); at the validated 200 Hz control rate the whole-robot inertia is
    strictly better (max tilt 0.08 vs a persistent -0.3 pitch offset), so
    the option was removed.
    """
    I_w = jnp.zeros((3, 3))
    for b in range(model.nb):
        d = kin.com_w[b] - com
        I_w = I_w + kin.inertia_w[b] + model.mass[b] * (
            jnp.dot(d, d) * jnp.eye(3) - jnp.outer(d, d))
    return I_w


def _static_ff(foot_rel, contact, mass):
    """Gravity feedforward: MOMENT-BALANCED static force distribution.

    A uniform weight split leaves a residual pitch/roll moment whenever
    the feet are not directly under the CoM; the LQR then discovers that
    REDUCING normal force reduces the tipping moment (the SRB model does
    not know that losing contact means falling) and plans itself to the
    ground.  Solve min ||f|| s.t. sum f = m g, sum r x f = 0 instead.
    """
    nf = foot_rel.shape[0]
    A_rows = []
    for i in range(nf):
        blk = jnp.concatenate(
            [contact[i] * spatial.skew(foot_rel[i]),
             contact[i] * jnp.eye(3)], axis=0)  # (6, 3)
        A_rows.append(blk)
    A_stat = jnp.concatenate(A_rows, axis=1)  # (6, m)
    b_stat = jnp.concatenate(
        [jnp.zeros(3), jnp.asarray([0.0, 0.0, 9.81]) * mass])
    AAt = A_stat @ A_stat.T + 1e-6 * jnp.eye(6)
    from pointfoot_tpu.ops import linalg as _lo

    return A_stat.T @ _lo.chol_solve(AAt, b_stat)


def srb_problem_sched(model: RobotModel, phys: PhysicsState,
                      params: PhysicsParams, foot_pos: jax.Array,
                      contact_seq: jax.Array, command: jax.Array,
                      cfg: SRBConfig, kin=None, height_ref=None):
    """srb_problem with a CONTACT SCHEDULE over the horizon.

    The frozen-contact problem makes roll about a two-point support line
    uncontrollable for the whole lookahead — fatal for a quadruped trot,
    whose diagonal stance pairs alternate faster than the horizon.  The
    production convex-MPC formulation (Di Carlo 2018, MIT Cheetah 3 —
    public method) gates the force columns per STEP from the gait clock's
    future stance masks, so the planner corrects roll using the NEXT
    diagonal.  Swing feet should be passed at their predicted touchdown
    (step target), not their current airborne position.

    contact_seq: (T, nf) per-horizon-step stance gates.
    Returns (F, c_seq (T,n), L_seq (T,n,m), Xd, Ud, XTd, x0, f_ff_seq
    (T,m)).
    """
    mass = jnp.sum(model.mass) + params.added_mass
    if kin is None:
        kin = dynamics.forward_kinematics(model, phys, params)
    com = jnp.sum(model.mass[:, None] * kin.com_w, axis=0) / jnp.sum(model.mass)
    I_w = _srb_inertia(model, kin, com)
    from pointfoot_tpu.ops import linalg as linalg_ops

    I_inv = linalg_ops.inv3(I_w + 1e-6 * jnp.eye(3))
    foot_rel = foot_pos - com
    n = 12
    c = jnp.zeros(n).at[8].add(-9.81 * cfg.dt)

    def per_step(ct):
        F, L = _srb_matrices(mass, I_inv, foot_rel, ct, cfg)
        f_ff = _static_ff(foot_rel, ct, mass)
        return F, L, f_ff, c + L @ f_ff

    F_seq, L_seq, f_ff_seq, c_seq = jax.vmap(per_step)(contact_seq)
    F = F_seq[0]  # time-invariant (contact only enters L)

    yaw = quat_ops.yaw(phys.base_quat)
    cmd_world = quat_ops.rotate(
        quat_ops.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), yaw),
        jnp.asarray([command[0], command[1], 0.0]))
    h_ref = cfg.height_target if height_ref is None else height_ref
    x_ref = jnp.concatenate([
        phys.base_pos.at[2].set(h_ref) * jnp.asarray([0.0, 0.0, 1.0]),
        jnp.zeros(3),
        cmd_world,
        jnp.zeros(3).at[2].set(command[2]),
    ])
    Xd = jnp.asarray(
        [cfg.w_pos, cfg.w_pos, cfg.w_height,
         cfg.w_orient, cfg.w_orient, 0.0,
         cfg.w_vel, cfg.w_vel, cfg.w_vel,
         cfg.w_omega, cfg.w_omega, cfg.w_vel])
    Ud = jnp.tile(jnp.asarray(
        [cfg.w_force_tangent, cfg.w_force_tangent, cfg.w_force_normal]),
        foot_rel.shape[0])
    x0 = jnp.concatenate([
        (phys.base_pos * jnp.asarray([0.0, 0.0, 1.0])),
        quat_ops.to_rotvec(
            quat_ops.mul(phys.base_quat, quat_ops.conjugate(
                quat_ops.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), yaw)))),
        phys.base_lin_vel,
        phys.base_ang_vel,
    ]) - x_ref
    return F, c_seq, L_seq, Xd, Ud, 5.0 * Xd, x0, f_ff_seq


def _project_cone(fs: jax.Array, cfg: SRBConfig) -> jax.Array:
    """Unilateral + friction-cone projection, fs (..., T, nf, 3)."""
    fz = jnp.clip(fs[..., 2], 0.0, cfg.f_max)
    fxy = jnp.clip(fs[..., :2], -cfg.mu * fz[..., None],
                   cfg.mu * fz[..., None])
    return jnp.concatenate([fxy, fz[..., None]], axis=-1)


def srb_plan(model: RobotModel, phys: PhysicsState, params: PhysicsParams,
             foot_pos: jax.Array, contact: jax.Array, command: jax.Array,
             cfg: SRBConfig, kin=None) -> SRBPlan:
    """One 50 Hz re-plan for a single scenario (vmap over scenarios).

    foot_pos: (nf, 3) current world foot positions; contact: (nf,) {0,1}
    stance mask; command: (3,) desired (vx, vy, wz) in the base frame.
    Pass `kin` to reuse an existing forward-kinematics evaluation.
    """
    F, c_tot, L, Xd, Ud, XTd, x0, f_ff = srb_problem(
        model, phys, params, foot_pos, contact, command, cfg, kin=kin)
    T = cfg.horizon
    n, m = F.shape[0], L.shape[1]
    U = jnp.diag(Ud)
    Fs = jnp.broadcast_to(F, (T, n, n))
    cs = jnp.broadcast_to(c_tot, (T, n))
    Ls = jnp.broadcast_to(L, (T, n, m))
    Xs = jnp.broadcast_to(jnp.diag(Xd), (T, n, n))
    Us = jnp.broadcast_to(U, (T, m, m))

    Ps, ps = riccati.sequential_lqr_value(Fs, cs, Ls, Xs, Us, jnp.diag(XTd))

    def rollout(x, t):
        K, d = riccati.lqr_gains_from_value(F, c_tot, L, U, Ps[t + 1],
                                            ps[t + 1])
        du = -K @ x - d
        f = f_ff + du
        x1 = F @ x + c_tot + L @ du
        return x1, (f, x1)

    _, (fs, xs) = jax.lax.scan(rollout, x0, jnp.arange(T))
    fs = _project_cone(fs.reshape(T, -1, 3), cfg)
    return SRBPlan(forces=fs, xs=jnp.concatenate([x0[None], xs], axis=0))


def _foot_ancestors(model: RobotModel, cidx) -> tuple:
    """Joint indices on the path base -> foot sphere's body (static)."""
    b = model.collision_body[cidx]
    path = []
    while b > 0:
        path.append(b - 1)
        b = model.parent[b]
    return tuple(reversed(path))


def forces_to_torques(model: RobotModel, phys: PhysicsState,
                      params: PhysicsParams, feet_idx, forces: jax.Array,
                      contact: jax.Array, default_qpos, cfg: SRBConfig,
                      kin=None) -> jax.Array:
    """Stance legs realize the planned ground reaction: tau = C_j - J^T f
    (gravity/bias compensation + force mapping over the foot's ANCESTOR
    joints only — other legs' columns are zero), with light joint damping
    against internal buckling; swing legs run PD to the default pose."""
    if kin is None:
        kin = dynamics.forward_kinematics(model, phys, params)
    S = dynamics.motion_subspaces(model, kin, phys.base_pos)
    body_vel = dynamics.body_spatial_velocities(model, phys, S)
    C = dynamics.bias_forces(model, params, kin, S, phys.qvel, body_vel,
                             phys.base_pos)
    nj = model.nj
    tau = jnp.zeros(nj)
    stance_mask = jnp.zeros(nj)
    for k, cidx in enumerate(feet_idx):
        b = model.collision_body[cidx]
        p = kin.body_pos[b] + kin.body_rot[b] @ model.collision_offset[cidx]
        rel = p - phys.base_pos
        for j in _foot_ancestors(model, cidx):
            col = S[6 + j, 3:] + jnp.cross(S[6 + j, :3], rel)
            tau = tau.at[j].add(contact[k] * (-col @ forces[k]))
            stance_mask = stance_mask.at[j].add(contact[k])
    stance_mask = jnp.minimum(stance_mask, 1.0)
    # bias compensation + stabilizing joint damping on stance legs
    tau = tau + stance_mask * (C[6:] - cfg.kd_stance * phys.qvel
                               + cfg.kp_stance * (default_qpos - phys.qpos))
    pd = cfg.kp_swing * (default_qpos - phys.qpos) - cfg.kd_swing * phys.qvel
    tau = tau + (1.0 - stance_mask) * pd
    return jnp.clip(tau, -model.effort_limit, model.effort_limit)


class SRBController:
    """Batched SRB-MPC: 50 Hz force re-planning + 200 Hz leg torque loop.

    Two-rate structure (what real convex-MPC stacks run): `plan` produces
    ground-reaction force schedules at the control rate; `leg_torques`
    re-maps the held plan force to joint torques at the SIM substep rate
    using the current kinematics — without the fast remap, feedforward
    torques go stale within a tick and the stance legs buckle.
    """

    def __init__(self, model: RobotModel, params_single: PhysicsParams,
                 feet_idx, default_qpos, cfg: SRBConfig = SRBConfig()):
        self.model = model
        self.params = params_single
        self.feet_idx = tuple(feet_idx)
        self.default_qpos = jnp.asarray(default_qpos)
        self.cfg = cfg

    @partial(jax.jit, static_argnums=0)
    def plan(self, phys: PhysicsState, foot_pos: jax.Array,
             contact: jax.Array, command: jax.Array) -> SRBPlan:
        """(B, ...) batched re-plan; returns stacked SRBPlans."""
        return jax.vmap(
            lambda p, fp, ct, cmd: srb_plan(
                self.model, p, self.params, fp, ct, cmd, self.cfg)
        )(phys, foot_pos, contact, command)

    @partial(jax.jit, static_argnums=0)
    def leg_torques(self, phys: PhysicsState, forces: jax.Array,
                    contact: jax.Array) -> jax.Array:
        """(B, nf, 3) planned forces -> (B, nj) torques at current state."""
        return jax.vmap(
            lambda p, f, ct: forces_to_torques(
                self.model, p, self.params, self.feet_idx, f, ct,
                self.default_qpos, self.cfg)
        )(phys, forces, contact)

    @partial(jax.jit, static_argnums=0)
    def control(self, phys: PhysicsState, foot_pos: jax.Array,
                contact: jax.Array, command: jax.Array):
        """One-shot: plan + map the first force (single-rate convenience)."""
        plans = self.plan(phys, foot_pos, contact, command)
        tau = self.leg_torques(phys, plans.forces[:, 0], contact)
        return tau, plans

    @partial(jax.jit, static_argnums=0)
    def plan_tick_pallas(self, phys: PhysicsState, command: jax.Array):
        """Fused tick with the batch-level Pallas SRB-LQR kernel
        (ops/pallas/riccati.py): problem assembly and torque mapping stay
        vmapped XLA; the Riccati sweep + rollout run as ONE kernel."""
        from pointfoot_tpu.ops.pallas.riccati import pallas_srb_lqr

        nf = len(self.feet_idx)

        def prep(p, cmd):
            kin = dynamics.forward_kinematics(self.model, p, self.params)
            fps, contact = [], []
            for cidx in self.feet_idx:
                b = self.model.collision_body[cidx]
                fps.append(kin.body_pos[b] + kin.body_rot[b]
                           @ self.model.collision_offset[cidx])
                contact.append(
                    (p.contact_force[cidx, 2] > 1.0).astype(jnp.float32))
            foot_pos = jnp.stack(fps)
            ct = jnp.stack(contact)
            ct = jnp.where(jnp.sum(ct) > 0, ct, jnp.ones_like(ct))
            prob = srb_problem(self.model, p, self.params, foot_pos, ct, cmd,
                               self.cfg, kin=kin)
            return prob, ct

        probs, ct = jax.vmap(prep)(phys, command)
        fs = pallas_srb_lqr(*probs, horizon=self.cfg.horizon)  # (B, T, m)
        B, T = fs.shape[0], fs.shape[1]
        fs = _project_cone(fs.reshape(B, T, nf, 3), self.cfg)
        tau = self.leg_torques(phys, fs[:, 0], ct)
        return tau, fs

    @partial(jax.jit, static_argnums=0)
    def plan_tick(self, phys: PhysicsState, command: jax.Array):
        """Fused 50 Hz tick: ONE forward-kinematics evaluation shared by
        foot positions, contact detection, the SRB plan, and the torque map.
        Returns (torques (B, nj), plans)."""

        def one(p, cmd):
            kin = dynamics.forward_kinematics(self.model, p, self.params)
            fps, contact = [], []
            for k, cidx in enumerate(self.feet_idx):
                b = self.model.collision_body[cidx]
                fp = (kin.body_pos[b]
                      + kin.body_rot[b] @ self.model.collision_offset[cidx])
                fps.append(fp)
                contact.append(
                    (p.contact_force[cidx, 2] > 1.0).astype(jnp.float32))
            foot_pos = jnp.stack(fps)
            ct = jnp.stack(contact)
            ct = jnp.where(jnp.sum(ct) > 0, ct, jnp.ones_like(ct))
            plan = srb_plan(self.model, p, self.params, foot_pos, ct, cmd,
                            self.cfg, kin=kin)
            tau = forces_to_torques(
                self.model, p, self.params, self.feet_idx, plan.forces[0],
                ct, self.default_qpos, self.cfg, kin=kin)
            return tau, plan

        return jax.vmap(one)(phys, command)
