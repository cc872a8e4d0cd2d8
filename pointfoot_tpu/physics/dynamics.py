"""Articulated floating-base dynamics: FK, CRBA, RNEA, forward dynamics, step.

This is the TPU-native replacement for the PhysX TGS solver the reference
invokes through `gym.simulate` (reference point_foot.py:183-185; solver cfg
pointfoot_rough_config.py:202-213).  Design:

* generalized coordinates: world base pose (pos, quat) + joint angles;
  generalized velocity ``u = [ω_world(3); v_base_world(3); q̇(nj)]`` — matching
  the Isaac Gym root-state convention (world-frame velocities at the actor
  root origin) so state round-trips with the env layer are trivial;
* all spatial algebra in world-aligned axes about the *current base position*
  (see ops/spatial.py) — float32-safe far from the world origin;
* mass matrix via the Composite Rigid Body Algorithm, bias forces via RNEA
  with a gravity pseudo-acceleration, contacts as compliant foot-sphere vs
  heightfield forces mapped through point Jacobians (physics/contact.py);
* every function is a pure single-env computation with static python loops
  over the (small) kinematic tree — callers `vmap` over envs and `lax.scan`
  over decimation substeps, so the whole control step fuses into one XLA
  program running batched 12x12 (biped) linear algebra on the MXU.

Note row ordering: angular before linear in the base block (Featherstone
convention), i.e. u[0:3]=ω, u[3:6]=v.  `PhysicsState` stores them as separate
named fields so no caller ever needs to know.
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pointfoot_tpu.ops import linalg as linalg_ops
from pointfoot_tpu.ops import quat as quat_ops
from pointfoot_tpu.ops import spatial
from pointfoot_tpu.physics import contact as contact_mod
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState, RobotModel

# Terrain height query: (x, y) -> height. Vectorized over trailing shape.
HeightFn = Callable[[jax.Array, jax.Array], jax.Array]


class Kinematics(NamedTuple):
    """World-frame forward kinematics (single env)."""

    body_pos: jax.Array  # (nb, 3) world body-frame origins
    body_rot: jax.Array  # (nb, 3, 3) body->world
    joint_axis_w: jax.Array  # (nj, 3) world joint axes
    joint_anchor: jax.Array  # (nj, 3) world anchors
    com_w: jax.Array  # (nb, 3) world CoM positions
    inertia_w: jax.Array  # (nb, 3, 3) CoM inertia in world axes


def forward_kinematics(
    model: RobotModel, state: PhysicsState, params: PhysicsParams
) -> Kinematics:
    """Compute world poses of all bodies (python loop over static tree)."""
    nb = model.nb
    base_rot = quat_ops.to_matrix(state.base_quat)
    pos = [state.base_pos]
    rot = [base_rot]
    axes, anchors = [], []
    joint_rot_mats = quat_ops.to_matrix(model.joint_rot)  # (nj,3,3)
    for b in range(1, nb):
        j = b - 1
        p = model.parent[b]
        anchor = pos[p] + rot[p] @ model.joint_pos[j]
        frame0 = rot[p] @ joint_rot_mats[j]
        axis_w = frame0 @ model.joint_axis[j]
        q = state.qpos[j]
        rot_b = frame0 @ _axis_angle_mat(model.joint_axis[j], q)
        pos.append(anchor)
        rot.append(rot_b)
        axes.append(axis_w)
        anchors.append(anchor)
    body_pos = jnp.stack(pos)
    body_rot = jnp.stack(rot)
    com_body = model.com
    # base CoM shift from domain randomization (reference point_foot.py:472-477)
    com_body = com_body.at[0].add(params.com_offset)
    com_w = body_pos + jnp.einsum("bij,bj->bi", body_rot, com_body)
    inertia_w = spatial.rotate_inertia(body_rot, model.inertia)
    return Kinematics(
        body_pos=body_pos,
        body_rot=body_rot,
        joint_axis_w=jnp.stack(axes) if nb > 1 else jnp.zeros((0, 3)),
        joint_anchor=jnp.stack(anchors) if nb > 1 else jnp.zeros((0, 3)),
        com_w=com_w,
        inertia_w=inertia_w,
    )


def _axis_angle_mat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Rodrigues rotation matrix about a (constant) unit axis."""
    K = spatial.skew(axis)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3, dtype=axis.dtype) + s * K + (1.0 - c) * (K @ K)


def _effective_masses(model: RobotModel, params: PhysicsParams) -> jax.Array:
    """Per-body masses with randomized base payload (point_foot.py:466-471)."""
    return model.mass.at[0].add(params.added_mass)


def motion_subspaces(model: RobotModel, kin: Kinematics, origin: jax.Array) -> jax.Array:
    """(nv, 6) motion-subspace rows about `origin` (== base pos).

    Base rows are the identity basis because the origin rides the base.
    """
    nj = model.nj
    base = jnp.eye(6, dtype=origin.dtype)
    if nj == 0:
        return base
    anchors_rel = kin.joint_anchor - origin
    joint_rows = spatial.revolute_subspace(kin.joint_axis_w, anchors_rel)
    return jnp.concatenate([base, joint_rows], axis=0)


def body_spatial_velocities(
    model: RobotModel, state: PhysicsState, S: jax.Array
) -> jax.Array:
    """(nb, 6) spatial velocity of each body about the base-origin."""
    v0 = jnp.concatenate([state.base_ang_vel, state.base_lin_vel])
    vels = [v0]
    for b in range(1, model.nb):
        j = b - 1
        vels.append(vels[model.parent[b]] + S[6 + j] * state.qvel[j])
    return jnp.stack(vels)


def mass_matrix(
    model: RobotModel,
    params: PhysicsParams,
    kin: Kinematics,
    S: jax.Array,
    origin: jax.Array,
) -> jax.Array:
    """(nv, nv) joint-space inertia matrix via CRBA (world coordinates)."""
    nb, nj, nv = model.nb, model.nj, model.nv
    masses = _effective_masses(model, params)
    com_rel = kin.com_w - origin
    I_bodies = spatial.spatial_inertia(masses, com_rel, kin.inertia_w)  # (nb,6,6)
    # composite inertias: accumulate children into parents (reverse topological)
    Ic = [I_bodies[b] for b in range(nb)]
    for b in range(nb - 1, 0, -1):
        Ic[model.parent[b]] = Ic[model.parent[b]] + Ic[b]

    M = jnp.zeros((nv, nv), dtype=S.dtype)
    M = M.at[:6, :6].set(Ic[0])
    for j in range(nj):
        b = j + 1
        F = Ic[b] @ S[6 + j]  # (6,)
        M = M.at[6 + j, 6 + j].set(S[6 + j] @ F)
        # walk up through movable ancestors
        i = model.parent[b]
        while i > 0:
            jj = i - 1
            v = S[6 + jj] @ F
            M = M.at[6 + j, 6 + jj].set(v)
            M = M.at[6 + jj, 6 + j].set(v)
            i = model.parent[i]
        # base coupling (S_base = identity)
        M = M.at[:6, 6 + j].set(F)
        M = M.at[6 + j, :6].set(F)
    return M


def inverse_dynamics(
    model: RobotModel,
    params: PhysicsParams,
    kin: Kinematics,
    S: jax.Array,
    qvel: jax.Array,
    body_vel: jax.Array,
    origin: jax.Array,
    udot: jax.Array,
    gravity: float = 9.81,
) -> jax.Array:
    """RNEA: generalized forces realizing generalized acceleration `udot`.

    World-coordinate recursive Newton-Euler with a gravity pseudo-acceleration
    at the base.  `bias_forces` is the udot=0 special case; the M-consistency
    unit test reconstructs CRBA columns from this with unit accelerations.
    """
    nb, nv = model.nb, model.nv
    masses = _effective_masses(model, params)
    com_rel = kin.com_w - origin
    I_bodies = spatial.spatial_inertia(masses, com_rel, kin.inertia_w)

    a_grav = jnp.zeros(6, dtype=S.dtype).at[5].set(gravity)
    accs = [a_grav + udot[:6]]
    for b in range(1, nb):
        j = b - 1
        vj = S[6 + j] * qvel[j]
        accs.append(
            accs[model.parent[b]]
            + S[6 + j] * udot[6 + j]
            + spatial.motion_cross(body_vel[b], vj)
        )

    # per-body net spatial force, then accumulate subtree forces leaves -> root
    f_sub = [
        I_bodies[b] @ accs[b]
        + spatial.force_cross(body_vel[b], I_bodies[b] @ body_vel[b])
        for b in range(nb)
    ]
    tau = jnp.zeros(nv, dtype=S.dtype)
    for b in range(nb - 1, 0, -1):
        j = b - 1
        tau = tau.at[6 + j].set(S[6 + j] @ f_sub[b])
        f_sub[model.parent[b]] = f_sub[model.parent[b]] + f_sub[b]
    tau = tau.at[:6].set(f_sub[0])
    return tau


def bias_forces(
    model: RobotModel,
    params: PhysicsParams,
    kin: Kinematics,
    S: jax.Array,
    qvel: jax.Array,
    body_vel: jax.Array,
    origin: jax.Array,
    gravity: float = 9.81,
) -> jax.Array:
    """(nv,) Coriolis + centrifugal + gravity generalized forces (RNEA, u̇=0)."""
    zero = jnp.zeros(model.nv, dtype=S.dtype)
    return inverse_dynamics(
        model, params, kin, S, qvel, body_vel, origin, zero, gravity
    )


def _applied_generalized_force(
    model: RobotModel,
    params: PhysicsParams,
    state: PhysicsState,
    joint_torque: jax.Array,
    external_force: jax.Array | None,
    external_torque: jax.Array | None,
    dtype,
) -> jax.Array:
    """Actuation + joint dry friction + limit springs + external base push."""
    nv = model.nv
    tau = jnp.zeros(nv, dtype=dtype)
    tau = tau.at[6:].set(joint_torque)
    # per-env DOF dry friction (smoothed sign) — the sys-ID degree of freedom
    # the reference sets via dof_props["friction"][i] (point_foot.py:103-108);
    # viscous joint damping is implicit
    tau = tau.at[6:].add(-params.joint_friction * jnp.tanh(state.qvel / 0.05))
    # joint-limit position compliance: stiff one-sided spring over the
    # out-of-bound band (the in-solve half of the limit semantics; the
    # authoritative statement of limit handling — and why it is post-solve
    # clamps, decided by the trained-policy A/B rather than any claim
    # about PhysX internals — is the block comment above finish_step)
    k_lim = 200.0
    over = jnp.maximum(state.qpos - model.q_upper, 0.0)
    under = jnp.maximum(model.q_lower - state.qpos, 0.0)
    tau = tau.at[6:].add(-k_lim * over + k_lim * under)
    # external base push (force-based pushes, reference point_foot.py:590-611)
    if external_force is not None:
        n = jnp.zeros(3, dtype=dtype)  # applied at base origin == spatial origin
        if external_torque is not None:
            n = n + external_torque
        tau = tau.at[:3].add(n).at[3:6].add(external_force)
    return tau


def forward_dynamics(
    model: RobotModel,
    params: PhysicsParams,
    state: PhysicsState,
    joint_torque: jax.Array,
    height_fn: HeightFn,
    external_force: jax.Array | None = None,
    external_torque: jax.Array | None = None,
    gravity: float = 9.81,
) -> Tuple[jax.Array, jax.Array]:
    """Explicit generalized acceleration u̇ (nv,) + contact forces (nc, 3).

    Smooth, fully explicit evaluation — used by unit tests and as the smooth
    dynamics of the MPC engine.  The simulator `step` uses the implicit
    velocity solve below instead (stable for stiff contact).
    """
    origin = state.base_pos
    kin = forward_kinematics(model, state, params)
    S = motion_subspaces(model, kin, origin)
    body_vel = body_spatial_velocities(model, state, S)
    M = mass_matrix(model, params, kin, S, origin)
    C = bias_forces(model, params, kin, S, state.qvel, body_vel, origin, gravity)
    tau = _applied_generalized_force(
        model, params, state, joint_torque, external_force, external_torque,
        M.dtype
    )
    tau = tau.at[6:].add(-model.joint_damping * state.qvel)
    f_contact, tau_contact = contact_mod.contact_forces(
        model, params, kin, body_vel, S, origin, height_fn
    )
    rhs = tau + tau_contact - C
    Mreg = M + 1e-6 * jnp.eye(model.nv, dtype=M.dtype)
    udot = linalg_ops.chol_solve(Mreg, rhs)
    return udot, f_contact


def assemble_velocity_solve(
    model: RobotModel,
    params: PhysicsParams,
    state: PhysicsState,
    joint_torque: jax.Array,
    height_fn: HeightFn,
    dt: float,
    external_force: jax.Array | None = None,
    external_torque: jax.Array | None = None,
    gravity: float = 9.81,
):
    """Build the implicit velocity system (A, rhs) + contact terms (1 env)."""
    origin = state.base_pos
    kin = forward_kinematics(model, state, params)
    S = motion_subspaces(model, kin, origin)
    body_vel = body_spatial_velocities(model, state, S)
    M = mass_matrix(model, params, kin, S, origin)
    C = bias_forces(model, params, kin, S, state.qvel, body_vel, origin, gravity)
    tau = _applied_generalized_force(
        model, params, state, joint_torque, external_force, external_torque,
        M.dtype
    )

    terms = contact_mod.contact_terms(
        model, params, kin, body_vel, S, origin, height_fn
    )
    Jt_f0 = jnp.einsum("civ,ci->v", terms.jac, terms.f_spring)
    JtDJ = jnp.einsum("civ,cij,cjw->vw", terms.jac, terms.damp, terms.jac)

    nv = model.nv
    u = jnp.concatenate([state.base_ang_vel, state.base_lin_vel, state.qvel])
    A = M + dt * JtDJ + 1e-6 * jnp.eye(nv, dtype=M.dtype)
    A = A.at[jnp.arange(6, nv), jnp.arange(6, nv)].add(dt * model.joint_damping)
    rhs = M @ u + dt * (tau + Jt_f0 - C)
    return A, rhs, terms


# Joint-limit semantics — a deliberate, measured trade (round 4).
#
# AUTHORITATIVE STATEMENT of joint-limit semantics (supersedes any older
# per-line claim about PhysX internals — PhysX/Isaac Gym is closed
# source, and what its solver does inside is not verifiable from here;
# the decisive evidence is the trained-policy A/B below, not an engine
# claim).  Both URDF joint limits are enforced POST-SOLVE, exactly as
# the gen-1 physics every committed policy was trained on:
#   * velocity: clip(q̇, ±vl) in finish_step;
#   * position: the k_lim=200 soft spring over a 0.2 rad band
#     (_applied_generalized_force) + hard qpos clip at bound±0.2.
#
# Round 4 built and measured the "physically correct" alternative — a
# two-pass solve with exact active-set engagement from the unconstrained
# post-solve velocity and stiff implicit in-solve brakes/stops (internal
# joint torques, momentum-consistent however stiff; see git history at
# this file).  It conserves L in flight-railing scenarios where the
# clamps ratchet the base to the ±64 rad/s saturation... and it breaks
# every trained walking policy.  Policy-parity A/B on the committed
# model_100000 (levels 0 x vx {0, 0.4}, scripts/eval_policy.py):
#   gen-1 clamp semantics                ->   2-3 falls (committed eval)
#   in-solve velocity brake (1e4 diag)   ->  30 falls
#   in-solve position stops at bounds    -> 164 falls
#   position stops at the ±0.2 band edge -> 166 falls
#   both brakes                          -> 345 falls
# The gait demonstrably rides BOTH clamps (knee clamp mid-swing; clip
# with preserved pressing velocity at the position band) — the clamps
# are part of the effective trained dynamics, not numerical backstops.
# The cost: a clamp that engages deletes joint momentum with no reaction
# (unphysical); sustained full-effort railing in FLIGHT ratchets base
# angular momentum (the round-3 75 rad/s flight hunt).  The reference
# engine shares this behavior class; it is bounded by the ±64 rad/s /
# ±50 m/s saturations and pinned by tests/test_physics_invariants.py::
# test_railed_joint_limits_contract, and the clean-regime conservation
# invariants (ballistic trio) still hold to integrator order.


def finish_step(
    model: RobotModel, state: PhysicsState, u_new: jax.Array,
    terms, dt: float,
) -> PhysicsState:
    """Contact sensor forces at the post-step velocity + position update."""
    v_p_new = jnp.einsum("civ,v->ci", terms.jac, u_new)
    f_c = terms.f_spring - jnp.einsum("cij,cj->ci", terms.damp, v_p_new)
    f_n = jnp.einsum("ci,ci->c", f_c, terms.normal)
    f_t = f_c - f_n[:, None] * terms.normal
    f_c = jnp.where(
        terms.active[:, None],
        jnp.maximum(f_n, 0.0)[:, None] * terms.normal + f_t,
        jnp.zeros_like(f_c),
    )

    ang, lin, qvel = u_new[:3], u_new[3:6], u_new[6:]
    # u_new's linear part is the SPATIAL velocity at the (old) base origin
    # — the velocity solve advances it with the spatial acceleration.  The
    # stored state velocity is the MATERIAL base-point velocity, and the
    # two derivatives differ by the classical velocity-product term
    # (Featherstone eq. 2.47: v̇_point = a_spatial + ω × v).  Omitting it
    # leaked momentum whenever the base tumbled: a free-falling body with
    # ω=(0.5,-0.8,0.3) showed CoM acceleration (0.44, 0.37, -10.45) m/s²
    # instead of (0, 0, -9.81) — caught by
    # tests/test_physics_invariants.py::test_ballistic_com_parabola.
    # trapezoidal evaluation (midpoint ω, v across the step) — evaluating
    # at the endpoint alone leaves an O(dt·ω·g) bias (~0.04 m/s² at |ω|=1)
    ang_m = 0.5 * (state.base_ang_vel + ang)
    lin_m = 0.5 * (state.base_lin_vel + lin)
    lin = lin + dt * jnp.cross(ang_m, lin_m)
    # Isaac Gym asset-option clamps (max_angular_velocity=64,
    # max_linear_velocity=1000, gymapi defaults the reference inherits):
    # a numerically exploding env saturates instead of overflowing to
    # inf/NaN, so termination can catch it before it poisons the batch
    ang = jnp.clip(ang, -64.0, 64.0)
    # Isaac's max_linear_velocity default is 1000, but our compliant
    # contact at the 5 ms substep can catapult a deeply-clipped state;
    # 50 m/s is still 10x any legitimate locomotion speed
    lin = jnp.clip(lin, -50.0, 50.0)
    # Joint-velocity limit: 1x post-solve clamp — Isaac Gym AND
    # trained-policy parity (see the joint-limit semantics note above
    # finish_step's caller section)
    qvel = jnp.clip(qvel, -model.velocity_limit, model.velocity_limit)
    pos = state.base_pos + dt * lin
    quat = quat_ops.integrate(state.base_quat, ang, dt)
    qpos = state.qpos + dt * qvel
    # hard position stop at the soft-band edge — gen-1 / trained-policy
    # parity (see the joint-limit semantics note above)
    qpos = jnp.clip(qpos, model.q_lower - 0.2, model.q_upper + 0.2)
    return PhysicsState(
        base_pos=pos, base_quat=quat, base_lin_vel=lin, base_ang_vel=ang,
        qpos=qpos, qvel=qvel, contact_force=f_c,
    )


def step(
    model: RobotModel,
    params: PhysicsParams,
    state: PhysicsState,
    joint_torque: jax.Array,
    height_fn: HeightFn,
    dt: float,
    external_force: jax.Array | None = None,
    external_torque: jax.Array | None = None,
    gravity: float = 9.81,
) -> PhysicsState:
    """One physics substep (reference sim dt = 0.005 s, cfg sim.dt :197).

    Semi-implicit Euler with *implicit* contact & joint damping:

        (M + dt·Jᵀ D J + dt·diag(b_joint)) u⁺ = M u + dt·(τ + Jᵀ f_spring − C)

    then positions integrate with u⁺.  The damping-implicit velocity solve is
    what lets stiff compliant contact run stably at the reference's 5 ms
    substep — the TPU-native answer to PhysX TGS's implicit solver iterations
    (reference solver cfg pointfoot_rough_config.py:202-213).
    """
    A, rhs, terms = assemble_velocity_solve(
        model, params, state, joint_torque, height_fn, dt,
        external_force, external_torque, gravity)
    u_new = linalg_ops.chol_solve(A, rhs)
    return finish_step(model, state, u_new, terms, dt)


def step_batched(
    model: RobotModel,
    params: PhysicsParams,
    state: PhysicsState,
    joint_torque: jax.Array,
    height_fn: HeightFn,
    dt: float,
    external_force: jax.Array | None = None,
    gravity: float = 9.81,
    solver=None,
) -> PhysicsState:
    """Batched substep: vmapped assembly/finish around ONE batch-level solve.

    With `solver=pallas_chol_solve` (ops/pallas) the (B, nv, nv) velocity
    systems factor in a lane-batched Pallas kernel; default is the unrolled
    XLA path (identical results).  On TPU at large batch the assembly is
    emitted directly in the kernel's (nv*nv, B) batch-minor layout
    (``vmap out_axes``) so no HBM transpose sits between assembly and solve.
    """
    ext = (external_force if external_force is not None
           else jnp.zeros_like(state.base_pos))
    assemble = lambda p, s, t, f: assemble_velocity_solve(
        model, p, s, t, height_fn, dt, f, None, gravity)

    B = state.base_pos.shape[0]
    on_tpu = jax.devices()[0].platform == "tpu"
    if (solver is None and on_tpu and jax.device_count() == 1
            and os.environ.get("POINTFOOT_MEGAKERNEL", "1") == "1"):
        # single-device only: a pallas_call under pjit is not auto-
        # partitioned — multi-chip meshes keep the XLA path until the
        # rollout is shard_mapped (future work, docs/PROFILE_SUBSTEP.md)
        # substep mega-kernel (docs/PROFILE_SUBSTEP.md): the whole substep
        # as ONE lane-batched Pallas kernel — 2.35x the XLA path on v5e at
        # B=4096.  Terrain enters as surface rows gathered at the sphere
        # positions of the SAME pre-step state (identical to what
        # contact.contact_terms would query); flat ground folds the
        # surface to trace-time constants.
        from pointfoot_tpu.ops.pallas import substep as _substep

        if B >= _substep._BLOCK:
            surface = None
            if not getattr(height_fn, "is_flat", False):
                # sphere query positions from a tiny positions-only FK
                # kernel (the XLA mini-FK was itself launch-bound)
                xy = _substep.fk_contact_xy_pallas(model, state)
                h, n = contact_mod.query_surface(
                    height_fn, xy[..., 0], xy[..., 1])
                surface = (h, n)
            return _substep.substep_pallas(
                model, params, state, joint_torque, dt, gravity=gravity,
                external_force=ext, surface=surface)
    if solver is None and on_tpu and B >= 128:
        from pointfoot_tpu.ops.pallas.cholesky import pallas_chol_solve_lanes

        # batch-minor assembly: A (nv, nv, B), rhs (nv, B), terms batch-major
        A, rhs, terms = jax.vmap(assemble, out_axes=(2, 1, 0))(
            params, state, joint_torque, ext)
        nv = model.nv
        u_t = pallas_chol_solve_lanes(A.reshape(nv * nv, B), rhs)
        return jax.vmap(
            lambda s, u, tm: finish_step(model, s, u, tm, dt),
            in_axes=(0, 1, 0),
        )(state, u_t, terms)

    if solver is None:
        solver = linalg_ops.chol_solve
    A, rhs, terms = jax.vmap(assemble)(params, state, joint_torque, ext)
    u_new = solver(A, rhs)
    return jax.vmap(
        lambda s, u, tm: finish_step(model, s, u, tm, dt)
    )(state, u_new, terms)
