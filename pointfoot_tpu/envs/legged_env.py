"""Functional vectorized legged-robot environment (PointFoot + LeggedRobot).

This module re-expresses the reference environment layer — `BaseTask` /
`LeggedRobot` / `PointFoot` (reference envs/base/base_task.py,
envs/base/legged_robot.py, envs/pointfoot/point_foot.py) — as a pure
state-transition function over batched pytrees:

    step: (EnvState, actions, ) -> (EnvState, StepOutput)

with no host synchronization anywhere: resets, curricula, command
resampling and pushes are masked on-device updates (the reference's
`len(env_ids)==0` early-outs, point_foot.py:259-260, become `where` masks),
so a full PPO rollout `lax.scan`s over this function and compiles into a
single XLA program.

Semantics parity notes (file:line cite the reference):
* control: per-substep PD torque recompute, P/V/T modes, torque clip to URDF
  limits (point_foot.py:523-547); decimation x sim-dt policy rate (:180-185).
* observations: PointFoot order [w*0.25, g_proj, (q-q_def), qd*0.05, a_prev,
  cmd*scale] (point_foot.py:375-382); LeggedRobot order additionally leads
  with v_base*2.0 (legged_robot.py:212-219).  Privileged obs append 121
  clipped height samples (point_foot.py:367-373).
* noise: the reference builds its noise vector with the base-class layout,
  misaligned with PointFoot's obs order (point_foot.py:666-676, SURVEY.md
  quirk #1).  We apply the intended per-group magnitudes aligned to the
  actual layout, and drop the debug noise-tensor dump (:334, quirk #2).
* commands: the reference stubs `_resample_commands` for sys-ID
  (point_foot.py:498-521); we implement the LeggedRobot resampler
  (legged_robot.py:337-351) plus the external pin hook `update_cmd`
  (point_foot.py:123-129) via a per-env `cmd_pinned` mask.
* termination: contact-force norm > 1 N on base/abad spheres OR timeout
  (point_foot.py:239-247); timeouts reported separately for PPO
  bootstrapping (:286-288).
* rewards: the full 22-term PointFoot table (point_foot.py:1131-1253),
  scales pre-multiplied by dt (:796-820), optional positive-only clip with
  termination added after (:301-318).  `feet_distance` uses the corrected
  pairwise form (quirk #6).
* feet state machinery: OR-filtered contacts, air time, per-swing max foot
  height — exact update order of `_compute_feet_states`
  (point_foot.py:1114-1129).
* curricula: terrain promote/demote on reset (point_foot.py:613-636) and
  command-range widening (:638-650), both as on-device masked updates.
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pointfoot_tpu.envs.config import LeggedEnvCfg
from pointfoot_tpu.ops import quat as quat_ops
from pointfoot_tpu.physics import dynamics
from pointfoot_tpu.physics.assets import get_model
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState, RobotModel
from pointfoot_tpu.terrain.grid import TerrainGrid, build_terrain, flat_grid

GRAVITY_VEC = np.array([0.0, 0.0, -1.0], np.float32)


@struct.dataclass
class EnvState:
    """Complete batched environment state (leading dim = num_envs)."""

    physics: PhysicsState
    params: PhysicsParams  # per-env domain-randomized physics parameters
    rng: jax.Array  # single PRNG key, split every step
    episode_step: jax.Array  # (B,) int32
    common_step: jax.Array  # () int32 global counter
    actions: jax.Array  # (B, na) current clipped actions
    last_actions: jax.Array  # (B, na)
    last_qvel: jax.Array  # (B, nj)
    torques: jax.Array  # (B, nj) last applied torques
    commands: jax.Array  # (B, 4) vx, vy, wz, heading
    cmd_pinned: jax.Array  # (B,) bool — external sys-ID pin (update_cmd)
    lin_vel_x_range: jax.Array  # (2,) command-curriculum state
    terrain_level: jax.Array  # (B,) int32
    terrain_type: jax.Array  # (B,) int32
    env_origin: jax.Array  # (B, 3)
    feet_air_time: jax.Array  # (B, nf)
    last_feet_air_time: jax.Array  # (B, nf)
    current_max_feet_height: jax.Array  # (B, nf)
    last_max_feet_height: jax.Array  # (B, nf)
    last_contacts: jax.Array  # (B, nf) bool
    push_force: jax.Array  # (B, 3) world force queued for next substep 0
    actuator_carry: jax.Array  # (B, nj, L, 2, H) LSTM actuator state (or (B,0))
    episode_sums: jax.Array  # (B, n_terms)
    terminate: jax.Array  # (B,) bool — contact-only termination (sys-ID flag)
    time_out: jax.Array  # (B,) bool
    # (B,) integral of base velocity along the (yaw-rotated) commanded
    # direction — the terrain-curriculum demotion credit.  Net displacement
    # under-credits an arcing walk (a yaw command curls the path, so a
    # perfectly tracking robot "covers no distance" and is demoted); the
    # signed along-command integral equals displacement for straight
    # commands and arc length for turns, and gait wobble cancels
    cmd_progress: jax.Array  # (B,)


class StepOutput(NamedTuple):
    obs: jax.Array  # (B, num_obs)
    privileged_obs: Optional[jax.Array]  # (B, num_priv) or None
    reward: jax.Array  # (B,)
    done: jax.Array  # (B,) bool
    extras: Dict[str, jax.Array]


class LeggedEnv:
    """Static environment definition: config + model + terrain + jitted fns.

    Replaces the reference god-object env with a thin holder of static data;
    all dynamics live in pure functions.  Satisfies the same contract the
    rsl_rl `VecEnv` protocol demanded (task_registry.py:147-154) through
    `reset_all` / `step`.
    """

    def __init__(self, cfg: LeggedEnvCfg, terrain: TerrainGrid | None = None,
                 model: RobotModel | None = None):
        self.cfg = cfg
        # phase-ablation switch for throughput profiling ONLY (bench.py
        # BENCH_MODE=env_phases): a set of phase names whose work is
        # replaced by zeros at trace time so the phase's cost can be
        # measured by difference on-chip.  Empty (the default, and the
        # only supported value for training/eval) leaves step() exact.
        self._ablate: frozenset = frozenset()
        self.model = model if model is not None else get_model(cfg.asset.model_name)
        m = self.model
        self.num_envs = cfg.env.num_envs
        self.num_obs = cfg.env.num_observations
        self.num_privileged_obs = cfg.env.num_privileged_obs
        self.num_actions = cfg.env.num_actions
        self.dt = cfg.dt
        self.max_episode_length = cfg.max_episode_length
        self.max_episode_length_s = cfg.env.episode_length_s

        # --- terrain ---
        if terrain is not None:
            self.terrain = terrain
        elif cfg.terrain.mesh_type == "plane":
            side = int(np.ceil(np.sqrt(self.num_envs)))
            self.terrain = flat_grid(
                size=max(2 * side * cfg.env.env_spacing + 20, 60),
                num_levels=side, num_types=side, spacing=cfg.env.env_spacing,
            )
        elif cfg.terrain.procedural or os.environ.get(
                "POINTFOOT_PROCTERRAIN") == "1":
            from pointfoot_tpu.terrain.procedural import build_procedural

            self.terrain = build_procedural(cfg.terrain, seed=0)
        else:
            self.terrain = build_terrain(cfg.terrain, seed=0)

        # --- per-joint static arrays from name-keyed config dicts ---
        def by_name(pairs, default=0.0):
            out = np.full(m.nj, default, np.float32)
            for i, jn in enumerate(m.joint_names):
                for key, val in pairs:
                    if key in jn:
                        out[i] = val
                        break
            return out

        self.default_qpos = jnp.asarray(
            by_name(cfg.init_state.default_joint_angles))
        self.kp = jnp.asarray(by_name(cfg.control.stiffness))
        self.kd = jnp.asarray(by_name(cfg.control.damping))
        self.torque_limit = m.effort_limit
        self.qvel_limit = m.velocity_limit

        # --- collision-sphere index sets (name matching like the reference
        #     feet/termination/penalized indexing, point_foot.py:919-931) ---
        self.feet_idx = m.collision_indices(cfg.asset.foot_name)
        term = []
        for s in cfg.asset.terminate_after_contacts_on:
            term += list(m.collision_indices(s))
        self.termination_idx = tuple(sorted(set(term)))
        pen = []
        for s in cfg.asset.penalize_contacts_on:
            pen += list(m.collision_indices(s))
        # penalized excludes feet (they legitimately touch the ground)
        pen = set(pen) - set(self.feet_idx)
        self.penalized_idx = tuple(sorted(pen))
        self.nf = len(self.feet_idx)
        if not self.feet_idx:
            raise ValueError(
                f"no feet matched '{cfg.asset.foot_name}' in "
                f"{m.collision_names}")
        if not self.termination_idx:
            raise ValueError(
                f"no termination bodies matched "
                f"{cfg.asset.terminate_after_contacts_on} in "
                f"{m.collision_names}")

        # --- height-scan grid (base frame, yaw-rotated at query time) ---
        hx = np.asarray(cfg.height_scan.points_x, np.float32)
        hy = np.asarray(cfg.height_scan.points_y, np.float32)
        gx, gy = np.meshgrid(hx, hy, indexing="ij")
        self.height_points = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel(), np.zeros_like(gx.ravel())], -1))
        self.num_height_points = self.height_points.shape[0]
        self.measure_heights = (
            cfg.height_scan.measure_heights and cfg.terrain.mesh_type != "plane"
        )

        # --- reward table: (name, scale*dt), dt pre-multiply per reference
        #     _prepare_reward_function (point_foot.py:804-812) ---
        scales = dict(cfg.rewards.scales)
        self.termination_scale = scales.pop("termination", 0.0)  # added post-clip
        self.reward_terms = tuple(
            (name, scale * self.dt) for name, scale in scales.items()
            if scale != 0.0
        )
        self.reward_names = tuple(n for n, _ in self.reward_terms) + (
            ("termination",) if self.termination_scale else ())
        self._has_feet_height_rewards = any(
            "feet_height" in n for n in self.reward_names)

        # actuator network (anymal family)
        self.use_actuator_net = cfg.control.use_actuator_network
        if self.use_actuator_net:
            from pointfoot_tpu.physics import actuator as act

            self.actuator_weights = act.load_anydrive_weights()

        self.push_interval = int(np.ceil(
            cfg.domain_rand.push_interval_s / self.dt))
        self.resample_interval = int(cfg.commands.resampling_time / self.dt)
        # set by the runner when training under a device mesh: lets the
        # physics rollout shard_map the Pallas mega-kernel over the DP axis
        self.shard_mesh = None
        self.cmd_scale = jnp.asarray([
            cfg.normalization.lin_vel_scale,
            cfg.normalization.lin_vel_scale,
            cfg.normalization.ang_vel_scale,
        ])

        # --- noise vectors, aligned to the ACTUAL obs layout (quirk #1) ---
        self.noise_vec = jnp.asarray(self._build_noise_vec())
        nhp = self.num_height_points
        self.priv_noise_vec = (
            jnp.full((nhp,), cfg.noise.height_measurements * cfg.noise.noise_level
                     * cfg.normalization.height_meas_scale, jnp.float32)
            if (self.num_privileged_obs or 0) > self.num_obs else None
        )

    # ------------------------------------------------------------------ init

    def _build_noise_vec(self) -> np.ndarray:
        cfg = self.cfg
        n = cfg.noise
        s = cfg.normalization
        nj, na = self.model.nj, self.num_actions
        parts = []
        if cfg.obs_style == "legged":
            parts.append(np.full(3, n.lin_vel * n.noise_level * s.lin_vel_scale))
        parts += [
            np.full(3, n.ang_vel * n.noise_level * s.ang_vel_scale),
            np.full(3, n.gravity * n.noise_level),
        ]
        if cfg.obs_style == "legged":
            parts.append(np.zeros(3))  # commands
        parts += [
            np.full(nj, n.dof_pos * n.noise_level * s.dof_pos_scale),
            np.full(nj, n.dof_vel * n.noise_level * s.dof_vel_scale),
            np.zeros(na),  # previous actions
        ]
        if cfg.obs_style != "legged":
            parts.append(np.zeros(3))  # commands last (PointFoot layout)
        vec = np.concatenate(parts).astype(np.float32)
        if cfg.obs_style == "legged" and self.measure_heights and \
                self.num_obs > len(vec):
            vec = np.concatenate([
                vec,
                np.full(self.num_height_points,
                        n.height_measurements * n.noise_level * s.height_meas_scale,
                        np.float32),
            ])
        return vec[: self.num_obs]

    def _sample_params(self, key) -> PhysicsParams:
        """Domain randomization at init: friction buckets
        (point_foot.py:411-435), added mass (:466-471), CoM shift (:472-477)."""
        cfg = self.cfg.domain_rand
        B = self.num_envs
        nc = len(self.model.collision_body)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        if cfg.randomize_friction:
            buckets = jax.random.uniform(
                k1, (cfg.num_friction_buckets,),
                minval=cfg.friction_range[0], maxval=cfg.friction_range[1])
            ids = jax.random.randint(k2, (B,), 0, cfg.num_friction_buckets)
            friction = jnp.broadcast_to(buckets[ids][:, None], (B, nc))
        else:
            friction = jnp.full((B, nc), self.cfg.terrain.static_friction)
        added_mass = (
            jax.random.uniform(k3, (B,), minval=cfg.added_mass_range[0],
                               maxval=cfg.added_mass_range[1])
            if cfg.randomize_base_mass else jnp.zeros(B))
        com = (
            jax.random.uniform(k4, (B, 3), minval=-1.0, maxval=1.0)
            * jnp.asarray(cfg.rand_com_vec)
            if cfg.randomize_base_com else jnp.zeros((B, 3)))
        nominal = PhysicsParams.nominal(
            self.model, batch=(B,),
            contact_stiffness=self.cfg.sim.contact_stiffness,
            contact_damping=self.cfg.sim.contact_damping,
        )
        return nominal.replace(
            friction=friction, added_mass=added_mass, com_offset=com,
            kp=jnp.broadcast_to(self.kp, (B, self.model.nj)),
            kd=jnp.broadcast_to(self.kd, (B, self.model.nj)),
        )

    def init_state(self, key: jax.Array) -> EnvState:
        """Fresh environment state; analogous to env construction + first
        reset in the reference (base_task.py:111-115)."""
        B = self.num_envs
        m = self.model
        keys = jax.random.split(key, 6)
        params = self._sample_params(keys[0])

        # terrain cell assignment (legged_robot.py:978-986 semantics)
        max_init = min(self.cfg.terrain.max_init_terrain_level,
                       self.terrain.num_levels - 1)
        if self.cfg.terrain.curriculum and self.cfg.terrain.mesh_type != "plane":
            level = jax.random.randint(keys[1], (B,), 0, max_init + 1)
        else:
            level = (jnp.arange(B) // max(B // self.terrain.num_levels, 1)
                     ) % self.terrain.num_levels
        ttype = (jnp.arange(B) // max(B // self.terrain.num_types, 1)
                 ) % self.terrain.num_types
        origin = self.terrain.env_origins[level, ttype]

        qpos0 = jnp.broadcast_to(self.default_qpos, (B, m.nj))
        base_pos = origin + jnp.asarray(self.cfg.init_state.pos)
        physics = PhysicsState(
            base_pos=base_pos,
            base_quat=jnp.broadcast_to(jnp.asarray(self.cfg.init_state.rot), (B, 4)),
            base_lin_vel=jnp.zeros((B, 3)),
            base_ang_vel=jnp.zeros((B, 3)),
            qpos=qpos0,
            qvel=jnp.zeros((B, m.nj)),
            contact_force=jnp.zeros((B, len(m.collision_body), 3)),
        )
        ranges = self.cfg.commands
        state = EnvState(
            physics=physics,
            params=params,
            rng=keys[2],
            episode_step=jnp.zeros(B, jnp.int32),
            common_step=jnp.zeros((), jnp.int32),
            actions=jnp.zeros((B, self.num_actions)),
            last_actions=jnp.zeros((B, self.num_actions)),
            last_qvel=jnp.zeros((B, m.nj)),
            torques=jnp.zeros((B, m.nj)),
            commands=jnp.zeros((B, 4)),
            cmd_pinned=jnp.zeros(B, bool),
            lin_vel_x_range=jnp.asarray(ranges.lin_vel_x, jnp.float32),
            terrain_level=level.astype(jnp.int32),
            terrain_type=ttype.astype(jnp.int32),
            env_origin=origin,
            feet_air_time=jnp.zeros((B, self.nf)),
            last_feet_air_time=jnp.zeros((B, self.nf)),
            current_max_feet_height=jnp.zeros((B, self.nf)),
            last_max_feet_height=jnp.zeros((B, self.nf)),
            last_contacts=jnp.zeros((B, self.nf), bool),
            push_force=jnp.zeros((B, 3)),
            actuator_carry=(
                jnp.zeros((B, m.nj, 2, 2, 8)) if self.use_actuator_net
                # placeholder must be non-empty: checkpointers (Orbax)
                # refuse zero-size arrays
                else jnp.zeros((B, 1))),
            episode_sums=jnp.zeros((B, len(self.reward_names))),
            terminate=jnp.zeros(B, bool),
            cmd_progress=jnp.zeros(B),
            time_out=jnp.zeros(B, bool),
        )
        # initial reset of all envs (reference reset_buf=1 init, PF:68)
        state = self._reset_envs(state, jnp.ones(B, bool), keys[3])
        return state

    # ------------------------------------------------------------- internals

    def _height_fn(self):
        t = self.terrain
        fn = lambda x, y: t.height_at(x, y)
        fn.is_flat = self.cfg.terrain.mesh_type == "plane"
        if self.cfg.terrain.mesh_type != "plane":
            # one-gather surface queries for contact (TerrainGrid.surface_at)
            fn.surface_fn = lambda x, y: t.surface_at(x, y)
        else:
            zero = lambda x, y: (
                jnp.zeros_like(jnp.asarray(x, jnp.float32)),
                jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                 jnp.asarray(x).shape + (3,)))
            fn.surface_fn = zero
        return fn

    def _compute_torques(self, actions, qpos, qvel, last_qvel, params):
        """PD torque law (point_foot.py:523-547), vectorized over envs."""
        c = self.cfg.control
        scaled = actions * c.action_scale
        if c.control_type == "P":
            tau = params.kp * (scaled + self.default_qpos - qpos) - params.kd * qvel
        elif c.control_type == "V":
            tau = params.kp * (scaled - qvel) - params.kd * (
                qvel - last_qvel) / self.cfg.sim.dt
        elif c.control_type == "T":
            tau = scaled
        else:
            raise NameError(f"Unknown controller type: {c.control_type}")
        return jnp.clip(tau, -self.torque_limit, self.torque_limit)

    def _physics_rollout(self, state: EnvState, actions):
        """Decimation loop: recompute torques each substep
        (point_foot.py:180-185), push force applied on substep 0 only."""
        m = self.model
        hf = self._height_fn()
        sim_dt = self.cfg.sim.dt

        # fused row-layout rollout on TPU at large batch: one mega-kernel
        # per substep with PD torque and FK-of-output inside; between
        # substeps only the terrain surface gather runs in XLA
        # (docs/PROFILE_SUBSTEP.md).  The scan path below stays the
        # reference implementation everywhere else (tests pin equality).
        import os as _os

        from pointfoot_tpu.ops.pallas import substep as _substep

        mesh = getattr(self, "shard_mesh", None)
        on_tpu = jax.devices()[0].platform == "tpu"
        # POINTFOOT_FORCE_KERNEL=1 routes the fused-rollout dispatch on
        # non-TPU backends too, in Pallas interpret mode — this is how the
        # multi-chip dryrun / slow tests exercise the sharded mega-kernel
        # seam inside the FULL PPO iteration without TPU hardware
        # (VERDICT r3 item 9); shrink _substep._BLOCK via
        # PALLAS_SUBSTEP_LANE to keep interpret-mode batches small.
        force = _os.environ.get("POINTFOOT_FORCE_KERNEL") == "1"
        if ((on_tpu or force)
                and not self.use_actuator_net
                and _os.environ.get("POINTFOOT_MEGAKERNEL", "1") == "1"):
            interp = not on_tpu
            if (jax.device_count() == 1
                    and self.num_envs >= _substep._BLOCK):
                phys, tau_last, sphere_pos = _substep.rollout_substeps(
                    m, state.params, state.physics, actions,
                    state.last_qvel, state.push_force, hf, sim_dt,
                    self.cfg.control.decimation, self.default_qpos,
                    self.cfg.control.action_scale,
                    self.cfg.control.control_type,
                    gravity=self.cfg.sim.gravity, interpret=interp)
                return phys, tau_last, state.actuator_carry, sphere_pos
            # multi-chip: shard_map the fused rollout over the DP axis so
            # each device runs the mega-kernel on its local shard (pjit
            # would not partition the pallas_call; the runner hands the
            # env its mesh via `shard_mesh`)
            if (mesh is not None and jax.device_count() > 1
                    and self.num_envs % mesh.size == 0
                    and self.num_envs // mesh.size >= _substep._BLOCK):
                phys, tau_last, sphere_pos = \
                    _substep.rollout_substeps_sharded(
                        mesh, mesh.axis_names[0], m, state.params,
                        state.physics, actions, state.last_qvel,
                        state.push_force, hf, sim_dt,
                        self.cfg.control.decimation, self.default_qpos,
                        self.cfg.control.action_scale,
                        self.cfg.control.control_type,
                        gravity=self.cfg.sim.gravity, interpret=interp)
                return phys, tau_last, state.actuator_carry, sphere_pos

        def substep(carry, i):
            phys, last_qvel, act_carry = carry
            if self.use_actuator_net:
                from pointfoot_tpu.physics import actuator as act

                pos_err = (actions * self.cfg.control.action_scale
                           + self.default_qpos - phys.qpos)
                tau, act_carry = act.actuator_net_torque(
                    self.actuator_weights, act_carry, pos_err, phys.qvel)
                tau = jnp.clip(tau, -self.torque_limit, self.torque_limit)
            else:
                tau = self._compute_torques(
                    actions, phys.qpos, phys.qvel, last_qvel, state.params)
            push = jnp.where(i == 0, state.push_force, jnp.zeros_like(state.push_force))
            # solver=None -> step_batched dispatches: substep mega-kernel on
            # TPU at B>=1024, lane-batched Pallas Cholesky at B>=128, XLA
            # unroll elsewhere (identical physics, tests pin all three)
            new_phys = dynamics.step_batched(
                m, state.params, phys, tau, hf, sim_dt,
                external_force=push, gravity=self.cfg.sim.gravity)
            return (new_phys, phys.qvel, act_carry), tau

        (phys, _, act_carry), taus = jax.lax.scan(
            substep, (state.physics, state.last_qvel, state.actuator_carry),
            jnp.arange(self.cfg.control.decimation))
        return phys, taus[-1], act_carry, None

    def _base_frame_quantities(self, phys: PhysicsState):
        base_lin_vel = quat_ops.rotate_inverse(phys.base_quat, phys.base_lin_vel)
        base_ang_vel = quat_ops.rotate_inverse(phys.base_quat, phys.base_ang_vel)
        proj_grav = quat_ops.rotate_inverse(
            phys.base_quat, jnp.broadcast_to(jnp.asarray(GRAVITY_VEC),
                                             phys.base_pos.shape))
        return base_lin_vel, base_ang_vel, proj_grav

    def _foot_positions(self, phys: PhysicsState, params) -> jax.Array:
        """(B, nf, 3) world foot-sphere centers via FK."""
        m = self.model

        def one(p, s):
            kin = dynamics.forward_kinematics(m, s, p)
            pts = []
            for c in self.feet_idx:
                b = m.collision_body[c]
                pts.append(kin.body_pos[b] + kin.body_rot[b] @ m.collision_offset[c])
            return jnp.stack(pts)

        return jax.vmap(one)(params, phys)

    def _measured_heights(self, phys: PhysicsState) -> jax.Array:
        """(B, P) terrain heights at the yaw-rotated scan grid
        (point_foot.py:1048-1075); zeros on plane terrain."""
        B = phys.base_pos.shape[0]
        if not self.measure_heights:
            return jnp.zeros((B, self.num_height_points))
        pts = quat_ops.apply_yaw(
            phys.base_quat[:, None, :], self.height_points[None, :, :]
        ) + phys.base_pos[:, None, :]
        return self.terrain.height_scan_at(pts[..., 0], pts[..., 1])

    def _feet_heights(self, foot_pos) -> jax.Array:
        if self.cfg.terrain.mesh_type == "plane":
            h = jnp.zeros(foot_pos.shape[:-1])
        else:
            h = self.terrain.height_scan_at(foot_pos[..., 0], foot_pos[..., 1])
        return foot_pos[..., 2] - h

    # ------------------------------------------------------------------ step

    def step(self, state: EnvState, actions: jax.Array
             ) -> Tuple[EnvState, StepOutput]:
        """One policy step.  Mirrors reference step + post_physics_step
        (point_foot.py:170-230) with masked functional resets."""
        cfg = self.cfg
        B = self.num_envs
        clip_a = cfg.normalization.clip_actions
        actions = jnp.clip(actions, -clip_a, clip_a)

        rng, k_noise, k_reset, k_push, k_cmd = jax.random.split(state.rng, 5)
        state = state.replace(actions=actions, rng=rng)

        # --- physics (decimation substeps) ---
        phys, torques, act_carry, sphere_pos = self._physics_rollout(
            state, actions)
        # curriculum credit: signed velocity along the commanded direction
        # (yaw-rotated body-frame command), integrated per control tick —
        # see EnvState.cmd_progress.  Uses the commands that were ACTIVE
        # during this tick's substeps (pre-resample).
        cmd_xy = state.commands[:, :2]
        cmd_norm = jnp.linalg.norm(cmd_xy, axis=-1, keepdims=True)
        cmd_dir_b = cmd_xy / jnp.maximum(cmd_norm, 1e-6)
        cmd_dir_w = quat_ops.apply_yaw(
            phys.base_quat,
            jnp.concatenate([cmd_dir_b, jnp.zeros_like(cmd_norm)], axis=-1))
        progress = state.cmd_progress + self.dt * jnp.where(
            cmd_norm[:, 0] > 0.05,
            jnp.sum(phys.base_lin_vel[:, :2] * cmd_dir_w[:, :2], axis=-1),
            0.0)
        # push was consumed by substep 0
        state = state.replace(
            physics=phys, torques=torques, actuator_carry=act_carry,
            push_force=jnp.zeros_like(state.push_force),
            episode_step=state.episode_step + 1,
            common_step=state.common_step + 1,
            cmd_progress=progress,
        )

        # --- derived quantities ---
        base_lin_vel, base_ang_vel, proj_grav = self._base_frame_quantities(phys)
        # the fused rollout already computed final-state sphere positions
        foot_pos = (sphere_pos[:, jnp.asarray(self.feet_idx), :]
                    if sphere_pos is not None
                    else self._foot_positions(phys, state.params))
        if "heights" in self._ablate:
            measured_heights = jnp.zeros_like(self._measured_heights(phys))
        else:
            # (round-5 profiling note: a materialization barrier here was
            # A/B'd at -1.3% — the ablation profile's apparent consumer
            # duplication was a compilation artifact; the real cost is the
            # height-scan hash chain itself, attacked at the source in
            # terrain/procedural.py via hash-prefix hoisting)
            measured_heights = self._measured_heights(phys)
        contact_force = phys.contact_force  # (B, nc, 3)
        feet_force = contact_force[:, jnp.asarray(self.feet_idx), :]

        # --- feet state machinery (PF:1114-1129) ---
        # Order parity with the reference: it zeroes feet_air_time with the
        # PREVIOUS step's contact filter BEFORE computing first_contact, so
        # a continuously standing foot keeps air_time 0 and never fires
        # first_contact.  The equivalent single-pass form carries air_time
        # already zeroed-on-contact: first_contact fires only for a foot
        # that actually accumulated swing time, and the reward-visible
        # value is air_old + dt (what the reference's post-increment
        # reward reads).  The previous ordering here zeroed FIRST and
        # added dt after, so standing feet carried air_time == dt and
        # fired first_contact EVERY step — a large spurious standing
        # penalty through the feet_air_time band (pointfoot) / step bonus
        # (legged family), and last_* latches overwritten every step.
        contact = feet_force[..., 2] > 1.0
        contact_filt = contact | state.last_contacts
        first_contact = (state.feet_air_time > 0.0) & contact_filt
        air_for_reward = state.feet_air_time + self.dt
        last_feet_air_time = jnp.where(
            first_contact, air_for_reward, state.last_feet_air_time)
        feet_air_time = air_for_reward * (1.0 - contact_filt)
        feet_height = self._feet_heights(foot_pos)
        last_max_feet_height = jnp.where(
            first_contact, state.current_max_feet_height,
            state.last_max_feet_height)
        current_max_feet_height = jnp.maximum(
            state.current_max_feet_height * (1.0 - contact_filt), feet_height)
        state = state.replace(
            feet_air_time=feet_air_time,
            last_feet_air_time=last_feet_air_time,
            current_max_feet_height=current_max_feet_height,
            last_max_feet_height=last_max_feet_height,
            last_contacts=contact,
        )

        # --- commands: resample / heading controller / curriculum pin ---
        if "commands" not in self._ablate:
            state = self._update_commands(state, k_cmd, phys)

        # --- pushes: PointFoot queues a world force (PF:590-611); the
        # LeggedRobot family sets the base velocity directly (LR:414-419) ---
        if cfg.domain_rand.push_robots and "push" not in self._ablate:
            push_step = (state.common_step % self.push_interval) == 0
            if cfg.obs_style == "legged":
                vel_xy = jax.random.uniform(
                    k_push, (B, 2), minval=-cfg.domain_rand.max_push_vel_xy,
                    maxval=cfg.domain_rand.max_push_vel_xy)
                new_lin = phys.base_lin_vel.at[:, :2].set(vel_xy)
                phys = phys.replace(base_lin_vel=jnp.where(
                    push_step, new_lin, phys.base_lin_vel))
                state = state.replace(physics=phys)
            else:
                # F_max = mean BASE-link mass * max_push_vel / sim_dt (PF:590-596)
                mean_mass = jnp.mean(
                    self.model.mass[0] + state.params.added_mass)
                fmax = mean_mass * cfg.domain_rand.max_push_vel_xy / cfg.sim.dt
                raw = jax.random.uniform(k_push, (B, 3), minval=-fmax,
                                         maxval=fmax)
                world = quat_ops.rotate(phys.base_quat, raw)
                world = world.at[:, 2].multiply(0.5)
                state = state.replace(
                    push_force=jnp.where(push_step, world,
                                         jnp.zeros_like(world)))

        # --- termination (PF:239-247) ---
        term_force = contact_force[:, jnp.asarray(self.termination_idx), :]
        terminate = jnp.any(
            jnp.linalg.norm(term_force, axis=-1) > 1.0, axis=-1)
        # NaN quarantine: a numerically exploded env must reset, not poison
        # the batch (long randomized runs can hit pathological states).
        # One fused add-reduce: any NaN/Inf propagates to a non-finite sum
        # (inf + -inf = NaN), so a single isfinite test covers all fields.
        probe = (
            jnp.sum(phys.base_pos, axis=-1) + jnp.sum(phys.base_quat, axis=-1)
            + jnp.sum(phys.qpos, axis=-1) + jnp.sum(phys.qvel, axis=-1)
            + jnp.sum(phys.base_lin_vel, axis=-1)
            + jnp.sum(phys.base_ang_vel, axis=-1))
        bad = ~jnp.isfinite(probe)
        terminate = terminate | bad
        time_out = state.episode_step > self.max_episode_length
        done = terminate | time_out
        state = state.replace(terminate=terminate, time_out=time_out)

        # --- rewards (pre-reset state, PF order: termination->reward->reset) ---
        ctx = dict(
            base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
            proj_grav=proj_grav, phys=phys, torques=torques,
            measured_heights=measured_heights, foot_pos=foot_pos,
            feet_force=feet_force, contact_force=contact_force,
            first_contact=first_contact, contact_filt=contact_filt,
            feet_air_time=air_for_reward,  # pre-zeroing, = ref post-+dt
            done=done, time_out=time_out, state=state,
        )
        if "reward" in self._ablate:
            reward = jnp.zeros(B)
            term_values = jnp.zeros((B, len(self.reward_names)))
        else:
            reward, term_values = self._compute_reward(ctx)
        # quarantined (non-finite) envs must not leak into the PPO batch:
        # zero their rewards entirely (nan_to_num alone maps inf to 3.4e38,
        # which still poisons GAE), and clamp the rest defensively
        reward = jnp.where(bad, 0.0, jnp.nan_to_num(reward))
        # cfg.rewards.clip_reward (default 20, still ~10-50x any
        # legitimate per-step magnitude; scales are dt-premultiplied so
        # healthy per-step terms are O(1)).  The old +-1e4 band let finite-but-
        # huge rewards from kicked envs (deep-penetration spring
        # impulses) through: one storm of them drove value_loss from ~3
        # to 1e8 at ~88k iters and the poisoned critic took the policy
        # down with it (entropy runaway; metrics.jsonl).  See the cfg
        # field note: clip-magnitude steps are the value-loss-storm
        # ignition observed in long round-4 runs.
        clip_r = self.cfg.rewards.clip_reward
        reward = jnp.clip(reward, -clip_r, clip_r)
        term_values = jnp.where(bad[:, None], 0.0,
                                jnp.nan_to_num(term_values))
        term_values = jnp.clip(term_values, -clip_r, clip_r)
        episode_sums = state.episode_sums + term_values
        state = state.replace(episode_sums=episode_sums)

        # --- extras (episode logging before sums reset, PF:276-285) ---
        n_done = jnp.maximum(jnp.sum(done), 1)
        extras = {
            "time_outs": time_out,
            "terminate": terminate,
            "num_resets": jnp.sum(done),
            "num_nan_quarantined": jnp.sum(bad),
            "episode_rew": jnp.where(
                jnp.sum(done) > 0,
                jnp.sum(jnp.where(done[:, None], episode_sums, 0.0), axis=0)
                / n_done / self.max_episode_length_s,
                jnp.zeros(len(self.reward_names))),
            "terrain_level": jnp.mean(state.terrain_level.astype(jnp.float32)),
            "max_command_x": state.lin_vel_x_range[1],
        }

        # --- masked reset (curricula inside) ---
        if "reset" not in self._ablate:
            state = self._reset_envs(state, done, k_reset)

        # --- observations from post-reset state (PF ordering).  The height
        # scan is reused from before the reset — exactly the reference
        # behavior (post_physics_step computes measured_heights once,
        # :212-214, and compute_observations after reset_idx reads the stale
        # buffer for freshly reset envs) ---
        if "obs" in self._ablate:
            obs = jnp.zeros((B, self.num_obs))
            priv = (jnp.zeros((B, self.num_privileged_obs))
                    if self.num_privileged_obs is not None else None)
        else:
            obs, priv = self._compute_observations(state, k_noise,
                                                   measured_heights)

        state = state.replace(
            last_actions=state.actions,
            last_qvel=state.physics.qvel,
        )
        return state, StepOutput(obs, priv, reward, done, extras)

    # --------------------------------------------------------------- obs

    def _compute_observations(self, state: EnvState, key,
                              measured_heights=None):
        cfg = self.cfg
        phys = state.physics
        base_lin_vel, base_ang_vel, proj_grav = self._base_frame_quantities(phys)
        s = cfg.normalization
        q_rel = (phys.qpos - self.default_qpos) * s.dof_pos_scale
        qd = phys.qvel * s.dof_vel_scale
        cmd = state.commands[:, :3] * self.cmd_scale
        if cfg.obs_style == "legged":
            parts = [base_lin_vel * s.lin_vel_scale,
                     base_ang_vel * s.ang_vel_scale,
                     proj_grav, cmd, q_rel, qd, state.actions]
        else:  # PointFoot: no linear velocity, commands last (PF:375-382)
            parts = [base_ang_vel * s.ang_vel_scale, proj_grav,
                     q_rel, qd, state.actions, cmd]
        obs = jnp.concatenate(parts, axis=-1)

        heights = None
        want_heights = (self.num_privileged_obs or 0) > obs.shape[-1] or (
            self.num_obs > obs.shape[-1])
        if want_heights:
            mh = (measured_heights if measured_heights is not None
                  else self._measured_heights(phys))
            heights = jnp.clip(
                phys.base_pos[:, 2:3] - 0.5 - mh, -1.0, 1.0
            ) * s.height_meas_scale

        if self.num_obs > obs.shape[-1] and heights is not None:
            obs = jnp.concatenate([obs, heights], axis=-1)

        if obs.shape[-1] != self.num_obs:
            raise RuntimeError(
                f"obs size {obs.shape[-1]} != num_observations {self.num_obs}")

        priv = None
        if self.num_privileged_obs is not None:
            # privileged = proprio prefix (+ heights for the critic, PF:355-373)
            base = obs[:, : self.num_obs]
            if self.num_privileged_obs > base.shape[-1] and heights is not None:
                priv = jnp.concatenate([base, heights], axis=-1)
            else:
                priv = base
            if priv.shape[-1] != self.num_privileged_obs:
                raise RuntimeError(
                    f"priv obs size {priv.shape[-1]} != "
                    f"num_privileged_obs {self.num_privileged_obs}")

        # additive uniform noise (PF:652-695 magnitudes, corrected layout)
        if cfg.noise.add_noise:
            kn, kp2 = jax.random.split(key)
            noise = (jax.random.uniform(kn, obs.shape) * 2.0 - 1.0) * self.noise_vec
            obs = obs + noise
            if priv is not None:
                if self.priv_noise_vec is not None and \
                        priv.shape[-1] > self.num_obs:
                    extra = (jax.random.uniform(
                        kp2, priv[:, self.num_obs:].shape) * 2.0 - 1.0
                    ) * self.priv_noise_vec
                    priv = priv + jnp.concatenate([noise, extra], axis=-1)
                elif priv.shape[-1] == obs.shape[-1]:
                    priv = priv + noise
        clip = cfg.normalization.clip_observations
        # nan_to_num before clip: quarantined envs can leave one step of
        # stale non-finite height/obs values (reference reuses the stale
        # height buffer too); never hand NaN to the policy
        obs = jnp.clip(jnp.nan_to_num(obs), -clip, clip)
        if priv is not None:
            priv = jnp.clip(jnp.nan_to_num(priv), -clip, clip)
        return obs, priv

    # --------------------------------------------------------------- rewards

    def _compute_reward(self, ctx) -> Tuple[jax.Array, jax.Array]:
        """Weighted sum over active terms + post-clip termination reward
        (point_foot.py:301-318).  Returns (reward, per-term matrix)."""
        values = []
        total = jnp.zeros(self.num_envs)
        for name, scale in self.reward_terms:
            r = REWARD_FNS[name](self, ctx) * scale
            total = total + r
            values.append(r)
        if self.cfg.rewards.only_positive_rewards:
            total = jnp.maximum(total, 0.0)
        if self.termination_scale:
            r = _reward_termination(self, ctx) * (self.termination_scale * self.dt)
            total = total + r
            values.append(r)
        return total, jnp.stack(values, axis=-1)

    # --------------------------------------------------------------- commands

    def _resample_commands(self, state: EnvState, need: jax.Array, key,
                           ) -> EnvState:
        """Sample new commands where `need` (LR:337-351), respecting pins."""
        cfg = self.cfg.commands
        B = self.num_envs
        k1, k2, k3, k4 = jax.random.split(key, 4)
        need = need & ~state.cmd_pinned
        lo, hi = state.lin_vel_x_range[0], state.lin_vel_x_range[1]
        vx = jax.random.uniform(k1, (B,), minval=lo, maxval=hi)
        if cfg.low_cmd_oversample > 0.0:
            # low-command oversampling (CommandsCfg.low_cmd_oversample):
            # redirect a fraction of draws into the precision-critical
            # [0.2, band] magnitude range (sign random) so sharpened
            # tracking selectivity is actually sampled
            k1a, k1b, k1c = jax.random.split(k1, 3)
            mag = jax.random.uniform(k1a, (B,), minval=0.2,
                                     maxval=cfg.low_cmd_band)
            sign = jnp.where(
                jax.random.uniform(k1b, (B,)) < 0.5, -1.0, 1.0)
            use_low = jax.random.uniform(k1c, (B,)) < cfg.low_cmd_oversample
            vx = jnp.where(use_low, sign * mag, vx)
        vy = jax.random.uniform(k2, (B,), minval=cfg.lin_vel_y[0],
                                maxval=cfg.lin_vel_y[1])
        cmds = state.commands
        cmds = cmds.at[:, 0].set(jnp.where(need, vx, cmds[:, 0]))
        cmds = cmds.at[:, 1].set(jnp.where(need, vy, cmds[:, 1]))
        if cfg.heading_command:
            heading = jax.random.uniform(k3, (B,), minval=cfg.heading[0],
                                         maxval=cfg.heading[1])
            cmds = cmds.at[:, 3].set(jnp.where(need, heading, cmds[:, 3]))
        else:
            wz = jax.random.uniform(k4, (B,), minval=cfg.ang_vel_yaw[0],
                                    maxval=cfg.ang_vel_yaw[1])
            cmds = cmds.at[:, 2].set(jnp.where(need, wz, cmds[:, 2]))
        # zero small commands (LR:349-350)
        small = jnp.linalg.norm(cmds[:, :2], axis=-1) < 0.2
        zero_mask = need & small
        cmds = cmds.at[:, :2].multiply(jnp.where(zero_mask, 0.0, 1.0)[:, None])
        return state.replace(commands=cmds)

    def _update_commands(self, state: EnvState, key, phys) -> EnvState:
        """Periodic resample + heading controller (PF:479-490)."""
        need = (state.episode_step % self.resample_interval) == 0
        state = self._resample_commands(state, need, key)
        if self.cfg.commands.heading_command:
            cmds = state.commands
            yaw = quat_ops.yaw(phys.base_quat)
            wz = quat_ops.heading_wz(cmds[:, 3], yaw)
            cmds = cmds.at[:, 2].set(
                jnp.where(state.cmd_pinned, cmds[:, 2], wz))
            state = state.replace(commands=cmds)
        return state

    # --------------------------------------------------------------- resets

    def _reset_envs(self, state: EnvState, done: jax.Array, key) -> EnvState:
        """Masked functional reset of done envs: curricula, state resample,
        buffer clears (point_foot.py:249-288, :549-588)."""
        cfg = self.cfg
        B = self.num_envs
        m = self.model
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)

        # ---- terrain curriculum (PF:613-636) ----
        level = state.terrain_level
        origin = state.env_origin
        if cfg.terrain.curriculum and cfg.terrain.mesh_type != "plane":
            dist = jnp.linalg.norm(
                state.physics.base_pos[:, :2] - state.env_origin[:, :2], axis=-1)
            if cfg.terrain.cmd_conditioned_promotion:
                # promotion DEVIATION (TerrainCfg.cmd_conditioned_promotion):
                # required distance scales with the commanded speed —
                # clip(0.5*|cmd|*T, 2.0 m, terrain_length/2) — so slow-but-
                # tracking episodes can promote too (the reference's fixed
                # terrain_length/2 bar is unreachable below ~0.4 m/s)
                cmd_speed = jnp.linalg.norm(state.commands[:, :2], axis=-1)
                required = jnp.clip(
                    0.5 * cmd_speed * self.max_episode_length_s,
                    2.0, self.terrain.terrain_length / 2)
                move_up = dist > required
            else:
                move_up = dist > self.terrain.terrain_length / 2
            # DELIBERATE deviation from point_foot.py:630: the reference
            # scales required distance by the FULL episode length even for
            # episodes that terminated early, demoting a robot that tracked
            # perfectly until a fall at t<T for "missing" the remaining
            # (T-t) worth of distance.  Under honest (non-adhesive) contact
            # this over-demotion traps the whole batch at level ~1 and the
            # policy overfits easy terrain (observed: terrain_level 4.5 ->
            # 1.0 while tracking reward climbed).  Scale by the time the
            # episode actually ran instead.
            if cfg.terrain.reference_exact_demotion:
                # reference-exact A/B path (point_foot.py:627-631): required
                # distance scaled by the FULL episode length regardless of
                # when the episode ended; judged on net displacement.
                ep_secs = jnp.full_like(dist, self.max_episode_length_s)
                cmd_dist = (jnp.linalg.norm(state.commands[:, :2], axis=-1)
                            * ep_secs * 0.5)
                move_down = (dist < cmd_dist) & ~move_up
            else:
                ep_secs = state.episode_step.astype(jnp.float32) * self.dt
                cmd_dist = (jnp.linalg.norm(state.commands[:, :2], axis=-1)
                            * ep_secs * 0.5)
                # demote on the along-command progress credit, not net
                # displacement: a yaw command curls the path, so an arcing
                # robot that tracks perfectly shows little displacement from
                # origin and would be demoted for obeying its command
                # (round-2 queue; see EnvState.cmd_progress).  Promotion
                # stays displacement-based — crossing the terrain is what
                # promotion measures, and an arc genuinely doesn't cross it.
                move_down = (state.cmd_progress < cmd_dist) & ~move_up
            new_level = level + move_up.astype(jnp.int32) - move_down.astype(jnp.int32)
            rand_level = jax.random.randint(
                k1, (B,), 0, self.terrain.num_levels)
            new_level = jnp.where(new_level >= self.terrain.num_levels,
                                  rand_level, jnp.maximum(new_level, 0))
            level = jnp.where(done, new_level, level)
            origin = self.terrain.env_origins[level, state.terrain_type]

        # ---- command curriculum (PF:638-650) ----
        rng_range = state.lin_vel_x_range
        if cfg.commands.curriculum:
            idx = self.reward_names.index("tracking_lin_vel")
            track_scale = dict(self.reward_terms)["tracking_lin_vel"]
            mean_track = jnp.sum(
                jnp.where(done, state.episode_sums[:, idx], 0.0)
            ) / jnp.maximum(jnp.sum(done), 1)
            trigger = ((state.common_step % self.max_episode_length) == 0) & (
                jnp.sum(done) > 0) & (
                mean_track / self.max_episode_length > 0.8 * track_scale)
            widened = jnp.stack([
                jnp.clip(rng_range[0] - 0.5, -cfg.commands.max_curriculum, 0.0),
                jnp.clip(rng_range[1] + 0.5, 0.0, cfg.commands.max_curriculum),
            ])
            rng_range = jnp.where(trigger, widened, rng_range)

        # ---- state resets (PF:549-588) ----
        qpos_new = self.default_qpos * jax.random.uniform(
            k2, (B, m.nj), minval=0.5, maxval=1.5)
        base_pos_new = origin + jnp.asarray(cfg.init_state.pos)
        if cfg.terrain.mesh_type != "plane":
            base_pos_new = base_pos_new.at[:, :2].add(
                jax.random.uniform(k3, (B, 2), minval=-1.0, maxval=1.0))
        vel6 = jax.random.uniform(k4, (B, 6), minval=-0.5, maxval=0.5)
        quat_new = jnp.broadcast_to(
            jnp.asarray(cfg.init_state.rot, jnp.float32), (B, 4))

        d3 = done[:, None]
        phys = state.physics
        phys = phys.replace(
            base_pos=jnp.where(d3, base_pos_new, phys.base_pos),
            base_quat=jnp.where(d3, quat_new, phys.base_quat),
            base_lin_vel=jnp.where(d3, vel6[:, :3], phys.base_lin_vel),
            base_ang_vel=jnp.where(d3, vel6[:, 3:], phys.base_ang_vel),
            qpos=jnp.where(d3, qpos_new, phys.qpos),
            qvel=jnp.where(d3, jnp.zeros_like(phys.qvel), phys.qvel),
            # contact_force is the one field the masked reset above does not
            # replace — clear it too so a quarantined (NaN) env leaves no
            # residue anywhere (bad => done, so every non-finite lane is
            # fully rewritten; no tree-wide nan_to_num pass needed)
            contact_force=jnp.where(
                done[:, None, None], 0.0, phys.contact_force),
        )

        state = state.replace(
            physics=phys,
            terrain_level=level,
            env_origin=origin,
            lin_vel_x_range=rng_range,
            episode_step=jnp.where(done, 0, state.episode_step),
            cmd_progress=jnp.where(done, 0.0, state.cmd_progress),
            actions=jnp.where(d3, 0.0, state.actions),
            last_actions=jnp.where(d3, 0.0, state.last_actions),
            last_qvel=jnp.where(d3, 0.0, state.last_qvel),
            feet_air_time=jnp.where(d3, 0.0, state.feet_air_time),
            last_feet_air_time=jnp.where(d3, 0.0, state.last_feet_air_time),
            current_max_feet_height=jnp.where(d3, 0.0, state.current_max_feet_height),
            last_max_feet_height=jnp.where(d3, 0.0, state.last_max_feet_height),
            last_contacts=jnp.where(d3, False, state.last_contacts),
            episode_sums=jnp.where(d3, 0.0, state.episode_sums),
            actuator_carry=jnp.where(
                done.reshape((B,) + (1,) * (state.actuator_carry.ndim - 1)),
                0.0, state.actuator_carry),
        )
        # fresh episodes get fresh commands (legged_robot.py reset_idx)
        return self._resample_commands(state, done, k5)

    # ---------------------------------------------------------- sys-ID hooks

    def update_frictions(self, state: EnvState, friction) -> EnvState:
        """Pin per-joint DOF dry friction (point_foot.py:103-108 sets
        dof_props["friction"][i] per joint — the 6-d quantity the GAN/
        identifier propose, GAN.py:71-83).  Accepts scalar, (nj,), or
        (B, nj); per-env values flow into the dynamics as pytree leaves."""
        f = jnp.broadcast_to(
            jnp.asarray(friction), state.params.joint_friction.shape)
        return state.replace(params=state.params.replace(joint_friction=f))

    def update_ground_friction(self, state: EnvState, friction) -> EnvState:
        """Pin contact (ground) Coulomb friction per collision sphere — the
        domain-randomization axis (point_foot.py:411-435)."""
        f = jnp.broadcast_to(jnp.asarray(friction), state.params.friction.shape)
        return state.replace(params=state.params.replace(friction=f))

    def update_added_mass_and_base_com(self, state: EnvState, added_mass,
                                       com_offset) -> EnvState:
        """Pin base payload + CoM shift (point_foot.py:110-121)."""
        am = jnp.broadcast_to(jnp.asarray(added_mass), state.params.added_mass.shape)
        co = jnp.broadcast_to(jnp.asarray(com_offset), state.params.com_offset.shape)
        return state.replace(
            params=state.params.replace(added_mass=am, com_offset=co))

    def update_cmd(self, state: EnvState, cmd) -> EnvState:
        """Pin commands externally (sys-ID, point_foot.py:123-129)."""
        cmds = jnp.broadcast_to(
            jnp.asarray(cmd), (self.num_envs, jnp.asarray(cmd).shape[-1]))
        full = state.commands.at[:, : cmds.shape[-1]].set(cmds)
        return state.replace(
            commands=full, cmd_pinned=jnp.ones(self.num_envs, bool))


# ---------------------------------------------------------------------------
# Reward term table (point_foot.py:1131-1253).  Each fn: (env, ctx) -> (B,)
# ---------------------------------------------------------------------------


def _reward_lin_vel_z(env, ctx):
    return jnp.square(ctx["base_lin_vel"][:, 2])


def _reward_ang_vel_xy(env, ctx):
    return jnp.sum(jnp.square(ctx["base_ang_vel"][:, :2]), axis=-1)


def _reward_orientation(env, ctx):
    return jnp.sum(jnp.square(ctx["proj_grav"][:, :2]), axis=-1)


def _reward_base_height(env, ctx):
    h = jnp.mean(
        ctx["phys"].base_pos[:, 2:3] - ctx["measured_heights"], axis=-1)
    return jnp.square(h - env.cfg.rewards.base_height_target)


def _reward_torques(env, ctx):
    return jnp.sum(jnp.square(ctx["torques"]), axis=-1)


def _reward_dof_vel(env, ctx):
    return jnp.sum(jnp.square(ctx["phys"].qvel), axis=-1)


def _reward_dof_acc(env, ctx):
    st = ctx["state"]
    return jnp.sum(
        jnp.square((st.last_qvel - ctx["phys"].qvel) / env.dt), axis=-1)


def _reward_action_rate(env, ctx):
    st = ctx["state"]
    return jnp.sum(jnp.square(st.last_actions - st.actions), axis=-1)


def _reward_collision(env, ctx):
    if not env.penalized_idx:
        return jnp.zeros(env.num_envs)
    f = ctx["contact_force"][:, jnp.asarray(env.penalized_idx), :]
    return jnp.sum((jnp.linalg.norm(f, axis=-1) > 0.1).astype(jnp.float32),
                   axis=-1)


def _reward_termination(env, ctx):
    return (ctx["done"] & ~ctx["time_out"]).astype(jnp.float32)


def _reward_dof_pos_limits(env, ctx):
    # reference stores SOFT limits (mid ± 0.5*range*soft_dof_pos_limit) in
    # dof_pos_limits before this reward reads them (point_foot.py:455-463)
    m = env.model
    soft = env.cfg.rewards.soft_dof_pos_limit
    mid = 0.5 * (m.q_lower + m.q_upper)
    half = 0.5 * (m.q_upper - m.q_lower) * soft
    q = ctx["phys"].qpos
    low = -jnp.minimum(q - (mid - half), 0.0)
    high = jnp.maximum(q - (mid + half), 0.0)
    return jnp.sum(low + high, axis=-1)


def _reward_dof_vel_limits(env, ctx):
    lim = env.qvel_limit * env.cfg.rewards.soft_dof_vel_limit
    return jnp.sum(
        jnp.clip(jnp.abs(ctx["phys"].qvel) - lim, 0.0, 1.0), axis=-1)


def _reward_torque_limits(env, ctx):
    lim = env.torque_limit * env.cfg.rewards.soft_torque_limit
    return jnp.sum(jnp.maximum(jnp.abs(ctx["torques"]) - lim, 0.0), axis=-1)


def _reward_tracking_lin_vel(env, ctx):
    cmd = ctx["state"].commands[:, :2]
    err = jnp.sum(jnp.square(cmd - ctx["base_lin_vel"][:, :2]), axis=-1)
    sigma = env.cfg.rewards.tracking_sigma
    vref = env.cfg.rewards.tracking_rel_vref
    if vref > 0.0:  # trace-time constant; 0 = reference-exact fixed width
        sigma = sigma * jnp.clip(
            jnp.sum(jnp.square(cmd), axis=-1) / (vref * vref), 0.04, 1.0)
    return jnp.exp(-err / sigma)


def _reward_tracking_ang_vel(env, ctx):
    err = jnp.square(ctx["state"].commands[:, 2] - ctx["base_ang_vel"][:, 2])
    return jnp.exp(-err / env.cfg.rewards.tracking_sigma)


def _reward_feet_air_time(env, ctx):
    """PointFoot: band penalty on air time at first contact (PF:1202-1213).
    LeggedRobot family: (air_time - 0.5) bonus gated by nonzero command
    (LR:867-876)."""
    st = ctx["state"]
    fc = ctx["first_contact"].astype(jnp.float32)
    # the accumulated swing time at touchdown (ctx value, NOT the stored
    # state leaf, which is already zeroed for feet in contact)
    air = ctx["feet_air_time"]
    if env.cfg.obs_style == "legged":
        rew = jnp.sum((air - 0.5) * fc, axis=-1)
        return rew * (jnp.linalg.norm(st.commands[:, :2], axis=-1) > 0.1)
    below = jnp.sum(
        jnp.minimum(air - env.cfg.rewards.min_feet_air_time, 0.0)
        * fc, axis=-1)
    above = jnp.sum(
        jnp.minimum(env.cfg.rewards.max_feet_air_time - air, 0.0)
        * fc, axis=-1)
    return below + above


def _reward_no_fly(env, ctx):
    contacts = ctx["feet_force"][..., 2] > 0.1
    return (jnp.sum(contacts.astype(jnp.float32), axis=-1) == 1.0).astype(
        jnp.float32)


def _reward_unbalance_feet_air_time(env, ctx):
    return jnp.var(ctx["state"].last_feet_air_time, axis=-1)


def _reward_unbalance_feet_height(env, ctx):
    return jnp.var(ctx["state"].last_max_feet_height, axis=-1)


def _reward_feet_stumble(env, ctx):
    f = ctx["feet_force"]
    lateral = jnp.linalg.norm(f[..., :2], axis=-1)
    return jnp.any(lateral > 5.0 * jnp.abs(f[..., 2]), axis=-1).astype(
        jnp.float32)


def _reward_stand_still(env, ctx):
    cmd = ctx["state"].commands
    if env.cfg.obs_style == "legged":
        # LR:900-902: joint displacement at near-zero command
        return jnp.sum(
            jnp.abs(ctx["phys"].qpos - env.default_qpos), axis=-1
        ) * (jnp.linalg.norm(cmd[:, :2], axis=-1) < 0.1)
    # PF:1231-1235: elementwise command gate (quirk #8 — keep PF semantics)
    rew_lin = jnp.abs(ctx["base_lin_vel"][:, :2]) * (cmd[:, :2] < 0.1)
    rew_ang = jnp.abs(ctx["base_ang_vel"][:, 2:3]) * (cmd[:, 2:3] < 0.1)
    return jnp.sum(jnp.concatenate([rew_lin, rew_ang], axis=-1), axis=-1)


def _reward_feet_contact_forces(env, ctx):
    norm = jnp.linalg.norm(ctx["feet_force"], axis=-1)
    return jnp.sum(
        jnp.maximum(norm - env.cfg.rewards.max_contact_force, 0.0), axis=-1)


def _reward_feet_distance(env, ctx):
    """Correct pairwise form of PF:1242-1250 (reference inner loop overwrote
    the distance — harmless for 2 feet; see SURVEY.md quirk #6)."""
    fp = ctx["foot_pos"]
    nf = fp.shape[1]
    total = jnp.zeros(fp.shape[0])
    for i in range(nf - 1):
        for j in range(i + 1, nf):
            d = jnp.linalg.norm(fp[:, i, :2] - fp[:, j, :2], axis=-1)
            total = total + jnp.clip(
                env.cfg.rewards.min_feet_distance - d, 0.0, 1.0)
    return total


def _reward_survival(env, ctx):
    return (~ctx["done"]).astype(jnp.float32) * env.dt


def _reward_feet_height(env, ctx):
    """Clearance shaping (enabled when a feet_height scale exists)."""
    st = ctx["state"]
    target = env.cfg.rewards.clearance_height_target
    return jnp.sum(
        jnp.square(st.current_max_feet_height - target), axis=-1)


REWARD_FNS = {
    "lin_vel_z": _reward_lin_vel_z,
    "ang_vel_xy": _reward_ang_vel_xy,
    "orientation": _reward_orientation,
    "base_height": _reward_base_height,
    "torques": _reward_torques,
    "dof_vel": _reward_dof_vel,
    "dof_acc": _reward_dof_acc,
    "action_rate": _reward_action_rate,
    "collision": _reward_collision,
    "termination": _reward_termination,
    "dof_pos_limits": _reward_dof_pos_limits,
    "dof_vel_limits": _reward_dof_vel_limits,
    "torque_limits": _reward_torque_limits,
    "tracking_lin_vel": _reward_tracking_lin_vel,
    "tracking_ang_vel": _reward_tracking_ang_vel,
    "feet_air_time": _reward_feet_air_time,
    "no_fly": _reward_no_fly,
    "unbalance_feet_air_time": _reward_unbalance_feet_air_time,
    "unbalance_feet_height": _reward_unbalance_feet_height,
    "feet_stumble": _reward_feet_stumble,
    "stand_still": _reward_stand_still,
    "feet_contact_forces": _reward_feet_contact_forces,
    "feet_distance": _reward_feet_distance,
    "survival": _reward_survival,
    "feet_height": _reward_feet_height,
}
