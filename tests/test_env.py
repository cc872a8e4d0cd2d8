"""Environment-layer tests: shapes, semantics, golden reward values.

Covers the contract of reference point_foot.py step/post_physics_step
(SURVEY.md §2.4) far beyond the reference's single smoke test
(legged_gym/tests/test_env.py:42-52).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointfoot_tpu.utils.registry import task_registry

B = 8


@pytest.fixture(scope="module")
def flat_env():
    return task_registry.make_env("pointfoot_flat", num_envs=B)


@pytest.fixture(scope="module")
def flat_run(flat_env):
    env = flat_env
    state = env.init_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    state, out = step(state, jnp.zeros((B, 6)))
    return env, state, out, step


def test_obs_shapes_and_layout(flat_run):
    env, state, out, _ = flat_run
    assert out.obs.shape == (B, 27)
    assert out.privileged_obs.shape == (B, 27)
    # PointFoot layout: [ang_vel*0.25 | gravity | q-qdef | qd*0.05 | a | cmd]
    g = np.asarray(out.obs[:, 3:6])
    # projected gravity ~ (0,0,-1) for upright robots (+noise)
    assert np.all(g[:, 2] < -0.8)


def test_smoke_zero_actions_episode(flat_run):
    """Reference test_env equivalent: run 10x with zero actions, finite."""
    env, state, out, step = flat_run
    for _ in range(30):
        state, out = step(state, jnp.zeros((B, 6)))
    assert np.isfinite(np.asarray(out.obs)).all()
    assert np.isfinite(np.asarray(out.reward)).all()


def test_rough_env_priv_obs():
    env = task_registry.make_env("pointfoot_rough", num_envs=4)
    state = env.init_state(jax.random.PRNGKey(1))
    state, out = jax.jit(env.step)(state, jnp.zeros((4, 6)))
    assert out.obs.shape == (4, 27)
    assert out.privileged_obs.shape == (4, 148)
    # height channel is clipped*5 -> within ±5
    assert np.abs(np.asarray(out.privileged_obs[:, 27:])).max() <= 5.0 + 1e-5


def test_termination_on_fall(flat_env):
    """Robots started lying on the ground must terminate via base contact."""
    env = flat_env
    state = env.init_state(jax.random.PRNGKey(2))
    phys = state.physics
    # put robots on their side at ground level
    quat = jnp.broadcast_to(
        jnp.asarray([0.7071, 0.0, 0.0, 0.7071]), phys.base_quat.shape)
    state = state.replace(
        physics=phys.replace(
            base_pos=phys.base_pos.at[:, 2].set(0.12), base_quat=quat))
    step = jax.jit(env.step)
    done_any = np.zeros(B, bool)
    for _ in range(10):
        state, out = step(state, jnp.zeros((B, 6)))
        done_any |= np.asarray(out.done)
    assert done_any.all()
    # terminate flag (contact-only) was set, not just timeouts
    assert np.asarray(out.extras["terminate"]).any() or done_any.all()


def test_timeout_and_bootstrapping_flag(flat_env):
    env = flat_env
    state = env.init_state(jax.random.PRNGKey(3))
    # force near-timeout
    state = state.replace(
        episode_step=jnp.full(B, env.max_episode_length, jnp.int32))
    state, out = jax.jit(env.step)(state, jnp.zeros((B, 6)))
    assert np.asarray(out.extras["time_outs"]).all()
    assert np.asarray(out.done).all()
    # after masked reset, episode steps are cleared
    assert np.asarray(state.episode_step).max() == 0


def test_reset_randomization_ranges(flat_env):
    """DoF reset in 0.5-1.5x default, root vel in ±0.5 (PF:549-588)."""
    env = task_registry.make_env("pointfoot_flat", num_envs=64)
    state = env.init_state(jax.random.PRNGKey(4))
    v = np.asarray(state.physics.base_lin_vel)
    assert np.abs(v).max() <= 0.5 + 1e-5
    assert np.abs(v).std() > 0.05  # actually randomized
    # default qpos is 0 for pointfoot -> qpos stays 0 regardless of scale
    np.testing.assert_allclose(np.asarray(state.physics.qpos), 0.0, atol=1e-6)


def test_domain_randomization_params(flat_env):
    env = task_registry.make_env("pointfoot_flat", num_envs=64)
    state = env.init_state(jax.random.PRNGKey(5))
    fric = np.asarray(state.params.friction)
    assert fric.min() >= 0.0 and fric.max() <= 1.5 + 1e-6
    assert np.unique(fric[:, 0]).size > 4  # bucketed but diverse
    am = np.asarray(state.params.added_mass)
    assert am.min() >= -1.0 - 1e-6 and am.max() <= 2.0 + 1e-6
    com = np.asarray(state.params.com_offset)
    assert np.abs(com[:, 0]).max() <= 0.03 + 1e-6
    assert np.abs(com[:, 1]).max() <= 0.02 + 1e-6


def test_sysid_hooks(flat_env):
    """update_frictions / update_added_mass_and_base_com / update_cmd
    (point_foot.py:103-129)."""
    env = flat_env
    state = env.init_state(jax.random.PRNGKey(6))
    # 6-d per-joint DOF friction (reference sets dof_props["friction"][i])
    fric6 = jnp.asarray([0.01, 0.05, 0.1, 0.15, 0.02, 0.08])
    state = env.update_frictions(state, fric6)
    np.testing.assert_allclose(
        np.asarray(state.params.joint_friction),
        np.broadcast_to(np.asarray(fric6), (env.num_envs, 6)))
    state = env.update_ground_friction(state, 0.77)
    np.testing.assert_allclose(np.asarray(state.params.friction), 0.77)
    state = env.update_added_mass_and_base_com(state, 1.5, [0.01, 0.0, -0.01])
    np.testing.assert_allclose(np.asarray(state.params.added_mass), 1.5)
    state = env.update_cmd(state, [0.5, 0.0, 0.1])
    state2, out = jax.jit(env.step)(state, jnp.zeros((B, 6)))
    # pinned commands survive resampling steps
    np.testing.assert_allclose(np.asarray(state2.commands[:, 0]), 0.5)
    np.testing.assert_allclose(np.asarray(state2.commands[:, 2]), 0.1)


def test_determinism(flat_env):
    env = flat_env
    s1 = env.init_state(jax.random.PRNGKey(7))
    s2 = env.init_state(jax.random.PRNGKey(7))
    step = jax.jit(env.step)
    a = jnp.ones((B, 6)) * 0.1
    for _ in range(5):
        s1, o1 = step(s1, a)
        s2, o2 = step(s2, a)
    np.testing.assert_array_equal(np.asarray(o1.obs), np.asarray(o2.obs))
    np.testing.assert_array_equal(np.asarray(o1.reward), np.asarray(o2.reward))


def test_push_queues_force(flat_env):
    env = flat_env
    state = env.init_state(jax.random.PRNGKey(8))
    # push fires when common_step % push_interval == 0
    state = state.replace(
        common_step=jnp.asarray(env.push_interval - 1, jnp.int32))
    state, out = jax.jit(env.step)(state, jnp.zeros((B, 6)))
    assert np.abs(np.asarray(state.push_force)).max() > 0.0
    state, out = jax.jit(env.step)(state, jnp.zeros((B, 6)))
    # consumed and re-zeroed on the next non-push step
    np.testing.assert_allclose(np.asarray(state.push_force), 0.0)


class TestRewardGoldenValues:
    """Golden-value checks of individual reward terms against hand-computed
    expectations (reference formulas point_foot.py:1131-1253)."""

    def _ctx(self, env, state, **over):
        B_ = env.num_envs
        ctx = dict(
            base_lin_vel=jnp.zeros((B_, 3)),
            base_ang_vel=jnp.zeros((B_, 3)),
            proj_grav=jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (B_, 1)),
            phys=state.physics,
            torques=jnp.zeros((B_, 6)),
            measured_heights=jnp.zeros((B_, env.num_height_points)),
            foot_pos=jnp.zeros((B_, 2, 3)),
            feet_force=jnp.zeros((B_, 2, 3)),
            contact_force=state.physics.contact_force,
            first_contact=jnp.zeros((B_, 2), bool),
            contact_filt=jnp.zeros((B_, 2), bool),
            feet_air_time=state.feet_air_time + env.dt,
            done=jnp.zeros(B_, bool),
            time_out=jnp.zeros(B_, bool),
            state=state,
        )
        ctx.update(over)
        return ctx

    def test_tracking_lin_vel(self, flat_env):
        from pointfoot_tpu.envs.legged_env import REWARD_FNS

        env = flat_env
        state = env.init_state(jax.random.PRNGKey(9))
        state = state.replace(
            commands=state.commands.at[:, 0].set(0.5).at[:, 1].set(0.0))
        ctx = self._ctx(env, state,
                        base_lin_vel=jnp.tile(jnp.asarray([0.5, 0.0, 0.0]),
                                              (B, 1)))
        r = REWARD_FNS["tracking_lin_vel"](env, ctx)
        np.testing.assert_allclose(np.asarray(r), 1.0, atol=1e-6)
        ctx2 = self._ctx(env, state, base_lin_vel=jnp.zeros((B, 3)))
        r2 = REWARD_FNS["tracking_lin_vel"](env, ctx2)
        np.testing.assert_allclose(np.asarray(r2), np.exp(-0.25 / 0.25),
                                   rtol=1e-5)

    def test_no_fly_single_contact(self, flat_env):
        from pointfoot_tpu.envs.legged_env import REWARD_FNS

        env = flat_env
        state = env.init_state(jax.random.PRNGKey(10))
        ff = jnp.zeros((B, 2, 3)).at[:, 0, 2].set(10.0)
        r = REWARD_FNS["no_fly"](env, self._ctx(env, state, feet_force=ff))
        np.testing.assert_allclose(np.asarray(r), 1.0)
        ff2 = ff.at[:, 1, 2].set(10.0)
        r2 = REWARD_FNS["no_fly"](env, self._ctx(env, state, feet_force=ff2))
        np.testing.assert_allclose(np.asarray(r2), 0.0)

    def test_feet_air_time_band(self, flat_env):
        from pointfoot_tpu.envs.legged_env import REWARD_FNS

        env = flat_env
        state = env.init_state(jax.random.PRNGKey(11))
        fc = jnp.zeros((B, 2), bool).at[:, 0].set(True)
        # air time 0.4 in [0.25, 0.65] -> no penalty
        r = REWARD_FNS["feet_air_time"](
            env, self._ctx(env, state, first_contact=fc,
                           feet_air_time=jnp.full((B, 2), 0.4)))
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)
        # air time 0.1 -> below-min penalty = 0.1-0.25 = -0.15
        r2 = REWARD_FNS["feet_air_time"](
            env, self._ctx(env, state, first_contact=fc,
                           feet_air_time=jnp.full((B, 2), 0.1)))
        np.testing.assert_allclose(np.asarray(r2), -0.15, atol=1e-6)
        # air time 1.0 -> above-max penalty = 0.65-1.0 = -0.35
        r3 = REWARD_FNS["feet_air_time"](
            env, self._ctx(env, state, first_contact=fc,
                           feet_air_time=jnp.full((B, 2), 1.0)))
        np.testing.assert_allclose(np.asarray(r3), -0.35, atol=1e-5)

    def test_feet_distance_penalty(self, flat_env):
        from pointfoot_tpu.envs.legged_env import REWARD_FNS

        env = flat_env
        state = env.init_state(jax.random.PRNGKey(12))
        fp = jnp.zeros((B, 2, 3)).at[:, 1, 1].set(0.04)  # 4 cm apart
        r = REWARD_FNS["feet_distance"](env, self._ctx(env, state, foot_pos=fp))
        np.testing.assert_allclose(np.asarray(r), 0.1 - 0.04, atol=1e-6)
        fp2 = jnp.zeros((B, 2, 3)).at[:, 1, 1].set(0.2)
        r2 = REWARD_FNS["feet_distance"](env, self._ctx(env, state, foot_pos=fp2))
        np.testing.assert_allclose(np.asarray(r2), 0.0)

    def test_survival_and_termination(self, flat_env):
        from pointfoot_tpu.envs.legged_env import REWARD_FNS

        env = flat_env
        state = env.init_state(jax.random.PRNGKey(13))
        done = jnp.zeros(B, bool).at[0].set(True)
        to = jnp.zeros(B, bool)
        ctx = self._ctx(env, state, done=done, time_out=to)
        surv = np.asarray(REWARD_FNS["survival"](env, ctx))
        assert surv[0] == 0.0 and np.allclose(surv[1:], env.dt)
        term = np.asarray(REWARD_FNS["termination"](env, ctx))
        assert term[0] == 1.0 and np.all(term[1:] == 0.0)

    def test_stand_still(self, flat_env):
        from pointfoot_tpu.envs.legged_env import REWARD_FNS

        env = flat_env
        state = env.init_state(jax.random.PRNGKey(14))
        state = state.replace(commands=jnp.zeros((B, 4)))
        ctx = self._ctx(
            env, state,
            base_lin_vel=jnp.tile(jnp.asarray([0.3, -0.2, 0.0]), (B, 1)),
            base_ang_vel=jnp.tile(jnp.asarray([0.0, 0.0, 0.4]), (B, 1)))
        r = REWARD_FNS["stand_still"](env, ctx)
        np.testing.assert_allclose(np.asarray(r), 0.3 + 0.2 + 0.4, atol=1e-6)


@pytest.mark.parametrize("task", ["anymal_c_flat", "anymal_b", "a1",
                                  "cassie", "anymal_c_rough"])
def test_all_registered_tasks_step(task):
    """Every registered robot family builds and steps with finite outputs
    (reference smoke test semantics, tests/test_env.py:42-52, across the 7
    registered tasks — pointfoot_{rough,flat} are covered elsewhere)."""
    env = task_registry.make_env(task, num_envs=2)
    state = env.init_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(3):
        state, out = step(state, jnp.zeros((2, env.num_actions)))
    assert out.obs.shape == (2, env.num_obs)
    assert np.isfinite(np.asarray(out.obs)).all()
    assert np.isfinite(np.asarray(out.reward)).all()
    if env.num_privileged_obs:
        assert out.privileged_obs.shape == (2, env.num_privileged_obs)


def test_cmd_progress_accumulates_and_resets(flat_env):
    """cmd_progress integrates velocity along the yaw-rotated commanded
    direction (gated on |cmd| > 0.05) and clears on reset."""
    from pointfoot_tpu.ops import quat as quat_ops

    env = flat_env
    state = env.init_state(jax.random.PRNGKey(3))
    # pin a pure-forward command (sys-ID hook keeps the resampler off)
    state = env.update_cmd(state, jnp.broadcast_to(
        jnp.asarray([0.5, 0.0, 0.0]), (B, 3)))
    prev = np.asarray(state.cmd_progress)
    np.testing.assert_array_equal(prev, 0.0)
    state, _ = jax.jit(env.step)(state, jnp.zeros((B, 6)))
    yaw = np.asarray(quat_ops.yaw(state.physics.base_quat))
    v = np.asarray(state.physics.base_lin_vel[:, :2])
    expect = env.dt * (v[:, 0] * np.cos(yaw) + v[:, 1] * np.sin(yaw))
    np.testing.assert_allclose(np.asarray(state.cmd_progress), expect,
                               atol=1e-5)
    # zero command accrues nothing
    state0 = env.update_cmd(state, jnp.zeros((B, 3)))
    state1, _ = jax.jit(env.step)(state0, jnp.zeros((B, 6)))
    np.testing.assert_allclose(np.asarray(state1.cmd_progress),
                               np.asarray(state0.cmd_progress), atol=1e-6)


def test_terrain_curriculum_credits_arc_walking():
    """A robot obeying a yaw command walks an arc: little net displacement
    but full along-command progress.  Demotion must use the progress
    credit (an arcing perfect tracker is NOT demoted), while a robot that
    tracked nothing still is."""
    env = task_registry.make_env("pointfoot_rough", num_envs=4)
    state = env.init_state(jax.random.PRNGKey(0))
    lvl = jnp.full((4,), 3, jnp.int32)
    origin = env.terrain.env_origins[lvl, state.terrain_type]
    # timeout-length episode at (vx 0.5, wz 1.0): cmd_dist = 0.5*T*0.5
    T = int(env.max_episode_length)
    cmds = jnp.broadcast_to(jnp.asarray([0.5, 0.0, 1.0, 0.0]), (4, 4))
    full_progress = 0.5 * T * env.dt  # tracked the command the whole way
    state = state.replace(
        terrain_level=lvl, env_origin=origin,
        physics=state.physics.replace(
            # back at the origin: the arc closed (worst case for the old
            # displacement criterion)
            base_pos=state.physics.base_pos.at[:, :2].set(origin[:, :2])),
        commands=cmds,
        episode_step=jnp.full((4,), T, jnp.int32),
        cmd_progress=jnp.full((4,), full_progress),
    )
    done = jnp.ones(4, bool)
    new = env._reset_envs(state, done, jax.random.PRNGKey(1))
    assert (np.asarray(new.terrain_level) >= 3).all(), \
        f"arc walker demoted: {new.terrain_level}"
    # same episode with no progress -> demoted
    state2 = state.replace(cmd_progress=jnp.zeros(4))
    new2 = env._reset_envs(state2, done, jax.random.PRNGKey(1))
    assert (np.asarray(new2.terrain_level) == 2).all(), \
        f"non-tracker not demoted: {new2.terrain_level}"


@pytest.mark.slow
def test_every_registered_task_has_live_joints():
    """Cross-family physics invariant: for EVERY registered task, stepping
    with small nonzero actions must (1) keep the state finite and (2)
    actually MOVE the joints.  The anymal_c asset shipped round 1 with
    degenerate URDF joint limits (lower=upper=0 baked from a <limit>
    element with no range attributes) that clamped every joint to q=0 —
    an env that compiles, steps, and returns rewards while the robot is
    a statue.  This would have caught it."""
    from pointfoot_tpu.utils.registry import task_registry

    for name in task_registry.task_names:
        env = task_registry.make_env(
            name, num_envs=4,
            cfg_patch=dict(terrain=dict(mesh_type="plane", curriculum=False),
                           height_scan=dict(measure_heights=False),
                           noise=dict(add_noise=False),
                           domain_rand=dict(push_robots=False)))
        state = env.init_state(jax.random.PRNGKey(0))
        q0 = np.asarray(state.physics.qpos)
        step = jax.jit(env.step)
        a = 0.5 * jnp.ones((4, env.num_actions))
        for _ in range(10):
            state, out = step(state, a)
        q1 = np.asarray(state.physics.qpos)
        assert np.isfinite(q1).all(), f"{name}: non-finite qpos"
        moved = np.abs(q1 - q0).max()
        assert moved > 0.02, (
            f"{name}: joints frozen (max |dq| = {moved:.4f} after 10 "
            f"steps of 0.5-scaled actions) — asset limits or actuation "
            f"path broken")


@pytest.mark.slow
def test_standing_feet_never_fire_first_contact():
    """Feet in continuous contact must keep feet_air_time == 0 and never
    fire first_contact (reference zeroes air time with the previous
    step's contact filter BEFORE the first_contact check,
    point_foot.py:1114-1129).  The old ordering here zeroed first and
    +dt after, so standing feet carried air_time == dt and fired
    first_contact EVERY step — a constant spurious feet_air_time
    penalty for standing/slow gaits in every training run.  Uses the
    PD quadruped (a zero-action pointfoot tips over; its feet genuinely
    swing)."""
    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env(
        "anymal_c_flat", num_envs=4,
        cfg_patch=dict(noise=dict(add_noise=False),
                       domain_rand=dict(push_robots=False),
                       control=dict(use_actuator_network=False)))
    state = env.init_state(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    a = jnp.zeros((4, env.num_actions))
    for _ in range(25):  # let the spawn transient settle into contact
        state, out = step(state, a)
    sums0 = np.asarray(state.episode_sums)
    air_idx = env.reward_names.index("feet_air_time")
    for _ in range(20):
        state, out = step(state, a)
    # stored air time for grounded feet stays exactly 0
    assert np.all(np.asarray(state.feet_air_time) <= env.dt + 1e-6)
    # and the air-time reward accumulates NOTHING while standing
    d = np.asarray(state.episode_sums)[:, air_idx] - sums0[:, air_idx]
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_cmd_conditioned_promotion_toggle():
    """TerrainCfg.cmd_conditioned_promotion (round-5 deviation): a
    slow-command episode that tracked well promotes under the knob —
    required distance clip(0.5*|cmd|*T, 2.0, terrain_length/2) — while
    the reference's fixed terrain_length/2 bar (point_foot.py:627) is
    unreachable below ~0.4 m/s no matter how well it tracked."""
    results = {}
    for on in (False, True):
        env = task_registry.make_env(
            "pointfoot_rough", num_envs=4,
            cfg_patch=dict(terrain=dict(cmd_conditioned_promotion=on)))
        state = env.init_state(jax.random.PRNGKey(0))
        T = int(env.max_episode_length)
        lvl = jnp.full((4,), 3, jnp.int32)
        origin = env.terrain.env_origins[lvl, state.terrain_type]
        # timed out at T having tracked cmd 0.3 at ~58% of episode
        # distance: covered 3.5 m — above the knob's 3.0 m requirement,
        # below the fixed 4.0 m bar (terrain_length 8)
        covered = 3.5
        assert covered < env.terrain.terrain_length / 2
        state = state.replace(
            terrain_level=lvl, env_origin=origin,
            physics=state.physics.replace(
                base_pos=state.physics.base_pos.at[:, :2].set(
                    origin[:, :2] + jnp.asarray([covered, 0.0]))),
            commands=jnp.broadcast_to(
                jnp.asarray([0.3, 0.0, 0.0, 0.0]), (4, 4)),
            episode_step=jnp.full((4,), T, jnp.int32),
            cmd_progress=jnp.full((4,), covered),
        )
        new = env._reset_envs(state, jnp.ones(4, bool),
                              jax.random.PRNGKey(1))
        results[on] = np.asarray(new.terrain_level)
    # reference rule: 3.5 m < 4.0 m -> no promotion (and progress 3.5 >
    # demotion bar 3.0 -> no demotion either)
    assert (results[False] == 3).all(), results[False]
    # knob: 3.5 m > clip(0.5*0.3*20, 2, 4) = 3.0 m -> promoted
    assert (results[True] == 4).all(), results[True]


def test_reference_exact_demotion_toggle():
    """PARITY.md quirk #10: `terrain.reference_exact_demotion=true` restores
    the reference's demotion rule (point_foot.py:627-631) — required
    distance scaled by the FULL episode length even when the episode ended
    early, judged on net displacement.  The default rule scales by actual
    episode seconds, so an early-fallen robot that tracked perfectly while
    alive keeps its level under the default and loses it under the flag."""
    T = None
    results = {}
    for exact in (False, True):
        env = task_registry.make_env(
            "pointfoot_rough", num_envs=4,
            cfg_patch=dict(terrain=dict(reference_exact_demotion=exact)))
        state = env.init_state(jax.random.PRNGKey(0))
        T = int(env.max_episode_length)
        lvl = jnp.full((4,), 3, jnp.int32)
        origin = env.terrain.env_origins[lvl, state.terrain_type]
        # fell at T/4 having tracked vx=0.5 exactly: covered 0.5*(T/4)*dt m
        steps = T // 4
        covered = 0.5 * steps * env.dt  # 2.5 m for T=1000, dt=0.02
        assert covered < env.terrain.terrain_length / 2  # below promotion
        state = state.replace(
            terrain_level=lvl, env_origin=origin,
            physics=state.physics.replace(
                base_pos=state.physics.base_pos.at[:, :2].set(
                    origin[:, :2] + jnp.asarray([covered, 0.0]))),
            commands=jnp.broadcast_to(
                jnp.asarray([0.5, 0.0, 0.0, 0.0]), (4, 4)),
            episode_step=jnp.full((4,), steps, jnp.int32),
            cmd_progress=jnp.full((4,), covered),
        )
        new = env._reset_envs(state, jnp.ones(4, bool),
                              jax.random.PRNGKey(1))
        results[exact] = np.asarray(new.terrain_level)
    # default: perfect-while-alive tracker keeps its level
    assert (results[False] == 3).all(), results[False]
    # reference-exact: full-episode scaling demotes it (2.5 m < 5 m required)
    assert (results[True] == 2).all(), results[True]


def test_reward_clamp_bounds_freak_envs():
    """Per-step rewards are clipped to +-100 (legged_env step): a
    pathological state cannot inject value-function-poisoning returns
    (the ~88k value_loss=1e8 incident, docs/ROUND3_NOTES.md)."""
    env = task_registry.make_env("pointfoot_rough", num_envs=4)
    state = env.init_state(jax.random.PRNGKey(0))
    # catapult half the batch: deep under terrain at high speed
    phys = state.physics
    bad_pos = phys.base_pos.at[:2, 2].set(-3.0)
    bad_vel = phys.base_lin_vel.at[:2].set(
        jnp.asarray([30.0, -30.0, -45.0]))
    state = state.replace(physics=phys.replace(
        base_pos=bad_pos, base_lin_vel=bad_vel,
        qvel=phys.qvel.at[:2].set(19.0)))
    state, out = jax.jit(env.step)(state, 100.0 * jnp.ones((4, 6)))
    r = np.asarray(out.reward)
    assert np.isfinite(r).all()
    assert (np.abs(r) <= 100.0).all(), r
    sums = np.asarray(state.episode_sums)
    assert np.isfinite(sums).all() and (np.abs(sums) <= 100.0 * 20).all()
