"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The fake-cluster testing the reference never had (SURVEY.md §4): env batches
shard over a 'dp' mesh, the full PPO iteration compiles and executes under
pjit, and collectives ride the mesh via shard_map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pointfoot_tpu.parallel.mesh import (
    env_sharding, make_mesh, replicated, shard_batch)


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_shard_batch_placement():
    mesh = make_mesh(8)
    x = jnp.arange(16 * 3, dtype=jnp.float32).reshape(16, 3)
    tree = {"a": x, "scalar": jnp.asarray(1.0)}
    placed = shard_batch(tree, mesh)
    assert placed["a"].sharding.is_equivalent_to(env_sharding(mesh), ndim=2)
    # batch dim split over 8 devices
    shard_shapes = {s.data.shape for s in placed["a"].addressable_shards}
    assert shard_shapes == {(2, 3)}
    assert placed["scalar"].sharding.is_equivalent_to(replicated(mesh), ndim=0)


def test_psum_over_mesh():
    from jax.experimental.shard_map import shard_map

    mesh = make_mesh(8)
    x = jnp.ones((8, 4))

    @jax.jit
    def allreduce(x):
        return shard_map(
            lambda v: jax.lax.psum(v, "dp"),
            mesh=mesh, in_specs=P("dp"), out_specs=P(None),
        )(x)

    out = allreduce(jax.device_put(x, env_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), 8.0)


def test_sharded_env_step_matches_single_device():
    """The same env step under a dp-sharded batch must produce identical
    results (sharding is a layout annotation, not a semantic change)."""
    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env("pointfoot_flat", num_envs=16)
    state = env.init_state(jax.random.PRNGKey(0))
    actions = jnp.ones((16, 6)) * 0.1

    s1, o1 = jax.jit(env.step)(state, actions)

    mesh = make_mesh(8)
    state_sharded = shard_batch(state, mesh)
    actions_sharded = jax.device_put(actions, env_sharding(mesh))
    s2, o2 = jax.jit(env.step)(state_sharded, actions_sharded)

    np.testing.assert_allclose(np.asarray(o1.obs), np.asarray(o2.obs),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1.reward), np.asarray(o2.reward),
                               atol=1e-5)


def test_rollout_substeps_sharded_matches_unsharded():
    """The shard_mapped Pallas rollout (multi-chip mega-kernel path) must
    reproduce the single-shard fused rollout exactly: physics is env-
    parallel, so sharding the batch over 'dp' is layout only.  Runs in
    interpret mode on the virtual CPU mesh (the TPU dispatch in
    `legged_env._physics_rollout` takes this path when per-device batch
    clears the kernel block size)."""
    from pointfoot_tpu.ops.pallas import substep as sp
    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env("pointfoot_rough", num_envs=16)
    state = env.init_state(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    for _ in range(3):
        state, _ = step(state, 0.15 * jnp.ones((16, 6)))
    actions = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (16, 6))
    args = (env.model, state.params, state.physics, actions,
            state.last_qvel, state.push_force, env._height_fn(),
            env.cfg.sim.dt, env.cfg.control.decimation, env.default_qpos,
            env.cfg.control.action_scale, env.cfg.control.control_type)

    phys_ref, tau_ref, sphere_ref = sp.rollout_substeps(
        *args, gravity=env.cfg.sim.gravity, interpret=True)

    mesh = make_mesh(8)
    state_sh = shard_batch(state, mesh)
    actions_sh = jax.device_put(actions, env_sharding(mesh))
    phys_got, tau_got, sphere_got = sp.rollout_substeps_sharded(
        mesh, "dp", env.model, state_sh.params, state_sh.physics,
        actions_sh, state_sh.last_qvel, state_sh.push_force,
        env._height_fn(), env.cfg.sim.dt, env.cfg.control.decimation,
        env.default_qpos, env.cfg.control.action_scale,
        env.cfg.control.control_type, gravity=env.cfg.sim.gravity,
        interpret=True)

    for name in ("base_pos", "base_quat", "base_lin_vel", "base_ang_vel",
                 "qpos", "qvel", "contact_force"):
        np.testing.assert_allclose(
            np.asarray(getattr(phys_got, name)),
            np.asarray(getattr(phys_ref, name)), atol=1e-5,
            err_msg=name)
    np.testing.assert_allclose(np.asarray(tau_got), np.asarray(tau_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sphere_got),
                               np.asarray(sphere_ref), atol=1e-5)


def test_sharded_ppo_iteration():
    """Full PPO train iteration under a dp mesh (the dryrun path)."""
    from pointfoot_tpu.utils.registry import task_registry

    mesh = make_mesh(8)
    env = task_registry.make_env("pointfoot_flat", num_envs=16)
    runner = task_registry.make_alg_runner(env, "pointfoot_flat")
    train_state, env_state = runner.init(jax.random.PRNGKey(0))
    env_state = shard_batch(env_state, mesh)
    train_state = jax.device_put(train_state, replicated(mesh))
    obs = jax.device_put(jnp.zeros((16, env.num_obs)), env_sharding(mesh))
    priv = jax.device_put(jnp.zeros((16, env.num_privileged_obs)),
                          env_sharding(mesh))
    key = jax.device_put(jax.random.PRNGKey(1), replicated(mesh))
    step = jax.jit(runner.train_iteration)
    ts, es, obs, priv, metrics = step(train_state, env_state, obs, priv, key)
    assert np.isfinite(float(metrics["mean_reward"]))
    assert np.isfinite(float(metrics["kl"]))
