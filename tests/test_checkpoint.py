"""Checkpoint save/load roundtrip: Orbax payload -> typed pytree graft.

Pins the fixes for (a) zero-size arrays, (b) flax-struct field order vs
Orbax dict key order, (c) NamedTuple-by-field-name restoration, (d)
host-numpy saves restoring on any backend."""

import jax
import jax.numpy as jnp
import numpy as np


def test_checkpoint_roundtrip(tmp_path):
    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env("pointfoot_flat", num_envs=4)
    runner = task_registry.make_alg_runner(env, "pointfoot_flat",
                                           log_dir=str(tmp_path))
    ts, es = runner.init(jax.random.PRNGKey(0))
    # make the state distinctive
    ts = ts.replace(learning_rate=jnp.asarray(0.123),
                    update_count=jnp.asarray(7, jnp.int32))
    runner.current_iteration = 42
    path = runner.save(ts, es)

    runner2 = task_registry.make_alg_runner(env, "pointfoot_flat")
    ts0, es0 = runner2.init(jax.random.PRNGKey(1))
    ts2, es2 = runner2.load(path, ts0, es0)
    assert runner2.current_iteration == 42
    np.testing.assert_allclose(float(ts2.learning_rate), 0.123)
    assert int(ts2.update_count) == 7
    # params match exactly
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # env state round-trips (same batch size)
    np.testing.assert_allclose(np.asarray(es2.physics.base_pos),
                               np.asarray(es.physics.base_pos))
    # types preserved (flax structs / NamedTuples intact)
    assert type(ts2) is type(ts)
    assert type(ts2.opt_state) is type(ts.opt_state)


def test_checkpoint_load_with_different_env_batch(tmp_path):
    """Evaluating a big-batch training run with a small eval env keeps the
    fresh env state and restores only the train state."""
    from pointfoot_tpu.utils.registry import task_registry

    env_big = task_registry.make_env("pointfoot_flat", num_envs=8)
    runner = task_registry.make_alg_runner(env_big, "pointfoot_flat",
                                           log_dir=str(tmp_path))
    ts, es = runner.init(jax.random.PRNGKey(0))
    path = runner.save(ts, es)

    env_small = task_registry.make_env("pointfoot_flat", num_envs=2)
    runner2 = task_registry.make_alg_runner(env_small, "pointfoot_flat")
    ts0, es0 = runner2.init(jax.random.PRNGKey(1))
    ts2, es2 = runner2.load(path, ts0, es0)
    assert es2.physics.base_pos.shape[0] == 2  # fresh env kept
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_missing_new_field_restores(tmp_path):
    """An OLD checkpoint (saved before an EnvState field existed) still
    restores: checkpoint-present leaves graft by name, the new field keeps
    its fresh template value.  Pins the shapes_ok by-path comparison
    (leaf-order zip compared unrelated leaves)."""
    import orbax.checkpoint as ocp
    from flax import serialization

    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env("pointfoot_flat", num_envs=4)
    runner = task_registry.make_alg_runner(env, "pointfoot_flat",
                                           log_dir=str(tmp_path))
    ts, es = runner.init(jax.random.PRNGKey(0))
    es = es.replace(terrain_level=jnp.full((4,), 5, jnp.int32),
                    cmd_progress=jnp.full((4,), 9.9))
    # simulate the old format: env_state as a dict lacking cmd_progress
    es_dict = serialization.to_state_dict(jax.device_get(es))
    es_dict.pop("cmd_progress")
    payload = {"train_state": jax.device_get(ts), "env_state": es_dict,
               "iteration": 11}
    path = str(tmp_path / "model_11")
    ocp.PyTreeCheckpointer().save(path, payload, force=True)

    ts0, es0 = runner.init(jax.random.PRNGKey(1))
    ts2, es2 = runner.load(path, ts0, es0)
    assert runner.current_iteration == 11
    # checkpointed fields grafted...
    assert (np.asarray(es2.terrain_level) == 5).all()
    # ...and the post-checkpoint field keeps the fresh value
    assert (np.asarray(es2.cmd_progress) == 0.0).all()
