"""NaN-quarantine behavior: an exploded env resets instead of poisoning
the batch (guards added after a long TPU run went NaN mid-training)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointfoot_tpu.utils.registry import task_registry


def test_nan_env_is_quarantined_and_batch_stays_finite():
    env = task_registry.make_env("pointfoot_flat", num_envs=8)
    state = env.init_state(jax.random.PRNGKey(0))
    # poison env 3
    phys = state.physics
    phys = phys.replace(
        qvel=phys.qvel.at[3].set(jnp.nan),
        base_lin_vel=phys.base_lin_vel.at[3, 0].set(jnp.inf))
    state = state.replace(physics=phys)

    state, out = jax.jit(env.step)(state, jnp.zeros((8, 6)))
    done = np.asarray(out.done)
    assert done[3], "non-finite env must terminate"
    # rewards finite for the whole batch
    assert np.isfinite(np.asarray(out.reward)).all()
    # after the masked reset the poisoned env is clean again
    assert np.isfinite(np.asarray(state.physics.qvel)).all()
    assert np.isfinite(np.asarray(state.physics.base_lin_vel)).all()
    # healthy envs unaffected
    assert not done[[0, 1, 2, 4, 5, 6, 7]].all()

    # next step runs normally
    state, out2 = jax.jit(env.step)(state, jnp.zeros((8, 6)))
    assert np.isfinite(np.asarray(out2.obs)).all()
