"""Optimizer robustness: inf/NaN gradients must not corrupt Adam state.

Regression for the frozen-training failure: optax.zero_nans passes inf
through, clip_by_global_norm maps inf -> NaN (inf * 0), and the NaN then
lives in the Adam moments forever — every later update silently zeroes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointfoot_tpu.envs.config import AlgorithmCfg
from pointfoot_tpu.rl.networks import ActorCritic
from pointfoot_tpu.rl.ppo import PPO


def test_inf_gradients_do_not_corrupt_optimizer():
    net = ActorCritic(num_actions=2, actor_hidden=(8,), critic_hidden=(8,))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)),
                      jnp.zeros((1, 4)))
    ppo = PPO(net, AlgorithmCfg())
    ts = ppo.init_train_state(params)

    bad_grads = jax.tree.map(lambda p: jnp.full_like(p, jnp.inf), params)
    updates, opt_state = ppo.tx.update(bad_grads, ts.opt_state, ts.params)
    # the poisoned step itself is neutralized
    for u in jax.tree.leaves(updates):
        assert np.isfinite(np.asarray(u)).all()
    new_params = optax.apply_updates(ts.params, updates)

    # and a SUBSEQUENT healthy step still works (Adam moments clean)
    good_grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.01, params)
    updates2, _ = ppo.tx.update(good_grads, opt_state, new_params)
    leaves = [np.asarray(u) for u in jax.tree.leaves(updates2)]
    assert all(np.isfinite(u).all() for u in leaves)
    assert max(np.abs(u).max() for u in leaves) > 0  # not frozen


def test_nan_gradients_also_neutralized():
    net = ActorCritic(num_actions=2, actor_hidden=(8,), critic_hidden=(8,))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)),
                      jnp.zeros((1, 4)))
    ppo = PPO(net, AlgorithmCfg())
    ts = ppo.init_train_state(params)
    bad = jax.tree.map(lambda p: jnp.full_like(p, jnp.nan), params)
    updates, opt_state = ppo.tx.update(bad, ts.opt_state, ts.params)
    for u in jax.tree.leaves(updates):
        assert np.isfinite(np.asarray(u)).all()
