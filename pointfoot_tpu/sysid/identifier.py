"""Supervised LSTM system identifier.

Capability parity with reference scripts/Identifier.py: sample candidate
(friction^6, mass, com^3) parameters, simulate trajectories, regress the
parameters from observation windows with an LSTM + MSE (:36, :77-86).  The
reference's subprocess rejection loop with a growing python `avoid` list
(:17-27, :62-71) becomes a vectorized masked batch: falling-parameter
rollouts are detected by the env's terminate flag and excluded from the
loss in-graph — no process restarts, no host round trips.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pointfoot_tpu.models.nets import LSTMIdentifier
from pointfoot_tpu.sysid.gan import COM_RANGE, FRIC_RANGE, MASS_RANGE
from pointfoot_tpu.sysid.simulate import simulate_trajectory

_LO = jnp.asarray([r[0] for r in FRIC_RANGE + MASS_RANGE + COM_RANGE])
_HI = jnp.asarray([r[1] for r in FRIC_RANGE + MASS_RANGE + COM_RANGE])


class IdentifierState(NamedTuple):
    params: dict
    opt_state: optax.OptState


class IdentifierTrainer:
    """Trains LSTMIdentifier on simulated (trajectory -> parameters) pairs.

    The env should be built with one env per candidate parameter vector
    (num_envs = batch); each env gets its own sampled parameters, so one
    `lax.scan` rollout simulates the whole batch.
    """

    def __init__(self, env, policy_fn: Callable, window: int = 400,
                 warmup: int = 100, lr: float = 1e-3, hidden: int = 512):
        self.env = env
        self.policy_fn = policy_fn
        self.window = window
        self.warmup = warmup
        self.net = LSTMIdentifier(hidden=hidden, out_dim=10)
        self.tx = optax.adam(lr)

    def init(self, key) -> IdentifierState:
        p = self.net.init(key, jnp.zeros((1, self.window, self.env.num_obs)))
        return IdentifierState(params=p, opt_state=self.tx.init(p))

    def sample_params(self, key):
        """Uniform candidates in the physical ranges (Identifier.py:17-27)."""
        B = self.env.num_envs
        u = jax.random.uniform(key, (B, 10))
        return _LO + u * (_HI - _LO)

    @partial(jax.jit, static_argnums=0)
    def train_step(self, ident: IdentifierState, env_state, cmd, key):
        k_sample, k_drop = jax.random.split(key)
        target = self.sample_params(k_sample)  # (B, 10)
        # per-env, per-joint DOF friction: each env simulates its own 6-d
        # candidate (reference Identifier.py:17-27 -> point_foot.py:103-108)
        fric = target[:, :6]
        traj, _ = simulate_trajectory(
            self.env, env_state, self.policy_fn, fric, target[:, 6],
            target[:, 7:10], cmd, length=self.window, warmup=self.warmup)
        windows = jnp.swapaxes(traj.obs, 0, 1)  # (B, T, 27)
        valid = ~traj.fell  # vectorized avoid-list (Identifier.py:67-71)

        def loss_fn(p):
            pred = self.net.apply(p, windows)
            per = jnp.mean((pred - target) ** 2, axis=-1)
            n_valid = jnp.maximum(jnp.sum(valid), 1)
            return jnp.sum(jnp.where(valid, per, 0.0)) / n_valid

        loss, grads = jax.value_and_grad(loss_fn)(ident.params)
        upd, opt = self.tx.update(grads, ident.opt_state, ident.params)
        new = IdentifierState(params=optax.apply_updates(ident.params, upd),
                              opt_state=opt)
        return new, {"mse": loss, "num_valid": jnp.sum(valid)}

    @partial(jax.jit, static_argnums=0)
    def predict(self, ident: IdentifierState, windows: jax.Array):
        """Infer parameters from observation windows (inference.py:26-49)."""
        return self.net.apply(ident.params, windows)
