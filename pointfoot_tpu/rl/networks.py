"""Flax actor-critic networks (rsl_rl ActorCritic / ActorCriticRecurrent).

Architecture parity with the rsl_rl v1.0.2 modules consumed by the reference
(SURVEY.md §2.5): separate actor/critic ELU MLPs (hidden dims from
PolicyCfg, e.g. 512/256/128 rough, 128/64/32 flat —
pointfoot_rough_config.py:220-228), state-independent learned log-std
initialized from init_noise_std, asymmetric critic consuming privileged
observations.  The recurrent variant wraps the MLPs with an LSTM encoder
(helpers.py:193-219 export path).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_ACT = {
    "elu": nn.elu, "relu": nn.relu, "selu": nn.selu, "tanh": nn.tanh,
    "gelu": nn.gelu, "swish": nn.swish,
}


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        for h in self.hidden:
            x = act(nn.Dense(h)(x))
        return nn.Dense(self.out)(x)


class ActorCritic(nn.Module):
    """Gaussian policy + value function with asymmetric observations."""

    num_actions: int
    actor_hidden: Sequence[int] = (512, 256, 128)
    critic_hidden: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0

    def setup(self):
        self.actor = MLP(self.actor_hidden, self.num_actions, self.activation,
                         name="actor")
        self.critic = MLP(self.critic_hidden, 1, self.activation, name="critic")
        self.log_std = self.param(
            "log_std",
            lambda _key, shape: jnp.full(shape, jnp.log(self.init_noise_std)),
            (self.num_actions,))

    def __call__(self, obs, priv_obs):
        """Used for init; returns (mean, std, value)."""
        return self.act_mean(obs), jnp.exp(self.log_std), self.value(priv_obs)

    def act_mean(self, obs):
        return self.actor(obs)

    def value(self, priv_obs):
        return self.critic(priv_obs).squeeze(-1)

    def distribution(self, obs):
        mean = self.actor(obs)
        std = jnp.exp(self.log_std)
        return mean, jnp.broadcast_to(std, mean.shape)


def sample_action(mean, std, key):
    noise = jax.random.normal(key, mean.shape)
    return mean + std * noise


def gaussian_log_prob(mean, std, action):
    var = std**2
    return jnp.sum(
        -0.5 * ((action - mean) ** 2 / var + jnp.log(2 * jnp.pi * var)),
        axis=-1)


def gaussian_entropy(std):
    return jnp.sum(0.5 * (1.0 + jnp.log(2 * jnp.pi)) + jnp.log(std), axis=-1)


class ActorCriticRecurrent(nn.Module):
    """LSTM-encoded actor-critic (rsl_rl ActorCriticRecurrent equivalent).

    A single-layer LSTM encodes observations; separate MLP heads produce the
    action mean and value.  Carries are (actor_carry, critic_carry); use
    `initialize_carry` and thread carries through rollouts.
    """

    num_actions: int
    rnn_hidden: int = 256
    actor_hidden: Sequence[int] = (256, 128)
    critic_hidden: Sequence[int] = (256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0

    def setup(self):
        self.actor_rnn = nn.OptimizedLSTMCell(self.rnn_hidden, name="actor_rnn")
        self.critic_rnn = nn.OptimizedLSTMCell(self.rnn_hidden, name="critic_rnn")
        self.actor_head = MLP(self.actor_hidden, self.num_actions,
                              self.activation, name="actor_head")
        self.critic_head = MLP(self.critic_hidden, 1, self.activation,
                               name="critic_head")
        self.log_std = self.param(
            "log_std",
            lambda _key, shape: jnp.full(shape, jnp.log(self.init_noise_std)),
            (self.num_actions,))

    def initialize_carry(self, batch_shape: Tuple[int, ...]):
        shape = batch_shape + (self.rnn_hidden,)
        zeros = jnp.zeros(shape)
        return (zeros, zeros), (zeros, zeros)

    def __call__(self, carry, obs, priv_obs):
        (a_carry, c_carry) = carry
        a_carry, a_feat = self.actor_rnn(a_carry, obs)
        c_carry, c_feat = self.critic_rnn(c_carry, priv_obs)
        mean = self.actor_head(a_feat)
        value = self.critic_head(c_feat).squeeze(-1)
        std = jnp.broadcast_to(jnp.exp(self.log_std), mean.shape)
        return (a_carry, c_carry), (mean, std, value)
