"""Direct-trajectory GAN: generator produces observation windows directly.

Capability parity with reference scripts/rough_GAN.py:40-117 — instead of
proposing physical parameters and simulating, the generator maps noise
straight to 27-d observation sequences (MLPGenerator hidden [256, 512, 256],
rrough_gen.py:6-28) and the LSTM discriminator separates them from real
windows.  Useful as a learned trajectory prior / data augmenter; kept for
inventory parity with the reference's experiment scripts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from pointfoot_tpu.models.nets import MLPDiscriminator, leaky
from pointfoot_tpu.sysid.gan import _bce


class _SeqGenerator(nn.Module):
    """noise (B, zdim) -> obs window (B, T, obs_dim)."""

    window: int
    obs_dim: int = 27
    hidden: tuple = (256, 512, 256)

    @nn.compact
    def __call__(self, z):
        h = z
        for w in self.hidden:
            h = leaky(nn.Dense(w)(h))
        out = nn.Dense(self.window * self.obs_dim)(h)
        return out.reshape(z.shape[0], self.window, self.obs_dim)


class DirectGANState(NamedTuple):
    gen: dict
    disc: dict
    opt_gen: optax.OptState
    opt_disc: optax.OptState


class DirectTrajectoryGAN:
    def __init__(self, window: int = 100, obs_dim: int = 27,
                 z_dim: int = 64, lr: float = 1e-3):
        self.window = window
        self.obs_dim = obs_dim
        self.z_dim = z_dim
        self.gen = _SeqGenerator(window, obs_dim)
        self.disc = MLPDiscriminator(out_dim=1)
        self.tx_gen = optax.adam(lr)
        self.tx_disc = optax.adam(lr)

    def init(self, key) -> DirectGANState:
        k1, k2 = jax.random.split(key)
        g = self.gen.init(k1, jnp.zeros((1, self.z_dim)))
        d = self.disc.init(k2, jnp.zeros((1, self.window, self.obs_dim)))
        return DirectGANState(gen=g, disc=d, opt_gen=self.tx_gen.init(g),
                              opt_disc=self.tx_disc.init(d))

    def sample(self, state: DirectGANState, key, batch: int = 1):
        z = jax.random.normal(key, (batch, self.z_dim))
        return self.gen.apply(state.gen, z)

    @partial(jax.jit, static_argnums=0)
    def train_step(self, gs: DirectGANState, real_windows, key):
        z = jax.random.normal(key, (real_windows.shape[0], self.z_dim))

        def gen_loss_fn(g):
            fake = self.gen.apply(g, z)
            score = self.disc.apply(gs.disc, fake)
            return _bce(score, jnp.ones_like(score)), fake

        (g_loss, fake), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(gs.gen)
        upd, opt_gen = self.tx_gen.update(g_grads, gs.opt_gen, gs.gen)
        gen_new = optax.apply_updates(gs.gen, upd)

        def disc_loss_fn(d):
            s_real = self.disc.apply(d, real_windows)
            s_fake = self.disc.apply(d, jax.lax.stop_gradient(fake))
            return (_bce(s_real, jnp.ones_like(s_real))
                    + _bce(s_fake, jnp.zeros_like(s_fake)))

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(gs.disc)
        upd_d, opt_disc = self.tx_disc.update(d_grads, gs.opt_disc, gs.disc)
        disc_new = optax.apply_updates(gs.disc, upd_d)
        return (DirectGANState(gen=gen_new, disc=disc_new,
                               opt_gen=opt_gen, opt_disc=opt_disc),
                {"gen_loss": g_loss, "disc_loss": d_loss})
