"""WGAN-GP sys-ID: single 10-d generator + Lipschitz critic.

Capability parity with reference scripts/Wasserstein_GAN.py: one
MLPGenerator produces the full 10-d (friction^6, mass, com^3) vector
(:74-75), the critic scores trajectory windows with Wasserstein loss
(:33-34) and gradient penalty lambda=10 (:37-56, :84).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pointfoot_tpu.models.nets import MLPCritic, MLPGenerator
from pointfoot_tpu.sysid.gan import COM_RANGE, FRIC_RANGE, MASS_RANGE
from pointfoot_tpu.sysid.simulate import chunk_windows, simulate_trajectory

PARAM_RANGE = FRIC_RANGE + MASS_RANGE + COM_RANGE  # 10-d


class WGANState(NamedTuple):
    gen: dict
    critic: dict
    opt_gen: optax.OptState
    opt_critic: optax.OptState


class WGANTrainer:
    def __init__(self, env, policy_fn: Callable, sim_length: int = 400,
                 warmup: int = 100, lr: float = 1e-4, gp_lambda: float = 10.0,
                 chunk: int = 400, overlap: int = 100):
        self.env = env
        self.policy_fn = policy_fn
        self.sim_length = sim_length
        self.warmup = warmup
        self.chunk = min(chunk, sim_length)
        self.overlap = min(overlap, self.chunk // 2)
        self.gp_lambda = gp_lambda
        self.gen = MLPGenerator(10, PARAM_RANGE)
        self.critic = MLPCritic()
        self.tx_gen = optax.adam(lr, b1=0.5, b2=0.9)
        self.tx_critic = optax.adam(lr, b1=0.5, b2=0.9)

    def init(self, key) -> WGANState:
        k1, k2 = jax.random.split(key)
        g = self.gen.init(k1, jnp.zeros(10))
        c = self.critic.init(
            k2, jnp.zeros((1, self.chunk, self.env.num_obs)))
        return WGANState(gen=g, critic=c, opt_gen=self.tx_gen.init(g),
                         opt_critic=self.tx_critic.init(c))

    def _simulate(self, env_state, params10, cmd):
        # per-joint DOF friction (GAN.py:71-83 -> point_foot.py:103-108)
        fric = jnp.broadcast_to(params10[:6],
                                (self.env.num_envs, self.env.model.nj))
        traj, _ = simulate_trajectory(
            self.env, env_state, self.policy_fn, fric, params10[6],
            params10[7:10], cmd, length=self.sim_length, warmup=self.warmup)
        return chunk_windows(traj.obs, chunk=self.chunk,
                             overlap=self.overlap)

    def _gradient_penalty(self, critic_params, real, fake, key):
        """GP on interpolates (Wasserstein_GAN.py:37-56)."""
        eps = jax.random.uniform(key, (real.shape[0], 1, 1))
        n = min(real.shape[0], fake.shape[0])
        inter = eps[:n] * real[:n] + (1 - eps[:n]) * fake[:n]

        def f(x):
            return jnp.sum(self.critic.apply(critic_params, x[None]))

        grads = jax.vmap(jax.grad(f))(inter)
        gnorm = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2)) + 1e-12)
        return jnp.mean((gnorm - 1.0) ** 2)

    @partial(jax.jit, static_argnums=0)
    def train_step(self, ws: WGANState, env_state, real_windows, cmd, key):
        k_z, k_gp = jax.random.split(key)
        z = jax.random.normal(k_z, (10,))

        def critic_loss_fn(c, fake):
            s_real = self.critic.apply(c, real_windows)
            s_fake = self.critic.apply(c, fake)
            w_loss = jnp.mean(s_fake) - jnp.mean(s_real)
            gp = self._gradient_penalty(c, real_windows, fake, k_gp)
            return w_loss + self.gp_lambda * gp

        def gen_loss_fn(g):
            params10 = self.gen.apply(g, z)
            fake = self._simulate(env_state, params10, cmd)
            return -jnp.mean(self.critic.apply(ws.critic, fake)), fake

        (g_loss, fake), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(ws.gen)
        upd, opt_gen = self.tx_gen.update(g_grads, ws.opt_gen, ws.gen)
        gen_new = optax.apply_updates(ws.gen, upd)

        c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(
            ws.critic, jax.lax.stop_gradient(fake))
        upd_c, opt_critic = self.tx_critic.update(
            c_grads, ws.opt_critic, ws.critic)
        critic_new = optax.apply_updates(ws.critic, upd_c)

        return (WGANState(gen=gen_new, critic=critic_new, opt_gen=opt_gen,
                          opt_critic=opt_critic),
                {"gen_loss": g_loss, "critic_loss": c_loss})
