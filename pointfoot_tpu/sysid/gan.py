"""Adversarial sys-ID: three parameter generators vs a trajectory
discriminator, with gradients THROUGH the simulator.

Capability parity with reference scripts/GAN.py (SURVEY.md §2.7): MLP
generators for friction (6-d, range [0, 0.2] per joint as in GAN.py:71-74),
added mass (1-d, [-1, 2]) and CoM offset (3-d, ±(0.03, 0.02, 0.03)); the
LSTM-MLP discriminator scores 400-step windows of simulated vs real 27-d
observation trajectories with BCE.  Where the reference's generator update
was vacuous (the trajectory arrived detached through a file, GAN.py:135-139),
here the generator loss backpropagates through `simulate_trajectory` into
the generator parameters — real gradient-based sys-ID.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pointfoot_tpu.models.nets import MLPDiscriminator, MLPGenerator
from pointfoot_tpu.sysid.simulate import chunk_windows, simulate_trajectory

FRIC_RANGE = tuple((0.0, 0.2) for _ in range(6))  # GAN.py:71-72
MASS_RANGE = ((-1.0, 2.0),)  # GAN.py:73
COM_RANGE = ((-0.03, 0.03), (-0.02, 0.02), (-0.03, 0.03))  # GAN.py:74


class GANState(NamedTuple):
    gen_fric: dict
    gen_mass: dict
    gen_com: dict
    disc: dict
    opt_gen: tuple
    opt_disc: optax.OptState


def _bce(pred, target):
    eps = 1e-7
    pred = jnp.clip(pred, eps, 1 - eps)
    return -jnp.mean(target * jnp.log(pred) + (1 - target) * jnp.log(1 - pred))


class GANTrainer:
    def __init__(self, env, policy_fn: Callable, sim_length: int = 400,
                 warmup: int = 100, lr: float = 1e-3,
                 through_sim_gradients: bool = True,
                 chunk: int = 400, overlap: int = 100):
        self.env = env
        self.policy_fn = policy_fn
        self.sim_length = sim_length
        self.warmup = warmup
        self.chunk = min(chunk, sim_length)
        self.overlap = min(overlap, self.chunk // 2)
        self.through_sim = through_sim_gradients
        self.gen_fric = MLPGenerator(6, FRIC_RANGE)
        self.gen_mass = MLPGenerator(1, MASS_RANGE)
        self.gen_com = MLPGenerator(3, COM_RANGE)
        self.disc = MLPDiscriminator(out_dim=1)
        self.tx_gen = optax.adam(lr)
        self.tx_disc = optax.adam(lr)

    def init(self, key) -> GANState:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        z6, z1, z3 = jnp.zeros(6), jnp.zeros(1), jnp.zeros(3)
        win = jnp.zeros((1, self.chunk, self.env.num_obs))
        gf = self.gen_fric.init(k1, z6)
        gm = self.gen_mass.init(k2, z1)
        gc = self.gen_com.init(k3, z3)
        d = self.disc.init(k4, win)
        return GANState(
            gen_fric=gf, gen_mass=gm, gen_com=gc, disc=d,
            opt_gen=(self.tx_gen.init(gf), self.tx_gen.init(gm),
                     self.tx_gen.init(gc)),
            opt_disc=self.tx_disc.init(d),
        )

    def propose(self, gs: GANState, key):
        k1, k2, k3 = jax.random.split(key, 3)
        fric = self.gen_fric.apply(gs.gen_fric, jax.random.normal(k1, (6,)))
        mass = self.gen_mass.apply(gs.gen_mass, jax.random.normal(k2, (1,)))
        com = self.gen_com.apply(gs.gen_com, jax.random.normal(k3, (3,)))
        return fric, mass, com

    def _simulate(self, env_state, fric, mass, com, cmd):
        # per-joint DOF friction, exactly the 6-d quantity the generator
        # proposes (reference GAN.py:71-83 -> point_foot.py:103-108)
        fric_full = jnp.broadcast_to(
            fric, (self.env.num_envs, self.env.model.nj))
        traj, _ = simulate_trajectory(
            self.env, env_state, self.policy_fn, fric_full, mass[0], com,
            cmd, length=self.sim_length, warmup=self.warmup)
        return traj

    @partial(jax.jit, static_argnums=0)
    def train_step(self, gs: GANState, env_state, real_windows: jax.Array,
                   cmd: jax.Array, key) -> tuple:
        """One adversarial update (GAN.py:96-162 collapsed in-process).

        real_windows: (N, chunk, 27) windows of real data for this command.
        Returns (new GANState, metrics dict)."""
        k_fric, k_mass, k_com = jax.random.split(key, 3)

        def gen_loss_fn(gf, gm, gc):
            # independent noise per generator (propose() splits the same way;
            # a shared key would correlate the three proposals)
            fric = self.gen_fric.apply(gf, jax.random.normal(k_fric, (6,)))
            mass = self.gen_mass.apply(gm, jax.random.normal(k_mass, (1,)))
            com = self.gen_com.apply(gc, jax.random.normal(k_com, (3,)))
            if not self.through_sim:
                fric = jax.lax.stop_gradient(fric)
                mass = jax.lax.stop_gradient(mass)
                com = jax.lax.stop_gradient(com)
            traj = self._simulate(env_state, fric, mass, com, cmd)
            sim_w = chunk_windows(traj.obs, chunk=self.chunk,
                                  overlap=self.overlap)
            score = self.disc.apply(gs.disc, sim_w)
            # generator wants the discriminator to say "real" (1)
            return _bce(score, jnp.ones_like(score)), sim_w

        (g_loss, sim_w), grads = jax.value_and_grad(
            gen_loss_fn, argnums=(0, 1, 2), has_aux=True)(
            gs.gen_fric, gs.gen_mass, gs.gen_com)
        new_gens, new_opts = [], []
        for p, g, o in zip((gs.gen_fric, gs.gen_mass, gs.gen_com), grads,
                           gs.opt_gen):
            upd, o2 = self.tx_gen.update(g, o, p)
            new_gens.append(optax.apply_updates(p, upd))
            new_opts.append(o2)

        def disc_loss_fn(d):
            s_real = self.disc.apply(d, real_windows)
            s_sim = self.disc.apply(d, jax.lax.stop_gradient(sim_w))
            return (_bce(s_real, jnp.ones_like(s_real))
                    + _bce(s_sim, jnp.zeros_like(s_sim)))

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(gs.disc)
        upd, opt_disc = self.tx_disc.update(d_grads, gs.opt_disc, gs.disc)
        disc_new = optax.apply_updates(gs.disc, upd)

        gs = GANState(gen_fric=new_gens[0], gen_mass=new_gens[1],
                      gen_com=new_gens[2], disc=disc_new,
                      opt_gen=tuple(new_opts), opt_disc=opt_disc)
        metrics = {"gen_loss": g_loss, "disc_loss": d_loss}
        return gs, metrics
