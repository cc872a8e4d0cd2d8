"""In-process differentiable trajectory simulation for sys-ID.

Replaces `scripts/simulate_trajectory.py` (reference :62-108): instead of a
subprocess building a fresh Isaac Gym sim, reading parameter files and
writing `sim_traj.pt` / `terminate.npy`, this is a pure function — apply the
proposed (friction, added_mass, com) through the env's sys-ID hooks, pin the
command, roll the policy for `warmup + length` steps under `lax.scan`, and
return the last `length` proprioceptive observations plus a fall flag.
Because everything is JAX, it vmaps over parameter batches and is
differentiable w.r.t. the physical parameters.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pointfoot_tpu.envs.legged_env import EnvState, LeggedEnv


class SimTrajectory(NamedTuple):
    obs: jax.Array  # (T, B, num_obs) trajectory window
    fell: jax.Array  # (B,) bool — contact termination occurred (terminate.npy)


def simulate_trajectory(
    env: LeggedEnv,
    state: EnvState,
    policy_fn: Callable[[jax.Array], jax.Array],
    friction, added_mass, com_offset, cmd,
    length: int = 1000,
    warmup: int = 150,
) -> Tuple[SimTrajectory, EnvState]:
    """Roll `warmup` discarded + `length` recorded steps with pinned params.

    Mirrors the reference's random 100-200 step warmup then 1000-step window
    (simulate_trajectory.py:76-108); `warmup` is an explicit argument since
    randomness must be seeded (SURVEY.md RNG spec)."""
    state = env.update_frictions(state, friction)
    state = env.update_added_mass_and_base_com(state, added_mass, com_offset)
    state = env.update_cmd(state, cmd)

    def step(carry, _):
        s, obs, fell = carry
        action = policy_fn(obs)
        s, out = env.step(s, action)
        fell = fell | out.extras["terminate"]
        return (s, out.obs, fell), out.obs

    B = env.num_envs
    obs0 = jnp.zeros((B, env.num_obs))
    fell0 = jnp.zeros(B, bool)
    (state, obs, fell), _ = jax.lax.scan(
        step, (state, obs0, fell0), None, length=warmup)
    (state, obs, fell), traj = jax.lax.scan(
        step, (state, obs, fell), None, length=length)
    return SimTrajectory(obs=traj, fell=fell), state


def chunk_windows(traj: jax.Array, chunk: int = 400, overlap: int = 100
                  ) -> jax.Array:
    """(T, B, D) -> (num_chunks*B, chunk, D), stride = chunk - overlap.

    The reference `parse_data` chunking (simulate_trajectory.py:27-42)."""
    T = traj.shape[0]
    stride = chunk - overlap
    n = (T - overlap) // stride
    starts = [i * stride for i in range(n)]
    wins = jnp.stack([traj[s:s + chunk] for s in starts])  # (n, chunk, B, D)
    wins = jnp.moveaxis(wins, 2, 1)  # (n, B, chunk, D)
    return wins.reshape((-1,) + wins.shape[2:])
