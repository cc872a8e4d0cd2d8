"""Device-mesh parallelism: sharding rules, multi-host init.

The reference's only parallelism is single-device vectorized envs (PhysX
batches all envs in one sim; the `--horovod` flag is dead code —
helpers.py:162, SURVEY.md §2.6).  Here data parallelism over scenarios/envs
is first-class: env state is sharded over a `jax.sharding.Mesh` 'dp' axis,
the jitted train/solve step runs under pjit, and XLA inserts `psum`
all-reduces over ICI for PPO gradients and solver reductions.
"""

from pointfoot_tpu.parallel.mesh import (
    env_sharding, make_mesh, multihost_init, replicated, shard_batch,
)

__all__ = ["make_mesh", "env_sharding", "replicated", "shard_batch",
           "multihost_init"]
