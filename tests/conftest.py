"""Test configuration: 8-device virtual CPU mesh.

All tests run on CPU with ``xla_force_host_platform_device_count=8`` so that
multi-chip sharding paths (pjit / shard_map over a Mesh) compile and execute
without TPU hardware, mirroring how the driver validates
``__graft_entry__.dryrun_multichip``.  The CPU-backend override itself lives
in the repo-root conftest.py (it must beat the axon plugin's programmatic
``jax_platforms`` update).
"""

import os

import jax

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is dominated by XLA compiles of
# the jitted env/train steps; caching them across runs (and across test
# processes) cuts repeat wall-clock by an order of magnitude.
_cache_dir = os.environ.get(
    "POINTFOOT_TEST_CACHE", "/tmp/pointfoot_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
