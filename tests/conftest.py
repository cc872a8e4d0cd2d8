"""Test configuration: 8-device virtual CPU mesh.

All tests run on CPU with ``xla_force_host_platform_device_count=8`` so that
multi-chip sharding paths (pjit / shard_map over a Mesh) compile and execute
without TPU hardware, mirroring how the driver validates
``__graft_entry__.dryrun_multichip``.  The CPU-backend override itself lives
in the repo-root conftest.py (it must beat the axon plugin's programmatic
``jax_platforms`` update).
"""

import jax

jax.config.update("jax_default_matmul_precision", "highest")
