"""Root pytest conftest: force the CPU backend for tests.

This machine boots every python process with an `axon` TPU PJRT plugin whose
registration calls ``jax.config.update("jax_platforms", "axon,cpu")`` —
programmatic config beats the ``JAX_PLATFORMS`` env var, so without this
override all "CPU" tests silently compile through the remote TPU tunnel
(minutes per first compile, occasional exit hangs).  Tests run on a virtual
8-device CPU mesh (see tests/conftest.py) by design.
"""

import os

# Keep pytest-xdist workers OFF the TPU tunnel entirely: the axon plugin's
# sitecustomize registers (and dials the remote pool) in every python
# process whose env has PALLAS_AXON_POOL_IPS set.  A `-n 4` test run spawns
# 4 workers that all dial at once, which is exactly the "parallel JAX
# clients storm the tunnel" failure that silently hangs a concurrently
# running TPU trainer (docs/ROUND2_NOTES.md "Operational hazards").  Workers
# inherit this (already-mutated) environ from the master, so their
# sitecustomize skips registration; the master itself registered before
# this file ran, which is the same single-client footprint as any other
# lone python process.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
