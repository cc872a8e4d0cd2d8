"""Root pytest conftest: force the CPU backend for tests.

This machine boots every python process with an `axon` TPU PJRT plugin whose
registration calls ``jax.config.update("jax_platforms", "axon,cpu")`` —
programmatic config beats the ``JAX_PLATFORMS`` env var, so without this
override all "CPU" tests silently compile through the remote TPU tunnel
(minutes per first compile, occasional exit hangs).  Tests run on a virtual
8-device CPU mesh (see tests/conftest.py) by design.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
