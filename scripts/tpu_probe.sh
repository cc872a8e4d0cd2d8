#!/usr/bin/env bash
# Single home for the TPU-tunnel health probe: one tiny JAX client, one
# matmul, bounded by timeout.  Exit 0 = tunnel answers.  Sourced/called by
# tunnel_recover.sh and train_queue.sh so the probe (size, timeout,
# backoff) cannot drift between the two unattended-recovery paths.
timeout "${PROBE_TIMEOUT_S:-180}" python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
(x @ x).block_until_ready()
" > /dev/null 2>&1
