"""Two-process jax.distributed smoke test on one machine (fake cluster).

Validates the multi-host code path of BASELINE.json configs[4] without a pod
slice: two OS processes, each with 2 virtual CPU devices, join a
jax.distributed cluster; the global 4-device 'dp' mesh shards an env batch
across processes and a psum all-reduce crosses the process boundary.

Run directly (it re-spawns itself as workers):
    python scripts/multihost_smoke.py
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PORT = int(os.environ.get("SMOKE_PORT", "52345"))
NPROC = 2


def worker(pid: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NPROC, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == NPROC
    devices = np.asarray(jax.devices())  # 4 global devices
    mesh = Mesh(devices, ("dp",))

    # global array sharded over both processes
    B = 8
    local = jnp.arange(B // NPROC * 3, dtype=jnp.float32).reshape(
        B // NPROC, 3) + 100 * pid
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("dp"))

    @jax.jit
    def total(x):
        return jnp.sum(x)

    out = total(garr)
    # the jitted sum's output is replicated: read the local shard
    got = float(np.asarray(out.addressable_shards[0].data))
    expected = float(sum(range(B // NPROC * 3)) * NPROC
                     + 100 * (B // NPROC * 3) * sum(range(NPROC)))
    if pid == 0:
        status = "OK" if abs(got - expected) < 1e-3 else "MISMATCH"
        print(f"multihost_smoke {status}: psum-total {got} "
              f"(expected {expected}) across {NPROC} processes / "
              f"{len(devices)} devices", flush=True)
    jax.distributed.shutdown()


def main():
    if "SMOKE_PID" in os.environ:
        worker(int(os.environ["SMOKE_PID"]))
        return
    procs = []
    for pid in range(NPROC):
        env = dict(os.environ, SMOKE_PID=str(pid))
        procs.append(subprocess.Popen([sys.executable, __file__], env=env))
    rcs = [p.wait(timeout=300) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs
    print("all workers exited cleanly")


if __name__ == "__main__":
    main()
