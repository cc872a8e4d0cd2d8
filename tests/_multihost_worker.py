"""Worker process for tests/test_multihost.py (not collected by pytest).

One member of a 2-process loopback jax.distributed cluster, 2 virtual CPU
devices each: runs a real sharded PPO train iteration (pointfoot_flat,
tiny batch) through runner.learn with checkpointing on, exactly the
multi-host path of BASELINE.json configs[4] minus the pod hardware.

argv: <process_id> <coordinator_port> <log_root>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2"
                           ).strip()

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, port, log_root = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    from pointfoot_tpu.parallel.mesh import multihost_init

    multihost_init(coordinator=f"127.0.0.1:{port}", num_processes=2,
                   process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    from jax.sharding import Mesh

    from pointfoot_tpu.envs.config import override
    from pointfoot_tpu.utils.registry import task_registry

    # tiny everything: 8 envs over 4 devices / 2 processes
    env = task_registry.make_env("pointfoot_flat", num_envs=8)
    _, train_cfg = task_registry.get_cfgs("pointfoot_flat")
    train_cfg = override(
        train_cfg,
        runner=dict(num_steps_per_env=4, save_interval=2),
        algorithm=dict(num_learning_epochs=2, num_mini_batches=2))
    # per-process log dir: ONLY process 0's may receive files (host-0
    # logging/checkpointing, SURVEY.md §5)
    log_dir = os.path.join(log_root, f"proc{pid}")
    os.makedirs(log_dir, exist_ok=True)
    runner = task_registry.make_alg_runner(
        env, "pointfoot_flat", log_dir=log_dir, train_cfg=train_cfg,
        mesh=Mesh(np.asarray(jax.devices()), ("dp",)))
    runner.learn(num_iterations=2, log_every=1)
    print(f"worker {pid} finished 2 sharded iterations", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
