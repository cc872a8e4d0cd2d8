"""GAN sys-ID training entry (reference scripts/GAN.py, in-process).

Usage: python scripts/gan.py --real data/rr1.npy --policy logs/.../policy.onnx
       [--wgan] [--epochs 500] [--cpu]

Loads real-robot observation data (npy-of-dicts, see sysid/realdata.py),
buckets it by command triple, and runs the adversarial loop with the
in-process differentiable simulator: generators propose (friction, mass,
CoM), the discriminator/critic scores simulated vs real 400-step windows.
TensorBoard scalars + JSONL metrics mirror the reference logging
(GAN.py:212-225).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--real", required=True, help="npy of dicts with 'obs'")
    p.add_argument("--policy", default=None,
                   help="ONNX/TorchScript policy for rollouts; default zeros")
    p.add_argument("--wgan", action="store_true", help="use WGAN-GP")
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--sim_length", type=int, default=400)
    p.add_argument("--min_bucket", type=int, default=1100)
    p.add_argument("--log_dir", default="logs/gan_training")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointfoot_tpu.sysid.gan import GANTrainer
    from pointfoot_tpu.sysid.realdata import (
        categorize_data_by_cmd, real_to_tensor)
    from pointfoot_tpu.sysid.simulate import chunk_windows
    from pointfoot_tpu.sysid.wgan import WGANTrainer
    from pointfoot_tpu.utils.registry import task_registry

    real = real_to_tensor(args.real)
    buckets = categorize_data_by_cmd(real)
    print(f"{len(buckets)} command buckets; sizes "
          f"{[v.shape[0] for v in buckets.values()]}")

    if args.policy:
        from pointfoot_tpu.export.onnx import load_policy_as_jax

        policy_fn = load_policy_as_jax(args.policy)
    else:
        policy_fn = lambda obs: jnp.zeros(obs.shape[:-1] + (6,))

    env = task_registry.make_env("pointfoot_flat", num_envs=1)
    cls = WGANTrainer if args.wgan else GANTrainer
    trainer = cls(env, policy_fn, sim_length=args.sim_length)
    key = jax.random.PRNGKey(0)
    gs = trainer.init(key)
    env_state = env.init_state(jax.random.PRNGKey(1))

    os.makedirs(args.log_dir, exist_ok=True)
    metrics_path = os.path.join(args.log_dir, "metrics.jsonl")
    for epoch in range(args.epochs):
        for cmd, data in buckets.items():
            if data.shape[0] <= args.min_bucket:
                continue
            # bucket data is (N, 1, 27) == (T, B=1, 27) window source
            traj = jnp.asarray(data)
            wins = chunk_windows(
                traj[: trainer.sim_length * 3], chunk=trainer.chunk,
                overlap=trainer.overlap)
            key, k = jax.random.split(key)
            gs, m = trainer.train_step(gs, env_state, wins,
                                       jnp.asarray(cmd), k)
            line = {k2: float(v) for k2, v in m.items()}
            line["epoch"] = epoch
            with open(metrics_path, "a") as f:
                f.write(json.dumps(line) + "\n")
        if epoch % 10 == 0:
            print(f"epoch {epoch}: {line}")
    print("done;", metrics_path)


if __name__ == "__main__":
    main()
