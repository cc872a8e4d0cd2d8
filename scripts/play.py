"""Policy evaluation / deployment preview.

Replaces reference scripts/play.py:32-121: loads the latest checkpoint for a
task, overrides the config for evaluation (<=50 envs, domain rand / noise /
pushes off, play.py:43-51), optionally exports the policy (TorchScript +
ONNX, :62-65), rolls the policy while logging states and rewards, and
renders the diagnostic dashboard to a PNG.

Usage: python scripts/play.py --task=pointfoot_flat [--load_run DIR]
       [--steps N] [--export] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="pointfoot_flat")
    p.add_argument("--load_run", default=None)
    p.add_argument("--num_envs", type=int, default=50)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--export", action="store_true")
    p.add_argument("--dashboard", default="play_dashboard.png")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--cmd", type=float, nargs=3, default=None,
                   metavar=("VX", "VY", "WZ"),
                   help="pin a fixed command instead of the env resampler")
    args = p.parse_args()
    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointfoot_tpu.envs.config import override
    from pointfoot_tpu.utils.helpers import get_load_path
    from pointfoot_tpu.utils.logger import Logger
    from pointfoot_tpu.utils.registry import task_registry

    env_cfg, train_cfg = task_registry.get_cfgs(args.task)
    # eval overrides (reference play.py:43-51)
    env_cfg = override(
        env_cfg,
        env=dict(num_envs=min(env_cfg.env.num_envs, args.num_envs)),
        terrain=dict(curriculum=False),
        noise=dict(add_noise=False),
        domain_rand=dict(randomize_friction=False, push_robots=False,
                         randomize_base_mass=False, randomize_base_com=False),
    )
    from pointfoot_tpu.envs.legged_env import LeggedEnv

    env = LeggedEnv(env_cfg)
    runner = task_registry.make_alg_runner(env, args.task)
    ts0, es0 = runner.init(jax.random.PRNGKey(0))
    path = args.load_run or get_load_path(
        os.path.join("logs", train_cfg.runner.experiment_name))
    train_state, env_state = runner.load(path, ts0, es0)
    print(f"loaded {path}")
    policy = runner.get_inference_policy(train_state)

    if args.export:
        from pointfoot_tpu.export.onnx import (
            export_policy_as_onnx, export_policy_torchscript)

        exp_dir = os.path.join(os.path.dirname(path), "exported")
        os.makedirs(exp_dir, exist_ok=True)
        onnx_path = export_policy_as_onnx(
            train_state.params, env.num_obs,
            os.path.join(exp_dir, "policy.onnx"))
        ts_path = export_policy_torchscript(
            train_state.params, env.num_obs,
            os.path.join(exp_dir, "policy_1.pt"))
        print(f"exported {onnx_path} and {ts_path}")

    logger = Logger(env.dt)
    step = jax.jit(env.step)
    if args.cmd is not None:
        env_state = env.update_cmd(env_state, jnp.asarray(args.cmd))
    env_state, out = step(env_state, jnp.zeros((env.num_envs,
                                                env.num_actions)))
    obs = out.obs
    robot = 0
    joint = 1
    for i in range(args.steps):
        action = policy(obs)
        env_state, out = step(env_state, action)
        obs = out.obs
        phys = env_state.physics
        from pointfoot_tpu.ops import quat as quat_ops

        v_body = quat_ops.rotate_inverse(phys.base_quat, phys.base_lin_vel)
        w_body = quat_ops.rotate_inverse(phys.base_quat, phys.base_ang_vel)
        logger.log_states({
            "dof_pos_target": float(action[robot, joint]) * env_cfg.control.action_scale,
            "dof_pos": float(phys.qpos[robot, joint]),
            "dof_vel": float(phys.qvel[robot, joint]),
            "dof_torque": float(env_state.torques[robot, joint]),
            "command_x": float(env_state.commands[robot, 0]),
            "command_y": float(env_state.commands[robot, 1]),
            "command_yaw": float(env_state.commands[robot, 2]),
            "base_vel_x": float(v_body[robot, 0]),
            "base_vel_y": float(v_body[robot, 1]),
            "base_vel_z": float(v_body[robot, 2]),
            "base_vel_yaw": float(w_body[robot, 2]),
            "contact_forces_z": np.asarray(
                phys.contact_force[robot, jnp.asarray(env.feet_idx), 2]),
        })
        n_done = int(np.asarray(out.extras["num_resets"]))
        if n_done > 0:
            ep = np.asarray(out.extras["episode_rew"])
            logger.log_rewards(
                {f"rew_{n}": v for n, v in zip(env.reward_names, ep)}, n_done)
    logger.print_rewards()
    out_png = logger.plot_states(args.dashboard)
    print(f"dashboard saved to {out_png}")


if __name__ == "__main__":
    main()
