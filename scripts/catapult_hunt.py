"""Hunt the residual catapult events: run training-condition rollouts
(noise + DR + pushes + exploration) and dump full physics context for any
env whose base flies (|vz| or z beyond bounds).

The depenetration-velocity cap (physics gen 2) removed the contact-spring
launch mechanism, yet flat fine-tune logs still show base_height reward
storms (logs/pointfoot_flat/tpu_r3_ft2: -36 @ it 31501).  Something else
injects momentum.  Usage:

  JAX_PLATFORMS=cpu python scripts/catapult_hunt.py \
      --load_run logs/pointfoot_flat/tpu_r3_ft/model_16500 [--envs 512]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", os.environ.get("HUNT_PLATFORM", "cpu"))

import jax.numpy as jnp
import numpy as np

from pointfoot_tpu.utils.registry import task_registry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="pointfoot_flat")
    ap.add_argument("--load_run", required=True)
    ap.add_argument("--envs", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--explore_std", type=float, default=0.6)
    ap.add_argument("--z_hi", type=float, default=1.5)
    ap.add_argument("--vz_hi", type=float, default=4.0)
    args = ap.parse_args()

    env = task_registry.make_env(args.task, num_envs=args.envs)
    _, tc = task_registry.get_cfgs(args.task)
    runner = task_registry.make_alg_runner(env, args.task, train_cfg=tc)
    ts0, es = runner.init(jax.random.PRNGKey(0))
    ts, _ = runner.load(args.load_run, ts0, es)
    policy = runner.get_inference_policy(ts)
    step = jax.jit(env.step)

    state = env.init_state(jax.random.PRNGKey(3))
    state, out = step(state, jnp.zeros((args.envs, env.num_actions)))
    obs = out.obs
    key = jax.random.PRNGKey(42)
    prev = None
    for t in range(args.steps):
        key, k = jax.random.split(key)
        a = policy(obs) + args.explore_std * jax.random.normal(
            k, (args.envs, env.num_actions))
        new_state, out = step(state, a)
        obs = out.obs
        z = np.asarray(new_state.physics.base_pos[:, 2])
        vz = np.asarray(new_state.physics.base_lin_vel[:, 2])
        bad = np.where((z > args.z_hi) | (np.abs(vz) > args.vz_hi))[0]
        if len(bad):
            e = int(bad[0])
            pb, pa = state.physics, new_state.physics

            def row(p, name):
                print(f"  {name}: z={float(p.base_pos[e,2]):+.3f} "
                      f"vz={float(p.base_lin_vel[e,2]):+.2f} "
                      f"|v|={float(jnp.linalg.norm(p.base_lin_vel[e])):.2f} "
                      f"|w|={float(jnp.linalg.norm(p.base_ang_vel[e])):.2f}")
                print(f"    qpos={np.asarray(p.qpos[e]).round(2)}")
                print(f"    qvel={np.asarray(p.qvel[e]).round(1)}")
                print(f"    fz={np.asarray(p.contact_force[e,:,2]).round(0)}")

            print(f"[t={t}] env {e} flew ({len(bad)} total this step)")
            row(pb, "before")
            row(pa, "after ")
            print(f"    push={np.asarray(state.push_force[e]).round(1)}")
            print(f"    limits lo={np.asarray(env.model.q_lower).round(2)}")
            print(f"           hi={np.asarray(env.model.q_upper).round(2)}")
            print(f"    kp={np.asarray(state.params.kp[e]).round(1)}")
            print(f"    kd={np.asarray(state.params.kd[e]).round(2)}")
            print(f"    friction={np.asarray(state.params.friction[e]).round(2)}")
            print(f"    added_mass={float(state.params.added_mass[e]):.2f} "
                  f"com={np.asarray(state.params.com_offset[e]).round(3)}")
            print(f"    k_c={float(state.params.contact_stiffness[e]):.0f} "
                  f"d_c={float(state.params.contact_damping[e]):.0f}")
            print(f"    ep_step={int(state.episode_step[e])}")
            if prev is not None:
                print("  two steps back:")
                row(prev, "t-2   ")
            if len(bad) >= 1 and t > 0:
                break
        prev = state.physics
        state = new_state
    else:
        print("no catapult events detected")


if __name__ == "__main__":
    main()
