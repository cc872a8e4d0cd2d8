"""Render a walking GIF: trained RL policy (env rollout) or gait-MPC.

Replaces the reference's interactive viewer capture (play.py camera/frame
recording, reference play.py:80-87) with headless artifact rendering.

Usage:
  python scripts/make_gif.py --mode policy --task pointfoot_rough \
      --load_run logs/.../model_N --out docs/walk_rough.gif
  python scripts/make_gif.py --mode gait --vx 0.4 --out docs/walk_gait.gif
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def tree_index(tree, i):
    return jax.tree.map(lambda x: x[i], tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["policy", "gait"], default="policy")
    ap.add_argument("--task", default="pointfoot_rough")
    ap.add_argument("--load_run", default=None)
    ap.add_argument("--out", default="docs/walk.gif")
    ap.add_argument("--vx", type=float, default=0.4)
    ap.add_argument("--wz", type=float, default=0.0)
    ap.add_argument("--heading", type=float, default=None)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--every", type=int, default=2,
                    help="render every Nth control tick")
    ap.add_argument("--terrain", type=str, default="flat",
                    help="gait mode: kind:amp analytic terrain "
                         "(terrain/analytic.py), e.g. wave:0.04")
    ap.add_argument("--robot", type=str, default="pointfoot",
                    help="gait mode: robot with a tuned stack "
                         "(pointfoot | a1 | anymal_b | anymal_c | "
                         "cassie)")
    args = ap.parse_args()

    from pointfoot_tpu.utils.visualizer import render_rollout

    if args.mode == "gait":
        from pointfoot_tpu.mpc.gait import heading_command, make_controller
        from pointfoot_tpu.physics import dynamics
        from pointfoot_tpu.physics.model import PhysicsState

        from pointfoot_tpu.terrain.analytic import (
            AnalyticTerrain, make_terrain)

        hfn = make_terrain(args.terrain)
        on_terrain = args.terrain not in ("", "flat")
        stack = make_controller(args.robot,
                                height_fn=hfn if on_terrain else None)
        ctrl, model, params = stack.ctrl, stack.ctrl.model, stack.ctrl.params
        phys = PhysicsState.default(model, stack.q0, batch=(1,),
                                    base_height=stack.z0)
        gait = ctrl.init(1, phys)
        cmd = jnp.asarray([[args.vx, 0.0, args.wz]])

        @jax.jit
        def substeps(p, tq):
            def sub(pp, _):
                return jax.vmap(lambda s, u: dynamics.step(
                    model, params, s, u, hfn, 0.005))(pp, tq), ()
            p, _ = jax.lax.scan(sub, p, None, length=stack.substeps)
            return p

        # render cadence: `--every` is in 50 Hz-equivalent ticks so GIF
        # timing is robot-independent (the a1 ticks at 200 Hz)
        ticks_per_50hz = max(1, round(0.02 / stack.ctrl_dt))
        every = args.every * ticks_per_50hz
        states = []
        for t in range(args.steps * ticks_per_50hz):
            c = cmd
            if args.heading is not None:
                c = heading_command(phys.base_quat, cmd[:, :2],
                                    jnp.full((1,), args.heading))
            tq, gait = ctrl.control(phys, c, gait)
            phys = substeps(phys, tq)
            if t % every == 0:
                states.append(tree_index(phys, 0))
        out = render_rollout(
            model, states, params, args.out, fps=25 // args.every,
            terrain=AnalyticTerrain(hfn) if on_terrain else None)
        print(f"wrote {out} ({len(states)} frames)")
        return

    from pointfoot_tpu.utils.helpers import get_load_path
    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env(
        args.task, num_envs=4,
        cfg_patch=dict(noise=dict(add_noise=False),
                       domain_rand=dict(push_robots=False)))
    _, tc = task_registry.get_cfgs(args.task)
    runner = task_registry.make_alg_runner(env, args.task, train_cfg=tc)
    ts0, es0 = runner.init(jax.random.PRNGKey(0))
    path = args.load_run or get_load_path(
        os.path.join("logs", tc.runner.experiment_name))
    ts, _ = runner.load(path, ts0, es0)
    policy = runner.get_inference_policy(ts)
    step = jax.jit(env.step)

    state = env.init_state(jax.random.PRNGKey(1))
    state = env.update_cmd(state, jnp.asarray([args.vx, 0.0, 0.0]))
    state, out0 = step(state, jnp.zeros((4, env.num_actions)))
    obs = out0.obs
    states = []
    for t in range(args.steps):
        state, outp = step(state, policy(obs))
        state = env.update_cmd(state, jnp.asarray([args.vx, 0.0, 0.0]))
        obs = outp.obs
        if t % args.every == 0:
            states.append(tree_index(state.physics, 0))
    terrain = getattr(env, "terrain", None)
    out = render_rollout(env.model, states, env.params_single
                         if hasattr(env, "params_single")
                         else tree_index(state.params, 0),
                         args.out, terrain=terrain, fps=25 // args.every)
    print(f"wrote {out} ({len(states)} frames)")


if __name__ == "__main__":
    main()
