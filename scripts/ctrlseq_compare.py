"""Control-sequence comparison: gait-MPC vs the trained RL policy.

BASELINE's "ctrl-seq max err" asks how close direct optimization gets to
the learned controller.  Protocol: roll the RL policy closed-loop on
pointfoot_flat (noise/DR off, pinned command), then query the stepping
MPC (mpc/gait.py) for its torque command AT EVERY STATE the policy
visited (gait clock threaded along the trajectory).  Reports per-joint
RMS and max torque differences plus the normalized error — the RL
torques come from the env's PD law (tau = kp(a*scale - q) - kd qdot,
point_foot.py:523-547 parity), the MPC's from SRB force mapping + swing
PD, so agreement is measured on the common output: joint torques.

Usage: python scripts/ctrlseq_compare.py [--load_run DIR] [--vx 0.4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pointfoot_tpu.mpc.gait import SteppingController
from pointfoot_tpu.utils.registry import task_registry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_run",
                    default="logs/pointfoot_flat/tpu_run7/model_4500")
    ap.add_argument("--vx", type=float, default=0.4)
    ap.add_argument("--steps", type=int, default=250)
    args = ap.parse_args()

    env = task_registry.make_env(
        "pointfoot_flat", num_envs=1,
        cfg_patch=dict(noise=dict(add_noise=False),
                       domain_rand=dict(randomize_friction=False,
                                        push_robots=False,
                                        randomize_base_mass=False,
                                        randomize_base_com=False)))
    _, tc = task_registry.get_cfgs("pointfoot_flat")
    runner = task_registry.make_alg_runner(env, "pointfoot_flat",
                                           train_cfg=tc)
    ts0, es0 = runner.init(jax.random.PRNGKey(0))
    ts, _ = runner.load(args.load_run, ts0, es0)
    policy = runner.get_inference_policy(ts)

    model = env.model
    feet = model.collision_indices("foot")
    mpc = SteppingController(model, jax.tree.map(lambda x: x, env._params_single)
                             if hasattr(env, "_params_single") else
                             _single_params(env), feet,
                             np.zeros(model.nj))

    state = env.init_state(jax.random.PRNGKey(0))
    state = env.update_cmd(state, jnp.asarray([args.vx, 0.0, 0.0]))
    step = jax.jit(env.step)
    state, out = step(state, jnp.zeros((1, env.num_actions)))
    obs = out.obs
    gait = mpc.init(1, state.physics)
    cmd = jnp.asarray([[args.vx, 0.0, 0.0]])

    tau_rl, tau_mpc = [], []
    for t in range(args.steps):
        a = policy(obs)
        # MPC torque at the SAME pre-step state
        tq_mpc, gait = mpc.control(state.physics, cmd, gait)
        state, out = step(state, a)
        state = env.update_cmd(state, jnp.asarray([args.vx, 0.0, 0.0]))
        obs = out.obs
        tau_rl.append(np.asarray(state.torques[0]))
        tau_mpc.append(np.asarray(tq_mpc[0]))
    tau_rl = np.stack(tau_rl)
    tau_mpc = np.stack(tau_mpc)
    # skip the 1 s transient (command ramp in both controllers)
    sl = slice(50, None)
    diff = tau_mpc[sl] - tau_rl[sl]
    rms = float(np.sqrt(np.mean(diff**2)))
    mx = float(np.abs(diff).max())
    scale = float(np.sqrt(np.mean(tau_rl[sl] ** 2)))
    print(json.dumps({
        "metric": "ctrlseq_torque_err_vs_rl_policy",
        "rms_Nm": round(rms, 3),
        "max_Nm": round(mx, 3),
        "rl_rms_Nm": round(scale, 3),
        "normalized_rms": round(rms / max(scale, 1e-9), 3),
        "vx": args.vx, "steps": args.steps,
    }))
    # task-level comparison: closed-loop velocity tracking of each
    # controller on the same command (the practically meaningful number —
    # instantaneous torques differ mostly by gait-phase misalignment)
    from pointfoot_tpu.ops import quat as quat_ops
    from pointfoot_tpu.physics import dynamics as dyn_mod

    FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
    model = env.model

    def mpc_rollout():
        from pointfoot_tpu.physics.model import PhysicsState

        phys = PhysicsState.default(model, np.zeros(model.nj), batch=(1,),
                                    base_height=0.62)
        g = mpc.init(1, phys)
        params1 = _single_params(env)

        @jax.jit
        def substeps(p, tq):
            def sub(pp, _):
                return jax.vmap(lambda s, u: dyn_mod.step(
                    model, params1, s, u, FLAT, 0.005))(pp, tq), ()
            p, _ = jax.lax.scan(sub, p, None, length=4)
            return p

        vxs = []
        for t in range(args.steps):
            tq, g = mpc.control(phys, cmd, g)
            phys = substeps(phys, tq)
            if t >= 50:
                vb = quat_ops.rotate_inverse(phys.base_quat[0],
                                             phys.base_lin_vel[0])
                vxs.append(float(vb[0]))
        return float(np.mean(vxs))

    def rl_vx():
        st = env.init_state(jax.random.PRNGKey(1))
        st = env.update_cmd(st, jnp.asarray([args.vx, 0.0, 0.0]))
        st, o = step(st, jnp.zeros((1, env.num_actions)))
        ob = o.obs
        vxs = []
        for t in range(args.steps):
            st, o = step(st, policy(ob))
            st = env.update_cmd(st, jnp.asarray([args.vx, 0.0, 0.0]))
            ob = o.obs
            if t >= 50:
                vb = quat_ops.rotate_inverse(st.physics.base_quat[0],
                                             st.physics.base_lin_vel[0])
                vxs.append(float(vb[0]))
        return float(np.mean(vxs))

    v_mpc, v_rl = mpc_rollout(), rl_vx()
    print(json.dumps({
        "metric": "closed_loop_vx_tracking",
        "cmd": args.vx,
        "mpc_vx": round(v_mpc, 3),
        "rl_vx": round(v_rl, 3),
        "mpc_err_pct": round(100 * abs(v_mpc - args.vx) / max(args.vx, 1e-9), 1),
        "rl_err_pct": round(100 * abs(v_rl - args.vx) / max(args.vx, 1e-9), 1),
    }))


def _single_params(env):
    from pointfoot_tpu.physics.model import PhysicsParams

    return PhysicsParams.nominal(env.model)


if __name__ == "__main__":
    main()
