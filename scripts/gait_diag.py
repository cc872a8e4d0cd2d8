"""Closed-loop diagnostic for the biped stepping controller (mpc/gait.py).

Rolls SteppingController + raw physics at the reference two-rate scheme
(50 Hz control / 200 Hz substep, pointfoot_rough_config.py:95,197) and
reports base height / tilt / velocity traces and time-to-fall, so gait
tuning has a measurable target: >=5 s walking at commanded vx with zero
falls (BASELINE ctrl-seq north star).

Usage: python scripts/gait_diag.py [--vx 0.4] [--ticks 250] [--b 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
if os.environ.get("DIAG_PRECISION"):
    jax.config.update("jax_default_matmul_precision",
                      os.environ["DIAG_PRECISION"])

import jax.numpy as jnp
import numpy as np

import pointfoot_tpu.mpc.gait as gait_mod
from pointfoot_tpu.mpc.gait import make_controller
from pointfoot_tpu.ops import quat as quat_ops
from pointfoot_tpu.physics import dynamics
from pointfoot_tpu.physics.assets import get_model
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState

from pointfoot_tpu.terrain.analytic import FLAT, make_terrain  # noqa: E402


def rollout(ctrl, phys, cmd, ticks, substeps=4, sub_dt=0.005,
            heading=None, height_fn=FLAT):
    model, params = ctrl.model, ctrl.params
    gait = ctrl.init(phys.base_pos.shape[0], phys)

    def tick(carry, _):
        p, g = carry
        c = cmd
        if heading is not None:  # heading-mode outer loop (PF:487-490)
            c = gait_mod.heading_command(p.base_quat, cmd[:, :2], heading)
        tau, g = ctrl.control(p, c, g)

        def sub(pp, _):
            return jax.vmap(lambda s, t: dynamics.step(
                model, params, s, t, height_fn, sub_dt))(pp, tau), ()

        p, _ = jax.lax.scan(sub, p, None, length=substeps)
        grav_b = jax.vmap(lambda q: quat_ops.rotate_inverse(
            q, jnp.asarray([0.0, 0.0, -1.0])))(p.base_quat)
        tilt = jnp.arccos(jnp.clip(-grav_b[:, 2], -1, 1))
        # roll ~ gy, pitch ~ -gx of body-frame gravity
        fz = p.contact_force[:, jnp.asarray(ctrl.feet_idx), 2]
        foot_pos = jax.vmap(lambda s: ctrl._foot_positions(s)[0])(p)
        # heading-frame velocities: during a turn the world x/y components
        # rotate with yaw, so tracking must be judged in the yaw frame
        yaw = jax.vmap(quat_ops.yaw)(p.base_quat)
        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        vx_h = cy * p.base_lin_vel[:, 0] + sy * p.base_lin_vel[:, 1]
        vy_h = -sy * p.base_lin_vel[:, 0] + cy * p.base_lin_vel[:, 1]
        out = dict(z=p.base_pos[:, 2], tilt=tilt,
                   roll=grav_b[:, 1], pitch=-grav_b[:, 0],
                   wz=p.base_ang_vel[:, 2], yaw=yaw,
                   vx=vx_h, vy=vy_h,
                   x=p.base_pos[:, 0], y=p.base_pos[:, 1], phase=g.phase,
                   fz=fz, foot_y=foot_pos[..., 1], foot_z=foot_pos[..., 2])
        return (p, g), out

    (phys, gait), traj = jax.lax.scan(tick, (phys, gait), None, length=ticks)
    return phys, jax.tree.map(np.asarray, traj)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vx", type=float, default=0.0)
    ap.add_argument("--wz", type=float, default=0.0)
    ap.add_argument("--ticks", type=int, default=250)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--period", type=float, default=None)
    ap.add_argument("--duty", type=float, default=None)
    ap.add_argument("--y_off", type=float, default=None)
    ap.add_argument("--k_int", type=float, default=None)
    ap.add_argument("--k_raibert", type=float, default=None)
    ap.add_argument("--kp_cart", type=float, default=None)
    ap.add_argument("--kd_cart", type=float, default=None)
    ap.add_argument("--swing_height", type=float, default=None)
    ap.add_argument("--perturb", type=float, default=0.0)
    ap.add_argument("--push_vx", type=float, default=0.0)
    ap.add_argument("--push_vy", type=float, default=0.0)
    ap.add_argument("--w_omega", type=float, default=None)
    ap.add_argument("--w_orient", type=float, default=None)
    ap.add_argument("--w_tan", type=float, default=None)
    ap.add_argument("--yaw_ant", type=float, default=None)
    ap.add_argument("--duty_turn", type=float, default=None)
    ap.add_argument("--trace_env", type=int, default=0)
    ap.add_argument("--err_gain", type=float, default=None)
    ap.add_argument("--step_reach", type=float, default=None)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--heading", type=float, default=None,
                    help="heading-mode: commanded yaw [rad] (wz arg ignored)")
    ap.add_argument("--terrain", type=str, default="flat",
                    help="kind:amp — flat | slope:0.1 | wave:0.04 | "
                         "bumps:0.03 | step:0.08 | grid:LEVEL (the real "
                         "curriculum TerrainGrid row; env b spawns on "
                         "type column b)")
    ap.add_argument("--robot", type=str, default="pointfoot",
                    choices=("pointfoot", "a1", "anymal_b", "anymal_c",
                             "cassie"),
                    help="robot with a tuned stack (mpc.gait.make_controller)")
    args = ap.parse_args()

    model = get_model(args.robot)
    # flags default to None = "defer to the robot's tuned stack"
    # (mpc.gait.make_controller); an explicitly passed value overrides
    # the tuned default, including when it happens to equal it
    gkw = {k: v for k, v in dict(
        period=args.period, duty=args.duty, k_raibert=args.k_raibert,
        kp_cart=args.kp_cart, y_off=args.y_off, k_int=args.k_int,
        kd_cart=args.kd_cart, swing_height=args.swing_height,
        yaw_anticipate=args.yaw_ant, duty_turn_gain=args.duty_turn,
        period_err_gain=args.err_gain,
        step_reach=args.step_reach).items() if v is not None}
    spawn_xyz = None
    if args.terrain.startswith("grid"):
        # the real curriculum TerrainGrid (pointfoot_rough dims): walk one
        # full difficulty row, env b on type column b
        from pointfoot_tpu.terrain.grid import TerrainCfg, build_terrain

        level = int(args.terrain.partition(":")[2] or 0)
        grid = build_terrain(TerrainCfg(), seed=args.seed)
        hfn = grid.height_at
        cols = np.arange(args.b) % grid.num_types
        spawn_xyz = np.asarray(grid.env_origins)[
            min(level, grid.num_levels - 1), cols]  # (b, 3)
        print(f"terrain grid row {level}: type columns {cols.tolist()}")
    else:
        hfn = make_terrain(args.terrain)
    skw = {k: v for k, v in (("w_omega", args.w_omega),
                             ("w_orient", args.w_orient),
                             ("w_force_tangent", args.w_tan))
           if v is not None}
    stack = make_controller(
        args.robot, gait_overrides=gkw, srb_overrides=skw,
        height_fn=None if args.terrain in ("", "flat") else hfn)
    ctrl, q0, z0 = stack.ctrl, stack.q0, stack.z0
    # control rate: the biped runs the reference two-rate scheme (50 Hz
    # control / 200 Hz substep); the quadruped trots tick AT the substep
    # rate — at 50 Hz the swing-leg reaction moment develops a ~0.3 rad
    # pitch offset between plan refreshes (see make_controller)
    ctrl_dt, substeps = stack.ctrl_dt, stack.substeps
    # --ticks is in 50 Hz-equivalent units so durations are comparable
    # across robots regardless of each stack's control rate
    ticks_per_50hz = max(1, round(0.02 / ctrl_dt))
    ticks = args.ticks * ticks_per_50hz
    phys = PhysicsState.default(model, q0, batch=(args.b,),
                                base_height=z0)
    if spawn_xyz is not None:
        off = jnp.asarray(spawn_xyz, jnp.float32)
        phys = phys.replace(base_pos=phys.base_pos + off)
    if args.perturb > 0:
        key = jax.random.PRNGKey(args.seed)
        kv, kw = jax.random.split(key)
        phys = phys.replace(
            base_lin_vel=phys.base_lin_vel + args.perturb
            * jax.random.normal(kv, phys.base_lin_vel.shape),
            base_ang_vel=phys.base_ang_vel + args.perturb
            * jax.random.normal(kw, phys.base_ang_vel.shape))
    if args.push_vx or args.push_vy:
        phys = phys.replace(base_lin_vel=phys.base_lin_vel + jnp.asarray(
            [args.push_vx, args.push_vy, 0.0]))
    cmd = jnp.broadcast_to(jnp.asarray([args.vx, 0.0, args.wz]), (args.b, 3))

    heading = (None if args.heading is None else
               jnp.full((args.b,), args.heading))
    phys, tr = rollout(ctrl, phys, cmd, ticks, substeps=substeps,
                       heading=heading, height_fn=hfn)
    relz = tr["z"] - np.asarray(hfn(tr["x"], tr["y"]))  # height above ground
    z_fall = 0.35 if args.robot == "pointfoot" else 0.55 * z0
    fallen = (relz < z_fall) | (tr["tilt"] > 0.8) | ~np.isfinite(relz)
    first_fall = np.where(fallen.any(0), fallen.argmax(0), ticks)
    print(f"cmd vx={args.vx}  ticks={ticks} (dt {ctrl_dt})")
    print(f"falls: {int((first_fall < ticks).sum())}/{args.b}")
    print(f"time-to-fall per env [ticks]: {first_fall}")
    # yaw progress: achieved heading vs the commanded-integral (unwrapped)
    yaw_uw = np.unwrap(tr["yaw"], axis=0)
    yaw_gain = (yaw_uw[-1] - yaw_uw[0]).mean()
    yaw_cmd_total = args.wz * ticks * ctrl_dt
    if abs(yaw_cmd_total) > 1e-6:
        print(f"yaw progress: {yaw_gain:+.3f} rad of {yaw_cmd_total:+.3f} "
              f"commanded ({100 * yaw_gain / yaw_cmd_total:.0f}%)")
    T10 = min(ticks, int(round(1.0 / ctrl_dt)))
    for name in ("z", "tilt", "vx", "vy", "wz"):
        v = tr[name]
        print(f"  {name}: t<1s mean {v[:T10].mean():+.3f} "
              f"| full mean {v.mean():+.3f} | min {v.min():+.3f} "
              f"| max {v.max():+.3f}")
    # dense trace of env 0 around the first fall
    e = min(args.trace_env, args.b - 1)
    t_end = int(first_fall[e]) + 10
    for t in range(0, min(t_end, ticks), 2 * ticks_per_50hz):
        fz_s = ",".join(f"{v:5.1f}" for v in tr['fz'][t, e])
        fy_s = ",".join(f"{v:+.3f}" for v in tr['foot_y'][t, e])
        fzp_s = ",".join(f"{v:.3f}" for v in tr['foot_z'][t, e])
        print(f"  t={t*ctrl_dt:5.2f}s ph={tr['phase'][t,e]:.2f} "
              f"z={tr['z'][t,e]:.3f} r={tr['roll'][t,e]:+.2f} "
              f"p={tr['pitch'][t,e]:+.2f} vx={tr['vx'][t,e]:+.2f} "
              f"vy={tr['vy'][t,e]:+.2f} "
              f"fz=({fz_s}) fy=({fy_s}) fzp=({fzp_s})")


if __name__ == "__main__":
    main()
