"""Structured policy evaluation: falls / velocity tracking per config.

Shared core of scripts/eval_policy.py and the policy-in-the-loop physics
regression gate (tests/test_policy_regression.py, VERDICT r3 item 3): a
physics change that breaks trained walking must turn a test red on CPU —
golden anchors and calibration bands demonstrably do NOT cover gait (the
round-3 depenetration cap passed every unit band while regressing the
flagship policy from 3 to 61 falls on the 2-config probe).

`falls` counts terminations summed over all steps (an env can fall and
auto-reset repeatedly), so it is a RELATIVE gait-health metric, not
falls-per-episode; see eval_episodes for the per-episode form.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

import pointfoot_tpu.ops.quat as quat_ops
from pointfoot_tpu.utils.registry import task_registry


def make_eval_env(task: str, num_envs: int, cfg_patch: Optional[dict] = None,
                  platform: Optional[str] = "cpu"):
    """Env + loaded-policy factory with eval-mode overrides (reference
    play.py:45-51: noise and pushes off).

    `platform="cpu"` (default) pins JAX to CPU unless devices already
    initialized: on this machine the axon PJRT plugin's sitecustomize
    overrides jax_platforms in EVERY process, so an eval that doesn't pin
    silently rides the single TPU tunnel and time-slices a live trainer
    (the round-2 ~35% bench under-report, utils/benchlock.py).  Pass
    platform=None to keep whatever the process already chose.
    """
    if platform is not None:
        try:
            jax.config.update("jax_platforms", platform)
        except RuntimeError:
            pass  # backend already initialized — caller owns the choice
    patch = dict(noise=dict(add_noise=False),
                 domain_rand=dict(push_robots=False))
    if cfg_patch:
        for k, v in cfg_patch.items():
            patch.setdefault(k, {}).update(v)
    return task_registry.make_env(task, num_envs=num_envs, cfg_patch=patch)


def load_policy(env, task: str, load_run: str):
    _, tc = task_registry.get_cfgs(task)
    runner = task_registry.make_alg_runner(env, task, train_cfg=tc)
    ts0, es0 = runner.init(jax.random.PRNGKey(0))
    ts, _ = runner.load(load_run, ts0, es0)
    return runner.get_inference_policy(ts)


def eval_config(env, policy, step, level, vx_cmd, wz_cmd=0.0, secs=10.0,
                seed: int = 11) -> dict:
    """Roll `secs` of closed-loop policy control at one (level, cmd)
    config; returns falls + mean base-frame velocities."""
    num_envs = env.num_envs
    steps = int(secs / env.dt)
    state = env.init_state(jax.random.PRNGKey(seed))
    if level is not None:
        lv = jnp.full((num_envs,), level, jnp.int32)
        state = state.replace(
            terrain_level=lv,
            env_origin=env.terrain.env_origins[lv, state.terrain_type])
        phys = state.physics
        new_pos = state.env_origin + jnp.asarray(env.cfg.init_state.pos)
        state = state.replace(physics=phys.replace(base_pos=new_pos))
    cmd = jnp.asarray([vx_cmd, 0.0, wz_cmd])
    state = env.update_cmd(state, cmd)
    state, out = step(state, jnp.zeros((num_envs, env.num_actions)))
    obs = out.obs
    falls = 0
    episodes = 0  # episode-ends seen (contact terminations + timeouts)
    done_now = np.zeros(num_envs, dtype=bool)
    vels, wzs = [], []
    skip = min(50, steps // 4)
    for t in range(steps):
        state, out = step(state, policy(obs))
        state = env.update_cmd(state, cmd)
        obs = out.obs
        falls += int(np.sum(np.asarray(
            out.extras.get("terminate", out.done))))
        done_now = np.asarray(out.done)
        episodes += int(np.sum(done_now))
        if t >= skip:
            vb = quat_ops.rotate_inverse(
                state.physics.base_quat, state.physics.base_lin_vel)
            vels.append(np.asarray(vb[:, 0]))
            wb = quat_ops.rotate_inverse(
                state.physics.base_quat, state.physics.base_ang_vel)
            wzs.append(np.asarray(wb[:, 2]))
    # falls-per-env-episode (VERDICT r3 weak #8): `falls` sums
    # terminations over all steps, so an env can fall repeatedly after
    # auto-reset — fine as a relative gait-health metric but not directly
    # a rate.  Each env-run contributes its ended episodes plus, for envs
    # whose final step did NOT end an episode, the one still in flight —
    # so falls / (episodes_ended + envs_mid_episode) IS the fraction of
    # episodes ending in a fall, without double-counting an env whose
    # episode ended exactly on the last step (advisor r4).
    still_running = num_envs - int(np.sum(done_now))
    total_episodes = episodes + still_running
    return {
        "level": level, "cmd_vx": float(vx_cmd), "falls": falls,
        "envs": num_envs, "secs": float(secs),
        "episodes": total_episodes,
        "falls_per_episode": round(falls / max(total_episodes, 1), 4),
        "mean_vx": round(float(np.mean(vels)), 3),
        "cmd_wz": float(wz_cmd),
        "mean_wz": round(float(np.mean(wzs)), 3),
    }


def eval_checkpoint(task: str, load_run: str, levels: Sequence,
                    vx_list: Sequence[float], num_envs: int = 16,
                    secs: float = 10.0, wz: float = 0.0,
                    cfg_patch: Optional[dict] = None) -> list:
    """Full battery: every (level, vx) config on one loaded checkpoint."""
    env = make_eval_env(task, num_envs, cfg_patch)
    policy = load_policy(env, task, load_run)
    step = jax.jit(env.step)
    flat = env.cfg.terrain.mesh_type == "plane"
    results = []
    for level in ([None] if flat else levels):
        for vx_cmd in vx_list:
            results.append(
                eval_config(env, policy, step, level, vx_cmd, wz, secs))
    return results
