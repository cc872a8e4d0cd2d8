"""Command-relative tracking width (rewards.tracking_rel_vref) — the
round-5 deviation knob for low-command calibration (VERDICT r4 item 2).

Reference semantics (point_foot.py:1131-1140): fixed width
exp(-err^2/0.25) regardless of command magnitude — measured to
under-select small-command precision (PARITY.md calibration split).
With the knob ON, selectivity is equal in RELATIVE error at every
command magnitude; OFF (default) must stay bit-identical to reference.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pointfoot_tpu.utils.registry import task_registry


def _track_reward(env, cmd_xy, vel_xy):
    from pointfoot_tpu.envs import legged_env as le
    B = len(cmd_xy)
    state = env.init_state(jax.random.PRNGKey(0))
    cmds = jnp.zeros((B, 4)).at[:, :2].set(jnp.asarray(cmd_xy))
    state = state.replace(commands=cmds)
    ctx = {"state": state, "base_lin_vel": jnp.zeros((B, 3)).at[:, :2].set(
        jnp.asarray(vel_xy))}
    return np.asarray(le._reward_tracking_lin_vel(env, ctx))


def test_default_is_reference_exact():
    env = task_registry.make_env("pointfoot_flat", num_envs=2)
    assert env.cfg.rewards.tracking_rel_vref == 0.0
    r = _track_reward(env, [[0.25, 0.0], [1.0, 0.0]],
                      [[0.45, 0.0], [1.2, 0.0]])
    # fixed width: same |err| -> same reward at any command
    np.testing.assert_allclose(r[0], r[1], rtol=1e-6)
    np.testing.assert_allclose(r, np.exp(-0.2**2 / 0.25), rtol=1e-5)


def test_rel_width_equalizes_relative_error():
    env = task_registry.make_env(
        "pointfoot_flat", num_envs=3,
        cfg_patch=dict(rewards=dict(tracking_rel_vref=1.0)))
    # 20% relative overshoot at cmd 0.25, 0.5 and 1.0
    r = _track_reward(
        env, [[0.25, 0.0], [0.5, 0.0], [1.0, 0.0]],
        [[0.30, 0.0], [0.60, 0.0], [1.20, 0.0]])
    # sigma_eff = 0.25*cmd^2 (above the floor) -> err^2/sigma_eff =
    # (0.2*cmd)^2/(0.25*cmd^2) = 0.16 at every magnitude
    np.testing.assert_allclose(r, np.exp(-0.16), rtol=1e-4)
    # at |cmd| = vref the knob is reference-exact
    r1 = _track_reward(env, [[1.0, 0.0]] * 3, [[1.2, 0.0]] * 3)
    np.testing.assert_allclose(r1, np.exp(-0.04 / 0.25), rtol=1e-5)


def test_rel_width_floor_bounds_standstill_sharpness():
    env = task_registry.make_env(
        "pointfoot_flat", num_envs=1,
        cfg_patch=dict(rewards=dict(tracking_rel_vref=1.0)))
    # cmd 0: sigma_eff floors at 0.04*0.25 = 0.01 — creep at 0.1 m/s is
    # strongly punished (0.37 vs the reference's near-flat 0.96) but the
    # width stays finite
    r = _track_reward(env, [[0.0, 0.0]], [[0.1, 0.0]])
    np.testing.assert_allclose(r, np.exp(-0.01 / 0.01), rtol=1e-4)


def test_low_cmd_oversample_shifts_distribution():
    """CommandsCfg.low_cmd_oversample (round-5 follow-up lever): with the
    knob at 0.5, about half of resampled vx land in the precision-
    critical [0.2, 0.4] magnitude band; default 0 keeps the reference's
    uniform draw (< ~12% in-band for the (-1, 1) range)."""
    def band_frac(patch):
        env = task_registry.make_env("pointfoot_flat", num_envs=512,
                                     cfg_patch=patch)
        state = env.init_state(jax.random.PRNGKey(0))
        # force a resample on every env
        state = state.replace(episode_step=jnp.zeros(512, jnp.int32))
        state = env._resample_commands(
            state, jnp.ones(512, bool), jax.random.PRNGKey(3))
        vx = np.abs(np.asarray(state.commands[:, 0]))
        return ((vx >= 0.2) & (vx <= 0.4)).mean()

    base = band_frac(None)
    over = band_frac(dict(commands=dict(low_cmd_oversample=0.5)))
    assert base < 0.2, base
    assert over > 0.35, over
