"""Value-loss-storm guard: the reward clip band is the trained-in defense
against the storms that destabilized long round-4 rough runs.

Mechanism (docs/ROUND4_NOTES.md §0 thread 0): rare finite-but-huge reward
steps (deep-penetration spring impulses on kicked envs) poison the value
targets; value_loss ~ clip**2, and a poisoned critic takes the policy down
(entropy runaway).  The storm-window A/B (clip 100 vs 20 replaying iters
100k-115k of tpu_r4_storm) measured value_loss max 11,428 -> 846 with
tracking maintained, and the 115k->200k continuation trained under 20
stayed calm.  These tests go red if the guard is removed or loosened
(VERDICT r4 item 3: "a red test/alarm if the guard is removed").
"""

import jax
import jax.numpy as jnp
import numpy as np

from pointfoot_tpu.envs.config import RewardsCfg
from pointfoot_tpu.utils.registry import task_registry


def test_default_clip_is_storm_safe():
    # 20 is ~10-50x any legitimate per-step magnitude (scales are
    # dt-premultiplied, healthy steps are O(1)) yet bounds the value-target
    # damage of a garbage step ~20x better than the old 100.  Anyone
    # loosening this default must re-run the storm-window A/B first.
    assert RewardsCfg().clip_reward <= 20.0 + 1e-9
    env = task_registry.make_env("pointfoot_rough", num_envs=1)
    assert env.cfg.rewards.clip_reward <= 20.0 + 1e-9


def test_finite_garbage_step_is_clipped():
    """A finite-but-huge state (the storm igniter) may not produce a
    reward outside the guard band."""
    env = task_registry.make_env("pointfoot_flat", num_envs=8)
    state = env.init_state(jax.random.PRNGKey(0))
    phys = state.physics
    # finite garbage: a kicked env with absurd velocity (quadratic reward
    # terms like lin_vel_z / dof_acc / torques scale as v**2 -> O(1e8))
    phys = phys.replace(
        qvel=phys.qvel.at[3].set(1e4),
        base_lin_vel=phys.base_lin_vel.at[3].set(
            jnp.array([1e4, -1e4, 1e4])))
    state = state.replace(physics=phys)

    clip = env.cfg.rewards.clip_reward
    _, out = jax.jit(env.step)(state, jnp.zeros((8, 6)))
    r = np.asarray(out.reward)
    assert np.isfinite(r).all()
    assert np.abs(r).max() <= clip + 1e-6, (
        f"reward {np.abs(r).max()} escaped the +-{clip} guard band")


def test_metrics_storm_detector(tmp_path):
    """scripts/storm_guard.py flags the recorded storm signature and stays
    quiet on the recorded healthy regime."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "storm_guard",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "storm_guard.py"))
    sg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sg)

    import json

    def write(rows):
        p = tmp_path / "metrics.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        return str(p)

    # healthy regime (tpu_r4_storm under clip 20): vloss ~2-3 with
    # bounded excursions to ~350, noise_std ~0.44
    calm = [{"it": i, "value_loss": 2.5 + (350 if i % 37 == 0 else 0),
             "noise_std": 0.44} for i in range(60)]
    code, msg = sg.check(write(calm))
    assert code == 0, msg

    # storm regime (control replay, clip 100): vloss p95 3.6k
    storm = [{"it": i, "value_loss": 3000.0 + 50 * i, "noise_std": 0.6}
             for i in range(60)]
    code, msg = sg.check(write(storm))
    assert code == 1 and "value_loss" in msg

    # noise inflation alone (0.82-1.0 at tracking collapse) also trips
    inflate = [{"it": i, "value_loss": 5.0, "noise_std": 0.9}
               for i in range(60)]
    code, msg = sg.check(write(inflate))
    assert code == 1 and "noise_std" in msg

    # too little data -> indeterminate, not an alarm
    code, _ = sg.check(write(calm[:3]))
    assert code == 2
