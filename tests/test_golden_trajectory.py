"""Golden-trajectory regression anchor (BASELINE.json configs[0] shape).

A deterministic 1-env pointfoot_flat rollout (noise/DR off, pinned command,
fixed sinusoidal action policy) recorded at tests/golden/ must reproduce
exactly on CPU across refactors — the control-sequence regression anchor the
reference relied on manual `shape.py` probing for (SURVEY.md §4).  Regenerate
deliberately (see test body for the exact recipe) whenever a *deliberate*
physics-behavior change lands, and note it in the commit message.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "pointfoot_flat_50step.npz")


def test_control_sequence_matches_golden():
    from pointfoot_tpu.envs.config import override
    from pointfoot_tpu.envs.legged_env import LeggedEnv
    from pointfoot_tpu.utils.registry import task_registry

    env_cfg, _ = task_registry.get_cfgs("pointfoot_flat")
    env_cfg = override(
        env_cfg,
        env=dict(num_envs=1),
        noise=dict(add_noise=False),
        domain_rand=dict(randomize_friction=False, push_robots=False,
                         randomize_base_mass=False, randomize_base_com=False))
    env = LeggedEnv(env_cfg)
    state = env.init_state(jax.random.PRNGKey(42))
    state = env.update_cmd(state, [0.3, 0.0, 0.0])
    step = jax.jit(env.step)
    obs_list, tau_list = [], []
    for t in range(50):
        a = 0.3 * jnp.sin(jnp.arange(6) * 1.0 + t * 0.1)[None, :]
        state, out = step(state, a)
        obs_list.append(np.asarray(out.obs[0]))
        tau_list.append(np.asarray(state.torques[0]))
    obs = np.stack(obs_list)
    tau = np.stack(tau_list)

    ref = np.load(GOLDEN)
    # tolerances at the control-sequence level (BASELINE "ctrl-seq max err"):
    # exact on the recording platform, small fp slack for kernel reordering
    np.testing.assert_allclose(tau, ref["torques"], atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(obs, ref["obs"], atol=2e-3, rtol=1e-4)


def _record_current():
    """The exact anchor recipe (shared with scripts/regen_golden.py)."""
    from pointfoot_tpu.envs.config import override
    from pointfoot_tpu.envs.legged_env import LeggedEnv
    from pointfoot_tpu.utils.registry import task_registry

    env_cfg, _ = task_registry.get_cfgs("pointfoot_flat")
    env_cfg = override(
        env_cfg,
        env=dict(num_envs=1),
        noise=dict(add_noise=False),
        domain_rand=dict(randomize_friction=False, push_robots=False,
                         randomize_base_mass=False, randomize_base_com=False))
    env = LeggedEnv(env_cfg)
    state = env.init_state(jax.random.PRNGKey(42))
    state = env.update_cmd(state, [0.3, 0.0, 0.0])
    step = jax.jit(env.step)
    obs_list, tau_list = [], []
    for t in range(50):
        a = 0.3 * jnp.sin(jnp.arange(6) * 1.0 + t * 0.1)[None, :]
        state, out = step(state, a)
        obs_list.append(np.asarray(out.obs[0]))
        tau_list.append(np.asarray(state.torques[0]))
    return np.stack(obs_list), np.stack(tau_list)


def test_archived_anchors_stay_runnable():
    """Every archived anchor generation (scripts/regen_golden.py) must stay
    loadable and replayable against current physics.  Archives document
    deliberate behavior changes, so they are NOT required to match — but
    the history must stay runnable (VERDICT r2 item 5), and the current
    anchor must carry provenance."""
    import glob

    cur = np.load(GOLDEN, allow_pickle=True)
    assert "git_rev" in cur and "reason" in cur, \
        "current anchor lacks provenance — regenerate via scripts/regen_golden.py"

    archive = os.path.join(os.path.dirname(GOLDEN), "archive")
    anchors = sorted(glob.glob(os.path.join(archive, "*.npz")))
    assert anchors, "archive/ must retain at least the first generation"
    obs, tau = _record_current()
    for path in anchors:
        ref = np.load(path, allow_pickle=True)
        assert ref["obs"].shape == obs.shape
        assert ref["torques"].shape == tau.shape
        drift = float(np.abs(ref["torques"] - tau).max())
        assert np.isfinite(drift)
        print(f"{os.path.basename(path)}: max torque drift vs current "
              f"physics {drift:.4f} N·m")
