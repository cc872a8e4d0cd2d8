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
