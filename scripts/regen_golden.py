"""Regenerate the golden control-sequence anchor — WITH archival.

VERDICT r2 item 5: regenerating the anchor in place ratifies whatever
physics exists (the round-1 contact-adhesion bug lived inside a passing
golden test for a round).  This script is now the only sanctioned way to
regenerate:

1. the current anchor is archived to tests/golden/archive/ under a name
   carrying its generation index and the git rev it was recorded at;
2. the new anchor embeds provenance (git rev, date, reason) inside the npz;
3. tests/golden/archive/HISTORY.md gets an entry (reason is REQUIRED);
4. tests/test_golden_trajectory.py::test_archived_anchors_stay_runnable
   replays every archived anchor against current physics and reports the
   drift — history stays runnable, so a regeneration can never silently
   orphan the record.

Usage: python scripts/regen_golden.py --reason "why the behavior changed"
"""

import argparse
import datetime
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
ANCHOR = os.path.join(GOLDEN_DIR, "pointfoot_flat_50step.npz")
ARCHIVE = os.path.join(GOLDEN_DIR, "archive")


def record_rollout():
    """EXACTLY the recipe in tests/test_golden_trajectory.py."""
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reason", required=True,
                    help="what physics behavior changed, and why")
    args = ap.parse_args()

    rev = subprocess.check_output(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=os.path.dirname(GOLDEN_DIR)).decode().strip()
    today = datetime.date.today().isoformat()

    os.makedirs(ARCHIVE, exist_ok=True)
    if os.path.exists(ANCHOR):
        old = np.load(ANCHOR, allow_pickle=True)
        gen = int(old["generation"]) if "generation" in old else 0
        old_rev = str(old["git_rev"]) if "git_rev" in old else "pre-archival"
        name = f"pointfoot_flat_50step_gen{gen:02d}_{old_rev}.npz"
        shutil.copy2(ANCHOR, os.path.join(ARCHIVE, name))
        print(f"archived generation {gen} -> archive/{name}")
    else:
        gen = -1

    obs, tau = record_rollout()
    np.savez(ANCHOR, obs=obs, torques=tau,
             generation=np.int32(gen + 1),
             git_rev=np.str_(rev), date=np.str_(today),
             reason=np.str_(args.reason))
    hist = os.path.join(ARCHIVE, "HISTORY.md")
    header = not os.path.exists(hist)
    with open(hist, "a") as f:
        if header:
            f.write("# Golden-anchor generation history\n\n"
                    "| gen | date | git rev | reason |\n|---|---|---|---|\n")
        f.write(f"| {gen + 1} | {today} | {rev} | {args.reason} |\n")
    print(f"recorded generation {gen + 1} @ {rev}: {args.reason}")


if __name__ == "__main__":
    main()
