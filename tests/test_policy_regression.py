"""Policy-in-the-loop physics regression gate (VERDICT r3 item 3).

Rolls the newest committed walking checkpoint through the CURRENT physics
on CPU and asserts gait health within a band of the checkpoint's committed
eval (logs/pointfoot_rough/tpu_r3_run1/eval_100000.json).  This is the
sensor every other physics test lacks: the round-3 depenetration-velocity
cap passed the golden anchor (regenerated), every calibration band, and
the whole unit suite — while regressing the flagship policy from 3 falls
to 61 on this exact probe.  Golden anchors ratify whatever physics exists;
calibration bands exercise statics and dead impacts, not gait.  Only a
trained policy closing the loop covers the regime training actually
visits.

Measured signal-to-noise on the 2-config probe (16 envs x 10 s, round-4
A/B matrix): healthy physics 1-3 falls; every broken variant 26-345.
The reduced probe here (8 envs x 6 s) keeps CPU cost ~40 s while the
same breakages measure 10-170 falls — the assert band (falls <= 8,
tracking >= 0.2 m/s) separates them by an order of magnitude.

When a newer rough checkpoint is committed, append it to CHECKPOINTS
with its own band instead of replacing the old row — older artifacts
staying healthy under newer physics is exactly what this gate is for.
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

# (task, checkpoint, cfg_patch, [(level, vx, max_falls, min_mean_vx)])
# Bands: committed eval_100000.json reads 2 falls @ (0, 0.0) and 1 fall
# @ (0, 0.4) with mean_vx 0.32; the reduced 8-env probe scales those to
# <=2 observed.  max_falls 8 = ~4x headroom, still 5x under the mildest
# observed breakage.  The 150k flagship is gated on the configuration it
# trained on (procedural terrain, eval_150000_proc.json: 0-1 falls and
# mean_vx 0.55-0.73 at cmd 0.4 on these configs).
CHECKPOINTS = [
    ("pointfoot_rough", "logs/pointfoot_rough/tpu_r3_run1/model_100000",
     None, [(0, 0.0, 8, None), (0, 0.4, 8, 0.20)]),
    ("pointfoot_rough", "logs/pointfoot_rough/tpu_r4_run1/model_150000",
     dict(terrain=dict(procedural=True)),
     [(0, 0.0, 8, None), (0, 0.4, 8, 0.25)]),
    # flat recal artifact: 0 falls on every config, vx 0.5 -> 0.64
    # (eval_55000.json); level None = plane terrain
    ("pointfoot_flat", "logs/pointfoot_flat/tpu_r4_ft/model_55000",
     None, [(None, 0.5, 4, 0.35)]),
    # round-5 flagship: 0 falls/144 on the full battery with cmd-0.4
    # error within +-9% and stand-creep <= 0.04 (eval_234000_proc.json).
    # min_vx 0.15 (not 0.25): this policy tracks PRECISELY (0.37-0.42 at
    # cmd 0.4 over 10 s) instead of overshooting, so the 6-s probe's
    # startup transient weighs more (measured 0.21 healthy); a gait
    # breakage still reads near 0 and/or double-digit falls
    ("pointfoot_rough", "logs/pointfoot_rough/tpu_r4_storm/model_234000",
     dict(terrain=dict(procedural=True)),
     [(0, 0.0, 8, None), (0, 0.4, 8, 0.15)]),
    # round-5 flat low-command artifact (VERDICT r4 item 2, flat half):
    # under the ROBUST probe (64 envs x 20 s) cmd 0.25 -> 0.237 (-5%),
    # 0.5 -> 0.454 (-9%), 1.0 -> 1.12 (+12%), 0 falls everywhere
    # (eval_82000_robust*.json).  Reward-shaping knobs it trained under
    # (tracking_rel_vref, low_cmd_oversample) do not affect obs/physics,
    # so no cfg_patch.  min_vx 0.12 at cmd 0.25: transient-weighted 6-s
    # probe on a precise tracker (same rationale as the 234k row).
    ("pointfoot_flat", "logs/pointfoot_flat/tpu_r5_os/model_82000",
     None, [(None, 0.25, 4, 0.12), (None, 0.5, 4, 0.30)]),
]


@pytest.mark.parametrize("task,ckpt,patch,configs", CHECKPOINTS,
                         ids=[c[1].split("/")[-2] + "_" + c[1].split("_")[-1]
                              for c in CHECKPOINTS])
def test_committed_policy_still_walks(task, ckpt, patch, configs):
    path = os.path.join(REPO, ckpt)
    if not os.path.isdir(path):
        pytest.skip(f"checkpoint {ckpt} not present")
    from pointfoot_tpu.utils import policy_eval

    import jax
    env = policy_eval.make_eval_env(task, num_envs=8, cfg_patch=patch)
    policy = policy_eval.load_policy(env, task, path)
    step = jax.jit(env.step)
    failures = []
    for level, vx, max_falls, min_vx in configs:
        rec = policy_eval.eval_config(env, policy, step, level, vx,
                                      secs=6.0)
        ok = rec["falls"] <= max_falls and (
            min_vx is None or rec["mean_vx"] >= min_vx)
        if not ok:
            failures.append(rec)
    assert not failures, (
        "physics regression: committed policy no longer walks: "
        + json.dumps(failures))
