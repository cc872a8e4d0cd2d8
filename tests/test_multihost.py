"""Two-process jax.distributed dress rehearsal (VERDICT r2 item 8).

The last untested seam before real multi-host hardware (SURVEY.md §7 step
8): two REAL OS processes join a loopback coordinator, each contributing 2
virtual CPU devices to a global 4-device 'dp' mesh, and run genuine sharded
PPO train iterations through runner.learn — cross-process gradient psum,
collective checkpoint gather, host-0-only logging and checkpoint writes.
"""

import json
import os
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


@pytest.mark.slow
def test_two_process_sharded_training(tmp_path):
    port = "53217"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), port, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"worker {pid} finished 2 sharded iterations" in out

    # host-0-only artifacts: process 0's dir has metrics + checkpoint,
    # process 1's stayed empty (runner gates all writes on process_index 0)
    d0, d1 = tmp_path / "proc0", tmp_path / "proc1"
    metrics = d0 / "metrics.jsonl"
    assert metrics.exists(), os.listdir(d0)
    lines = [json.loads(l) for l in metrics.read_text().splitlines()]
    assert len(lines) == 2 and lines[-1]["it"] == 2
    assert all(
        "kl" in l and abs(l["kl"]) < 10 and l["mean_reward"] == l["mean_reward"]
        for l in lines)
    ckpts = [f for f in os.listdir(d0) if f.startswith("model_")]
    assert "model_2" in ckpts, ckpts
    leaked = [f for f in os.listdir(d1)
              if f.startswith(("model_", "metrics", "events"))]
    assert not leaked, f"process 1 wrote host-0 artifacts: {leaked}"

    # the collective save must be restorable single-process (any backend)
    import numpy as np

    import orbax.checkpoint as ocp

    raw = ocp.PyTreeCheckpointer().restore(str(d0 / "model_2"))
    assert int(raw["iteration"]) == 2
    qpos = np.asarray(raw["env_state"]["physics"]["qpos"])
    assert qpos.shape[0] == 8, qpos.shape  # global batch, fully gathered
    assert np.isfinite(qpos).all()
