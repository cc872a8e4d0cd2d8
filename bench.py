"""Headline benchmark: pointfoot_rough env throughput at 4096 envs.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric: vectorized env steps/s (policy steps x num_envs) on one chip for the
flagship pointfoot_rough config (full physics: 4 PD substeps @ 200 Hz,
contact, terrain height scan, 19 active reward terms, curricula, masked
resets).  Baseline: real-time rate at 4096 envs and the reference's 50 Hz
policy rate = 204,800 steps/s (BASELINE.md: "real-time rate at batch 4096 on
one v5e host"); vs_baseline = achieved / real-time.

BENCH_MODE=mpc instead benchmarks the batched receding-horizon iLQR engine:
scenario-solves/s at BENCH_NUM_ENVS scenarios (horizon 25, 2 iterations per
50 Hz tick); vs_baseline = solves/s / (num_scenarios * 50 Hz).

BENCH_MODE=actuator_net benchmarks the actuator-net-in-the-loop dynamics
(BASELINE configs[3]): the anymal_c_rough task whose per-substep torques
come from the baked ANYdrive LSTM instead of the PD law.

BENCH_MODE=train benchmarks the FULL training iteration (24-step rollout
+ GAE + 5x4 PPO minibatch SGD) — the end-to-end number the
"Learning to Walk in Minutes" 4096-env regime is about.
"""

import json
import os
import sys
import time

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", "4096"))
TIMED_ITERS = int(os.environ.get("BENCH_ITERS", "20"))
STEPS_PER_ITER = int(os.environ.get("BENCH_SCAN", "24"))
MODE = os.environ.get("BENCH_MODE", "env")
REPS = int(os.environ.get("BENCH_REPS", "3"))

# measurement conditions recorded into the output JSON (set in __main__):
# whether this repo's own background trainer was quiesced for the run —
# BENCH_r02 measured 0.735x real-time purely because a concurrent trainer
# was time-slicing the single chip (its own metrics.jsonl logged 236k
# steps/s at the same wall-clock).
CONDITIONS = {"trainer": "unknown"}


def main_mpc():
    """SRB-MPC (the real-time 50 Hz planning layer): one tick = batched
    Riccati re-plan + leg-torque mapping for all scenarios."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointfoot_tpu.mpc.srb import SRBConfig, SRBController
    from pointfoot_tpu.physics import dynamics
    from pointfoot_tpu.physics.assets import get_model
    from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState

    B = NUM_ENVS
    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    feet = model.collision_indices("foot")
    ctrl = SRBController(model, params, feet, np.zeros(6, np.float32),
                         SRBConfig())
    phys = PhysicsState.default(model, np.zeros(6), batch=(B,),
                                base_height=0.62)
    cmd = jnp.zeros((B, 3))
    contact = jnp.ones((B, len(feet)))

    # fused Pallas SRB-LQR kernel by default on TPU (8.4x the XLA path,
    # 0.6% f32 parity); BENCH_SRB_PALLAS=0 forces the XLA solver
    on_tpu = jax.devices()[0].platform == "tpu"
    use_pallas = os.environ.get("BENCH_SRB_PALLAS", "1" if on_tpu else "0") == "1"

    @jax.jit
    def tick(p):
        if use_pallas:
            tau, fs = ctrl.plan_tick_pallas(p, cmd)
            return tau, fs
        tau, plans = ctrl.plan_tick(p, cmd)
        return tau, plans.xs

    tau, xs = tick(phys)
    jax.block_until_ready(tau)
    reps = []
    for _ in range(max(REPS, 1)):
        t0 = time.perf_counter()
        for _ in range(TIMED_ITERS):
            tau, xs = tick(phys)
        jax.block_until_ready(tau)
        dt = (time.perf_counter() - t0) / TIMED_ITERS
        reps.append(B / dt)
    solves_per_sec = sorted(reps)[len(reps) // 2]
    realtime = B * 50.0
    print(json.dumps({
        "metric": f"srb_mpc_scenario_solves_per_sec@{B}",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / realtime, 4),
        "conditions": {**CONDITIONS,
                       "solver": "pallas" if use_pallas else "xla",
                       "horizon": ctrl.cfg.horizon,
                       "reps_solves_per_sec": [round(r, 1) for r in reps]},
    }))


def main_mpc_ilqr():
    """Full-model iLQR (offline trajectory optimization, not the 50 Hz path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointfoot_tpu.mpc.controller import MPCController
    from pointfoot_tpu.mpc.ilqr import ILQRConfig
    from pointfoot_tpu.physics.assets import get_model
    from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState

    B = NUM_ENVS
    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    flat = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
    ctrl = MPCController(
        model, params, flat, np.zeros(6, np.float32),
        cfg=ILQRConfig(horizon=25, iterations=2, reg_init=1.0), dt=0.02)
    # Batch chunking (VERDICT r4 item 5): the monolithic vmap at B=4096
    # times out the remote XLA compile (>40 min; ROUND4_NOTES §2e) while
    # B<=1024 compiles fine — so compile the <=CHUNK-wide program once and
    # lax.map it over B/CHUNK slabs.  Same math, same total FLOPs; compile
    # cost is the 1024-wide program's.
    CHUNK = min(B, int(os.environ.get("BENCH_ILQR_CHUNK", "1024")))
    n_chunks = B // CHUNK
    assert CHUNK * n_chunks == B, (B, CHUNK)
    phys = PhysicsState.default(model, np.zeros(6), batch=(B,),
                                base_height=0.62)
    cmd = jnp.zeros((B, 3))
    ms = ctrl.init(B)

    def _split(tree):
        return jax.tree.map(
            lambda a: a.reshape((n_chunks, CHUNK) + a.shape[1:]), tree)

    @jax.jit
    def plan_all(phys, cmd, ms):
        def one(args):
            p, c, m = args
            return ctrl.plan(p, c, m)
        t, m2, c2 = jax.lax.map(one, (_split(phys), _split(cmd), _split(ms)))
        unsplit = lambda a: a.reshape((B,) + a.shape[2:])
        return (jax.tree.map(unsplit, t), jax.tree.map(unsplit, m2),
                jax.tree.map(unsplit, c2))

    torque, ms, cost = plan_all(phys, cmd, ms)  # compile
    jax.block_until_ready(cost)
    iters = max(TIMED_ITERS // 4, 3)
    t0 = time.perf_counter()
    for _ in range(iters):
        torque, ms, cost = plan_all(phys, cmd, ms)
    jax.block_until_ready(cost)
    dt = (time.perf_counter() - t0) / iters
    solves_per_sec = B / dt
    print(json.dumps({
        "metric": f"ilqr_scenario_solves_per_sec@{B}",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / (B * 50.0), 4),
    }))


def main_train():
    """Full PPO train_iteration throughput at NUM_ENVS (pointfoot_rough)."""
    import jax

    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_RNG", "threefry2x32"))
    import jax.numpy as jnp

    from pointfoot_tpu.utils.registry import task_registry

    os.environ.setdefault("POINTFOOT_PROCTERRAIN", "1")  # see main()
    env = task_registry.make_env("pointfoot_rough", num_envs=NUM_ENVS)
    runner = task_registry.make_alg_runner(env, "pointfoot_rough")
    ts, es = runner.init(jax.random.PRNGKey(0))  # es IS a fresh env state
    st, out = jax.jit(env.step)(
        es, jnp.zeros((NUM_ENVS, env.num_actions)))
    it = jax.jit(runner.train_iteration)
    key = jax.random.PRNGKey(2)
    ts, es2, obs, priv, metrics = it(ts, st, out.obs, out.privileged_obs, key)
    jax.block_until_ready(metrics["kl"])  # compile + warm
    # second warmup with the OUTPUTS as inputs: XLA picks different layouts
    # for the returned arrays than the fresh inputs had, so the second call
    # recompiles (~35 s) — it must not land inside the timed loop
    ts, es2, obs, priv, metrics = it(ts, es2, obs, priv, key)
    jax.block_until_ready(metrics["kl"])
    iters = max(TIMED_ITERS // 2, 5)
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        ts, es2, obs, priv, metrics = it(ts, es2, obs, priv, k)
    jax.block_until_ready(metrics["kl"])
    dt = (time.perf_counter() - t0) / iters
    steps_per_iter = NUM_ENVS * runner.cfg.runner.num_steps_per_env
    sps = steps_per_iter / dt
    print(json.dumps({
        "metric": f"train_env_steps_per_sec@{NUM_ENVS}envs_pointfoot_rough",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / (NUM_ENVS * 50.0), 3),
    }))


def _bench_env(task, procedural, timed_iters=None, reps=None, ablate=()):
    """Median-of-reps env-throughput measurement for ONE terrain path."""
    import jax
    import jax.numpy as jnp

    from pointfoot_tpu.utils.registry import task_registry

    os.environ["POINTFOOT_PROCTERRAIN"] = "1" if procedural else "0"
    env = task_registry.make_env(task, num_envs=NUM_ENVS)
    if ablate:
        env._ablate = frozenset(ablate)  # phase profiling only
    state = env.init_state(jax.random.PRNGKey(0))

    def do_steps(state, key):
        # deterministic time-varying actions: the metric is ENV steps/s, and
        # jax.random.normal (threefry) would add ~25% unrelated cost; the
        # env's internal randomness (noise, resets, pushes) still runs
        phase = jax.random.uniform(key, (NUM_ENVS, env.num_actions)) * 6.28

        def body(carry, t):
            s, _ = carry
            a = 0.2 * jnp.sin(phase + 0.1 * t)
            s, out = env.step(s, a)
            return (s, out.reward), ()

        (state, rew), _ = jax.lax.scan(
            body, (state, jnp.zeros(NUM_ENVS)),
            jnp.arange(STEPS_PER_ITER, dtype=jnp.float32))
        return state, rew

    # NOTE: no buffer donation by default — through the axon PJRT tunnel
    # donation serializes dispatch and costs ~27% (measured 197 ms vs
    # 155 ms per 10-step scan at 4096 envs); on-chip memory is not a
    # constraint here.  BENCH_DONATE=1 re-enables for A/B.
    if os.environ.get("BENCH_DONATE"):
        run = jax.jit(do_steps, donate_argnums=0)
    else:
        run = jax.jit(do_steps)
    key = jax.random.PRNGKey(1)

    # warmup/compile, then SETTLE: BENCH_r03 rep 1 read 43% of the median
    # because a just-quiesced trainer / freshly-warmed tunnel still had
    # residual work when timing started.  Keep running single warm iters
    # until two consecutive ones agree within 15% (cap 8) — only then is
    # the chip considered drained and the timed reps begin.
    state, rew = run(state, key)
    jax.block_until_ready(rew)
    prev, stable, settles = None, 0, 0
    for settles in range(1, 9):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        state, rew = run(state, k)
        jax.block_until_ready(rew)
        dt = time.perf_counter() - t0
        if prev is not None and abs(dt - prev) / prev < 0.15:
            stable += 1
            if stable >= 2:
                break
        else:
            stable = 0
        prev = dt

    # median of REPS independent timing reps: a single rep is vulnerable to
    # transient tunnel contention; the per-rep values go into the JSON so a
    # contended run is visible rather than silently averaged in.
    timed_iters = TIMED_ITERS if timed_iters is None else timed_iters
    n_reps = REPS if reps is None else reps
    per_iter_steps = NUM_ENVS * STEPS_PER_ITER
    rep_vals = []
    for _ in range(max(n_reps, 1)):
        t0 = time.perf_counter()
        for i in range(timed_iters):
            key, k = jax.random.split(key)
            state, rew = run(state, k)
        jax.block_until_ready(rew)
        elapsed = time.perf_counter() - t0
        rep_vals.append(per_iter_steps * timed_iters / elapsed)
    return sorted(rep_vals)[len(rep_vals) // 2], rep_vals, settles


def main_env_phases(task="pointfoot_rough"):
    """Phase-cost profile of the full env step by ablation (VERDICT r4
    item 6): measure the step with each post-physics phase's work replaced
    by zeros (LeggedEnv._ablate) and attribute cost by difference.  The
    'physics' row ablates everything post-physics at once — its gap to
    'full' is the total post-physics bill.  One JSON line; per-variant
    steps/s in the 'phases' field."""
    ALL = ("reward", "obs", "heights", "reset", "commands", "push")
    variants = {
        "full": (),
        "physics_only": ALL,
        "no_reward": ("reward",),
        "no_obs_heights": ("obs", "heights"),
        "no_reset": ("reset",),
        "no_cmd_push": ("commands", "push"),
    }
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    out = {}
    for name, ab in variants.items():
        val, rep_vals, settles = _bench_env(
            task, procedural=True, timed_iters=iters, reps=1, ablate=ab)
        out[name] = round(val)
    full = out["full"]
    # per-phase cost in us per step, attributed by rate difference
    us = {n: round(NUM_ENVS * (1.0 / full - 1.0 / v) * 1e6, 1)
          for n, v in out.items() if n != "full"}
    print(json.dumps({
        "metric": "env_phase_profile", "value": full, "unit": "steps/s",
        "vs_baseline": round(full / (NUM_ENVS * 50.0), 3),
        "phases": out, "phase_gain_us_per_step": us,
        "num_envs": NUM_ENVS, "conditions": CONDITIONS,
    }))


def main(task="pointfoot_rough"):
    import jax

    # RNG impl for the env's per-step draws (noise, resets, pushes,
    # commands).  Measured on the v5e chip (10-step scan, 4096 envs):
    # threefry2x32 200k steps/s vs rbg 167-171k — threefry wins end-to-end
    # here (XLA fuses it into the surrounding elementwise work; rbg's
    # hardware path serializes against the scan), so it stays the default.
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_RNG", "threefry2x32"))

    # Headline = the gather-free closed-form terrain (terrain/procedural.py),
    # the TPU-native configuration the round-4 rough run trains on: the
    # 121-pt height-scan gather was ~3.6 ms of the 5.5 ms step (XLA gather
    # floor).  The heightfield-TABLE path is measured in the same run and
    # recorded alongside (VERDICT r3 item 5: the official JSON carries both).
    # BENCH_BOTH_TERRAIN=0 skips the table A/B (e.g. quick iteration).
    steps_per_sec, reps, settles = _bench_env(task, procedural=True)
    CONDITIONS["terrain"] = "procedural"
    CONDITIONS["settle_iters"] = settles
    CONDITIONS["reps_steps_per_sec"] = [round(r, 1) for r in reps]
    if os.environ.get("BENCH_BOTH_TERRAIN", "1") == "1":
        # the table leg is an A/B condition, not the headline: one rep at
        # half the iteration count keeps the driver's bench budget intact
        # (the leg costs a second compile already)
        table_sps, table_reps, _ = _bench_env(
            task, procedural=False,
            timed_iters=max(TIMED_ITERS // 2, 2), reps=1)
        CONDITIONS["table_steps_per_sec"] = round(table_sps, 1)
    realtime = NUM_ENVS * 50.0  # 50 Hz policy rate (reference control rate)
    print(json.dumps({
        "metric": f"env_steps_per_sec@{NUM_ENVS}envs_{task}",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / realtime, 3),
        "conditions": dict(CONDITIONS),
    }))


def _tunnel_guard():
    """Fail fast if the TPU tunnel is wedged.

    A wedged axon tunnel blocks the FIRST in-process jax device
    enumeration forever (no timeout, no traceback — see
    docs/ROUND2_NOTES.md "Operational hazards"), which would hang the
    driver's end-of-round bench.  Probe with a tiny bounded SUBPROCESS
    client first (scripts/tpu_probe.sh, the same probe the training
    queue uses) and exit with an explicit error line instead of
    hanging.  BENCH_SKIP_PROBE=1 bypasses (e.g. CPU-only A/B runs).
    """
    if os.environ.get("BENCH_SKIP_PROBE"):
        return
    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "tpu_probe.sh")
    if not os.path.exists(probe):
        return
    import subprocess
    timeout_s = os.environ.get("PROBE_TIMEOUT_S", "300")
    rc = subprocess.call(["bash", probe],
                         env={**os.environ, "PROBE_TIMEOUT_S": timeout_s})
    if rc != 0:
        print(json.dumps({
            "metric": f"bench_error_{MODE}",
            "value": 0,
            "unit": "tunnel_wedged",
            "vs_baseline": 0,
            "error": f"TPU tunnel did not answer a {timeout_s} s probe; "
                     "bench aborted instead of hanging",
        }))
        sys.exit(3)


def _force_cpu_if_requested():
    """The axon PJRT plugin's sitecustomize programmatically overrides
    jax_platforms to 'axon,cpu', beating the JAX_PLATFORMS env var — a
    'CPU' bench A/B would silently run through the TPU tunnel (and
    contend with the background trainer).  Re-assert the env var."""
    want = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in want and "axon" not in want:
        import jax

        jax.config.update("jax_platforms", "cpu")


if __name__ == "__main__":
    _force_cpu_if_requested()
    _tunnel_guard()
    # Quiesce this repo's own background trainer (scripts/train_queue.sh):
    # take the bench lock; a live trainer drains its queued device work,
    # acks, and sleeps until we exit (pointfoot_tpu/utils/benchlock.py).
    from pointfoot_tpu.utils import benchlock

    CONDITIONS["trainer"] = benchlock.quiesce(
        timeout_s=float(os.environ.get("BENCH_QUIESCE_TIMEOUT_S", "300")))
    if MODE == "mpc":
        main_mpc()
    elif MODE == "mpc_ilqr":
        main_mpc_ilqr()
    elif MODE == "actuator_net":
        main(task="anymal_c_rough")
    elif MODE == "train":
        main_train()
    elif MODE == "env_phases":
        main_env_phases()
    else:
        main()
