"""Profile the 4096-env physics substep on the real chip (VERDICT r2 #7).

Decides the round-1 "Pallas physics mega-kernel" question with numbers:
times the full policy step and its physics components (assembly / solve /
finish), reads XLA cost analysis for roofline shares, and captures a
jax.profiler trace when the backend supports it.  Takes the bench lock so
the background trainer quiesces (utils/benchlock.py).

Usage: python scripts/profile_substep.py [--trace DIR]
Writes a markdown summary to stdout — paste into docs/PROFILE_SUBSTEP.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B = int(os.environ.get("PROFILE_NUM_ENVS", "4096"))


def timed(fn, *args, iters=20, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def cost_of(jitted, *args):
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0)), float(c.get("bytes accessed", 0))
    except Exception:
        return 0.0, 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="")
    args = ap.parse_args()

    from pointfoot_tpu.utils import benchlock

    cond = benchlock.quiesce(timeout_s=240)
    print(f"<!-- measurement condition: trainer={cond}, B={B} -->")

    import jax
    import jax.numpy as jnp

    from pointfoot_tpu.physics import dynamics
    from pointfoot_tpu.physics.assets import get_model
    from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState
    from pointfoot_tpu.utils.registry import task_registry

    dev = jax.devices()[0]
    print(f"<!-- device: {dev.platform} {getattr(dev, 'device_kind', '?')} -->")

    # ---- full env policy step (pointfoot_rough: 4 substeps + obs/rew) ----
    env = task_registry.make_env("pointfoot_rough", num_envs=B)
    st = env.init_state(jax.random.PRNGKey(0))
    act = jnp.zeros((B, env.num_actions))
    step = jax.jit(env.step)
    t_env = timed(lambda s: step(s, act)[0], st)
    f_env, by_env = cost_of(step, st, act)

    # ---- physics substep in isolation (flat ground; B, nv=12) ----
    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    pp = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)),
                      params)
    phys = PhysicsState.default(model, jnp.zeros(6), batch=(B,),
                                base_height=0.62)
    tau = jnp.zeros((B, model.nj))
    flat = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))

    sub = jax.jit(lambda p, s, t: dynamics.step_batched(
        model, p, s, t, flat, 0.005))
    t_sub = timed(lambda: sub(pp, phys, tau))
    f_sub, by_sub = cost_of(sub, pp, phys, tau)

    # ---- decomposition: assembly / solve / finish ----
    def assemble(p, s, t):
        return jax.vmap(lambda pi, si, ti: dynamics.assemble_velocity_solve(
            model, pi, si, ti, flat, 0.005))(p, s, t)

    jass = jax.jit(assemble)
    A, rhs, terms = jass(pp, phys, tau)
    t_ass = timed(lambda: jass(pp, phys, tau))
    f_ass, by_ass = cost_of(jass, pp, phys, tau)

    from pointfoot_tpu.ops import linalg as linalg_ops

    on_tpu = dev.platform == "tpu"
    if on_tpu:
        from pointfoot_tpu.ops.pallas.cholesky import pallas_chol_solve_lanes

        nv = model.nv
        At = jnp.transpose(A, (1, 2, 0)).reshape(nv * nv, B)
        rt = jnp.transpose(rhs, (1, 0))
        jsol = jax.jit(lambda a, r: pallas_chol_solve_lanes(a, r))
        t_sol = timed(lambda: jsol(At, rt))
        f_sol, by_sol = cost_of(jsol, At, rt)
        sol_name = "solve (Pallas lane-batched Cholesky)"
    else:
        jsol = jax.jit(linalg_ops.chol_solve)
        t_sol = timed(lambda: jsol(A, rhs))
        f_sol, by_sol = cost_of(jsol, A, rhs)
        sol_name = "solve (XLA Cholesky)"

    u = jax.vmap(lambda a, r: jnp.linalg.solve(a, r))(A, rhs)
    jfin = jax.jit(lambda s, uu, tm: jax.vmap(
        lambda si, ui, ti: dynamics.finish_step(model, si, ui, ti, 0.005)
    )(s, uu, tm))
    t_fin = timed(lambda: jfin(phys, u, terms))
    f_fin, by_fin = cost_of(jfin, phys, u, terms)

    # ---- optional profiler trace ----
    trace_note = "not captured"
    if args.trace:
        try:
            jax.profiler.start_trace(args.trace)
            for _ in range(5):
                out = sub(pp, phys, tau)
            jax.block_until_ready(out)
            jax.profiler.stop_trace()
            trace_note = f"captured to {args.trace}"
        except Exception as e:  # tunnel backends may not support profiling
            trace_note = f"FAILED: {type(e).__name__}: {e}"

    # ---- report ----
    hbm_gbps = 819.0 if on_tpu else 50.0  # v5e HBM BW
    rows = [
        ("full env.step (4 substeps + obs/rew/terrain)", t_env, f_env, by_env),
        ("physics substep (assembly+solve+finish)", t_sub, f_sub, by_sub),
        ("assembly (FK/CRBA/RNEA/contact terms)", t_ass, f_ass, by_ass),
        (sol_name, t_sol, f_sol, by_sol),
        ("finish (contact sensor + integrate)", t_fin, f_fin, by_fin),
    ]
    print(f"\n| component | time/call | us/env | GFLOP/s | HBM GB/s "
          f"| HBM roofline |")
    print("|---|---|---|---|---|---|")
    for name, t, f, by in rows:
        print(f"| {name} | {1e6 * t:.0f} us | {1e9 * t / B:.1f} ns "
              f"| {f / t / 1e9:.0f} | {by / t / 1e9:.0f} "
              f"| {100 * by / t / 1e9 / hbm_gbps:.0f}% |")
    overhead = t_sub - (t_ass + t_sol + t_fin)
    print(f"\nsubstep minus parts: {1e6 * overhead:.0f} us "
          f"(fusion/layout work XLA already does when jitted together)")
    print(f"4 substeps = {4e6 * t_sub:.0f} us of the {1e6 * t_env:.0f} us "
          f"env.step ({400 * t_sub / t_env:.0f}%)")
    print(f"profiler trace: {trace_note}")


if __name__ == "__main__":
    main()
