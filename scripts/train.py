"""Training entry point.

Usage:  python scripts/train.py --task=pointfoot_rough [--num_envs N]
        [--max_iterations K] [--seed S] [--log_dir DIR] [--cpu]

Replaces reference scripts/train.py:32-49 + the CLI surface of
utils/helpers.py:152-178 (default task pointfoot_rough, num_envs /
max_iterations / seed overrides; the dead --horovod flag is dropped —
multi-chip scaling is automatic over the device mesh).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_args():
    p = argparse.ArgumentParser(description="pointfoot_tpu trainer")
    p.add_argument("--task", default="pointfoot_rough")
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--max_iterations", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--log_dir", default=None)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--load_run", default=None,
                   help="checkpoint dir to resume from (default: latest)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (virtual multi-device)")
    p.add_argument("--rng", default="threefry", choices=["threefry", "rbg"],
                   help="PRNG impl (threefry default: measured faster than "
                        "rbg end-to-end on v5e — XLA fuses it into the "
                        "rollout; see bench.py)")
    p.add_argument("--override", action="append", default=[],
                   metavar="GROUP.FIELD=VALUE",
                   help="env-config override, repeatable: e.g. "
                        "--override rewards.only_positive_rewards=true "
                        "(reference update_cfg_from_args, helpers.py:127-150)")
    p.add_argument("--train_override", action="append", default=[],
                   metavar="GROUP.FIELD=VALUE",
                   help="train-config override, repeatable: e.g. "
                        "--train_override algorithm.max_lr=2.5e-4 "
                        "(same GROUP.FIELD=VALUE syntax as --override)")
    p.add_argument("--mesh", default="auto", choices=["auto", "none"],
                   help="DP device mesh: 'auto' shards the env batch over "
                        "all visible devices when more than one is present")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for pod-slice runs "
                        "(coordinator from POINTFOOT_* env vars)")
    return p.parse_args()


def main():
    args = get_args()
    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update(
        "jax_default_prng_impl",
        {"threefry": "threefry2x32"}.get(args.rng, args.rng))
    # Persistent compilation cache: a fresh-HLO compile of the 4096-env
    # train_iteration through the axon tunnel takes many minutes; without
    # a cache every watchdog relaunch (train_watchdog.sh) pays it again
    # and can churn against the staleness killer.  Best-effort — plugin
    # backends without executable serialization just skip caching.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("POINTFOOT_COMPILE_CACHE",
                           os.path.expanduser("~/.cache/pointfoot_jax")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    from pointfoot_tpu.parallel.mesh import make_mesh, multihost_init
    from pointfoot_tpu.utils.helpers import get_load_path
    from pointfoot_tpu.utils.registry import task_registry

    if args.multihost:
        multihost_init()
    mesh = None
    if args.mesh == "auto" and len(jax.devices()) > 1:
        mesh = make_mesh()
        print(f"DP mesh over {mesh.size} devices "
              f"({jax.process_count()} process(es))")

    import ast

    def parse_override(ov, flag):
        path, _, raw = ov.partition("=")
        group, _, field = path.partition(".")
        if not (group and field and raw):
            raise SystemExit(f"bad {flag} {ov!r}: want GROUP.FIELD=VALUE")
        try:
            val = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            val = {"true": True, "false": False}.get(raw.lower(), raw)
        return group, field, val

    cfg_patch = {}
    for ov in args.override:
        group, field, val = parse_override(ov, "--override")
        cfg_patch.setdefault(group, {})[field] = val

    env = task_registry.make_env(args.task, num_envs=args.num_envs,
                                 cfg_patch=cfg_patch or None)
    if mesh is not None and env.num_envs % mesh.size != 0:
        raise SystemExit(
            f"--num_envs {env.num_envs} must divide the mesh size "
            f"{mesh.size}")
    _, train_cfg = task_registry.get_cfgs(args.task)
    tc = None
    if args.train_override:
        from dataclasses import replace as _dc_replace

        _, tc = task_registry.get_cfgs(args.task)
        for ov in args.train_override:
            group, field, val = parse_override(ov, "--train_override")
            sub = getattr(tc, group)
            tc = _dc_replace(tc, **{group: _dc_replace(sub, **{field: val})})
        if args.max_iterations is not None:
            tc = _dc_replace(tc, runner=_dc_replace(
                tc.runner, max_iterations=args.max_iterations))
        # the overridden config IS the config of record from here on
        train_cfg = tc
    # default log_dir from the POST-override config, so
    # `--train_override runner.experiment_name=X` logs under X
    # (advisor r4: it used to silently log under the original name)
    log_dir = args.log_dir
    if log_dir is None:
        import datetime

        stamp = datetime.datetime.now().strftime("%b%d_%H-%M-%S")
        log_dir = os.path.join("logs", train_cfg.runner.experiment_name, stamp)
    runner = task_registry.make_alg_runner(
        env, args.task, log_dir=log_dir, train_cfg=tc,
        max_iterations=None if tc is not None else args.max_iterations,
        mesh=mesh)
    seed = args.seed if args.seed is not None else train_cfg.seed
    iters = (args.max_iterations if args.max_iterations is not None
             else train_cfg.runner.max_iterations)

    train_state = env_state = None
    if args.resume:
        path = args.load_run or get_load_path(
            os.path.join("logs", train_cfg.runner.experiment_name))
        key = jax.random.PRNGKey(seed)
        ts0, es0 = runner.init(key)
        train_state, env_state = runner.load(path, ts0, es0)
        print(f"resumed from {path} @ iteration {runner.current_iteration}")

    # dump the resolved run config: runs must be reproducible from the log
    # dir alone (the reference keeps the config in the checkpoint pickle;
    # here a readable json sits next to metrics.jsonl)
    os.makedirs(log_dir, exist_ok=True)
    import dataclasses
    import json

    # .jsonl: watchdog relaunches append one line per launch, and the last
    # line is the config the final weights trained under
    with open(os.path.join(log_dir, "run_config.jsonl"), "a") as f:
        f.write(json.dumps({
            "argv": sys.argv[1:], "task": args.task,
            "num_envs": env.num_envs, "iters": iters, "seed": int(seed),
            "env_cfg": dataclasses.asdict(env.cfg),
            "train_cfg": dataclasses.asdict(train_cfg),
        }, default=str) + "\n")

    print(f"task={args.task} envs={env.num_envs} iters={iters} "
          f"devices={jax.devices()} log_dir={log_dir}")
    runner.learn(iters, key=jax.random.PRNGKey(seed),
                 train_state=train_state, env_state=env_state,
                 log_every=args.log_every)


if __name__ == "__main__":
    main()
