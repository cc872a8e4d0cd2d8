"""Task registry: name -> (env cfg, train cfg) with env/runner factories.

Replaces reference utils/task_registry.py:44-158 (`TaskRegistry.register`,
`make_env`, `make_alg_runner`).  Configs are frozen dataclasses, so
registration stores values, not classes; `make_env` applies CLI-style
overrides via the dataclass overlay instead of the attribute whitelist
(helpers.py:127-150).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Dict, Optional, Tuple

from pointfoot_tpu.envs.config import LeggedEnvCfg, TrainCfg
from pointfoot_tpu.envs.legged_env import LeggedEnv


class TaskRegistry:
    def __init__(self):
        self._tasks: Dict[str, Tuple[LeggedEnvCfg, TrainCfg]] = {}

    def register(self, name: str, env_cfg: LeggedEnvCfg, train_cfg: TrainCfg):
        self._tasks[name] = (env_cfg, train_cfg)

    def get_cfgs(self, name: str) -> Tuple[LeggedEnvCfg, TrainCfg]:
        if name not in self._tasks:
            raise KeyError(
                f"Task '{name}' not registered. Available: {self.task_names}")
        return self._tasks[name]

    @property
    def task_names(self):
        return sorted(self._tasks)

    def make_env(self, name: str, num_envs: Optional[int] = None,
                 seed: Optional[int] = None, cfg_patch: Optional[dict] = None,
                 **env_overrides) -> LeggedEnv:
        """Build the env (reference make_env, task_registry.py:65-102).

        `cfg_patch`: nested {group: {field: value}} overlay applied through
        `config.override` — the CLI's `--override rewards.x=1` surface
        (reference update_cfg_from_args, helpers.py:127-150)."""
        env_cfg, _ = self.get_cfgs(name)
        if num_envs is not None:
            env_cfg = replace(env_cfg, env=replace(env_cfg.env,
                                                   num_envs=num_envs))
        if cfg_patch:
            from pointfoot_tpu.envs.config import override

            env_cfg = override(env_cfg, **cfg_patch)
        for key, val in env_overrides.items():
            env_cfg = replace(env_cfg, **{key: val})
        return LeggedEnv(env_cfg)

    def make_alg_runner(self, env, name: str, log_dir: Optional[str] = None,
                        train_cfg: Optional[TrainCfg] = None,
                        max_iterations: Optional[int] = None, mesh=None):
        """Build the on-policy runner (task_registry.py:104-155).

        `mesh`: optional DP device mesh — the runner shards the env batch
        over it in `learn` (parallel/mesh.py)."""
        from pointfoot_tpu.rl.runner import OnPolicyRunner

        if train_cfg is None:
            _, train_cfg = self.get_cfgs(name)
        if max_iterations is not None:
            train_cfg = replace(
                train_cfg, runner=replace(train_cfg.runner,
                                          max_iterations=max_iterations))
        return OnPolicyRunner(env, train_cfg, log_dir=log_dir, mesh=mesh)


task_registry = TaskRegistry()


def _register_builtin():
    from pointfoot_tpu.envs import pointfoot_config as pf

    task_registry.register("pointfoot_rough", pf.POINTFOOT_ROUGH_CFG,
                           pf.POINTFOOT_ROUGH_PPO)
    task_registry.register("pointfoot_flat", pf.POINTFOOT_FLAT_CFG,
                           pf.POINTFOOT_FLAT_PPO)
    try:
        from pointfoot_tpu.envs import robot_configs as rc

        for n, (e, t) in rc.TASKS.items():
            task_registry.register(n, e, t)
    except ImportError:
        pass


_register_builtin()
