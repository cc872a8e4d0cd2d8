"""Vectorized functional environments + task configs.

Registered tasks mirror reference envs/__init__.py:46-52 (anymal_c_rough/
flat, anymal_b, a1, cassie, pointfoot_rough, pointfoot_flat).
"""

from pointfoot_tpu.envs.config import LeggedEnvCfg, TrainCfg, override
from pointfoot_tpu.envs.legged_env import EnvState, LeggedEnv, StepOutput

__all__ = ["LeggedEnvCfg", "TrainCfg", "override", "EnvState", "LeggedEnv",
           "StepOutput"]
