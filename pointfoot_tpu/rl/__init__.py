"""On-policy RL: Flax actor-critic, PPO, rollout runner.

Replaces the external `rsl_rl` v1.0.2 dependency (reference README.md:35-37,
task_registry.py:37-38): OnPolicyRunner / PPO / ActorCritic /
ActorCriticRecurrent / RolloutStorage re-designed so the entire
rollout-plus-update iteration is ONE jitted function — the 24-step rollout is
a `lax.scan` over the functional env, the PPO epochs/minibatches are nested
scans, and a single `pjit` shards everything over the device mesh.
"""

from pointfoot_tpu.rl.networks import ActorCritic, ActorCriticRecurrent
from pointfoot_tpu.rl.ppo import PPO, TrainState
from pointfoot_tpu.rl.runner import OnPolicyRunner

__all__ = ["ActorCritic", "ActorCriticRecurrent", "PPO", "TrainState",
           "OnPolicyRunner"]
