"""Environment / training configuration system.

Re-expression of the reference class-tree configs (`BaseConfig` recursive
instantiation, base_config.py:33-55; `LeggedRobotCfg` field groups,
legged_robot_config.py:33-200) as frozen dataclasses: hashable, so configs
can be jit-static arguments, and overlayable via `dataclasses.replace` —
the same three-level model (base -> robot -> terrain variant) the reference
builds with subclassing (e.g. pointfoot_flat overriding pointfoot_rough,
flat/pointfoot_flat_config.py:4-37).

Reward scales are a plain dict (name -> scale); like the reference
`_prepare_reward_function` (point_foot.py:796-820) only non-zero entries
select reward terms, but selection is an explicit table lookup, not
reflection.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, Optional, Tuple

from pointfoot_tpu.terrain.grid import TerrainCfg


def _d(**kw):  # tiny helper for dict defaults
    return field(default_factory=lambda: dict(kw))


@dataclass(frozen=True)
class EnvCfg:
    """legged_robot_config.py:34-44 / pointfoot_rough_config.py:4-11."""

    num_envs: int = 4096
    num_observations: int = 27
    num_privileged_obs: Optional[int] = 148
    num_actions: int = 6
    env_spacing: float = 3.0
    send_timeouts: bool = True  # extras["time_outs"] for PPO bootstrap
    episode_length_s: float = 20.0


@dataclass(frozen=True)
class CommandsCfg:
    """legged_robot_config.py:78-90; ranges as (lo, hi) tuples."""

    curriculum: bool = False
    max_curriculum: float = 1.0
    num_commands: int = 4  # vx, vy, wz, heading
    resampling_time: float = 10.0
    heading_command: bool = True  # wz recomputed from heading error
    lin_vel_x: Tuple[float, float] = (-1.0, 1.0)
    lin_vel_y: Tuple[float, float] = (-1.0, 1.0)
    ang_vel_yaw: Tuple[float, float] = (-1.0, 1.0)
    heading: Tuple[float, float] = (-3.14, 3.14)
    # Low-command oversampling DEVIATION (0 = reference-exact uniform):
    # with this probability a resampled vx is drawn from the
    # low-magnitude band [0.2, low_cmd_band] (sign random) instead of
    # the full range.  Round-5 measurement: sharpening the tracking
    # width (rewards.tracking_rel_vref) moved cmd-0.25 error +82% → +24%
    # but convergence OSCILLATES — under the uniform range only ~10% of
    # episodes carry commands in the precision-critical 0.2-0.4 band, so
    # the sharpened gradient is sample-starved.  This knob feeds it.
    low_cmd_oversample: float = 0.0
    low_cmd_band: float = 0.4


@dataclass(frozen=True)
class InitStateCfg:
    """legged_robot_config.py:92-104; default_joint_angles keyed by name."""

    pos: Tuple[float, float, float] = (0.0, 0.0, 0.68)
    rot: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 1.0)
    lin_vel: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    ang_vel: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    default_joint_angles: Tuple[Tuple[str, float], ...] = ()


@dataclass(frozen=True)
class ControlCfg:
    """legged_robot_config.py:106-117 / pointfoot_rough_config.py:69-95."""

    control_type: str = "P"  # 'P' position, 'V' velocity, 'T' torque
    stiffness: Tuple[Tuple[str, float], ...] = ()  # per joint-name substring
    damping: Tuple[Tuple[str, float], ...] = ()
    action_scale: float = 0.5
    decimation: int = 4
    # ANYdrive LSTM actuator net replaces the PD law
    # (reference anymal_c_rough_config.py:70-71, anymal.py:71-81)
    use_actuator_network: bool = False


@dataclass(frozen=True)
class AssetCfg:
    """legged_robot_config.py:119-143 subset that survives the URDF compiler."""

    model_name: str = "pointfoot"  # baked asset registry key
    foot_name: str = "foot"
    penalize_contacts_on: Tuple[str, ...] = ("base", "abad", "hip", "knee")
    terminate_after_contacts_on: Tuple[str, ...] = ("abad", "base")
    self_collisions: bool = False
    fix_base_link: bool = False


@dataclass(frozen=True)
class DomainRandCfg:
    """legged_robot_config.py:145-153 / pointfoot_rough_config.py:119-128."""

    randomize_friction: bool = True
    friction_range: Tuple[float, float] = (0.2, 1.6)
    num_friction_buckets: int = 64
    randomize_base_mass: bool = True
    added_mass_range: Tuple[float, float] = (-1.0, 2.0)
    randomize_base_com: bool = True
    rand_com_vec: Tuple[float, float, float] = (0.03, 0.02, 0.03)
    push_robots: bool = True
    push_interval_s: float = 7.0
    max_push_vel_xy: float = 0.6


@dataclass(frozen=True)
class RewardsCfg:
    """legged_robot_config.py:155-177 / pointfoot_rough_config.py:131-166."""

    scales: Tuple[Tuple[str, float], ...] = ()
    only_positive_rewards: bool = False
    # finite-garbage guard band on the per-step total reward (and per-term
    # sums), NOT reference semantics (the reference has no clip).  Healthy
    # per-step magnitudes are O(1) (scales are dt-premultiplied), so 20 is
    # still ~10-50x any legitimate step.  Rare clip-magnitude steps are the
    # measured ignition of the value-loss storms that destabilize long
    # rough runs (vloss ~ clip**2); the storm-window A/B (100 vs 20,
    # docs/ROUND4_NOTES.md §0) showed 20 damps value_loss max 11,428→846
    # with tracking maintained, and the 115k→200k+ continuation trained
    # under 20 stayed calm throughout.  Default promoted 100→20 in round 5
    # (VERDICT r4 item 3); every artifact committed before tpu_r4_storm
    # trained under 100 (run_config.jsonl is the config-of-record).
    clip_reward: float = 20.0
    tracking_sigma: float = 0.25
    # Command-relative tracking width (round-5 deviation knob, default OFF
    # = reference-exact).  The reference's fixed width exp(-err^2/0.25)
    # (point_foot.py:1131-1140) gives <15% of max gradient at |err|~0.2,
    # so sub-10% error at small commands is structurally weakly selected —
    # measured as +38-80% overshoot at cmd 0.4 and the flat 45k/55k
    # calibration split (PARITY.md).  With tracking_rel_vref = v > 0 the
    # lin-vel tracking width scales as
    #   sigma_eff = sigma * clip(|cmd|^2 / v^2, 0.04, 1)
    # making the reward equally selective in RELATIVE error at every
    # command magnitude (at |cmd|=v it is reference-exact; the 0.04 floor
    # bounds the sharpness at stand-still).  A/B'd like the stairs cap.
    tracking_rel_vref: float = 0.0
    soft_dof_pos_limit: float = 0.97
    soft_dof_vel_limit: float = 0.9
    soft_torque_limit: float = 0.8
    base_height_target: float = 0.62
    max_contact_force: float = 200.0
    clearance_height_target: float = -0.2  # foot clearance vs base (anymal family)
    min_feet_distance: float = 0.1
    min_feet_air_time: float = 0.25
    max_feet_air_time: float = 0.65


@dataclass(frozen=True)
class NormalizationCfg:
    """pointfoot_rough_config.py:168-183."""

    lin_vel_scale: float = 2.0
    ang_vel_scale: float = 0.25
    dof_pos_scale: float = 1.0
    dof_vel_scale: float = 0.05
    height_meas_scale: float = 5.0
    clip_observations: float = 100.0
    clip_actions: float = 100.0


@dataclass(frozen=True)
class NoiseCfg:
    """pointfoot_rough_config.py:185-196; group scales applied per obs block."""

    add_noise: bool = True
    noise_level: float = 1.0
    lin_vel: float = 0.1
    ang_vel: float = 0.2
    gravity: float = 0.05
    dof_pos: float = 0.01
    dof_vel: float = 1.5
    height_measurements: float = 0.1


@dataclass(frozen=True)
class SimCfg:
    """pointfoot_rough_config.py:196-213 distilled to what our solver uses."""

    dt: float = 0.005
    gravity: float = 9.81
    contact_stiffness: float = 1.2e4
    contact_damping: float = 1.2e3


@dataclass(frozen=True)
class HeightScanCfg:
    """critic-only height scan grid (pointfoot_rough_config.py:21-27)."""

    measure_heights: bool = True
    # 11 x 11 grid over ±0.5 m (121 points + 27 proprio = 148 priv obs)
    points_x: Tuple[float, ...] = tuple(-0.5 + 0.1 * i for i in range(11))
    points_y: Tuple[float, ...] = tuple(-0.5 + 0.1 * i for i in range(11))


@dataclass(frozen=True)
class LeggedEnvCfg:
    env: EnvCfg = EnvCfg()
    terrain: TerrainCfg = TerrainCfg()
    commands: CommandsCfg = CommandsCfg()
    init_state: InitStateCfg = InitStateCfg()
    control: ControlCfg = ControlCfg()
    asset: AssetCfg = AssetCfg()
    domain_rand: DomainRandCfg = DomainRandCfg()
    rewards: RewardsCfg = RewardsCfg()
    normalization: NormalizationCfg = NormalizationCfg()
    noise: NoiseCfg = NoiseCfg()
    sim: SimCfg = SimCfg()
    height_scan: HeightScanCfg = HeightScanCfg()
    # which env family implements obs/reward semantics ('pointfoot'|'legged')
    obs_style: str = "pointfoot"

    @property
    def dt(self) -> float:
        """Policy dt = decimation * sim dt (reference point_foot.py:1000)."""
        return self.control.decimation * self.sim.dt

    @property
    def max_episode_length(self) -> int:
        return int(self.env.episode_length_s / self.dt + 0.5)

    def reward_scales_dict(self) -> Dict[str, float]:
        return {k: v for k, v in self.rewards.scales if v != 0.0}


# ---------------- PPO / training config (rsl_rl replacement) ----------------


@dataclass(frozen=True)
class PolicyCfg:
    """legged_robot_config.py:220-228."""

    init_noise_std: float = 1.0
    actor_hidden_dims: Tuple[int, ...] = (512, 256, 128)
    critic_hidden_dims: Tuple[int, ...] = (512, 256, 128)
    activation: str = "elu"
    # recurrent variant (ActorCriticRecurrent)
    rnn_type: str = ""
    rnn_hidden_size: int = 256
    rnn_num_layers: int = 1


@dataclass(frozen=True)
class AlgorithmCfg:
    """legged_robot_config.py:230-243."""

    value_loss_coef: float = 1.0
    use_clipped_value_loss: bool = True
    clip_param: float = 0.2
    entropy_coef: float = 0.01
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    learning_rate: float = 1e-3
    schedule: str = "adaptive"  # adaptive KL targeting
    gamma: float = 0.99
    lam: float = 0.95
    desired_kl: float = 0.01
    max_grad_norm: float = 1.0
    # adaptive-LR corridor. rsl_rl rails at 1e-2; observed failure mode at
    # 4096 envs: after a rare physics-explosion perturbs the policy, the
    # x1.5-per-minibatch growth compounds to the rail within one iteration
    # and the next updates destroy the policy. 1e-3 keeps long runs stable.
    max_lr: float = 1e-3
    min_lr: float = 1e-5
    # exploration-noise rails: log_std is projected into this range after
    # every SGD step.  Observed failure mode (anymal_c_flat, 512 envs,
    # only_positive_rewards): with the clipped total reward identically 0,
    # per-minibatch advantage normalization yields 0/eps = 0 and the ONLY
    # surviving gradient is the entropy bonus, which inflates noise_std
    # without bound (1.0 -> 247 over 1.5k iters) — pure-noise policy, run
    # dead.  rsl_rl v1.x has the same hole (IsaacLab's 2.x added a clamp);
    # the rails are generous enough that healthy runs never touch them
    # (pointfoot converges with std < 1)
    # Exploration-noise rails.  3.0 proved too loose: at ~79.3k iters of
    # the rough run a NaN-quarantine wave fed wild advantages and the
    # entropy term ran the std 0.51 -> 1.08 in ~1k iters, collapsing
    # terrain_level 4.6 -> 0 (metrics.jsonl tpu_r3_run1).  1.5 still
    # clears init_noise_std=1.0 with headroom but stops the runaway.
    max_noise_std: float = 1.5
    min_noise_std: float = 0.01
    # Winsorized KL for the adaptive-LR controller (0 = reference-exact
    # plain mean, the rsl_rl formula).  A few rogue samples with
    # per-sample KL in the hundreds can drag the 98k-sample mean past the
    # LR-drop threshold while typical divergence is tiny — measured to
    # rail the LR to 1e-5 on 31% of iterations (effective lr ~43% of the
    # cap) on the round-5 rough run with every other health metric flat.
    # When > 0, each sample's KL contribution is capped at this value
    # before averaging (rl/ppo.py).
    kl_winsor: float = 0.0


@dataclass(frozen=True)
class RunnerCfg:
    """legged_robot_config.py:245-258."""

    num_steps_per_env: int = 24
    max_iterations: int = 1500
    save_interval: int = 100
    experiment_name: str = "pointfoot_rough"
    run_name: str = ""
    resume: bool = False
    load_run: str = ""  # -1/latest semantics handled by checkpoint util
    checkpoint: str = ""
    policy_class_name: str = "ActorCritic"


@dataclass(frozen=True)
class TrainCfg:
    seed: int = 1
    policy: PolicyCfg = PolicyCfg()
    algorithm: AlgorithmCfg = AlgorithmCfg()
    runner: RunnerCfg = RunnerCfg()


def override(cfg, **groups):
    """Overlay helper: override(cfg, rewards=dict(base_height_target=0.6))."""
    updates = {}
    for name, changes in groups.items():
        sub = getattr(cfg, name)
        updates[name] = replace(sub, **changes) if isinstance(changes, dict) else changes
    return replace(cfg, **updates)
