r"""Gait / stepping layer over the SRB force planner: point-foot biped MPC.

A point foot gives the biped a line-segment support region, so standing SRB
balance is structurally impossible — bipeds balance by STEPPING (which is
what the RL policy learns).  This module adds the classic
Raibert-heuristic stepping stack (MIT Mini-Cheetah controller lineage,
public method) on top of mpc/srb.py:

* gait clock: phase in [0, 1), two legs offset by half a period; a leg is
  in stance while its local phase < duty — but may only LIFT OFF once the
  other leg is measurably loaded (support continuity);
* footstep targets, recomputed EVERY tick from the live velocity:
  p = p_com + yaw_frame(+/- y_off) + v T_st/2 + k_v (v - v_cmd) + k_i \int(v - v_cmd)
  (capture-point Raibert placement, CoM-anchored), capped to a reachable
  radius; the integral trim removes the constant-drift equilibrium a pure
  proportional gain leaves;
* swing trajectory: xy blend and sin-profile apex both complete at s=0.8
  of the swing window, then push slightly below the ground line so
  touchdown happens before the clock flips the leg back to stance; swing
  legs tracked with task-space PD (+ gravity compensation) through J^T;
* reach-down mode: a clock-stance foot that is NOT loaded (late
  touchdown) is actively driven to its target on the ground;
* stance legs: SRB ground-reaction forces (contact-gated schedule)
  realized via tau = C_j - J^T f.

Terrain-aware mode: pass `height_fn(x, y) -> z` (the physics/contact.py
callable contract, e.g. TerrainGrid.height_at or any analytic fn) and the
step-target z, loaded z-proxy, reach-down depth, swing clearance
(path-max over sampled terrain between liftoff and target) and the SRB
base-height reference all ride the terrain query.  Validated envelope
(scripts/gait_diag.py --terrain, 8-env batteries): at vx <= 0.6 — slopes
to 20% grade, rolling wave/bumps fields to 4-5 cm amplitude, discrete
steps +/-5 cm (6 cm fails); at vx 0.8 — 5% slopes and 2 cm fields;
turning (wz 0.5) on a 4 cm wave matches the flat 86% yaw tracking with
zero falls.  height_fn=None keeps the flat-ground path bit-exact.

Validated closed-loop (tests/test_gait.py): >=6-10 s walking at cmd vx in
{0.0, 0.4, 0.8} m/s with zero falls on flat ground at the reference's
50 Hz / 200 Hz two-rate scheme (speed-adaptive cadence); turning at
wz +/-0.5 with ~85-87% yaw-rate tracking for vx <= 0.4 via the
turn-adaptive double-support window (a point contact transmits no
vertical-axis moment, so yaw authority lives in two-feet force couples
— see GaitConfig.duty_turn_gain); commanded headings reached to ~3-6 deg
via the `heading_command` outer loop; perturbed starts (sigma 0.15 m/s on
base velocities) survive 16/16 at vx <= 0.4 on the pinned seeds
(~5% falls across a 4-seed battery; vx 0.8 perturbed is the envelope
edge, see the reach-down note).  For comparison, the trained flat RL
policy at (vx 0.4, wz 0.5) overshoots the yaw rate 24% and falls 2/8
(scripts/eval_policy.py --wz).  Everything is batched (vmap over
scenarios) and jit-safe; `GaitState` is a small pytree carried across
control ticks.

Quadruped mode: the same stack trots the A1 (hip-anchored placement via
GaitConfig.anchor="hip", diagonal-pair `offsets`=(0, .5, .5, 0),
horizon_schedule=True so roll about the stance diagonal is planned
against the NEXT diagonal).  The trot must run control AT the 200 Hz
substep rate with stiff attitude weights (w_orient 100 / w_omega 5): at
50 Hz the swing-leg reaction moment develops a ~0.3 rad pitch offset
between plan refreshes no matter which SRB inertia model is used, while
at 200 Hz whole-robot inertia walks with max tilt ~0.08.  Validated
envelope vx <= 0.6 on flat ground (0.8 falls ~3-4 s in);
tests/test_gait.py::test_quadruped_trots_closed_loop pins it, and
scripts/gait_diag.py --robot a1 carries the tuned defaults.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pointfoot_tpu.mpc.srb import (
    SRBConfig, _foot_ancestors, _project_cone, srb_problem)
from pointfoot_tpu.mpc import riccati
from pointfoot_tpu.ops import quat as quat_ops
from pointfoot_tpu.physics import dynamics
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState, RobotModel


@dataclass(frozen=True)
class GaitConfig:
    period: float = 0.34  # [s] full gait cycle (faster stepping bounds the
    # per-stance tipping a line-support biped accumulates)
    duty: float = 0.55  # stance fraction per leg
    swing_height: float = 0.05  # [m] apex
    # velocity-error foot placement gain; the capture-point value
    # sqrt(z0/g) ~ 0.25 for z0=0.62 — the liftoff-frozen 0.04 of round 1
    # could not arrest lateral falls.  Keep this AT the capture value:
    # overcapture (gain above sqrt(z0/g)) REVERSES the velocity instead of
    # zeroing it, and under a large perturbation the reversal escalates
    # step-over-step until the target exceeds step_reach
    k_raibert: float = 0.25
    # extra placement gain for SMALL velocity errors, saturating at
    # k_extra * err_sat of added offset: the small rotating tangential
    # error during a turn then lands feet further along the arc,
    # lengthening the yaw force-couple levers (measured: 63% -> ~80% yaw
    # tracking at wz 0.5), while a large push still gets the pure capture
    # gain — a 16-env perturbed-start battery falls 3x more often when the
    # extra gain applies to large errors (overcapture reversal)
    k_extra: float = 0.095
    err_sat: float = 0.2  # [m/s] error scale where the extra gain fades
    step_reach: float = 0.30  # [m] max step offset from the anchor
    kp_cart: float = 300.0  # swing task-space stiffness
    kd_cart: float = 12.0
    # lateral half-stance-width: steps anchor at CoM +/- y_off in the yaw
    # frame (capture-point placement), not at the hip — when the base
    # rolls, the hip rolls WITH it and hip-anchored steps chase the fall.
    # 0.06 < the 0.105 hip half-width: narrower stance = smaller lateral
    # limit-cycle amplitude (vy band +/-0.15 vs +/-0.39 at 0.09)
    y_off: float = 0.06
    contact_gate: bool = True  # SRB force only for feet actually loaded
    k_int: float = 0.12  # integral placement trim gain
    v_int_max: float = 0.6  # [m] anti-windup clamp on the error integral
    cmd_slew: float = 0.75  # [m/s^2] command slew-rate limit (soft start)
    # speed-adaptive cadence: period_eff = period / (1 + gain*|v_cmd|)
    # (0.34 s at stand, ~0.28 s at 0.8 m/s — higher speeds need faster
    # stepping to keep step length within reach)
    period_speed_gain: float = 0.35
    # error-adaptive cadence: under a large velocity ERROR (push/perturbed
    # start) quicken the clock by gain*min(|v - v_cmd|, cap) so recovery
    # steps land sooner.  Measured across 4 seeds x 16 perturbed starts
    # (scripts/gait_diag.py --perturb 0.15 --seed {1,2,3,7}): the gain
    # only SHUFFLES which marginal env falls (4 vs 3 falls/64 at vx 0.4;
    # 17 vs 16.5/64 at 0.8) — the apparent win on any single seed is
    # selection noise, so the default stays 0.  If enabled, the fades are
    # load-bearing: quickening during an arcing walk shrinks the
    # double-support window yaw authority lives in (87% -> 62% tracking,
    # then falls at wz 0.5), and stacking it on the speed-quickened period
    # at 0.8 m/s makes steps too rapid to place (5/16 vs 1/16 falls)
    period_err_gain: float = 0.0
    period_err_cap: float = 1.0
    period_err_wz_fade: float = 0.3
    period_err_fade_v: float = 0.4
    # turn-adaptive double support: a point contact transmits no moment
    # about its own vertical axis, so body yaw can only be driven during
    # DOUBLE support (tangential force couples between the two feet) or by
    # momentum exchange.  At duty 0.55 double support is ~10% of the cycle
    # (~1 control tick) — raising duty while turning widens the couple
    # window: duty_eff = duty + gain * min(|wz_cmd|, 1).  Lifts yaw-rate
    # tracking 66% -> ~80% at wz 0.5 for vx <= 0.4 (scripts/gait_diag.py).
    # The boost fades out above duty_turn_fade_v and is off by 2x that
    # speed: long double support at speed stretches the stance beyond
    # reach, and fast turning (vx 0.8 + wz 0.5) is unstable with or
    # without it (documented envelope: turns at vx <= 0.4)
    duty_turn_gain: float = 0.16
    duty_max: float = 0.70
    duty_turn_fade_v: float = 0.4
    # anticipated-yaw placement: step targets (lateral bias + command
    # direction) laid out in the heading frame at yaw + wz_cmd *
    # anticipate * period.  Measured (scripts/gait_diag.py): no gain at
    # vx=0 and 10% WORSE yaw progress at vx=0.4 (the rotated command
    # direction fights the velocity tracking mid-arc), so default off
    yaw_anticipate: float = 0.0
    # footstep anchor frame: "com" (CoM +/- y_off in the yaw frame —
    # capture-point placement, the right choice for a point-foot biped
    # whose hips roll WITH a lateral fall) or "hip" (classic Raibert hip
    # projection — the standard for quadrupeds, whose 2+ foot support
    # makes hip-roll feedback benign and whose front/rear legs must NOT
    # all converge on the CoM)
    anchor: str = "com"
    # stance-leg gravity/bias compensation scale.  The SRB plan's ground
    # force f already supports the TOTAL robot mass, so adding the full
    # joint-space bias C on stance legs double-counts the stance-leg
    # weight; this knob exists to A/B that surplus.  Measured: comp=1.0
    # WINS on every robot in the family — even the 50%-leg-mass ANYmal
    # tracks better with it (vx_ss 0.330 vs 0.167 at cmd 0.4; the LQR
    # height feedback absorbs the surplus).  The straight-leg lockup
    # once blamed on it was actually the anymal_c joint-limit asset bug
    # (see physics/urdf.py).  Keep 1.0 unless re-measuring
    stance_bias_comp: float = 1.0
    # joint-space posture spring on stance legs toward default_qpos:
    # regularizes heavy-legged robots away from the knee singularity the
    # task-space controllers cannot escape — and, on the 3-DOF-per-leg
    # point-foot biped, unwinds the stance-leg wind-up that sustained
    # yawing otherwise accumulates (no hip-yaw DOF: base yaw over a
    # planted point foot must be absorbed by abd/hip/knee; measured at
    # wz 0.5: joints drift to ~0.9-1.1 rad, the legs fold, and base z
    # erodes 0.62 -> 0.38 over 5 s).  60 restores flat height (min z
    # 0.614) AND lifts yaw-rate tracking 75% -> 91% (round-5 A/B; pinned
    # by test_biped_turns_closed_loop).  Quadruped stacks override this
    # per-robot in make_controller (their trot tuning predates the
    # default change and is preserved explicitly).
    kp_posture: float = 60.0
    # STARTUP RAMP on the posture spring: kp_eff ramps 0 -> kp_posture
    # over the first posture_ramp_s seconds after init, so the spring
    # cannot fight an initialization transient (perturbed-start recovery
    # lives in the first ~1.5 s).  0 = full-on from t=0 (cassie, whose
    # crouch-prevention spring predates the ramp).
    posture_ramp_s: float = 1.5
    # (Rejected alternates, measured round 5: with a 3-DOF point-foot
    # leg J^T is square — no stance null space — so any posture torque
    # perturbs the realized ground force (~30 N GRF error at kp 60 x
    # 0.3 rad), which is why the ramp gates by TIME rather than by
    # state: a joint-angle deadband lost the yaw win (0.91 -> 0.66) and
    # the step climb; a velocity-error fade lost those AND the
    # perturbed battery; a double-support-only gate — redundant forces
    # could in principle absorb the torque — chattered at contact rate
    # and failed every scenario (turns min z 0.28, step 0/4).)
    # contact schedule over the SRB horizon (Di Carlo 2018 convex-MPC
    # formulation): gate the force columns per horizon step from the gait
    # clock's FUTURE stance masks, with swing feet planned at their step
    # targets.  Required for a quadruped trot — roll about the current
    # diagonal support pair is uncontrollable under a frozen-contact
    # horizon, so the planner must see the next diagonal to regulate it.
    # Default off: the biped was tuned on the frozen-contact problem
    # (marginal-stability caveat — do not perturb it silently)
    horizon_schedule: bool = False


class GaitState(NamedTuple):
    phase: jax.Array  # (B,) gait clock in [0, 1)
    liftoff_pos: jax.Array  # (B, nf, 3) foot position at last liftoff
    target_pos: jax.Array  # (B, nf, 3) current step target
    v_int: jax.Array  # (B, 3) integrated velocity error (placement trim)
    cmd_f: jax.Array  # (B, 3) slew-limited command actually tracked
    ground_z: jax.Array  # (B,) latched ground height from loaded feet
    t: jax.Array  # (B,) seconds since init (posture-spring startup ramp)


def _leg_phase(phase, leg_offset):
    return jnp.mod(phase + leg_offset, 1.0)


def heading_command(base_quat, cmd_vxy, heading_des,
                    gain: float = 0.5, wz_max: float = 1.0):
    """Heading-mode outer loop over the stepping controller.

    The reference's heading controller (point_foot.py:487-490):
    wz = clip(gain * wrap_to_pi(heading - yaw), +/-wz_max), recomputed
    every tick.  Force-couple yaw on a point foot tracks only ~80% of a
    RATE command (see GaitConfig.duty_turn_gain), but under this
    error-proportional loop the commanded rate shrinks as the heading
    converges, so the ENDPOINT is reached exactly — rate-tracking
    shortfall costs settling time, not accuracy
    (tests/test_gait.py::test_biped_reaches_commanded_heading).

    Batched: base_quat (B, 4), cmd_vxy (B, 2), heading_des (B,) ->
    (B, 3) [vx, vy, wz] command for SteppingController.control.
    """
    yaw = quat_ops.yaw(base_quat)
    wz = quat_ops.heading_wz(heading_des, yaw, gain, wz_max)
    return jnp.concatenate([cmd_vxy, wz[..., None]], axis=-1)


class TunedStack(NamedTuple):
    """A ready-to-roll gait-MPC stack from `make_controller`."""
    ctrl: "SteppingController"
    q0: jax.Array  # default joint pose
    z0: float  # spawn / SRB reference height
    ctrl_dt: float  # control tick period [s]
    substeps: int  # physics substeps (at 200 Hz) per control tick


def make_controller(robot: str, height_fn=None, gait_overrides=None,
                    srb_overrides=None, gait: str = "trot") -> TunedStack:
    """Tuned gait-MPC stack for a named robot.

    Encapsulates the validated per-robot configuration (gains, gait
    pattern, control rate) so callers — scripts, tests, users — get the
    walking controller in one call instead of re-deriving the tuning:

    * ``pointfoot``: biped alternating gait at the reference two-rate
      scheme (50 Hz control / 4 x 200 Hz substeps), CoM-anchored
      capture-point placement.  Envelope: vx <= 0.8 flat, terrain and
      turning per the module docstring.
    * ``a1``: quadruped trot (diagonal pairs, hip anchoring, horizon
      contact schedule) at 200 Hz control — see the module docstring
      for why the trot needs the full substep rate.  Envelope: flat
      vx <= 0.6; 15% slopes / 4 cm waves / +/-5 cm steps / wz 0.5
      turns at vx 0.4.
    * ``anymal_c``: same trot recipe at ANYmal scale (52 kg, legs ~50%
      of total mass).  The heavy legs need a slower cadence (0.5 s —
      per-step impact losses were the dominant velocity drag), a
      stiffer SRB velocity weight, and the integral placement trim;
      envelope vx <= 0.6 (~80% tracking), 0.8 pitch-dives.  The same
      recipe runs ``anymal_b`` (30.6 kg) with even smaller tilt
      (<= 0.02) and a wider envelope (vx <= 0.8 at ~80% tracking).
    * ``cassie``: toe-contact biped, 30 kg with ~10 kg legs and SIX
      joints per leg.  Two cassie-specific needs: 200 Hz control (at
      50 Hz the leg reaction moments crash it instantly, like the
      quads) and the joint-space posture spring kp_posture=100 — a
      3-d toe force controls only half of a 6-DOF leg, and without the
      spring the uncontrolled null space collapses into a 20 cm crouch.
      With both it is the best walker of the family: 98-101% velocity
      tracking at vx 0.4-2.0, zero falls; turning ~69% of wz 0.5 (the
      same point-contact force-couple ceiling as the pointfoot).

    `gait_overrides` / `srb_overrides` are dicts merged over the tuned
    defaults (e.g. {"period": 0.3}).

    `gait` selects the footfall pattern for quadrupeds: "trot"
    (diagonal pairs, the tuned default) or "walk" (4-beat lateral
    sequence FR-RL-FL-RR at duty 0.8 — statically stable, slower, tilt
    ~0.09 vs the trot's 0.08, tracks ~60% at vx 0.4/0.6).  "pace" and
    "bound" were probed and fall within ~0.3 s — they need
    gait-specific roll/pitch momentum work the Raibert stack does not
    have; rejected rather than shipped broken.  Bipeds accept only the
    default alternating gait.
    """
    from pointfoot_tpu.physics.assets import get_model
    import numpy as np

    model = get_model(robot)
    feet = (model.collision_indices("foot")
            or model.collision_indices("FOOT")
            or model.collision_indices("toe"))
    if robot == "pointfoot":
        q0 = np.zeros(model.nj, np.float32)
        z0, ctrl_dt, substeps, offsets = 0.62, 0.02, 4, None
        gkw, skw = {}, dict(w_force_tangent=3e-3)
    elif robot == "a1":
        q0 = np.zeros(model.nj, np.float32)
        for i, nm in enumerate(model.joint_names):
            q0[i] = {"thigh": 0.9, "calf": -1.8}.get(nm.split("_")[1], 0.0)
        z0, ctrl_dt, substeps = 0.2662, 0.005, 1
        offsets = (0.0, 0.5, 0.5, 0.0)  # FR FL RR RL trot
        gkw = dict(anchor="hip", horizon_schedule=True, k_raibert=0.166,
                   swing_height=0.06, kp_cart=600.0, kd_cart=20.0,
                   k_int=0.0, kp_posture=0.0)  # trot tuned without it
        skw = dict(height_target=z0, w_force_tangent=3e-3, f_max=200.0,
                   w_orient=100.0, w_omega=5.0)
    elif robot in ("anymal_c", "anymal_b"):
        q0 = np.zeros(model.nj, np.float32)
        for i, nm in enumerate(model.joint_names):
            sgn = 1.0 if nm[1] == "F" else -1.0  # LF/RF vs LH/RH mirror
            q0[i] = {"HFE": 0.4 * sgn, "KFE": -0.8 * sgn}.get(nm[3:], 0.0)
        # standing height of this pose (feet incl. radius on the ground),
        # capture gain sqrt(z0/g), force cap ~ mass-proportional
        z0 = 0.5488 if robot == "anymal_c" else 0.4968
        ctrl_dt, substeps = 0.005, 1
        offsets = (0.0, 0.5, 0.5, 0.0)  # LF RF LH RH trot
        gkw = dict(anchor="hip", horizon_schedule=True,
                   k_raibert=round((z0 / 9.81) ** 0.5, 3),
                   period=0.5, swing_height=0.08, kp_cart=600.0,
                   kd_cart=20.0, k_int=0.1,
                   kp_posture=0.0)  # trot tuned without it
        skw = dict(height_target=z0, w_force_tangent=3e-3,
                   f_max=500.0 if robot == "anymal_c" else 300.0,
                   w_orient=100.0, w_omega=5.0, w_vel=50.0)
    elif robot == "cassie":
        q0 = np.zeros(model.nj, np.float32)
        ang = dict(hip_abduction_left=0.1, hip_abduction_right=-0.1,
                   hip_flexion=1.0, thigh_joint=-1.8,
                   ankle_joint=1.57, toe_joint=-1.57)
        for i, nm in enumerate(model.joint_names):
            q0[i] = ang.get(nm, ang.get(nm.rsplit("_", 1)[0], 0.0))
        z0, ctrl_dt, substeps, offsets = 0.8516, 0.005, 1, None
        gkw = dict(k_raibert=0.295, period=0.4, swing_height=0.06,
                   kp_cart=600.0, kd_cart=20.0, k_int=0.1,
                   # spring always full-on: the cassie null-space crouch
                   # it prevents was tuned pre-ramp (6-DOF legs DO have
                   # a stance null space)
                   kp_posture=100.0, posture_ramp_s=0.0, y_off=0.13)
        skw = dict(height_target=z0, w_force_tangent=3e-3, f_max=400.0,
                   w_orient=100.0, w_omega=5.0)
    else:
        raise ValueError(f"no tuned gait stack for {robot!r} "
                         "(have: pointfoot, a1, anymal_b, anymal_c, "
                         "cassie)")
    if gait != "trot":
        if offsets is None:
            raise ValueError(f"gait={gait!r} needs a quadruped; "
                             f"{robot} uses the default alternating gait")
        if gait == "walk":
            # 4-beat lateral sequence in the robot's (front-R, front-L,
            # rear-R, rear-L)-equivalent foot order; long double support
            offsets = (0.0, 0.5, 0.75, 0.25)
            gkw.update(duty=0.8, period=0.6)
        else:
            raise ValueError(f"unknown quadruped gait {gait!r} "
                             "(have: trot, walk)")
    gkw.update(gait_overrides or {})
    skw.update(srb_overrides or {})
    ctrl = SteppingController(model, PhysicsParams.nominal(model), feet,
                              q0, srb_cfg=SRBConfig(**skw),
                              gait_cfg=GaitConfig(**gkw), dt=ctrl_dt,
                              height_fn=height_fn, offsets=offsets)
    return TunedStack(ctrl, jnp.asarray(q0), z0, ctrl_dt, substeps)


class SteppingController:
    """Biped walking: SRB stance forces + Raibert swing stepping."""

    # Walking-tuned SRB weights: cheaper TANGENTIAL force (3e-3 vs the
    # standing-balance default 5e-3) is the main yaw-authority lever — the
    # double-support force couple that turns the body is made of tangential
    # forces, and at 5e-3 the planner rations them to ~68% yaw-rate
    # tracking at (vx 0.4, wz +0.5) where 3e-3 reaches ~80% both
    # directions with no loss in the perturbed-start battery
    # (tests/test_gait.py::test_biped_turns_closed_loop pins this)
    WALK_SRB = SRBConfig(w_force_tangent=3e-3)

    def __init__(self, model: RobotModel, params_single: PhysicsParams,
                 feet_idx, default_qpos, srb_cfg: SRBConfig = WALK_SRB,
                 gait_cfg: GaitConfig = GaitConfig(), dt: float = 0.02,
                 height_fn=None, offsets=None):
        self.model = model
        self.params = params_single
        self.feet_idx = tuple(feet_idx)
        self.nf = len(self.feet_idx)
        self.default_qpos = jnp.asarray(default_qpos)
        self.srb = srb_cfg
        self.gait = gait_cfg
        self.dt = dt
        # terrain-aware mode: height_fn(x, y) -> z (same callable contract
        # as physics/contact.py) switches step-target z, the loaded
        # z-proxy, reach-down depth, and the SRB height reference from the
        # flat-ground constants to terrain queries.  None keeps the
        # flat-ground behavior bit-exact (marginal-stability caveat: the
        # tuned flat gait must not be perturbed by the terrain plumbing).
        self.height_fn = height_fn
        # leg phase offsets: alternating for a biped (0, 0.5); pass
        # explicit offsets for other gaits, e.g. a quadruped trot pairs
        # diagonal legs ((0, 0.5, 0.5, 0) in FR/FL/RR/RL order)
        self.offsets = (jnp.asarray(offsets, jnp.float32)
                        if offsets is not None else jnp.asarray(
                            [i / self.nf for i in range(self.nf)],
                            jnp.float32))
        # hip anchor in base frame per foot: joint anchor of the leg's first
        # joint (abad) projected later
        self._hip_joint = tuple(
            _foot_ancestors(model, c)[0] for c in self.feet_idx)
        # neutral stance offset per leg (hip anchor -> default-pose foot,
        # base frame xy): in "hip" anchor mode steps anchor at
        # hip + R_yaw @ neutral, NOT at the hip joint itself — the ab/ad
        # link puts the natural foot ~8 cm outboard of the A1's hip joint,
        # and anchoring feet at the joint drives them under the trunk
        neutral = PhysicsState.default(model, self.default_qpos, batch=(),
                                       base_height=1.0)
        fp0, hips0, _ = self._foot_positions(neutral)
        self._neutral_off = (fp0 - hips0) * jnp.asarray([1.0, 1.0, 0.0])

    def init(self, batch: int, phys: PhysicsState) -> GaitState:
        fp = jax.vmap(lambda p: self._foot_positions(p)[0])(phys)
        return GaitState(
            phase=jnp.zeros(batch),
            liftoff_pos=fp,
            target_pos=fp,
            v_int=jnp.zeros((batch, 3)),
            cmd_f=jnp.zeros((batch, 3)),
            ground_z=jnp.min(fp[..., 2], axis=-1),
            t=jnp.zeros(batch),
        )

    # ------------------------------------------------------------------

    def _foot_positions(self, phys: PhysicsState):
        kin = dynamics.forward_kinematics(self.model, phys, self.params)
        pts, hips = [], []
        for k, cidx in enumerate(self.feet_idx):
            b = self.model.collision_body[cidx]
            pts.append(kin.body_pos[b]
                       + kin.body_rot[b] @ self.model.collision_offset[cidx])
            j = self._hip_joint[k]
            hips.append(kin.joint_anchor[j])
        return jnp.stack(pts), jnp.stack(hips), kin

    def _swing_torque(self, phys, kin, cidx, p_des, v_des):
        """Task-space PD on the swing foot through the leg Jacobian."""
        b = self.model.collision_body[cidx]
        p = kin.body_pos[b] + kin.body_rot[b] @ self.model.collision_offset[cidx]
        S = dynamics.motion_subspaces(self.model, kin, phys.base_pos)
        body_vel = dynamics.body_spatial_velocities(self.model, phys, S)
        from pointfoot_tpu.ops import spatial

        rel = p - phys.base_pos
        v_p = spatial.point_velocity(body_vel[b], rel)
        f = (self.gait.kp_cart * (p_des - p)
             + self.gait.kd_cart * (v_des - v_p))
        tau = jnp.zeros(self.model.nj)
        for j in _foot_ancestors(self.model, cidx):
            col = S[6 + j, 3:] + jnp.cross(S[6 + j, :3], rel)
            tau = tau.at[j].add(col @ f)
        return tau

    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=(0, 4))
    def control(self, phys: PhysicsState, command: jax.Array,
                gait: GaitState, debug: bool = False
                ) -> Tuple[jax.Array, GaitState]:
        """One 50 Hz tick: returns (torques (B, nj), new GaitState).

        debug=True additionally returns a dict of per-tick internals
        (planned forces, masks, step targets) for gait tuning probes.
        """
        g = self.gait

        def one(p, cmd, phase, liftoff, target, v_int, cmd_f, gz_prev,
                t_env):
            # slew-limit the tracked command: a step to 0.4 m/s from rest
            # excites the startup transient that tips the biped; ramping at
            # cmd_slew keeps the capture steps within reach
            dmax = g.cmd_slew * self.dt
            cmd = cmd_f + jnp.clip(cmd - cmd_f, -dmax, dmax)
            new_cmd_f = cmd
            # error-adaptive term uses the CURRENT yaw frame for the command
            # direction (cheap; placement recomputes it precisely below)
            yaw0 = quat_ops.yaw(p.base_quat)
            v_cmd_w0 = quat_ops.rotate(
                quat_ops.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), yaw0),
                jnp.asarray([cmd[0], cmd[1], 0.0]))
            v_err = jnp.minimum(
                jnp.linalg.norm((p.base_lin_vel - v_cmd_w0)[:2]),
                g.period_err_cap)
            v_err = v_err * jnp.clip(
                1.0 - jnp.abs(cmd[2]) / g.period_err_wz_fade, 0.0, 1.0)
            v_err = v_err * jnp.clip(
                1.0 - (jnp.linalg.norm(cmd[:2]) - g.period_err_fade_v)
                / jnp.maximum(g.period_err_fade_v, 1e-6), 0.0, 1.0)
            period = g.period / (
                1.0 + g.period_speed_gain * jnp.linalg.norm(cmd[:2])
                + g.period_err_gain * v_err)
            # widen double support while turning (see GaitConfig notes);
            # fades out above duty_turn_fade_v forward speed
            fade = jnp.clip(
                1.0 - (jnp.linalg.norm(cmd[:2]) - g.duty_turn_fade_v)
                / jnp.maximum(g.duty_turn_fade_v, 1e-6), 0.0, 1.0)
            duty = jnp.minimum(
                g.duty + fade * g.duty_turn_gain * jnp.minimum(
                    jnp.abs(cmd[2]), 1.0), g.duty_max)
            foot_pos, hips, kin = self._foot_positions(p)
            leg_ph = _leg_phase(phase, self.offsets)  # (nf,)
            stance = (leg_ph < duty).astype(jnp.float32)
            # support continuity: a leg may only lift off while the OTHER
            # leg is actually loaded — otherwise hold stance (prevents
            # freefall windows when a late-landing swing foot is still in
            # the air as the clock flips its sibling to swing)
            fz_meas = p.contact_force[jnp.asarray(self.feet_idx), 2]
            if self.height_fn is None:
                foot_clear = foot_pos[:, 2]
            else:  # height above the LOCAL terrain, not absolute z
                foot_clear = foot_pos[:, 2] - self.height_fn(
                    foot_pos[:, 0], foot_pos[:, 1])
            loaded = ((fz_meas > 1.0)
                      | (foot_clear < 0.035)).astype(jnp.float32)
            other_loaded = jnp.sum(loaded) - loaded
            stance = jnp.maximum(
                stance, (other_loaded < 0.5).astype(jnp.float32))

            new_phase = jnp.mod(phase + self.dt / period, 1.0)
            new_leg_ph = _leg_phase(new_phase, self.offsets)
            new_stance = (new_leg_ph < duty).astype(jnp.float32)
            just_lifted = (stance > 0.5) & (new_stance < 0.5)

            # Raibert footstep target (world): capture-point placement
            # anchored at the CoM +/- y_off in the yaw frame.  z taken from
            # the current foot height (terrain-relative).
            yaw = quat_ops.yaw(p.base_quat)
            # placement frame anticipates the heading at the step's
            # mid-stance so the footsteps carve the commanded arc
            yaw_step = yaw + g.yaw_anticipate * cmd[2] * period
            q_yaw = quat_ops.from_axis_angle(
                jnp.asarray([0.0, 0.0, 1.0]), yaw_step)
            v = p.base_lin_vel
            v_cmd_w = quat_ops.rotate(
                q_yaw, jnp.asarray([cmd[0], cmd[1], 0.0]))
            T_st = duty * period
            # slow integral trim on the placement: kills the constant
            # forward drift a pure proportional capture gain leaves
            # (steady-state error against the gait's systematic moments)
            new_v_int = jnp.clip(
                v_int + self.dt * (v - v_cmd_w), -g.v_int_max, g.v_int_max)
            # neutral term uses the COMMANDED velocity (classic Raibert):
            # with live v the error picks up an extra T_st/2 of effective
            # capture gain, landing ~35% past the capture point — an
            # overcaptured step REVERSES the velocity (LIP orbital energy
            # goes negative) and the next step must catch the reversal,
            # which escalates until the target leaves the reach cap
            err = v - v_cmd_w
            sat = jnp.minimum(1.0, g.err_sat / jnp.maximum(
                jnp.linalg.norm(err[:2]), 1e-6))
            offset = (v_cmd_w * T_st / 2 + (g.k_raibert + g.k_extra * sat)
                      * err + g.k_int * new_v_int)
            offset = offset.at[2].set(0.0)
            norm = jnp.linalg.norm(offset[:2])
            offset = offset * jnp.minimum(
                1.0, g.step_reach / jnp.maximum(norm, 1e-6))
            com = (jnp.sum(self.model.mass[:, None] * kin.com_w, axis=0)
                   / jnp.sum(self.model.mass))
            if g.anchor == "hip":
                # classic Raibert: each leg anchors at its own hip
                # projection plus the leg's neutral stance offset in the
                # yaw frame (quadrupeds; see GaitConfig.anchor and
                # _neutral_off)
                anchor_xy = hips + jax.vmap(
                    lambda o: quat_ops.rotate(q_yaw, o))(self._neutral_off)
            else:
                # per-leg lateral stance bias, signed by the leg's hip side
                side = jnp.sign(jax.vmap(
                    lambda h: quat_ops.rotate_inverse(
                        q_yaw, h - p.base_pos)[1])(hips))
                bias = jax.vmap(lambda s: quat_ops.rotate(
                    q_yaw, jnp.asarray([0.0, 1.0, 0.0]) * (s * g.y_off))
                )(side)
                anchor_xy = com[None, :] + bias
            # ground estimate from the LOADED feet (an airborne foot's own
            # z would feed back into its target and levitate it).  With NO
            # foot loaded (flight after a touchdown bounce) keep the LAST
            # grounded estimate: re-deriving it from the airborne feet makes
            # the reach-down target fall with the robot, so the legs never
            # extend to the real ground and flight ends in a crash
            # (perturbed-start battery, env-3 trace at t=0.44-0.68)
            gz = jnp.min(jnp.where(loaded > 0.5, foot_pos[:, 2], 1e9))
            ground_z = jnp.where(gz > 1e8, gz_prev, gz)
            new_gz = ground_z
            anchor = anchor_xy.at[:, 2].set(ground_z)
            tgt = anchor + offset[None, :]
            if self.height_fn is not None:
                # EDGE-AWARE placement (round 5): a foot set down ON a
                # height discontinuity (the 5 cm ledge lip) lands
                # half-supported and the stance collapses — measured to
                # fail ~half of phase-decorrelated approaches regardless
                # of posture tuning.  Probe the terrain +-delta along the
                # walk direction; if the gap exceeds edge_thresh, shift
                # the target onto whichever side matches the height at
                # the target itself (i.e. AWAY from the lip, not across
                # it).  MIT vision-MPC practice (footstep adjustment off
                # edges), here from the same height_fn the swing already
                # queries — no new sensing.
                delta, edge_thresh = 0.06, 0.03
                dir_xy = v_cmd_w[:2] / jnp.maximum(
                    jnp.linalg.norm(v_cmd_w[:2]), 1e-6)
                xf = tgt[:, 0] + delta * dir_xy[0]
                yf = tgt[:, 1] + delta * dir_xy[1]
                xb = tgt[:, 0] - delta * dir_xy[0]
                yb = tgt[:, 1] - delta * dir_xy[1]
                h_c = self.height_fn(tgt[:, 0], tgt[:, 1])
                h_f = self.height_fn(xf, yf)
                h_b = self.height_fn(xb, yb)
                on_edge = jnp.abs(h_f - h_b) > edge_thresh
                # shift toward the side whose height matches the target's
                shift = jnp.where(
                    jnp.abs(h_c - h_f) <= jnp.abs(h_c - h_b),
                    delta, -delta)
                tgt = tgt.at[:, 0].add(
                    jnp.where(on_edge, shift * dir_xy[0], 0.0))
                tgt = tgt.at[:, 1].add(
                    jnp.where(on_edge, shift * dir_xy[1], 0.0))
                # step-target z from the terrain under the (adjusted)
                # target xy (the latched ground_z is only the height
                # under the CURRENT support, wrong across slopes/steps)
                tgt = tgt.at[:, 2].set(
                    self.height_fn(tgt[:, 0], tgt[:, 1]))

            # liftoff pose latches at the stance->swing edge; the step TARGET
            # is recomputed EVERY tick from the live velocity (classic
            # Raibert): a target frozen at liftoff (when v was still caught)
            # cannot arrest the fall that develops during the swing
            new_liftoff = jnp.where(just_lifted[:, None], foot_pos, liftoff)
            in_swing = stance < 0.5
            new_target = jnp.where(in_swing[:, None], tgt, target)

            # SRB stance forces for CLOCK-stance feet that are actually
            # loaded (measured contact force or near-ground) — allocating
            # weight to a foot still in the air drops the robot during the
            # touchdown window.  All-stance fallback if nothing qualifies.
            eligible = stance * loaded if g.contact_gate else stance
            ct = jnp.where(jnp.sum(eligible) > 0, eligible,
                           jnp.ones_like(stance))
            # terrain-following base height: reference z rides the mean
            # terrain height under the feet (MIT convex-MPC convention)
            href = None
            if self.height_fn is not None:
                href = (jnp.mean(self.height_fn(
                    foot_pos[:, 0], foot_pos[:, 1]))
                    + self.srb.height_target)
            T = self.srb.horizon
            if g.horizon_schedule:
                # future stance gates from the gait clock; step 0 keeps the
                # measured-load gating (touchdown robustness), and any
                # support-free step falls back to all-stance
                tt = jnp.arange(T)
                ph_t = jnp.mod(
                    phase + (tt[:, None] * self.srb.dt) / period
                    + self.offsets[None, :], 1.0)
                ct_seq = (ph_t < duty).astype(jnp.float32).at[0].set(ct)
                ct_seq = jnp.where(
                    jnp.sum(ct_seq, 1, keepdims=True) > 0, ct_seq,
                    jnp.ones_like(ct_seq))
                # swing feet enter the plan at their predicted touchdown
                fp_sched = jnp.where(
                    stance[:, None] > 0.5, foot_pos, new_target)
                from pointfoot_tpu.mpc.srb import srb_problem_sched

                F, c_seq, L_seq, Xd, Ud, XTd, x0, f_ff_seq = \
                    srb_problem_sched(self.model, p, self.params, fp_sched,
                                      ct_seq, cmd, self.srb, kin=kin,
                                      height_ref=href)
                n, m = F.shape[0], L_seq.shape[2]
                U = jnp.diag(Ud)
                Ps, ps = riccati.sequential_lqr_value(
                    jnp.broadcast_to(F, (T, n, n)), c_seq, L_seq,
                    jnp.broadcast_to(jnp.diag(Xd), (T, n, n)),
                    jnp.broadcast_to(U, (T, m, m)), jnp.diag(XTd))
                K, d = riccati.lqr_gains_from_value(
                    F, c_seq[0], L_seq[0], U, Ps[1], ps[1])
                f0 = f_ff_seq[0] + (-K @ x0 - d)
            else:
                prob = srb_problem(self.model, p, self.params, foot_pos, ct,
                                   cmd, self.srb, kin=kin, height_ref=href)
                F, c_tot, L, Xd, Ud, XTd, x0, f_ff = prob
                n, m = F.shape[0], L.shape[1]
                U = jnp.diag(Ud)
                Ps, ps = riccati.sequential_lqr_value(
                    jnp.broadcast_to(F, (T, n, n)),
                    jnp.broadcast_to(c_tot, (T, n)),
                    jnp.broadcast_to(L, (T, n, m)),
                    jnp.broadcast_to(jnp.diag(Xd), (T, n, n)),
                    jnp.broadcast_to(U, (T, m, m)), jnp.diag(XTd))
                K, d = riccati.lqr_gains_from_value(
                    F, c_tot, L, U, Ps[1], ps[1])
                f0 = f_ff + (-K @ x0 - d)
            f0 = _project_cone(f0.reshape(self.nf, 3)[None], self.srb)[0]

            # stance torques: bias comp + J^T f + damping
            S = dynamics.motion_subspaces(self.model, kin, p.base_pos)
            body_vel = dynamics.body_spatial_velocities(self.model, p, S)
            C = dynamics.bias_forces(self.model, self.params, kin, S, p.qvel,
                                     body_vel, p.base_pos)
            nj = self.model.nj
            tau = jnp.zeros(nj)
            stance_mask_j = jnp.zeros(nj)
            swing_mask_j = jnp.zeros(nj)
            for k, cidx in enumerate(self.feet_idx):
                b = self.model.collision_body[cidx]
                pfo = (kin.body_pos[b]
                       + kin.body_rot[b] @ self.model.collision_offset[cidx])
                rel = pfo - p.base_pos
                for j in _foot_ancestors(self.model, cidx):
                    col = S[6 + j, 3:] + jnp.cross(S[6 + j, :3], rel)
                    tau = tau.at[j].add(ct[k] * (-col @ f0[k]))
                    stance_mask_j = stance_mask_j.at[j].add(stance[k])
                    swing_mask_j = swing_mask_j.at[j].add(1.0 - stance[k])
            stance_mask_j = jnp.minimum(stance_mask_j, 1.0)
            swing_mask_j = jnp.minimum(swing_mask_j, 1.0)
            # posture spring with startup ramp (GaitConfig.posture_ramp_s):
            # a steady-state wind-up regularizer that stays out of the
            # way of initialization/recovery transients
            if g.posture_ramp_s > 0.0:
                kp_post = g.kp_posture * jnp.clip(
                    t_env / g.posture_ramp_s, 0.0, 1.0)
            else:
                kp_post = g.kp_posture
            tau = tau + stance_mask_j * (
                g.stance_bias_comp * C[6:]
                + kp_post * (self.default_qpos - p.qpos)
                - self.srb.kd_stance * p.qvel)

            # swing torques: task-space PD along the swing trajectory.
            # The vertical profile completes at s=0.8 of the swing window
            # and then pushes slightly BELOW the ground line so touchdown
            # happens before the clock flips the leg back to stance (a
            # profile peaking mid-swing + tracking lag otherwise lands the
            # foot a quarter-cycle late, opening support gaps).
            T_sw = (1.0 - duty) * period
            for k, cidx in enumerate(self.feet_idx):
                s_ph = jnp.clip((leg_ph[k] - duty) / (1.0 - duty), 0, 1)
                p_lo = new_liftoff[k]
                p_tg = new_target[k]
                # xy completes at the same s=0.8 the z-profile touches down
                # at — lerping to s=1.0 lands the foot 20% short of the
                # capture point every step and vx never decays
                sxy = jnp.minimum(s_ph / 0.8, 1.0)
                p_des = p_lo + (p_tg - p_lo) * sxy
                z_base = p_lo[2] + (p_tg[2] - p_lo[2]) * sxy
                sz = sxy
                z_prof = (g.swing_height * jnp.sin(jnp.pi * sz)
                          - 0.02 * jnp.clip((s_ph - 0.8) / 0.2, 0.0, 1.0))
                if self.height_fn is not None:
                    # obstacle clearance on terrain: the lerped z_base can
                    # sit below the ground along the swing path (step
                    # risers, bump crests between the endpoints) — sample
                    # the terrain along the xy path and lift the apex so
                    # the profile clears the highest point + swing_height
                    ss = jnp.asarray([0.25, 0.5, 0.75])
                    xy = (p_lo[None, :2]
                          + (p_tg[:2] - p_lo[:2])[None, :] * ss[:, None])
                    h_path = jnp.max(self.height_fn(xy[:, 0], xy[:, 1]))
                    z_hi = jnp.maximum(jnp.maximum(p_lo[2], p_tg[2]), h_path)
                    mid = 0.5 * (p_lo[2] + p_tg[2])
                    z_prof = z_prof + (jnp.maximum(z_hi - mid, 0.0)
                                       * jnp.sin(jnp.pi * sz))
                p_des = p_des.at[2].set(z_base + z_prof)
                v_des = (p_tg - p_lo) / (0.8 * T_sw) * (sxy < 1.0)
                # z feedforward = d(z_prof)/dt so the foot is actively
                # driven down at the end of swing, not dropped by the PD
                dz = (g.swing_height * jnp.pi / 0.8 * jnp.cos(jnp.pi * sz)
                      * (sz < 1.0) - 0.02 / 0.2 * (s_ph > 0.8)) / T_sw
                v_des = v_des.at[2].set(dz)
                tau_sw = self._swing_torque(p, kin, cidx, p_des, v_des)
                tau = tau + (1.0 - stance[k]) * tau_sw
                # reach-down mode: clock-stance but unloaded (late touchdown)
                # — drive the foot to the ground at its step target; without
                # this the leg floats torqueless until the next swing window.
                # KNOWN LIMIT (vx-0.8 perturbed trace, seed 1 env 15,
                # t=0.52-0.92): after a flight event the foot can be 15+ cm
                # up and this fixed -0.3 m/s descent takes ~0.5 s to regain
                # support while the robot runs away on one leg.  A
                # height-proportional descent was measured NOT to reduce
                # aggregate falls (48-start battery: 15 vs 12.5 at vx 0.8 —
                # marginal-stability shuffle); the real fix is a
                # disturbance-triggered step replant (immediate clock reset
                # + capture-point target), queued for round 3.
                reach = stance[k] * (1.0 - loaded[k])
                reach_z = (ground_z if self.height_fn is None
                           else p_tg[2]) - 0.02
                p_reach = p_tg.at[2].set(reach_z)
                tau_rc = self._swing_torque(
                    p, kin, cidx, p_reach, jnp.asarray([0.0, 0.0, -0.3]))
                tau = tau + reach * tau_rc
            # gravity/Coriolis compensation for swing-leg joints: without it
            # the task-space PD must also carry the leg's weight and the
            # apex is never reached (each joint belongs to exactly one leg,
            # so the masks are disjoint)
            tau = tau + swing_mask_j * C[6:]
            tau = jnp.clip(tau, -self.model.effort_limit,
                           self.model.effort_limit)
            dbg = (dict(f0=f0, stance=stance, loaded=loaded, ct=ct,
                        target=tgt, x0=x0) if debug else {})
            return (tau, new_phase, new_liftoff, new_target, new_v_int,
                    new_cmd_f, new_gz, dbg)

        tau, phase, liftoff, target, v_int, cmd_f, gz, dbg = jax.vmap(one)(
            phys, command, gait.phase, gait.liftoff_pos, gait.target_pos,
            gait.v_int, gait.cmd_f, gait.ground_z, gait.t)
        new_gait = GaitState(phase=phase, liftoff_pos=liftoff,
                             target_pos=target, v_int=v_int, cmd_f=cmd_f,
                             ground_z=gz, t=gait.t + self.dt)
        if debug:
            return tau, new_gait, dbg
        return tau, new_gait
