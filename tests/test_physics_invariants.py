"""Regeneration-proof physics invariants (VERDICT r2 item 5).

The golden trajectory anchor (tests/golden/) is self-recorded and gets
regenerated on deliberate physics changes — so on its own it ratifies
whatever physics exists (the round-1 contact-adhesion bug lived inside a
passing golden test for a whole round).  These tests assert properties a
behavioral regression CANNOT re-record its way past:

* ballistic flight: CoM follows the gravity parabola and angular momentum
  about the CoM is conserved (no contact, no external torque) — catches
  momentum leaks in the articulated dynamics;
* contact bands: the calibrated numbers from scripts/contact_calibration.py
  (PARITY.md "Contact calibration" table) asserted as hard bands — static
  force balance, mm-scale penetration, dead impact, stick-slip breakaway
  near the friction cone.  An adhesion-style bug (feet glued to ground)
  moves breakaway far above mu*W and fails here regardless of what the
  golden anchor says.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointfoot_tpu.physics import dynamics
from pointfoot_tpu.physics.assets import get_model
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState

FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
DT = 0.005

# A1 stance rig from scripts/contact_calibration.py — a statically-stable
# quadruped stance so the contact is measured, not the robot's toppling
A1_QDEF = np.asarray([-0.1, 0.8, -1.5, 0.1, 0.8, -1.5,
                      -0.1, 1.0, -1.5, 0.1, 1.0, -1.5], np.float32)


def _pd(model, p, qdef, kp=40.0, kd=1.5):
    return jnp.clip(kp * (jnp.asarray(qdef) - p.qpos) - kd * p.qvel,
                    -model.effort_limit, model.effort_limit)


def _scan(model, params, phys, steps, tau_fn, ext=None):
    def body(p, _):
        p = dynamics.step(model, params, p, tau_fn(p), FLAT, DT,
                          external_force=ext)
        return p, (p.base_pos, p.base_lin_vel, p.contact_force)

    return jax.lax.scan(body, phys, None, length=steps)


# ------------------------------------------------------------- ballistic

def _com_and_L(model, params, state):
    """World CoM position, CoM velocity, and angular momentum about CoM."""
    kin = dynamics.forward_kinematics(model, state, params)
    S = dynamics.motion_subspaces(model, kin, state.base_pos)
    V = dynamics.body_spatial_velocities(model, state, S)  # about base pos
    w = V[:, :3]
    # velocity of each body's CoM point: v_ref + w x (com - ref)
    v_com_b = V[:, 3:] + jnp.cross(w, kin.com_w - state.base_pos[None, :])
    m = model.mass[:, None]
    M = jnp.sum(model.mass)
    com = jnp.sum(m * kin.com_w, axis=0) / M
    v_com = jnp.sum(m * v_com_b, axis=0) / M
    r = kin.com_w - com[None, :]
    L = jnp.sum(jnp.einsum("bij,bj->bi", kin.inertia_w, w)
                + model.mass[:, None] * jnp.cross(r, v_com_b), axis=0)
    return com, v_com, L


@pytest.fixture(scope="module")
def pf_model():
    model = get_model("pointfoot")
    return model, PhysicsParams.nominal(model)


def _flight_state(model, key):
    phys = PhysicsState.default(model, np.zeros(model.nj), base_height=3.0)
    k1, k2, k3 = jax.random.split(key, 3)
    return phys.replace(
        base_lin_vel=jax.random.uniform(k1, (3,), minval=-0.5, maxval=0.5),
        base_ang_vel=jax.random.uniform(k2, (3,), minval=-1.0, maxval=1.0),
        qvel=jax.random.uniform(k3, (model.nj,), minval=-2.0, maxval=2.0))


def test_ballistic_com_parabola(pf_model):
    """In flight the CoM obeys d2(com)/dt2 = g exactly — whatever the legs
    do (PD torques active: internal forces cannot move the CoM)."""
    model, params = pf_model
    phys = _flight_state(model, jax.random.PRNGKey(0))
    steps = 40  # 0.2 s: falls ~0.2 m from 3 m — never touches ground

    def body(p, _):
        p = dynamics.step(model, params, p,
                          _pd(model, p, np.zeros(model.nj)), FLAT, DT)
        com, v_com, L = _com_and_L(model, params, p)
        return p, (com, v_com)

    _, (com, v_com) = jax.lax.scan(body, phys, None, length=steps)
    com, v_com = np.asarray(com), np.asarray(v_com)
    # CoM acceleration between steps: (v[t+1]-v[t])/dt == (0, 0, -g)
    acc = np.diff(v_com, axis=0) / DT
    # tolerance = residual semi-implicit transport error (~0.02 m/s^2 at
    # |w|=1); the bug this pins produced 0.44 m/s^2 xy and -10.45 z
    np.testing.assert_allclose(acc[:, :2], 0.0, atol=6e-2)
    np.testing.assert_allclose(acc[:, 2], -9.81, atol=8e-2)
    # horizontal CoM velocity stays constant to integrator accuracy
    np.testing.assert_allclose(v_com[:, :2] - v_com[0, :2], 0.0, atol=1.5e-2)


def test_ballistic_angular_momentum_conserved(pf_model):
    """Zero torque in flight: L about the CoM is constant (gravity acts at
    the CoM; there is no other external force)."""
    model, params = pf_model
    # zero joint damping isolates the rigid-body integrator
    model = model.replace(joint_damping=jnp.zeros_like(model.joint_damping))
    phys = _flight_state(model, jax.random.PRNGKey(1))

    def body(p, _):
        p = dynamics.step(model, params, p, jnp.zeros(model.nj), FLAT, DT)
        com, v_com, L = _com_and_L(model, params, p)
        return p, L

    _, L = jax.lax.scan(body, phys, None, length=40)
    L = np.asarray(L)
    scale = max(np.abs(L[0]).max(), 1e-3)
    drift = np.abs(L - L[0]).max() / scale
    assert drift < 0.05, f"angular momentum drifted {drift:.1%} in flight"


def test_ballistic_internal_torques_dont_change_L(pf_model):
    """Even with PD torques flailing the legs, total L about the CoM only
    changes through integrator error (internal torques cancel pairwise)."""
    model, params = pf_model
    model = model.replace(joint_damping=jnp.zeros_like(model.joint_damping))
    phys = _flight_state(model, jax.random.PRNGKey(2))
    qdef = 0.5 * np.ones(model.nj, np.float32)

    def body(p, _):
        p = dynamics.step(model, params, p, _pd(model, p, qdef), FLAT, DT)
        _, _, L = _com_and_L(model, params, p)
        return p, L

    _, L = jax.lax.scan(body, phys, None, length=40)
    L = np.asarray(L)
    scale = max(np.abs(L[0]).max(), 1e-2)
    drift = np.abs(L - L[0]).max() / scale
    assert drift < 0.10, f"internal torques changed L by {drift:.1%}"


def test_railed_joint_limits_contract(pf_model):
    """Full-effort bang-bang flight rails every joint into its velocity
    AND position limits.  Pins the joint-limit CONTRACT of the gen-1 /
    trained-policy-parity semantics (see the joint-limit semantics note
    in physics/dynamics.py):

    * |q̇| never exceeds the URDF velocity limit (1x post-solve clamp —
      Isaac Gym's maxJointVelocity is the same mechanism);
    * qpos never leaves the soft-band backstop at bound±0.2;
    * the state saturates (|ω| ≤ 64, |v| ≤ 50) instead of exploding —
      the round-3 flight hunt found frictionless-DR envs ratcheting the
      base to 75 rad/s; the saturation bounds that pathology so
      termination can catch it before it poisons a training batch.

    DELIBERATELY NOT asserted: L conservation while the clamps engage.
    The clamps delete railed joint momentum with no reaction — round 4
    built the momentum-consistent alternative (two-pass solve, implicit
    in-solve brakes/stops; git history at physics/dynamics.py) and the
    policy-parity A/B on the committed model_100000 read 2-3 falls with
    clamp semantics vs 30 (velocity brake) / 166 (position stops) / 345
    (both): the trained gait rides both clamps, so they are part of the
    effective dynamics, matching the reference engine's own clamp
    behavior.  Conservation in the clean (unrailed) regime is pinned by
    the ballistic trio above."""
    model, params = pf_model
    model = model.replace(joint_damping=jnp.zeros_like(model.joint_damping))
    phys = _flight_state(model, jax.random.PRNGKey(3))
    # high drop so 2 s of bang-bang flailing stays airborne
    phys = phys.replace(base_pos=phys.base_pos.at[2].set(30.0))
    vl = np.asarray(model.velocity_limit)

    def body(carry, t):
        p = carry
        s = jnp.where((t // 12) % 2 == 0, 1.0, -1.0)
        p = dynamics.step(model, params, p, s * model.effort_limit, FLAT, DT)
        return p, (p.qvel, p.qpos, p.base_ang_vel, p.base_lin_vel)

    _, (qvel, qpos, w, v) = jax.lax.scan(body, phys, jnp.arange(400))
    qvel, qpos, w, v = (np.asarray(o) for o in (qvel, qpos, w, v))
    # the scenario only means anything if the limits actually engage
    assert (np.abs(qvel).max(axis=0) > 0.9 * vl).all(), "limits never hit"
    assert (np.abs(qvel) <= vl + 1e-4).all(), "velocity clamp breached"
    assert (qpos <= np.asarray(model.q_upper) + 0.2 + 1e-4).all()
    assert (qpos >= np.asarray(model.q_lower) - 0.2 - 1e-4).all()
    assert np.isfinite(qpos).all() and np.isfinite(w).all()
    assert (np.abs(w) <= 64.0 + 1e-3).all(), "angular saturation breached"
    assert (np.abs(v) <= 50.0 + 1e-3).all(), "linear saturation breached"


# ------------------------------------------------- calibrated contact bands

@pytest.fixture(scope="module")
def a1():
    model = get_model("a1")
    return model, PhysicsParams.nominal(model)


def test_static_force_balance_band(a1):
    """PARITY.md calibration row 1: settled foot normal forces sum to the
    weight (measured: 4 digits) with mm-scale penetration."""
    model, params = a1
    w = float(jnp.sum(model.mass)) * 9.81
    phys = PhysicsState.default(model, A1_QDEF, base_height=0.30)
    phys, (pos, vel, cf) = _scan(model, params, phys, 400,
                                 lambda p: _pd(model, p, A1_QDEF))
    feet = list(model.collision_indices("foot"))
    fz = np.asarray(cf[-1][..., 2])[feet]
    assert abs(fz.sum() - w) / w < 0.02, f"sum Fz {fz.sum():.1f} vs W {w:.1f}"
    pen_mm = 1e3 * fz / float(params.contact_stiffness)
    assert (pen_mm > 0.3).all() and (pen_mm < 10.0).all(), pen_mm


def test_drop_dead_impact_band(a1):
    """PARITY.md calibration row 3: 5 cm drop rebounds < 10% of the drop
    (measured 2.4 mm ~ restitution 0.05; PhysX anchor: restitution 0)."""
    model, params = a1
    phys = PhysicsState.default(model, A1_QDEF, base_height=0.35)
    phys, (pos, vel, cf) = _scan(model, params, phys, 400,
                                 lambda p: _pd(model, p, A1_QDEF))
    z = np.asarray(pos[:, 2])
    rebound = max(0.0, z[120:].max() - z[-1])
    assert rebound / 0.05 < 0.10, f"restitution {rebound / 0.05:.3f}"
    assert np.isfinite(z).all()


def test_stick_slip_breakaway_band(a1):
    """PARITY.md calibration row 5: ramped lateral push on the settled
    stance breaks away near the friction cone (measured 0.48 mu*W; the
    regularized cone creeps below it).  An adhesion bug (the round-1
    failure mode) pushes breakaway far above mu*W and fails the upper
    bound; a broken cone slides immediately and fails the lower."""
    model, params = a1
    w = float(jnp.sum(model.mass)) * 9.81
    mu = float(np.asarray(params.friction).ravel()[0])
    phys = PhysicsState.default(model, A1_QDEF, base_height=0.30)
    phys, _ = _scan(model, params, phys, 300,
                    lambda p: _pd(model, p, A1_QDEF))  # settle

    def body(p, f):
        p = dynamics.step(model, params, p, _pd(model, p, A1_QDEF), FLAT,
                          DT, external_force=jnp.asarray([f, 0.0, 0.0]))
        return p, p.base_lin_vel[0]

    forces = jnp.linspace(0.0, 2.0 * mu * w, 800)
    _, vx = jax.lax.scan(body, phys, forces)
    vx = np.asarray(vx)
    slid = np.where(vx > 0.2)[0]
    assert len(slid) > 0, "never broke away below 2 mu W — adhesion"
    ratio = float(forces[slid[0]]) / (mu * w)
    assert 0.30 < ratio < 0.80, f"breakaway at {ratio:.2f} mu*W"
    # creep below the cone stays creep (regularized Coulomb, PARITY.md)
    i_half = np.argmin(np.abs(np.asarray(forces) - 0.5 * mu * w))
    assert vx[i_half] < 0.4, f"creep {vx[i_half]:.3f} m/s at 0.5 mu W"


def test_deep_penetration_bounded_kick(pf_model):
    """A state that tunnels deep below terrain in one substep must get a
    BOUNDED restoring kick (penetration cap 0.2 m + 50 m/s velocity
    clamp), not a catapult launch — the catapult rewards poisoned the
    critic at ~88k iters of the rough run (value_loss 3 -> 1e8)."""
    model, params = pf_model
    phys = PhysicsState.default(model, np.zeros(model.nj), base_height=-1.5)
    phys = phys.replace(base_lin_vel=jnp.asarray([0.0, 0.0, -20.0]))
    p = phys
    for _ in range(10):
        p = dynamics.step(model, params, p, jnp.zeros(model.nj), FLAT, DT)
    assert np.isfinite(np.asarray(p.base_pos)).all()
    assert np.abs(np.asarray(p.base_lin_vel)).max() <= 50.0 + 1e-3
    assert np.abs(np.asarray(p.base_ang_vel)).max() <= 64.0 + 1e-3
    # spring force bounded by the cap: k * 0.2
    fmax = float(params.contact_stiffness) * 0.2
    assert np.asarray(p.contact_force).max() < 4 * fmax  # damping slack


def test_depenetration_velocity_capped(pf_model):
    """PhysX-parity depenetration cap (pointfoot_rough_config.py:210,
    max_depenetration_velocity = 1.0): a robot buried 1.5 m underground
    must surface at ~1 m/s and settle, NOT be catapulted tens of meters.
    Regeneration-proof: run the buried state to exit and assert the peak
    upward base velocity and apex height over the whole 3 s rollout.
    Without the cap this measures +9 m/s exit and a multi-meter flight
    (the flat fine-tune's collapse trigger, docs/ROUND3_NOTES.md)."""
    model, params = pf_model
    phys = PhysicsState.default(model, np.zeros(model.nj), base_height=-1.5)

    def body(p, _):
        p = dynamics.step(model, params, p, jnp.zeros(model.nj), FLAT, DT)
        return p, (p.base_pos[2], p.base_lin_vel[2])

    _, (zs, vzs) = jax.lax.scan(body, phys, None, length=600)
    zs, vzs = np.asarray(zs), np.asarray(vzs)
    # exit velocity bounded by the cap plus one-substep overshoot slack
    assert vzs.max() <= 2.0, f"upward exit velocity {vzs.max():.2f} m/s"
    # never launched: apex stays near the surface (sphere radii ~cm scale)
    assert zs.max() <= 0.8, f"apex {zs.max():.2f} m — catapulted"
    # and it actually surfaced (the cap must not trap it underground)
    assert zs[-1] > -0.6, f"still buried at z={zs[-1]:.2f}"
