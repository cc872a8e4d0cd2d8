"""SRB-MPC tests: plan sanity and standing stabilization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointfoot_tpu.mpc.srb import SRBConfig, SRBController, srb_plan
from pointfoot_tpu.physics import dynamics
from pointfoot_tpu.physics.assets import get_model
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState

FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))


@pytest.fixture(scope="module")
def setup():
    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    return model, params


def _foot_positions(model, phys, params, feet_idx):
    kin = dynamics.forward_kinematics(model, phys, params)
    pts = []
    for c in feet_idx:
        b = model.collision_body[c]
        pts.append(kin.body_pos[b] + kin.body_rot[b] @ model.collision_offset[c])
    return jnp.stack(pts)


def test_plan_supports_weight(setup):
    """Standing plan: stance forces sum to ~weight in z."""
    model, params = setup
    phys = PhysicsState.default(model, np.zeros(6), base_height=0.62)
    feet = model.collision_indices("foot")
    fp = _foot_positions(model, phys, params, feet)
    plan = srb_plan(model, phys, params, fp, jnp.ones(2), jnp.zeros(3),
                    SRBConfig())
    fz = float(jnp.sum(plan.forces[0][:, 2]))
    weight = 9.81 * float(jnp.sum(model.mass))
    np.testing.assert_allclose(fz, weight, rtol=0.15)


def test_srb_controller_stabilizes_quadruped():
    """Closed loop: SRB-MPC holds an A1 (4-foot support polygon) upright
    under a lateral velocity perturbation for 1 s.

    NOTE: a point-foot biped's support region is a line segment, so SRB
    standing balance without a stepping layer is structurally impossible
    for pointfoot — the gait/stepping layer is future work (the RL policy
    balances by stepping)."""
    from pointfoot_tpu.mpc.srb import SRBConfig

    model = get_model("a1")
    params = PhysicsParams.nominal(model)
    qdef = jnp.asarray([-0.1, 0.8, -1.5, 0.1, 0.8, -1.5,
                        -0.1, 1.0, -1.5, 0.1, 1.0, -1.5], jnp.float32)
    feet = model.collision_indices("foot")
    cfg = SRBConfig(height_target=0.28, w_vel=1.0, w_height=10.0,
                    w_orient=5.0, w_omega=0.5, w_force_normal=1e-3,
                    w_force_tangent=2e-2, kp_swing=20.0, kd_swing=0.5)
    ctrl = SRBController(model, params, feet, qdef, cfg)
    B = 2
    phys = PhysicsState.default(model, qdef, batch=(B,), base_height=0.29)
    phys = phys.replace(base_lin_vel=phys.base_lin_vel.at[:, 1].set(0.3))
    command = jnp.zeros((B, 3))

    def control_step(p, _):
        fp = jax.vmap(
            lambda s: _foot_positions(model, s, params, feet))(p)
        contact = (p.contact_force[:, jnp.asarray(feet), 2] > 1.0
                   ).astype(jnp.float32)
        contact = jnp.where(jnp.sum(contact, axis=1, keepdims=True) > 0,
                            contact, jnp.ones_like(contact))
        plans = ctrl.plan(p, fp, contact, command)
        f0 = plans.forces[:, 0]

        def sub(pp, _):
            # 200 Hz leg loop: remap the held plan force each substep
            tau = ctrl.leg_torques(pp, f0, contact)
            return jax.vmap(lambda s, t: dynamics.step(
                model, params, s, t, FLAT, 0.005))(pp, tau), ()

        p, _ = jax.lax.scan(sub, p, None, length=4)
        return p, p.base_pos[:, 2]

    phys, zs = jax.lax.scan(control_step, phys, None, length=50)
    zs = np.asarray(zs)
    assert zs.min() > 0.2, zs.min()
    assert abs(float(phys.base_quat[0, 3])) > 0.99
    assert float(jnp.linalg.norm(phys.base_lin_vel[0])) < 0.2
