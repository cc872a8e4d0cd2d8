"""Pallas plan tick == XLA plan tick (interpret mode on CPU)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np


@pytest.mark.slow
def test_plan_tick_pallas_matches_xla(monkeypatch):
    from pointfoot_tpu.mpc.srb import SRBConfig, SRBController
    from pointfoot_tpu.ops.pallas import riccati as priccati
    from pointfoot_tpu.physics.assets import get_model
    from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState

    # force interpret mode inside the controller path
    orig = priccati.pallas_srb_lqr

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(priccati, "pallas_srb_lqr", interp)

    model = get_model("a1")
    params = PhysicsParams.nominal(model)
    qdef = jnp.asarray([-0.1, 0.8, -1.5, 0.1, 0.8, -1.5,
                        -0.1, 1.0, -1.5, 0.1, 1.0, -1.5], jnp.float32)
    feet = model.collision_indices("foot")
    cfg = SRBConfig(height_target=0.28, horizon=5)
    ctrl = SRBController(model, params, feet, qdef, cfg)
    B = 3
    phys = PhysicsState.default(model, qdef, batch=(B,), base_height=0.28)
    phys = phys.replace(
        base_lin_vel=phys.base_lin_vel.at[:, 1].set(0.2),
        contact_force=phys.contact_force.at[:, jnp.asarray(feet), 2].set(30.0))
    cmd = jnp.zeros((B, 3))

    tau_x, plans = ctrl.plan_tick(phys, cmd)
    tau_p, fs = ctrl.plan_tick_pallas(phys, cmd)
    np.testing.assert_allclose(np.asarray(tau_p), np.asarray(tau_x),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(fs[:, 0]), np.asarray(plans.forces[:, 0]),
        rtol=2e-3, atol=5e-2)
