"""Stepping-controller mechanics tests (EXPERIMENTAL layer).

The gait layer runs and produces an alternating stance schedule and
reachable swing targets; closed-loop biped balance is round-2 tuning work
(see docs/ROUND1_NOTES.md) — these tests pin the mechanics, not balance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pointfoot_tpu.mpc.gait import GaitConfig, SteppingController, _leg_phase
from pointfoot_tpu.mpc.srb import SRBConfig
from pointfoot_tpu.physics.assets import get_model
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState


def test_gait_clock_alternates():
    g = GaitConfig(period=0.4, duty=0.55)
    offsets = jnp.asarray([0.0, 0.5])
    # over one period the two legs must alternate stance with overlap
    both_stance = single = 0
    for k in range(40):
        phase = k / 40.0
        st = (_leg_phase(phase, offsets) < g.duty)
        if bool(st[0]) and bool(st[1]):
            both_stance += 1
        elif bool(st[0]) != bool(st[1]):
            single += 1
    assert both_stance > 0  # double-support windows exist (duty > 0.5)
    assert single > both_stance  # mostly single support


def test_stepping_controller_runs_and_schedules():
    model = get_model("pointfoot")
    params = PhysicsParams.nominal(model)
    feet = model.collision_indices("foot")
    ctrl = SteppingController(model, params, feet, np.zeros(6),
                              srb_cfg=SRBConfig(height_target=0.6))
    B = 2
    phys = PhysicsState.default(model, np.zeros(6), batch=(B,),
                                base_height=0.62)
    gait = ctrl.init(B, phys)
    cmd = jnp.zeros((B, 3))
    phases = []
    for _ in range(12):
        tau, gait = ctrl.control(phys, cmd, gait)
        phases.append(float(gait.phase[0]))
        assert np.isfinite(np.asarray(tau)).all()
        assert np.abs(np.asarray(tau)).max() <= float(model.effort_limit.max())
    # clock advances by dt/period per tick
    np.testing.assert_allclose(np.diff(phases), 0.02 / 0.4, atol=1e-5)
    # liftoff/target bookkeeping stays finite and near the robot
    assert np.isfinite(np.asarray(gait.target_pos)).all()
    assert np.abs(np.asarray(gait.target_pos)[..., :2]).max() < 1.0
