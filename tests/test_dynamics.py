"""Physics-core correctness tests (physics/dynamics.py, physics/contact.py).

The reference has no physics tests (it trusts the PhysX binary, SURVEY.md §4);
here the solver is ours, so we verify it against first principles: free-fall,
CRBA/RNEA cross-consistency, energy conservation of the passive system, and a
drop test that must settle on the ground with ~weight-supporting contact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointfoot_tpu.physics import dynamics
from pointfoot_tpu.physics.assets import get_model
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState

DEFAULT_QPOS = np.zeros(6)  # reference default joint angles all 0.0
NO_GROUND = lambda x, y: jnp.full_like(jnp.asarray(x, jnp.float32), -1e3)
FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))


@pytest.fixture(scope="module")
def pf():
    return get_model("pointfoot")


@pytest.fixture(scope="module")
def params(pf):
    return PhysicsParams.nominal(pf)


def _state(pf, **kw):
    return PhysicsState.default(pf, DEFAULT_QPOS, **kw)


def test_free_fall_acceleration(pf, params):
    """No ground, no torque: base CoM must accelerate at exactly -g."""
    state = _state(pf)
    udot, _ = dynamics.forward_dynamics(
        pf, params, state, jnp.zeros(6), NO_GROUND
    )
    # whole-system CoM acceleration: project via momentum — for a system at
    # rest with no external force but gravity, \dot{h} = m g, so the CoM
    # acceleration is -g.  Check the linear momentum rate instead of udot
    # directly (base origin acc != CoM acc because of inertial coupling).
    kin = dynamics.forward_kinematics(pf, state, params)
    S = dynamics.motion_subspaces(pf, kin, state.base_pos)
    M = dynamics.mass_matrix(pf, params, kin, S, state.base_pos)
    hdot = M @ udot  # spatial momentum rate about base origin (v=0 here)
    total_m = float(jnp.sum(pf.mass))
    np.testing.assert_allclose(float(hdot[5]), -9.81 * total_m, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hdot[3:5]), 0.0, atol=1e-3)


def test_mass_matrix_matches_rnea(pf, params):
    """CRBA columns == RNEA with unit accelerations (v=0, g=0)."""
    rng = np.random.default_rng(0)
    state = _state(pf).replace(
        qpos=jnp.asarray(rng.uniform(-0.5, 0.5, 6).astype(np.float32)),
        base_quat=jnp.asarray(
            (lambda q: q / np.linalg.norm(q))(rng.normal(size=4)).astype(np.float32)
        ),
    )
    kin = dynamics.forward_kinematics(pf, state, params)
    S = dynamics.motion_subspaces(pf, kin, state.base_pos)
    body_vel = dynamics.body_spatial_velocities(pf, state, S)
    M = dynamics.mass_matrix(pf, params, kin, S, state.base_pos)
    nv = pf.nv
    M_rnea = np.zeros((nv, nv), np.float32)
    for j in range(nv):
        e = jnp.zeros(nv).at[j].set(1.0)
        col = dynamics.inverse_dynamics(
            pf, params, kin, S, state.qvel, body_vel * 0.0, state.base_pos,
            e, gravity=0.0,
        )
        M_rnea[:, j] = np.asarray(col)
    np.testing.assert_allclose(np.asarray(M), M_rnea, atol=1e-4)
    # symmetry + positive definiteness
    np.testing.assert_allclose(np.asarray(M), np.asarray(M).T, atol=1e-4)
    assert np.all(np.linalg.eigvalsh(np.asarray(M)) > 0)


def _total_energy(pf, params, state):
    kin = dynamics.forward_kinematics(pf, state, params)
    S = dynamics.motion_subspaces(pf, kin, state.base_pos)
    M = dynamics.mass_matrix(pf, params, kin, S, state.base_pos)
    u = jnp.concatenate([state.base_ang_vel, state.base_lin_vel, state.qvel])
    ke = 0.5 * u @ M @ u
    pe = jnp.sum(pf.mass * 9.81 * kin.com_w[:, 2])
    return float(ke + pe)


def test_energy_conservation_passive(pf):
    """Passive swing in vacuum: energy drift < 1% over 0.5 s at dt=1 ms."""
    params = PhysicsParams.nominal(pf)
    # zero out URDF damping/friction via model override
    model = pf.replace(
        joint_damping=jnp.zeros(6), joint_friction=jnp.zeros(6)
    )
    state = _state(model).replace(
        qpos=jnp.asarray([0.3, 0.5, -0.4, -0.3, -0.5, 0.4], jnp.float32),
        base_ang_vel=jnp.asarray([0.4, -0.2, 0.3], jnp.float32),
    )
    step = jax.jit(
        lambda s: dynamics.step(model, params, s, jnp.zeros(6), NO_GROUND, 1e-3)
    )
    e0 = _total_energy(model, params, state)
    for _ in range(500):
        state = step(state)
    e1 = _total_energy(model, params, state)
    assert abs(e1 - e0) / abs(e0) < 0.01, (e0, e1)


def test_drop_settles_on_ground(pf, params):
    """Drop from 0.7 m onto flat ground: must come to rest with contact
    supporting the full weight (a point-foot biped holding a fixed pose
    tips over — that is correct physics — so we only require settling)."""
    state = _state(pf, base_height=0.7)
    dt = 0.005

    def body(state, _):
        # PD to default pose keeps legs from collapsing
        tau = 40.0 * (0.0 - state.qpos) - 1.5 * state.qvel
        s = dynamics.step(pf, params, state, tau, FLAT, dt)
        return s, ()

    state, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=1500))(state)
    # settled: small base velocity, no explosion, no tunnelling
    assert float(jnp.linalg.norm(state.base_lin_vel)) < 0.1
    assert 0.0 < float(state.base_pos[2]) < 0.8
    assert np.all(np.isfinite(np.asarray(state.qpos)))
    # vertical contact force ≈ total weight
    fz = float(jnp.sum(state.contact_force[:, 2]))
    total_w = 9.81 * float(jnp.sum(pf.mass))
    np.testing.assert_allclose(fz, total_w, rtol=0.15)


def test_quadruped_drop_stays_upright():
    """A1 (statically stable) dropped near stand height stays upright and
    its feet carry the weight."""
    a1 = get_model("a1")
    # reference a1_config.py default joint angles (hip 0.1, thigh 0.8, calf -1.5)
    qdef = jnp.asarray(
        [-0.1, 0.8, -1.5, 0.1, 0.8, -1.5, -0.1, 1.0, -1.5, 0.1, 1.0, -1.5],
        jnp.float32,
    )
    params = PhysicsParams.nominal(a1, kp=60.0, kd=2.0)
    state = PhysicsState.default(a1, qdef, base_height=0.34)

    def body(s, _):
        tau = 60.0 * (qdef - s.qpos) - 2.0 * s.qvel
        return dynamics.step(a1, params, s, tau, FLAT, 0.005), ()

    state, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=600))(state)
    assert float(jnp.linalg.norm(state.base_lin_vel)) < 0.15
    assert 0.2 < float(state.base_pos[2]) < 0.45
    # upright: projected gravity stays mostly -z (quat near identity)
    assert abs(float(state.base_quat[3])) > 0.95
    fz = float(jnp.sum(state.contact_force[:, 2]))
    np.testing.assert_allclose(fz, 9.81 * float(jnp.sum(a1.mass)), rtol=0.15)
    feet = a1.collision_indices("foot")
    fz_feet = float(jnp.sum(state.contact_force[jnp.array(feet), 2]))
    assert fz_feet > 0.9 * fz


def test_friction_cone(pf, params):
    """Contact friction: tangential force opposes sliding and saturates at
    mu * f_n (regularized Coulomb cone)."""
    from pointfoot_tpu.physics import contact as cm

    state = _state(pf, base_height=0.56).replace(
        base_lin_vel=jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    )
    mu = 0.7
    p = params.replace(friction=jnp.full_like(params.friction, mu))
    kin = dynamics.forward_kinematics(pf, state, p)
    S = dynamics.motion_subspaces(pf, kin, state.base_pos)
    bv = dynamics.body_spatial_velocities(pf, state, S)
    forces, _ = cm.contact_forces(pf, p, kin, bv, S, state.base_pos, FLAT)
    forces = np.asarray(forces)
    touching = forces[:, 2] > 1.0
    assert touching.any()
    for f in forces[touching]:
        assert f[0] < 0  # opposes +x sliding
        np.testing.assert_allclose(abs(f[0]), mu * f[2], rtol=1e-3)


def test_zero_friction_slides(pf, params):
    """mu=0: no tangential force at all."""
    from pointfoot_tpu.physics import contact as cm

    state = _state(pf, base_height=0.56).replace(
        base_lin_vel=jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    )
    p = params.replace(friction=jnp.zeros_like(params.friction))
    kin = dynamics.forward_kinematics(pf, state, p)
    S = dynamics.motion_subspaces(pf, kin, state.base_pos)
    bv = dynamics.body_spatial_velocities(pf, state, S)
    forces, _ = cm.contact_forces(pf, p, kin, bv, S, state.base_pos, FLAT)
    np.testing.assert_allclose(np.asarray(forces)[:, :2], 0.0, atol=1e-5)


def test_vmap_batch(pf, params):
    """Dynamics must vmap cleanly over a batch of envs."""
    B = 16
    batch_params = PhysicsParams.nominal(pf, batch=(B,))
    states = PhysicsState.default(pf, DEFAULT_QPOS, batch=(B,), base_height=0.65)
    tau = jnp.zeros((B, 6))
    stepped = jax.jit(
        jax.vmap(lambda p, s, t: dynamics.step(pf, p, s, t, FLAT, 0.005))
    )(batch_params, states, tau)
    assert stepped.base_pos.shape == (B, 3)
    assert np.all(np.isfinite(np.asarray(stepped.base_pos)))
