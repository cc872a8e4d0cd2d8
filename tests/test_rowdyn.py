"""Scalar-row substep (physics/rowdyn.py) vs reference dynamics.step.

rowdyn is the body of the Pallas substep mega-kernel; with shape-() rows it
must reproduce physics/dynamics.py exactly (same math, different op order —
float32 roundoff only).  Any behavioral physics change must land in both.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointfoot_tpu.physics import dynamics, rowdyn
from pointfoot_tpu.physics.assets import get_model
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState

FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
DT = 0.005


def state_to_rows(state, params, tau, ext):
    nj = tau.shape[-1]
    return {
        "base_pos": [state.base_pos[i] for i in range(3)],
        "base_quat": [state.base_quat[i] for i in range(4)],
        "base_lin_vel": [state.base_lin_vel[i] for i in range(3)],
        "base_ang_vel": [state.base_ang_vel[i] for i in range(3)],
        "qpos": [state.qpos[j] for j in range(nj)],
        "qvel": [state.qvel[j] for j in range(nj)],
        "tau": [tau[j] for j in range(nj)],
        "ext_force": [ext[i] for i in range(3)],
        "friction": [params.friction[c]
                     for c in range(params.friction.shape[-1])],
        "joint_friction": [params.joint_friction[j] for j in range(nj)],
        "added_mass": params.added_mass,
        "com_offset": [params.com_offset[i] for i in range(3)],
        "k_contact": params.contact_stiffness,
        "d_contact": params.contact_damping,
    }


def rand_state(model, key, z):
    k = jax.random.split(key, 6)
    qdef = jnp.zeros(model.nj)
    st = PhysicsState.default(model, qdef, base_height=z)
    return st.replace(
        base_quat=jax.vmap(lambda q: q / jnp.linalg.norm(q))(
            (jnp.asarray([0.0, 0.0, 0.0, 1.0])
             + 0.1 * jax.random.normal(k[0], (4,)))[None])[0],
        base_lin_vel=0.5 * jax.random.normal(k[1], (3,)),
        base_ang_vel=0.8 * jax.random.normal(k[2], (3,)),
        qpos=0.4 * jax.random.normal(k[3], (model.nj,)),
        qvel=1.5 * jax.random.normal(k[4], (model.nj,)),
    )


def rand_params(model, key):
    k = jax.random.split(key, 4)
    p = PhysicsParams.nominal(model)
    nc = p.friction.shape[-1]
    return p.replace(
        friction=jax.random.uniform(k[0], (nc,), minval=0.3, maxval=1.2),
        added_mass=jax.random.uniform(k[1], (), minval=-0.5, maxval=2.0),
        com_offset=0.03 * jax.random.normal(k[2], (3,)),
        joint_friction=jax.random.uniform(k[3], (model.nj,), minval=0.0,
                                          maxval=0.3),
    )


@pytest.mark.parametrize("z", [0.55, 0.35, 2.0])  # grounded / deep / flight
def test_substep_matches_dynamics_step(z):
    model = get_model("pointfoot")
    mc = rowdyn.ModelConsts(model)
    for seed in (0, 1, 2):
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        state = rand_state(model, k1, z)
        params = rand_params(model, k2)
        tau = 10.0 * jax.random.normal(k3, (model.nj,))
        ext = 20.0 * jax.random.normal(k4, (3,))

        ref = dynamics.step(model, params, state, tau, FLAT, DT,
                            external_force=ext)
        out = rowdyn.substep_rows(mc, state_to_rows(state, params, tau, ext),
                                  DT, 9.81)

        def cmp(name, got_rows, want, atol):
            got = np.asarray(jax.tree.map(float, got_rows), np.float32)
            np.testing.assert_allclose(
                got.ravel(), np.asarray(want).ravel(), atol=atol,
                rtol=2e-4, err_msg=f"{name} (z={z}, seed={seed})")

        cmp("base_lin_vel", out["base_lin_vel"], ref.base_lin_vel, 2e-4)
        cmp("base_ang_vel", out["base_ang_vel"], ref.base_ang_vel, 2e-4)
        cmp("qvel", out["qvel"], ref.qvel, 5e-4)
        cmp("base_pos", out["base_pos"], ref.base_pos, 1e-5)
        cmp("base_quat", out["base_quat"], ref.base_quat, 1e-5)
        cmp("qpos", out["qpos"], ref.qpos, 1e-5)
        cmp("contact_force", out["contact_force"], ref.contact_force, 0.05)


def test_substep_matches_on_terrain_surface():
    """Non-flat surface rows (tilted plane) against a matching height_fn."""
    model = get_model("pointfoot")
    mc = rowdyn.ModelConsts(model)
    gx, gy = 0.15, -0.1  # terrain gradient

    def height_fn(x, y):
        return gx * x + gy * y

    nrm = np.array([-gx, -gy, 1.0]) / np.sqrt(gx * gx + gy * gy + 1.0)

    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    state = rand_state(model, k1, 0.5)
    params = rand_params(model, k2)
    tau = 10.0 * jax.random.normal(k3, (model.nj,))
    ext = jnp.zeros(3)

    ref = dynamics.step(model, params, state, tau, height_fn, DT,
                        external_force=ext)

    # surface rows: height under each collision sphere + plane normal
    kin = dynamics.forward_kinematics(model, state, params)
    surface = []
    for c in range(mc.nc):
        b = mc.collision_body[c]
        p = kin.body_pos[b] + kin.body_rot[b] @ model.collision_offset[c]
        surface.append((height_fn(p[0], p[1]),
                        [float(nrm[0]), float(nrm[1]), float(nrm[2])]))
    out = rowdyn.substep_rows(mc, state_to_rows(state, params, tau, ext),
                              DT, 9.81, surface=surface)
    got = np.asarray([float(v) for v in out["qvel"]])
    np.testing.assert_allclose(got, np.asarray(ref.qvel), atol=5e-4,
                               rtol=2e-4)
    got_v = np.asarray([float(v) for v in out["base_lin_vel"]])
    np.testing.assert_allclose(got_v, np.asarray(ref.base_lin_vel),
                               atol=2e-4, rtol=2e-4)
