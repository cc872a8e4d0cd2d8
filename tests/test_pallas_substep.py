"""Pallas substep mega-kernel vs dynamics.step_batched (interpret mode).

Exactness of the kernel wrapper (layout packing, padding, grid) on CPU;
the on-chip speed gate lives in bench/PROFILE_SUBSTEP.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointfoot_tpu.ops.pallas.substep import substep_pallas
from pointfoot_tpu.physics import dynamics
from pointfoot_tpu.physics.assets import get_model
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState

FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))
DT = 0.005
B = 16


@pytest.fixture(scope="module")
def rig():
    model = get_model("pointfoot")
    key = jax.random.PRNGKey(3)
    k = jax.random.split(key, 8)
    state = PhysicsState.default(model, jnp.zeros(model.nj), batch=(B,),
                                 base_height=0.5)
    q = (jnp.asarray([0.0, 0.0, 0.0, 1.0])
         + 0.1 * jax.random.normal(k[0], (B, 4)))
    state = state.replace(
        base_pos=state.base_pos.at[:, 2].add(
            jax.random.uniform(k[1], (B,), minval=-0.15, maxval=1.0)),
        base_quat=q / jnp.linalg.norm(q, axis=-1, keepdims=True),
        base_lin_vel=0.5 * jax.random.normal(k[2], (B, 3)),
        base_ang_vel=0.8 * jax.random.normal(k[3], (B, 3)),
        qpos=0.4 * jax.random.normal(k[4], (B, model.nj)),
        qvel=1.5 * jax.random.normal(k[5], (B, model.nj)),
    )
    params = PhysicsParams.nominal(model, batch=(B,))
    nc = params.friction.shape[-1]
    params = params.replace(
        friction=jax.random.uniform(k[6], (B, nc), minval=0.3, maxval=1.2),
        added_mass=jax.random.uniform(k[7], (B,), minval=-0.5, maxval=2.0))
    tau = 10.0 * jax.random.normal(k[0], (B, model.nj))
    ext = 20.0 * jax.random.normal(k[1], (B, 3))
    return model, params, state, tau, ext


def _assert_close(got: PhysicsState, ref: PhysicsState):
    np.testing.assert_allclose(got.base_lin_vel, ref.base_lin_vel,
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(got.base_ang_vel, ref.base_ang_vel,
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(got.qvel, ref.qvel, atol=1e-3, rtol=3e-4)
    np.testing.assert_allclose(got.base_pos, ref.base_pos, atol=2e-5)
    np.testing.assert_allclose(got.base_quat, ref.base_quat, atol=2e-5)
    np.testing.assert_allclose(got.qpos, ref.qpos, atol=2e-5)
    np.testing.assert_allclose(got.contact_force, ref.contact_force,
                               atol=0.1, rtol=1e-3)


def test_kernel_matches_step_batched_flat(rig):
    model, params, state, tau, ext = rig
    ref = dynamics.step_batched(model, params, state, tau, FLAT, DT,
                                external_force=ext)
    got = substep_pallas(model, params, state, tau, DT,
                         external_force=ext, interpret=True)
    _assert_close(got, ref)


def test_kernel_matches_step_batched_surface(rig):
    model, params, state, tau, ext = rig
    gx, gy = 0.12, -0.08

    def height_fn(x, y):
        return gx * x + gy * y

    ref = dynamics.step_batched(model, params, state, tau, height_fn, DT,
                                external_force=ext)

    # surface rows gathered at sphere positions from the SAME pre-step state
    kin = jax.vmap(lambda s, p: dynamics.forward_kinematics(model, s, p)
                   )(state, params)
    nc = len(model.collision_body)
    hs, ns = [], []
    nrm = np.array([-gx, -gy, 1.0]) / np.sqrt(gx * gx + gy * gy + 1.0)
    for c in range(nc):
        b = model.collision_body[c]
        p = (kin.body_pos[:, b]
             + jnp.einsum("bij,j->bi", kin.body_rot[:, b],
                          model.collision_offset[c]))
        hs.append(height_fn(p[:, 0], p[:, 1]))
        ns.append(jnp.broadcast_to(jnp.asarray(nrm, jnp.float32), (B, 3)))
    surface = (jnp.stack(hs, axis=1), jnp.stack(ns, axis=1))
    got = substep_pallas(model, params, state, tau, DT,
                         external_force=ext, surface=surface,
                         interpret=True)
    _assert_close(got, ref)


def test_fk_contact_xy_matches_forward_kinematics(rig):
    from pointfoot_tpu.ops.pallas.substep import fk_contact_xy_pallas

    model, params, state, tau, ext = rig
    got = fk_contact_xy_pallas(model, state, interpret=True)
    kin = jax.vmap(lambda s, p: dynamics.forward_kinematics(model, s, p)
                   )(state, params)
    nc = len(model.collision_body)
    for c in range(nc):
        b = model.collision_body[c]
        p = (kin.body_pos[:, b]
             + jnp.einsum("bij,j->bi", kin.body_rot[:, b],
                          model.collision_offset[c]))
        np.testing.assert_allclose(got[:, c], p[:, :2], atol=2e-5,
                                   err_msg=f"sphere {c}")


def test_fused_rollout_matches_scan_path():
    """rollout_substeps (one kernel per substep, PD + FK-of-output inside,
    row layout threaded) vs the reference scan path on real curriculum
    terrain, including push on substep 0 and foot positions."""
    from pointfoot_tpu.ops.pallas import substep as sp
    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env("pointfoot_rough", num_envs=8)
    state = env.init_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(3):
        state, _ = step(state, 0.2 * jnp.ones((8, 6)))
    state = state.replace(push_force=5.0 * jax.random.normal(
        jax.random.PRNGKey(9), (8, 3)))
    actions = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (8, 6))
    phys_ref, tau_ref, _, _ = env._physics_rollout(state, actions)
    phys_got, tau_got, sphere = sp.rollout_substeps(
        env.model, state.params, state.physics, actions, state.last_qvel,
        state.push_force, env._height_fn(), env.cfg.sim.dt,
        env.cfg.control.decimation, env.default_qpos,
        env.cfg.control.action_scale, env.cfg.control.control_type,
        gravity=env.cfg.sim.gravity, interpret=True)
    np.testing.assert_allclose(phys_got.qvel, phys_ref.qvel, atol=2e-3)
    np.testing.assert_allclose(phys_got.base_lin_vel, phys_ref.base_lin_vel,
                               atol=5e-4)
    np.testing.assert_allclose(phys_got.base_pos, phys_ref.base_pos,
                               atol=5e-5)
    np.testing.assert_allclose(phys_got.contact_force,
                               phys_ref.contact_force, atol=0.05, rtol=1e-3)
    np.testing.assert_allclose(tau_got, tau_ref, atol=5e-3)
    fp = env._foot_positions(phys_ref, state.params)
    np.testing.assert_allclose(
        np.asarray(sphere)[:, list(env.feet_idx)], fp, atol=5e-5)


def test_fused_rollout_matches_scan_path_flat():
    """Flat-terrain fused rollout (surface folded to trace-time constants,
    is_flat path) vs the reference scan path — the configuration the flat
    fine-tune trains under."""
    from pointfoot_tpu.ops.pallas import substep as sp
    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env("pointfoot_flat", num_envs=8)
    state = env.init_state(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    for _ in range(3):
        state, _ = step(state, 0.2 * jnp.ones((8, 6)))
    actions = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (8, 6))
    phys_ref, tau_ref, _, _ = env._physics_rollout(state, actions)
    hf = env._height_fn()
    assert getattr(hf, "is_flat", False), "flat env must mark is_flat"
    phys_got, tau_got, sphere = sp.rollout_substeps(
        env.model, state.params, state.physics, actions, state.last_qvel,
        state.push_force, hf, env.cfg.sim.dt, env.cfg.control.decimation,
        env.default_qpos, env.cfg.control.action_scale,
        env.cfg.control.control_type, gravity=env.cfg.sim.gravity,
        interpret=True)
    np.testing.assert_allclose(phys_got.qvel, phys_ref.qvel, atol=2e-3)
    np.testing.assert_allclose(phys_got.base_lin_vel, phys_ref.base_lin_vel,
                               atol=5e-4)
    np.testing.assert_allclose(phys_got.base_pos, phys_ref.base_pos,
                               atol=5e-5)
    np.testing.assert_allclose(phys_got.contact_force,
                               phys_ref.contact_force, atol=0.05, rtol=1e-3)
    np.testing.assert_allclose(tau_got, tau_ref, atol=5e-3)
