"""Unit tests for quaternion / spatial algebra (ops/quat.py, ops/spatial.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pointfoot_tpu.ops import quat, spatial


def rand_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_mul_identity():
    rng = np.random.default_rng(0)
    q = rand_quat(rng, (5,))
    out = quat.mul(q, np.broadcast_to(np.array(quat.IDENTITY), (5, 4)))
    np.testing.assert_allclose(out, q, atol=1e-6)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = rand_quat(rng, (7,))
    v = rng.normal(size=(7, 3)).astype(np.float32)
    R = quat.to_matrix(q)
    np.testing.assert_allclose(
        quat.rotate(q, v), np.einsum("bij,bj->bi", R, v), atol=1e-5
    )


def test_rotate_inverse_roundtrip():
    rng = np.random.default_rng(2)
    q = rand_quat(rng, (7,))
    v = rng.normal(size=(7, 3)).astype(np.float32)
    np.testing.assert_allclose(
        quat.rotate_inverse(q, quat.rotate(q, v)), v, atol=1e-5
    )


def test_axis_angle_90deg():
    q = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(np.pi / 2))
    v = quat.rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)


def test_euler_yaw_extraction():
    q = quat.from_euler_zyx(jnp.array(0.1), jnp.array(-0.2), jnp.array(0.7))
    np.testing.assert_allclose(float(quat.yaw(q)), 0.7, atol=1e-5)


def test_apply_yaw_matches_reference_semantics():
    # reference quat_apply_yaw (utils/math.py:38-42) zeroes q.x/q.y and
    # renormalizes -> pure z rotation by angle 2*atan2(qz, qw)
    q_tilt = quat.from_euler_zyx(jnp.array(0.4), jnp.array(0.3), jnp.array(1.1))
    ang = 2.0 * np.arctan2(float(q_tilt[2]), float(q_tilt[3]))
    q_flat = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(ang))
    v = jnp.array([1.0, 2.0, 0.5])
    np.testing.assert_allclose(
        quat.apply_yaw(q_tilt, v), quat.rotate(q_flat, v), atol=1e-5
    )


def test_integrate_constant_omega():
    # integrating w = pi/2 around z for 1s in small steps ≈ 90° rotation
    q = jnp.array(quat.IDENTITY)
    w = jnp.array([0.0, 0.0, np.pi / 2])
    for _ in range(1000):
        q = quat.integrate(q, w, 1e-3)
    np.testing.assert_allclose(float(quat.yaw(q)), np.pi / 2, atol=1e-2)


def test_wrap_to_pi():
    a = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 4 * np.pi + 0.3])
    out = quat.wrap_to_pi(a)
    np.testing.assert_allclose(
        out, [0.0, -np.pi + 0.1, np.pi - 0.1, 0.3], atol=1e-5
    )


def test_skew_cross_equivalence():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(4, 3)).astype(np.float32)
    b = rng.normal(size=(4, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", spatial.skew(a), b), np.cross(a, b), atol=1e-5
    )


def test_spatial_inertia_point_mass():
    # point mass at c: kinetic energy of pure translation v: 0.5 m v^2
    m = jnp.array(2.0)
    c = jnp.array([0.3, -0.2, 0.5])
    I = spatial.spatial_inertia(m, c, jnp.zeros((3, 3)))
    v = jnp.concatenate([jnp.zeros(3), jnp.array([1.0, 2.0, 3.0])])
    ke = 0.5 * v @ I @ v
    np.testing.assert_allclose(float(ke), 0.5 * 2.0 * 14.0, atol=1e-5)
    # rotation w about origin: velocity of mass = w x c -> KE = .5 m |w x c|^2
    w = jnp.array([0.5, 1.0, -0.7])
    vm = jnp.concatenate([w, jnp.zeros(3)])
    ke2 = 0.5 * vm @ I @ vm
    np.testing.assert_allclose(
        float(ke2), 0.5 * 2.0 * float(jnp.sum(jnp.cross(w, c) ** 2)), atol=1e-5
    )


def test_motion_force_cross_duality():
    # d/dt (v . f) consistency: (vxm m) . f = -m . (vxf f)
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.normal(size=6).astype(np.float32))
    m = jnp.asarray(rng.normal(size=6).astype(np.float32))
    f = jnp.asarray(rng.normal(size=6).astype(np.float32))
    lhs = spatial.motion_cross(v, m) @ f
    rhs = -m @ spatial.force_cross(v, f)
    np.testing.assert_allclose(float(lhs), float(rhs), atol=1e-4)


def test_heading_wz_law():
    """heading_wz = clip(gain * wrap_to_pi(err), +/-wz_max) — the single
    home of the reference heading controller (point_foot.py:487-490),
    shared by the env command layer and the gait-MPC heading mode."""
    import jax.numpy as jnp

    from pointfoot_tpu.ops.quat import heading_wz

    # small error: proportional
    np.testing.assert_allclose(
        float(heading_wz(jnp.asarray(0.4), jnp.asarray(0.0))), 0.2, atol=1e-6)
    # large error: clipped to wz_max
    assert float(heading_wz(jnp.asarray(3.0), jnp.asarray(0.0))) == 1.0
    # wraps: a 350-degree error is a -10-degree error
    err = float(heading_wz(jnp.asarray(2 * np.pi - 0.2), jnp.asarray(0.0)))
    np.testing.assert_allclose(err, -0.1, atol=1e-6)
    # custom gain/cap
    assert float(heading_wz(jnp.asarray(1.0), jnp.asarray(0.0),
                            gain=2.0, wz_max=1.5)) == 1.5
