"""Quaternion algebra in (x, y, z, w) convention.

Replaces the `isaacgym.torch_utils` quaternion helpers consumed by the
reference environments (quat_rotate, quat_rotate_inverse, quat_apply,
quat_apply_yaw, wrap_to_pi — see reference point_foot.py:208-211, :488 and
legged_gym/utils/math.py:38-48).  Everything here is shape-polymorphic pure
JAX: ops broadcast over arbitrary leading batch dimensions so the same code
runs under `vmap`, inside `lax.scan` rollouts and under `pjit` meshes.

Convention notes
----------------
* storage order is (x, y, z, w) to match Isaac Gym root-state tensors;
* `rotate(q, v)` applies the rotation that takes body-frame vectors to the
  world frame (same as isaacgym `quat_rotate`);
* integration uses world-frame angular velocity (PhysX semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IDENTITY = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def normalize(q: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Unit-normalize, guarding against zero norm."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b in xyzw layout."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q (body -> world).

    Uses the expanded Rodrigues form (2 cross products) — cheaper than
    building the rotation matrix when rotating a single vector.
    """
    qvec = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v + w * t + jnp.cross(qvec, t)


def rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by q⁻¹ (world -> body). Mirrors isaacgym quat_rotate_inverse."""
    qvec = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v - w * t + jnp.cross(qvec, t)


def to_matrix(q: jax.Array) -> jax.Array:
    """Quaternion -> 3x3 rotation matrix (body -> world), batched."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis + angle -> quaternion (xyzw)."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def from_euler_zyx(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """Intrinsic roll(x)-pitch(y)-yaw(z) Euler -> quaternion (URDF rpy order)."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def yaw(q: jax.Array) -> jax.Array:
    """Heading (yaw) angle of the rotation: atan2 of the rotated +x axis.

    Matches reference heading computation point_foot.py:488-489
    (forward = quat_apply(base_quat, [1,0,0]); heading = atan2(fy, fx)).
    """
    fwd = rotate(q, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], q.dtype), q.shape[:-1] + (3,)))
    return jnp.arctan2(fwd[..., 1], fwd[..., 0])


def yaw_quat(q: jax.Array) -> jax.Array:
    """Yaw-only component of q (zero out x/y, renormalize).

    Mirrors reference utils/math.py:38-42 `quat_apply_yaw`'s yaw extraction.
    """
    qy = q * jnp.array([0.0, 0.0, 1.0, 1.0], dtype=q.dtype)
    return normalize(qy)


def apply_yaw(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by only the yaw component of q (utils/math.py:38-42)."""
    return rotate(yaw_quat(q), v)


def heading_wz(heading_des: jax.Array, yaw: jax.Array,
               gain: float = 0.5, wz_max: float = 1.0) -> jax.Array:
    """The reference heading controller law (point_foot.py:487-490):
    wz = clip(gain * wrap_to_pi(heading - yaw), +/-wz_max).  Single home
    for the formula — used by both the env command layer and the gait-MPC
    heading mode so the two stacks cannot drift apart."""
    return jnp.clip(gain * wrap_to_pi(heading_des - yaw), -wz_max, wz_max)


def integrate(q: jax.Array, omega_world: jax.Array, dt: float) -> jax.Array:
    """First-order quaternion integration with world-frame angular velocity.

    q' = normalize(q + dt/2 * [ω,0] ⊗ q)  — PhysX-style explicit update.
    """
    dq = mul(jnp.concatenate([omega_world, jnp.zeros_like(omega_world[..., :1])], axis=-1), q)
    return normalize(q + 0.5 * dt * dq)


def from_rotvec(rv: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rotation vector (axis * angle) -> quaternion, Taylor-safe at 0."""
    angle = jnp.linalg.norm(rv, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < eps
    k = jnp.where(small, 0.5 + angle**2 / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle))
    return jnp.concatenate([rv * k, jnp.cos(half)], axis=-1)


def to_rotvec(q: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Quaternion -> rotation vector (inverse of from_rotvec)."""
    qn = normalize(q)
    # keep w >= 0 for the short rotation
    qn = qn * jnp.sign(jnp.where(qn[..., 3:4] == 0, 1.0, qn[..., 3:4]))
    sin_half = jnp.linalg.norm(qn[..., :3], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half, qn[..., 3:4])
    small = sin_half < eps
    scale = jnp.where(small, 2.0, angle / jnp.where(small, 1.0, sin_half))
    return qn[..., :3] * scale


def wrap_to_pi(angle: jax.Array) -> jax.Array:
    """Wrap angles to (-π, π]. Mirrors reference utils/math.py:45-48."""
    wrapped = jnp.mod(angle, 2.0 * jnp.pi)
    wrapped = jnp.where(wrapped > jnp.pi, wrapped - 2.0 * jnp.pi, wrapped)
    return wrapped
