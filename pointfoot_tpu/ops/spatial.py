"""6-D spatial (Plücker) algebra in world-aligned coordinates.

The articulated-dynamics core (CRBA mass matrix + RNEA bias, see
``physics/dynamics.py``) replaces the closed-source PhysX solver consumed by
the reference through `gym.simulate` (reference point_foot.py:183-185).  We
use Featherstone spatial vectors stacked ``[angular; linear]`` and express
everything in *world-aligned axes about a per-env origin placed at the
current base position*, which keeps magnitudes small in float32 regardless of
how far a robot has walked across a terrain grid.

All functions broadcast over leading batch dims and are jit/vmap/scan-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def skew(v: Array) -> Array:
    """3-vector -> skew-symmetric matrix, batched over leading dims."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero],
        axis=-1,
    )
    return m.reshape(v.shape[:-1] + (3, 3))


def motion_cross(v: Array, m: Array) -> Array:
    """Spatial motion cross product  v ×m m  ([w;v0] × [w2;v2])."""
    w, vl = v[..., :3], v[..., 3:]
    w2, v2 = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, w2), jnp.cross(w, v2) + jnp.cross(vl, w2)], axis=-1
    )


def force_cross(v: Array, f: Array) -> Array:
    """Spatial force cross product  v ×f f  (dual of motion_cross)."""
    w, vl = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
    )


def spatial_inertia(mass: Array, com: Array, inertia_com: Array) -> Array:
    """6x6 spatial inertia about the working origin (world-aligned axes).

    Parameters
    ----------
    mass:        (...,)      body mass
    com:         (..., 3)    body CoM position *relative to the origin*
    inertia_com: (..., 3, 3) rotational inertia about the CoM in world axes

    Returns (..., 6, 6):  [[I_C + m c̃ c̃ᵀ, m c̃], [m c̃ᵀ, m E]]
    """
    cx = skew(com)
    m = mass[..., None, None]
    top_left = inertia_com + m * (cx @ jnp.swapaxes(cx, -1, -2))
    top_right = m * cx
    bot_left = jnp.swapaxes(top_right, -1, -2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=com.dtype), top_left.shape)
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, m * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def revolute_subspace(axis_world: Array, anchor_rel: Array) -> Array:
    """Motion subspace of a revolute joint.

    axis_world: (..., 3) unit joint axis in world frame.
    anchor_rel: (..., 3) joint anchor position relative to the working origin.
    Returns (..., 6): [axis; anchor × axis].
    """
    return jnp.concatenate([axis_world, jnp.cross(anchor_rel, axis_world)], axis=-1)


def point_velocity(spatial_vel: Array, point_rel: Array) -> Array:
    """Linear velocity of a body-fixed point from the body's spatial velocity.

    spatial_vel: (..., 6) [w; v_origin];  point_rel: (..., 3) point − origin.
    """
    w, v = spatial_vel[..., :3], spatial_vel[..., 3:]
    return v + jnp.cross(w, point_rel)


def force_at_point(force: Array, point_rel: Array, torque: Array | None = None) -> Array:
    """Spatial force (about the origin) of a linear force applied at a point.

    force: (..., 3); point_rel: (..., 3) application point − origin.
    """
    n = jnp.cross(point_rel, force)
    if torque is not None:
        n = n + torque
    return jnp.concatenate([n, force], axis=-1)


def rotate_inertia(rot: Array, inertia: Array) -> Array:
    """Rotate a 3x3 inertia tensor: R I Rᵀ, batched."""
    return rot @ inertia @ jnp.swapaxes(rot, -1, -2)
