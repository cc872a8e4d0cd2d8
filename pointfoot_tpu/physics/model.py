"""Robot model arrays, per-env physics parameters, and dynamic state.

`RobotModel` is the output of the URDF compiler (`physics/urdf.py`): a pytree
of static model arrays (kinematic tree, inertials, joint limits, collision
spheres) that is closed over by the jitted dynamics step.  It replaces Isaac
Gym's `load_asset` + fixed-joint collapsing (reference point_foot.py:898-916)
— welded links are merged into their movable ancestor at compile time, with
`dont_collapse` feet surviving as named collision sites exactly like the
reference asset flag (PF_P441A.urdf foot_L_Joint `dont_collapse="true"`).

`PhysicsParams` carries everything domain randomization touches (per-env
friction, added base mass, CoM offset, PD gains, pushes) as pytree leaves, so
the sys-ID layer can differentiate straight through the simulator — the
capability the reference approximates with a subprocess GAN loop
(reference scripts/GAN.py:109-140).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class RobotModel:
    """Static articulated-body model (one robot; batched use via closure)."""

    # --- static tree metadata (hashable; part of jit cache key) ---
    nb: int = struct.field(pytree_node=False)  # movable bodies incl. base
    parent: Tuple[int, ...] = struct.field(pytree_node=False)  # len nb, parent[0]=-1
    body_names: Tuple[str, ...] = struct.field(pytree_node=False)
    joint_names: Tuple[str, ...] = struct.field(pytree_node=False)  # len nb-1
    # collision sphere -> movable body index, and original link name
    collision_body: Tuple[int, ...] = struct.field(pytree_node=False)
    collision_names: Tuple[str, ...] = struct.field(pytree_node=False)

    # --- joint arrays (nj = nb-1; joint j connects parent[j+1] -> body j+1) ---
    joint_pos: jax.Array  # (nj, 3) anchor in parent frame
    joint_rot: jax.Array  # (nj, 4) child-frame quat in parent frame at q=0 (xyzw)
    joint_axis: jax.Array  # (nj, 3) unit axis in child/joint frame
    q_lower: jax.Array  # (nj,)
    q_upper: jax.Array  # (nj,)
    effort_limit: jax.Array  # (nj,)  N*m, reference URDF <limit effort>
    velocity_limit: jax.Array  # (nj,) rad/s
    joint_damping: jax.Array  # (nj,) from URDF <dynamics damping>
    joint_friction: jax.Array  # (nj,) dry friction from URDF <dynamics friction>

    # --- body inertial arrays (welded children merged) ---
    mass: jax.Array  # (nb,)
    com: jax.Array  # (nb, 3) in body frame
    inertia: jax.Array  # (nb, 3, 3) about CoM, body frame

    # --- collision spheres (world geometry vs terrain) ---
    collision_offset: jax.Array  # (nc, 3) center in owning body frame
    collision_radius: jax.Array  # (nc,)

    @property
    def nj(self) -> int:
        return self.nb - 1

    @property
    def nv(self) -> int:
        """Generalized-velocity dimension: 6 (free base) + nj."""
        return 6 + self.nb - 1

    def collision_indices(self, substr: str) -> Tuple[int, ...]:
        """Indices of collision spheres whose source link name contains substr.

        Mirrors the reference's name matching for feet / termination /
        penalized contacts (point_foot.py:919-931, cfg asset.foot_name).
        """
        return tuple(
            i for i, n in enumerate(self.collision_names) if substr in n
        )

    def joint_index(self, name: str) -> int:
        return self.joint_names.index(name)

    def total_mass(self) -> jax.Array:
        return jnp.sum(self.mass)


@struct.dataclass
class PhysicsParams:
    """Per-env randomized physics parameters (leading batch dim everywhere).

    These are the sys-ID degrees of freedom of the reference (`update_frictions`,
    `update_added_mass_and_base_com`, point_foot.py:103-121) plus the
    PD-controller gains; being pytree leaves makes them differentiable inputs.
    """

    friction: jax.Array  # (..., nc) ground Coulomb friction per collision sphere
    joint_friction: jax.Array  # (..., nj) per-joint DOF dry friction — the
    # 6-d sys-ID degree of freedom the reference identifies via
    # dof_props["friction"][i] (point_foot.py:103-108, GAN.py:71-83)
    restitution: jax.Array  # (...,)
    added_mass: jax.Array  # (...,) kg added to base
    com_offset: jax.Array  # (..., 3) base CoM shift, body frame
    kp: jax.Array  # (..., nj)
    kd: jax.Array  # (..., nj)
    # contact material (soft-contact model)
    contact_stiffness: jax.Array  # (...,)  N/m
    contact_damping: jax.Array  # (...,)  N*s/m

    @classmethod
    def nominal(
        cls,
        model: RobotModel,
        batch: Tuple[int, ...] = (),
        kp: float = 40.0,
        kd: float = 1.5,
        friction: float = 1.0,
        contact_stiffness: float = 1.2e4,
        contact_damping: float = 1.2e3,
    ) -> "PhysicsParams":
        nc = len(model.collision_body)
        nj = model.nj
        ones = jnp.ones(batch, jnp.float32)

        def bcast(x, shape):
            return jnp.broadcast_to(jnp.asarray(x, jnp.float32), batch + shape)

        return cls(
            friction=bcast(friction, (nc,)),
            joint_friction=bcast(model.joint_friction, (nj,)),
            restitution=ones * 0.0,
            added_mass=ones * 0.0,
            com_offset=bcast(np.zeros(3), (3,)),
            kp=bcast(kp * np.ones(nj), (nj,)),
            kd=bcast(kd * np.ones(nj), (nj,)),
            contact_stiffness=ones * contact_stiffness,
            contact_damping=ones * contact_damping,
        )


@struct.dataclass
class PhysicsState:
    """Dynamic state of the articulated system (leading batch dims).

    Mirrors the Isaac Gym root-state + DoF-state tensor views the reference
    wraps with gymtorch (point_foot.py:700-724): world-frame base pose and
    velocity, joint positions/velocities — plus the analytically computed
    contact forces that replace `net_contact_force_tensor`.
    """

    base_pos: jax.Array  # (..., 3) world
    base_quat: jax.Array  # (..., 4) xyzw, body->world
    base_lin_vel: jax.Array  # (..., 3) world, at base origin
    base_ang_vel: jax.Array  # (..., 3) world
    qpos: jax.Array  # (..., nj)
    qvel: jax.Array  # (..., nj)
    contact_force: jax.Array  # (..., nc, 3) world-frame force on each sphere

    @classmethod
    def default(cls, model: RobotModel, default_qpos, batch: Tuple[int, ...] = (),
                base_height: float = 0.8) -> "PhysicsState":
        nc = len(model.collision_body)

        def bcast(x, shape):
            return jnp.broadcast_to(jnp.asarray(x, jnp.float32), batch + shape)

        return cls(
            base_pos=bcast(np.array([0.0, 0.0, base_height]), (3,)),
            base_quat=bcast(np.array([0.0, 0.0, 0.0, 1.0]), (4,)),
            base_lin_vel=bcast(np.zeros(3), (3,)),
            base_ang_vel=bcast(np.zeros(3), (3,)),
            qpos=bcast(np.asarray(default_qpos, np.float32), (model.nj,)),
            qvel=bcast(np.zeros(model.nj), (model.nj,)),
            contact_force=bcast(np.zeros((nc, 3)), (nc, 3)),
        )
