"""Batched articulated rigid-body physics: the TPU-native PhysX replacement.

The reference drives the closed-source Isaac Gym binary (C++ PhysX TGS) via
`gym.simulate`/state-tensor views (reference point_foot.py:183-185, :700-724).
Here the physics layer is a pure function of (model, params, state, torques)
— jitted, vmapped over envs, and scanned over decimation substeps — so the
entire env step fuses into one XLA program and domain-randomization
parameters are differentiable pytree leaves.
"""

from pointfoot_tpu.physics.model import RobotModel, PhysicsParams, PhysicsState
from pointfoot_tpu.physics.urdf import load_urdf

__all__ = ["RobotModel", "PhysicsParams", "PhysicsState", "load_urdf"]
