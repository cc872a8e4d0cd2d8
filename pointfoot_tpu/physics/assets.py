"""Baked robot model registry.

The URDF compiler (`physics/urdf.py`) runs offline; its numeric output for
each supported robot is stored as JSON under ``physics/_assets/`` (generated
by ``scripts/bake_assets.py`` from the URDF sources) so the framework is
standalone at runtime — the analogue of the reference's
``resources/robots/*/urdf`` asset directory (reference point_foot.py:898-916)
without shipping meshes (collision geometry is reduced to spheres at
compile time).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict

import jax.numpy as jnp
import numpy as np

from pointfoot_tpu.physics.model import RobotModel

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "_assets")


def model_to_dict(model: RobotModel) -> Dict:
    d = {}
    for k in ("nb", "parent", "body_names", "joint_names",
              "collision_body", "collision_names"):
        v = getattr(model, k)
        d[k] = list(v) if isinstance(v, tuple) else v
    for k in ("joint_pos", "joint_rot", "joint_axis", "q_lower", "q_upper",
              "effort_limit", "velocity_limit", "joint_damping",
              "joint_friction", "mass", "com", "inertia",
              "collision_offset", "collision_radius"):
        d[k] = np.asarray(getattr(model, k)).tolist()
    return d


def model_from_dict(d: Dict) -> RobotModel:
    arr = lambda k: jnp.asarray(np.array(d[k], np.float32))
    return RobotModel(
        nb=int(d["nb"]),
        parent=tuple(int(x) for x in d["parent"]),
        body_names=tuple(d["body_names"]),
        joint_names=tuple(d["joint_names"]),
        collision_body=tuple(int(x) for x in d["collision_body"]),
        collision_names=tuple(d["collision_names"]),
        joint_pos=arr("joint_pos"), joint_rot=arr("joint_rot"),
        joint_axis=arr("joint_axis"), q_lower=arr("q_lower"),
        q_upper=arr("q_upper"), effort_limit=arr("effort_limit"),
        velocity_limit=arr("velocity_limit"),
        joint_damping=arr("joint_damping"), joint_friction=arr("joint_friction"),
        mass=arr("mass"), com=arr("com"), inertia=arr("inertia"),
        collision_offset=arr("collision_offset"),
        collision_radius=arr("collision_radius"),
    )


def save_model(model: RobotModel, name: str) -> str:
    os.makedirs(_ASSET_DIR, exist_ok=True)
    path = os.path.join(_ASSET_DIR, f"{name}.json")
    with open(path, "w") as f:
        json.dump(model_to_dict(model), f)
    return path


@lru_cache(maxsize=None)
def get_model(name: str) -> RobotModel:
    """Load a baked robot model by name (e.g. 'pointfoot', 'a1', 'anymal_c')."""
    path = os.path.join(_ASSET_DIR, f"{name}.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no baked model '{name}' in {_ASSET_DIR}; "
            f"run scripts/bake_assets.py (available: "
            f"{sorted(os.listdir(_ASSET_DIR)) if os.path.isdir(_ASSET_DIR) else []})"
        )
    with open(path) as f:
        return model_from_dict(json.load(f))


def available_models():
    if not os.path.isdir(_ASSET_DIR):
        return []
    return sorted(
        p[:-5] for p in os.listdir(_ASSET_DIR)
        if p.endswith(".json") and not p.startswith("actuator"))
