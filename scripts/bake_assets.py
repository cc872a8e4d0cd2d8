"""Bake URDF robot descriptions into standalone JSON model assets.

Runs the URDF -> RobotModel compiler over the robot descriptions (by default
the reference checkout's resources tree) and serializes the numeric model
arrays into ``pointfoot_tpu/physics/_assets/``.  After baking, the framework
needs no URDF files at runtime.

Usage:  python scripts/bake_assets.py [--resources DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointfoot_tpu.physics.assets import save_model  # noqa: E402
from pointfoot_tpu.physics.urdf import load_urdf  # noqa: E402

ROBOTS = {
    "pointfoot": "PF_P441A/urdf/PF_P441A.urdf",
    "a1": "a1/urdf/a1.urdf",
    "anymal_b": "anymal_b/urdf/anymal_b.urdf",
    "anymal_c": "anymal_c/urdf/anymal_c.urdf",
    "cassie": "cassie/urdf/cassie.urdf",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resources", default="/root/reference/resources/robots")
    args = ap.parse_args()
    for name, rel in ROBOTS.items():
        path = os.path.join(args.resources, rel)
        if not os.path.exists(path):
            print(f"skip {name}: {path} not found")
            continue
        try:
            model, jmap = load_urdf(path)
        except Exception as e:  # keep baking the rest
            print(f"FAIL {name}: {e}")
            continue
        out = save_model(model, name)
        print(f"baked {name}: nb={model.nb} nj={model.nj} "
              f"nc={len(model.collision_body)} -> {out}")
        print(f"   joints: {model.joint_names}")


if __name__ == "__main__":
    main()
