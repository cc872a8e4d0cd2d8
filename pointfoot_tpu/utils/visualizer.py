"""Headless skeleton visualizer: render rollout frames to PNG / GIF.

Replaces the interactive Isaac Gym viewer of the reference (base_task.py
render/keyboard handling) with an offline artifact renderer fit for headless
TPU hosts: matplotlib 3-D line skeleton of the kinematic tree + terrain
patch, one PNG per frame or an animated GIF via pillow.
"""

from __future__ import annotations

from typing import List

import numpy as np

from pointfoot_tpu.physics import dynamics
from pointfoot_tpu.physics.model import PhysicsParams, PhysicsState, RobotModel


def body_positions(model: RobotModel, phys_single: PhysicsState,
                   params_single: PhysicsParams) -> np.ndarray:
    """(nb, 3) world body origins for one env."""
    kin = dynamics.forward_kinematics(model, phys_single, params_single)
    return np.asarray(kin.body_pos)


def render_frame(model: RobotModel, phys_single: PhysicsState,
                 params_single: PhysicsParams, terrain=None,
                 ax=None, lim: float = 1.0):
    """Draw one frame; returns the matplotlib figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    kin = dynamics.forward_kinematics(model, phys_single, params_single)
    pos = np.asarray(kin.body_pos)
    rot = np.asarray(kin.body_rot)
    if ax is None:
        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(111, projection="3d")
    else:
        fig = ax.figure
        ax.cla()
    # kinematic tree edges
    for b in range(1, model.nb):
        p = model.parent[b]
        ax.plot(*zip(pos[p], pos[b]), "o-", color="tab:blue", lw=2, ms=3)
    # collision spheres (feet etc.)
    for c, b in enumerate(model.collision_body):
        center = pos[b] + rot[b] @ np.asarray(model.collision_offset[c])
        ax.scatter(*center, s=60 * float(model.collision_radius[c]) / 0.03,
                   color="tab:red", alpha=0.6)
    base = pos[0]
    # terrain patch under the robot
    if terrain is not None:
        xs = np.linspace(base[0] - lim, base[0] + lim, 24)
        ys = np.linspace(base[1] - lim, base[1] + lim, 24)
        X, Y = np.meshgrid(xs, ys)
        import jax.numpy as jnp

        Z = np.asarray(terrain.height_at(jnp.asarray(X), jnp.asarray(Y)))
        ax.plot_surface(X, Y, Z, alpha=0.25, color="gray", lw=0)
    else:
        ax.plot([base[0] - lim, base[0] + lim], [base[1], base[1]], [0, 0],
                color="gray", alpha=0.4)
    ax.set_xlim(base[0] - lim, base[0] + lim)
    ax.set_ylim(base[1] - lim, base[1] + lim)
    ax.set_zlim(0, 2 * lim)
    ax.set_box_aspect((1, 1, 1))
    return fig


def render_rollout(model: RobotModel, states: List[PhysicsState],
                   params_single: PhysicsParams, out_path: str,
                   terrain=None, fps: int = 25) -> str:
    """Render a list of single-env PhysicsStates to a GIF (or PNG if one)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    frames = []
    from io import BytesIO

    from PIL import Image

    for st in states:
        render_frame(model, st, params_single, terrain=terrain, ax=ax)
        buf = BytesIO()
        fig.savefig(buf, format="png", dpi=80)
        buf.seek(0)
        frames.append(Image.open(buf).convert("P"))
    plt.close(fig)
    if len(frames) == 1 or not out_path.endswith(".gif"):
        frames[0].save(out_path)
    else:
        frames[0].save(out_path, save_all=True, append_images=frames[1:],
                       duration=int(1000 / fps), loop=0)
    return out_path
