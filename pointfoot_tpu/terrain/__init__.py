"""Procedural terrain: heightfield generators, curriculum grid, JAX sampling.

Replaces `legged_gym/utils/terrain.py` + `isaacgym.terrain_utils` (reference
terrain.py:109-145): the 8 sub-terrain families (sloped, noisy-sloped, stairs
up/down, discrete obstacles, stepping stones, gap, pit) are pure seedable
numpy generators composed into a (levels x types) curriculum grid.  Unlike
the reference there is no trimesh conversion — contacts and height-scans
sample the heightfield directly on-device (see `TerrainGrid.height_at`).
"""

from pointfoot_tpu.terrain.heightfield import (
    discrete_obstacles,
    gap,
    pit,
    pyramid_sloped,
    pyramid_stairs,
    random_uniform,
    stepping_stones,
)
from pointfoot_tpu.terrain.grid import TerrainGrid, TerrainCfg, build_terrain

__all__ = [
    "pyramid_sloped", "random_uniform", "pyramid_stairs", "discrete_obstacles",
    "stepping_stones", "gap", "pit", "TerrainGrid", "TerrainCfg", "build_terrain",
]
