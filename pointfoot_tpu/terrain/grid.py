"""Terrain curriculum grid + on-device height sampling.

Replaces the reference `Terrain` class (utils/terrain.py:38-73): composes
(num_rows=levels x num_cols=types) sub-terrains into one global heightfield
with a border, computes per-cell env origins, and exposes the result as a
JAX-ready struct.  `height_at` (bilinear, used by contact) and
`height_scan_at` (min-of-3-neighbors, exactly the reference lookup
point_foot.py:1100-1112) run on-device so terrain queries never leave the
chip during rollout.

Terrain-type selection per cell follows the reference proportions logic
(terrain.py:109-145) including the gap/pit tail the reference left
unreachable with 5-entry proportions (SURVEY.md quirks #5 — we support all 8).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pointfoot_tpu.terrain import heightfield as hfgen


@dataclass(frozen=True)
class TerrainCfg:
    """Mirror of the reference terrain config (legged_robot_config.py:52-77)."""

    mesh_type: str = "trimesh"  # 'plane' | 'heightfield' | 'trimesh' (same here)
    horizontal_scale: float = 0.1  # [m] cell size
    vertical_scale: float = 0.005  # [m] (kept for height-scan parity scaling)
    border_size: float = 25.0  # [m]
    curriculum: bool = True
    static_friction: float = 1.0
    dynamic_friction: float = 1.0
    restitution: float = 0.0
    # rough-terrain dims (pointfoot_rough_config.py:14-38)
    terrain_length: float = 8.0
    terrain_width: float = 8.0
    num_rows: int = 10  # difficulty levels
    num_cols: int = 20  # terrain types
    max_init_terrain_level: int = 5
    # proportions over the 8 families; reference lists 5 (quirk #5), extended
    # entries enable stepping stones / gap / pit
    terrain_proportions: Tuple[float, ...] = (0.1, 0.1, 0.35, 0.25, 0.2)
    slope_treshold: float = 0.75  # (sic, reference spelling)
    measure_heights: bool = True
    selected: bool = False
    selected_kwargs: dict = field(default_factory=dict)
    # Curriculum-demotion semantics (PARITY.md quirks register):
    #   False (default) — demotion requirement scaled by the seconds the
    #     episode ACTUALLY ran and judged on along-command progress.  The
    #     reference (point_foot.py:630) scales by the full episode length
    #     even for early-terminated episodes, which over-demotes and traps
    #     the batch at level ~1 under honest contact.
    #   True — reference-exact: full-episode scaling, net-displacement
    #     demotion test (for parity audits / A-B runs).
    reference_exact_demotion: bool = False
    # Curriculum-difficulty DEVIATION (off by default = reference-exact):
    # cap the stairs_up step height (m).  Round-4 diagnosis
    # (docs/ROUND4_NOTES.md §2): stairs_up is the single binding family of
    # the terrain curriculum — reference scaling 0.05+0.18*difficulty
    # reaches 0.23 m steps, beyond the point-foot biped's demonstrated
    # climbing envelope, pinning 35% of envs at mean level 2.8 while every
    # other family sits at 5.2-6.0.  A cap (e.g. 0.12) keeps level
    # progression meaningful for gait-quality curricula.
    stairs_up_height_cap: Optional[float] = None
    # Curriculum-promotion DEVIATION (off by default = reference-exact):
    # promote on distance > clip(0.5*|cmd|*T_episode, 2.0, terrain_length/2)
    # instead of the reference's fixed terrain_length/2 (point_foot.py:627).
    # Under the fixed rule an env commanded slower than ~0.4 m/s can NEVER
    # promote (0.4 * 20 s * 0.5 = 4.0 m = the fixed bar), so only the
    # fast-command tail of episodes carries the curriculum — and on
    # stairs_up those episodes fall the most, which is the round-4/5
    # diagnosed promotion bottleneck (family mean 3.8 vs 5.2-6.0 for every
    # other family at iteration 219k; scripts/terrain_family_stats.py).
    # With the knob on, a >=~80%-tracking episode promotes at ANY command
    # above the stand threshold; the 2.0 m floor keeps stand-still /
    # creep episodes from promoting trivially.  Demotion is unchanged.
    cmd_conditioned_promotion: bool = False
    # Gather-free closed-form terrain (terrain/procedural.py): heights come
    # from VPU math on a hash of the cell index instead of HBM gathers —
    # the height scan is the dominant cost of rough-terrain steps on TPU.
    # Same curriculum structure/statistics, different (hash-based) random
    # realization than the numpy tables.
    procedural: bool = False


@struct.dataclass
class TerrainGrid:
    """Device-resident terrain: global heightfield + env origins.

    Besides the raw heightfield, two derived fields are precomputed at build
    time so hot-path queries cost ONE gather each (TPU gathers are the
    bottleneck of terrain-heavy steps):

    * `min3`  — min(h[x,y], h[x+1,y], h[x,y+1]) per cell: the reference
      height-scan lookup (point_foot.py:1106-1111) as a single fetch;
    * `slope` — (R, C, 2) per-cell forward-difference gradient, giving the
      contact surface plane (height + normal) from one cell fetch.
    """

    height: jax.Array  # (R, C) float32 meters
    min3: jax.Array  # (R, C) precomputed min-of-3-neighbors
    slope: jax.Array  # (R, C, 2) d h / d x, d h / d y per cell
    hscale: float = struct.field(pytree_node=False)
    border: float = struct.field(pytree_node=False)  # [m] offset of grid origin
    env_origins: jax.Array  # (levels, types, 3)
    num_levels: int = struct.field(pytree_node=False)
    num_types: int = struct.field(pytree_node=False)
    # per-cell terrain difficulty/type for curriculum bookkeeping
    terrain_length: float = struct.field(pytree_node=False)

    def _grid_coords(self, x, y):
        px = (x + self.border) / self.hscale
        py = (y + self.border) / self.hscale
        R, C = self.height.shape
        px = jnp.clip(px, 0.0, R - 2.0)
        py = jnp.clip(py, 0.0, C - 2.0)
        return px, py

    # NOTE on lookup style: all hot queries below gather via ONE
    # jnp.take on a flattened (or row-packed) table.  2-D fancy indexing
    # lowers to a 3x slower TPU gather, and fetching the 3-4 values a
    # query needs as one packed ROW costs the same as fetching one scalar
    # (measured on v5e: 2d fancy 11.5 ms vs 1d take 3.8 ms vs packed row
    # 0.7 ms per 37k-point query set).  The packed tables are derived
    # in-trace from the pytree fields — XLA hoists them out of rollout
    # scans, so they cost one concat per jitted program, not per step.

    def _cell_index(self, x, y):
        px, py = self._grid_coords(x, y)
        x0 = jnp.floor(px).astype(jnp.int32)
        y0 = jnp.floor(py).astype(jnp.int32)
        C = self.height.shape[1]
        return x0, y0, px, py, x0 * C + y0

    def height_at(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Bilinear height sample (contact surface; matches the piecewise-
        linear trimesh PhysX collides against up to triangulation choice)."""
        x0, y0, px, py, idx = self._cell_index(x, y)
        fx = px - x0
        fy = py - y0
        h = self.height
        sx = jnp.concatenate([h[1:], h[-1:]], axis=0)
        sy = jnp.concatenate([h[:, 1:], h[:, -1:]], axis=1)
        sxy = jnp.concatenate([sy[1:], sy[-1:]], axis=0)
        packed = jnp.stack([h, sx, sy, sxy], axis=-1).reshape(-1, 4)
        q = jnp.take(packed, idx, axis=0)
        h00, h10, h01, h11 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        return (
            h00 * (1 - fx) * (1 - fy)
            + h10 * fx * (1 - fy)
            + h01 * (1 - fx) * fy
            + h11 * fx * fy
        )

    def height_scan_at(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """Reference height-scan lookup: min of 3 neighbor cells
        (point_foot.py:1106-1111) — one gather from the precomputed field."""
        _, _, _, _, idx = self._cell_index(x, y)
        return jnp.take(self.min3.reshape(-1), idx)

    def surface_at(self, x: jax.Array, y: jax.Array):
        """(height, unit normal) of the cell's contact plane — the
        piecewise-planar surface PhysX's trimesh collision approximates.
        One cell fetch (h + 2 slopes) instead of ~25 point queries."""
        x0, y0, px, py, idx = self._cell_index(x, y)
        packed = jnp.concatenate([self.height[..., None], self.slope],
                                 axis=-1).reshape(-1, 3)
        q = jnp.take(packed, idx, axis=0)
        h00, gx, gy = q[..., 0], q[..., 1], q[..., 2]
        h = h00 + gx * (px - x0) * self.hscale + gy * (py - y0) * self.hscale
        n = jnp.stack([-gx, -gy, jnp.ones_like(gx)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h, n


def _derived_fields(height: np.ndarray, hscale: float):
    """Precompute min-of-3 and per-cell slope fields (see TerrainGrid)."""
    h = np.asarray(height, np.float64)
    h_xp = np.roll(h, -1, axis=0)
    h_xp[-1] = h[-1]
    h_yp = np.roll(h, -1, axis=1)
    h_yp[:, -1] = h[:, -1]
    min3 = np.minimum(np.minimum(h, h_xp), h_yp)
    gx = (h_xp - h) / hscale
    gy = (h_yp - h) / hscale
    slope = np.stack([gx, gy], axis=-1)
    return (jnp.asarray(min3, jnp.float32), jnp.asarray(slope, jnp.float32))


def flat_grid(size: float = 40.0, hscale: float = 0.5,
              num_levels: int = 1, num_types: int = 1,
              spacing: float = 3.0) -> TerrainGrid:
    """Plane terrain ('plane' mesh_type, pointfoot_flat_config.py:9) as a
    degenerate grid; env origins on a square lattice like the reference
    `_get_env_origins` plane branch (point_foot.py:988-997)."""
    R = C = int(size / hscale)
    origins = np.zeros((num_levels, num_types, 3), np.float32)
    for i in range(num_levels):
        for j in range(num_types):
            origins[i, j] = (i * spacing, j * spacing, 0.0)
    return TerrainGrid(
        height=jnp.zeros((R, C), jnp.float32),
        min3=jnp.zeros((R, C), jnp.float32),
        slope=jnp.zeros((R, C, 2), jnp.float32),
        hscale=hscale,
        border=size / 2,
        env_origins=jnp.asarray(origins),
        num_levels=num_levels,
        num_types=num_types,
        terrain_length=size,
    )


def _make_subterrain(cfg: TerrainCfg, choice: float, difficulty: float,
                     rng: np.random.Generator, shape: Tuple[int, int]) -> np.ndarray:
    """One sub-terrain cell — selection logic of reference make_terrain
    (terrain.py:109-145), difficulty scalings identical."""
    hs = cfg.horizontal_scale
    hf = np.zeros(shape, np.float64)
    slope = difficulty * 0.4
    step_height = 0.05 + 0.18 * difficulty
    discrete_obstacles_height = 0.05 + difficulty * 0.2
    stepping_stones_size = 1.5 * (1.05 - difficulty)
    stone_distance = 0.05 if difficulty == 0 else 0.1
    gap_size = 1.0 * difficulty
    pit_depth = 1.0 * difficulty
    # the reference accumulates proportions into cumulative thresholds
    # (terrain.py:49) before make_terrain's `choice < proportions[k]` tests
    raw = list(cfg.terrain_proportions)
    cum = list(np.cumsum(raw))
    p = cum + [cum[-1] if cum else 0.0] * (7 - len(cum))
    if choice < p[0]:
        if choice < p[0] / 2:
            slope = -slope
        hfgen.pyramid_sloped(hf, hs, slope, platform_size=3.0)
    elif choice < p[1]:
        hfgen.pyramid_sloped(hf, hs, slope, platform_size=3.0)
        hfgen.random_uniform(hf, hs, rng, -0.05, 0.05, 0.005, 0.2)
    elif choice < p[3]:
        if choice < p[2]:
            # stairs UP (center lowest, robot climbs outward); optional
            # height cap — see TerrainCfg.stairs_up_height_cap.  Only a
            # POSITIVE cap applies (<= 0 / None = reference-exact) — keep
            # in lockstep with procedural.py's spec.stairs_up_cap guard so
            # both representations generate the same world for any cfg
            if (cfg.stairs_up_height_cap is not None
                    and cfg.stairs_up_height_cap > 0.0):
                step_height = min(step_height, cfg.stairs_up_height_cap)
            step_height = -step_height
        hfgen.pyramid_stairs(hf, hs, step_width=0.31, step_height=step_height,
                             platform_size=3.0)
    elif choice < p[4]:
        hfgen.discrete_obstacles(hf, hs, rng, discrete_obstacles_height,
                                 1.0, 2.0, 20, platform_size=3.0)
    elif choice < p[5]:
        hfgen.stepping_stones(hf, hs, rng, stepping_stones_size, stone_distance,
                              max_height=0.0, platform_size=4.0)
    elif choice < p[6]:
        hfgen.gap(hf, hs, gap_size, platform_size=3.0)
    else:
        hfgen.pit(hf, hs, pit_depth, platform_size=4.0)
    return hf


_SELECTED_GENERATORS = {
    "pyramid_sloped": lambda hf, hs, rng, kw: hfgen.pyramid_sloped(
        hf, hs, **kw),
    "random_uniform": lambda hf, hs, rng, kw: hfgen.random_uniform(
        hf, hs, rng, **kw),
    "pyramid_stairs": lambda hf, hs, rng, kw: hfgen.pyramid_stairs(
        hf, hs, **kw),
    "discrete_obstacles": lambda hf, hs, rng, kw: hfgen.discrete_obstacles(
        hf, hs, rng, **kw),
    "stepping_stones": lambda hf, hs, rng, kw: hfgen.stepping_stones(
        hf, hs, rng, **kw),
    "gap": lambda hf, hs, rng, kw: hfgen.gap(hf, hs, **kw),
    "pit": lambda hf, hs, rng, kw: hfgen.pit(hf, hs, **kw),
}


def build_terrain(cfg: TerrainCfg, seed: int = 0) -> TerrainGrid:
    """Compose the full curriculum grid (reference Terrain.__init__ +
    curiculum/randomized_terrain/selected_terrain, terrain.py:38-107).

    `cfg.selected` with `selected_kwargs={'type': <name>, ...}` fills every
    cell with one named sub-terrain — the reference's `selected_terrain`
    without the `eval()` (terrain.py:94-107 used eval on a string)."""
    rng = np.random.default_rng(seed)
    hs = cfg.horizontal_scale
    cell_r = int(cfg.terrain_length / hs)
    cell_c = int(cfg.terrain_width / hs)
    border = int(cfg.border_size / hs)
    R = cfg.num_rows * cell_r + 2 * border
    C = cfg.num_cols * cell_c + 2 * border
    big = np.zeros((R, C), np.float64)
    origins = np.zeros((cfg.num_rows, cfg.num_cols, 3), np.float32)
    for i in range(cfg.num_rows):  # difficulty level
        for j in range(cfg.num_cols):  # terrain type column
            if cfg.selected:
                kw = dict(cfg.selected_kwargs)
                gen = _SELECTED_GENERATORS[kw.pop("type")]
                hf = gen(np.zeros((cell_r, cell_c)), hs, rng, kw)
            else:
                if cfg.curriculum:
                    difficulty = i / max(cfg.num_rows - 1, 1)
                    choice = j / cfg.num_cols + 0.001
                else:
                    difficulty = float(rng.choice([0.5, 0.75, 0.9]))
                    choice = float(rng.uniform(0, 1))
                hf = _make_subterrain(cfg, choice, difficulty, rng,
                                      (cell_r, cell_c))
            r0, c0 = border + i * cell_r, border + j * cell_c
            big[r0:r0 + cell_r, c0:c0 + cell_c] = hf
            # env origin at cell center, z = max height near the center
            # (reference terrain.py:147-164)
            cx = r0 + cell_r // 2
            cy = c0 + cell_c // 2
            w = max(int(0.5 / hs), 1)
            z = big[cx - w:cx + w, cy - w:cy + w].max()
            origins[i, j] = (
                (cx - border) * hs - cfg.num_rows * cfg.terrain_length / 2 * 0,
                (cy - border) * hs,
                z,
            )
            origins[i, j, 0] = (cx - border) * hs
    min3, slope = _derived_fields(big, hs)
    return TerrainGrid(
        height=jnp.asarray(big, jnp.float32),
        min3=min3,
        slope=slope,
        hscale=hs,
        border=cfg.border_size,
        env_origins=jnp.asarray(origins),
        num_levels=cfg.num_rows,
        num_types=cfg.num_cols,
        terrain_length=cfg.terrain_length,
    )
