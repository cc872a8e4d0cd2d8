"""Procedural curriculum terrain: gather-free height evaluation.

TPU gathers are the dominant cost of terrain-heavy steps — the 121-point
height scan alone is ~3.6 ms of the 5.5 ms pointfoot_rough step at 4096
envs, sitting at the XLA gather primitive's ~7 ns/element floor
(docs/PROFILE_SUBSTEP.md).  This module re-derives the curriculum grid
(terrain/grid.py, reference utils/terrain.py:38-145) as a CLOSED-FORM
function of the global cell index: every random draw the numpy generators
consume is replaced by a stateless splitmix32-style hash of
(seed, cell, draw), so a height sample costs a few hundred elementwise VPU
ops instead of an HBM gather — compute beats memory on TPU, and the same
expression runs unchanged inside Pallas kernels (no table to stage).

`materialize()` evaluates the same function over the full index grid to
produce the heightfield table (env origins, rendering, parity tests), so
the closed form and the table agree bit-for-bit by construction.  The
terrain REALIZATION differs from `grid.build_terrain`'s numpy-Generator
realization (different RNG stream), but the family/difficulty structure
and statistics are identical — tests/test_procedural_terrain.py pins both
the query-path equivalence and the structural properties per sub-terrain
family.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ hashing

def _mix(x):
    """splitmix32 finalizer — full-avalanche 32-bit mix (public domain)."""
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
    return x ^ (x >> jnp.uint32(16))


def hash_u32(seed: int, *keys):
    """Stateless hash of integer keys -> uint32 array (shape = broadcast)."""
    h = jnp.uint32(np.uint32(seed) ^ np.uint32(0x9E3779B9))
    for k in keys:
        k = jnp.asarray(k).astype(jnp.uint32)
        h = _mix(h ^ (k * jnp.uint32(0x85EBCA6B) + jnp.uint32(0xC2B2AE35)))
    return h


def hash_unif(seed: int, *keys):
    """Uniform [0, 1) float32 from a stateless hash."""
    return hash_u32(seed, *keys).astype(jnp.float32) * jnp.float32(
        1.0 / 4294967296.0)


def hash_prefix(seed: int, *keys):
    """Partial hash state after folding `keys` — BIT-EXACT prefix of
    hash_u32(seed, *keys, more...).  Round-5 throughput refactor: the
    height scan's hot branch (_discrete_obstacles) draws 100 hashes per
    point-eval that share the same (i, j) keys; hoisting the (seed, i, j)
    prefix turns each draw from a 4-mix chain into a single mix (~4x
    fewer hash ops) while producing the identical bit pattern — the
    terrain realization every committed policy trained on is unchanged
    (pinned by test_procedural_terrain.py::test_hash_prefix_bit_exact)."""
    return hash_u32(seed, *keys)


def hash_unif_from(prefix, *keys):
    """Continue a hash_prefix with more keys -> uniform [0, 1) float32."""
    h = prefix
    for k in keys:
        k = jnp.asarray(k).astype(jnp.uint32)
        h = _mix(h ^ (k * jnp.uint32(0x85EBCA6B) + jnp.uint32(0xC2B2AE35)))
    return h.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)


# draw salts (one namespace per random consumer)
_S_ROUGH = 1  # random_uniform coarse-cell level
_S_RECT = 2  # discrete_obstacles rect params (salt + 8*k + draw)
_S_STONE_OFF = 3  # stepping-stones per-band row offset
_S_STONE_H = 4  # stepping-stones per-stone height
_S_DIFF = 5  # randomized (non-curriculum) difficulty
_S_CHOICE = 6  # randomized (non-curriculum) type choice


@dataclass(frozen=True)
class ProcSpec:
    """Static description of the procedural curriculum grid (hashable; safe
    to close over in jit/Pallas).  Mirrors TerrainCfg's fields that shape
    the heightfield (legged_robot_config.py:52-77)."""

    hscale: float = 0.1
    cell_r: int = 80  # cells per sub-terrain (terrain_length / hscale)
    cell_c: int = 80
    border: int = 250  # border cells (border_size / hscale)
    num_rows: int = 10  # difficulty levels
    num_cols: int = 20  # terrain type columns
    proportions: Tuple[float, ...] = (0.1, 0.1, 0.35, 0.25, 0.2)
    curriculum: bool = True
    seed: int = 0
    # stairs_up step-height cap (m) — curriculum deviation; only a
    # POSITIVE value applies (grid.py applies the same guard), <= 0 =
    # reference-exact (float, not Optional, so the dataclass stays
    # hashable for jit closure)
    stairs_up_cap: float = -1.0

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.num_rows * self.cell_r + 2 * self.border,
                self.num_cols * self.cell_c + 2 * self.border)


def _thresholds(spec: ProcSpec):
    cum = list(np.cumsum(spec.proportions))
    return cum + [cum[-1] if cum else 0.0] * (7 - len(cum))


# ------------------------------------------------- closed-form sub-terrains
# Each takes per-point int32 (u, v) cell coords inside the sub-terrain and
# per-point float difficulty; all static sizes/truncations happen in python
# exactly as the numpy generators do them (heightfield.py), so the closed
# forms reproduce the same geometry.

def _pyramid_sloped(spec, u, v, slope, platform_size=3.0):
    """heightfield.pyramid_sloped: ramp to center + flat platform."""
    rows, cols, hs = spec.cell_r, spec.cell_c, spec.hscale
    cx, cy = (rows - 1) / 2.0, (cols - 1) / 2.0
    dx = 1.0 - jnp.abs(u - cx) / cx
    dy = 1.0 - jnp.abs(v - cy) / cy
    d = jnp.minimum(dx, dy)
    max_h = slope * (rows / 2.0) * hs
    plat = int(platform_size / hs / 2)
    r0, r1 = int(cx) - plat, int(cx) + plat
    c0, c1 = int(cy) - plat, int(cy) + plat
    # plateau value = max_h * (min d over the platform region): the region
    # corner farthest from center (same for min when slope>=0 / max when <0)
    d_corner = min(1.0 - max(abs(r0 - cx), abs(r1 - 1 - cx)) / cx,
                   1.0 - max(abs(c0 - cy), abs(c1 - 1 - cy)) / cy)
    in_plat = (u >= r0) & (u < r1) & (v >= c0) & (v < c1)
    return jnp.where(in_plat, max_h * d_corner, max_h * d)


def _rough_noise(spec, i, j, u, v, min_h=-0.05, max_h=0.05, step=0.005,
                 downsampled_scale=0.2):
    """heightfield.random_uniform: coarse grid of quantized uniform levels,
    nearest-upsampled — level index from the cell hash."""
    ds = max(int(downsampled_scale / spec.hscale), 1)
    n_levels = len(np.arange(min_h, max_h + step, step))
    uu = hash_unif(spec.seed + _S_ROUGH, i, j, u // ds, v // ds)
    idx = jnp.minimum((uu * n_levels).astype(jnp.int32), n_levels - 1)
    return min_h + idx.astype(jnp.float32) * step


def _pyramid_stairs(spec, u, v, step_height, step_width=0.31,
                    platform_size=3.0):
    """heightfield.pyramid_stairs: cell (u, v) sits on ring
    min(u, v, rows-1-u, cols-1-v) // sw, capped at the loop's iteration
    count (the while-loop shrink-by-sw recurrence in closed form)."""
    rows, cols, hs = spec.cell_r, spec.cell_c, spec.hscale
    sw = max(int(step_width / hs), 1)
    plat = max(int(platform_size / hs), 1)
    n_iter = 0
    r0, r1, c0, c1 = 0, rows, 0, cols
    while (r1 - r0) > plat and (c1 - c0) > plat:
        r0, r1, c0, c1 = r0 + sw, r1 - sw, c0 + sw, c1 - sw
        n_iter += 1
    k = jnp.minimum(
        jnp.minimum(u // sw, (rows - 1 - u) // sw),
        jnp.minimum(v // sw, (cols - 1 - v) // sw))
    k = jnp.minimum(k, n_iter)
    return step_height * k.astype(jnp.float32)


def _discrete_obstacles(spec, i, j, u, v, max_height, min_size=1.0,
                        max_size=2.0, num_rects=20, platform_size=3.0):
    """heightfield.discrete_obstacles: 20 hash-parameterized rectangles
    painted in order (later rects overwrite), then a flat center platform."""
    rows, cols, hs = spec.cell_r, spec.cell_c, spec.hscale
    h = jnp.zeros_like(max_height)
    # hoisted (seed, i, j) hash prefix: each of the 100 draws below is a
    # single mix instead of a 4-mix chain — bit-exact (see hash_prefix)
    pfx = hash_prefix(spec.seed + _S_RECT, i, j)
    for k in range(num_rects):
        uw = hash_unif_from(pfx, 8 * k + 0)
        ul = hash_unif_from(pfx, 8 * k + 1)
        ur = hash_unif_from(pfx, 8 * k + 2)
        uc = hash_unif_from(pfx, 8 * k + 3)
        uh = hash_unif_from(pfx, 8 * k + 4)
        w = ((uw * (max_size - min_size) + min_size) / hs).astype(jnp.int32)
        l = ((ul * (max_size - min_size) + min_size) / hs).astype(jnp.int32)
        r = (ur * jnp.maximum(rows - w, 1).astype(jnp.float32)
             ).astype(jnp.int32)
        c = (uc * jnp.maximum(cols - l, 1).astype(jnp.float32)
             ).astype(jnp.int32)
        hidx = jnp.minimum((uh * 4).astype(jnp.int32), 3)
        # heights table [-mh, -mh/2, mh/2, mh] without a gather
        sign = jnp.where(hidx >= 2, 1.0, -1.0)
        mag = jnp.where((hidx == 1) | (hidx == 2), 0.5, 1.0)
        rect_h = sign * mag * max_height
        inside = (u >= r) & (u < r + w) & (v >= c) & (v < c + l)
        h = jnp.where(inside, rect_h, h)
    plat = max(int(platform_size / hs / 2), 1)
    cx, cy = rows // 2, cols // 2
    in_plat = ((u >= cx - plat) & (u < cx + plat)
               & (v >= cy - plat) & (v < cy + plat))
    return jnp.where(in_plat, 0.0, h)


def _stepping_stones(spec, i, j, u, v, stone_size, stone_distance,
                     max_height=0.0, platform_size=4.0, depth=-10.0):
    """heightfield.stepping_stones: stone lattice over a trench; per-band
    row offsets (and per-stone heights when max_height > 0) from the hash."""
    rows, cols, hs = spec.cell_r, spec.cell_c, spec.hscale
    ss = jnp.maximum((stone_size / hs).astype(jnp.int32), 1)
    sd = (stone_distance / hs).astype(jnp.int32)
    pitch = ss + sd
    band = v // jnp.maximum(pitch, 1)
    on_col = (v - band * pitch) < ss
    off = (hash_unif(spec.seed + _S_STONE_OFF, i, j, band)
           * ss.astype(jnp.float32)).astype(jnp.int32) - ss
    urow = u - off
    stone_row = urow // jnp.maximum(pitch, 1)
    on_row = (urow - stone_row * pitch) < ss
    stone_h = jnp.where(
        max_height > 0.0,
        (hash_unif(spec.seed + _S_STONE_H, i, j, band, stone_row) * 2.0 - 1.0)
        * max_height,
        0.0)
    h = jnp.where(on_col & on_row, stone_h, depth)
    plat = max(int(platform_size / hs / 2), 1)
    cx, cy = rows // 2, cols // 2
    in_plat = ((u >= cx - plat) & (u < cx + plat)
               & (v >= cy - plat) & (v < cy + plat))
    return jnp.where(in_plat, 0.0, h)


def _gap(spec, u, v, gap_size, platform_size=3.0, depth=-8.0):
    rows, cols, hs = spec.cell_r, spec.cell_c, spec.hscale
    g = (gap_size / hs).astype(jnp.int32)
    p = max(int(platform_size / hs / 2), 1)
    cx, cy = rows // 2, cols // 2
    in_moat = ((u >= cx - p - g) & (u < cx + p + g)
               & (v >= cy - p - g) & (v < cy + p + g))
    in_plat = (u >= cx - p) & (u < cx + p) & (v >= cy - p) & (v < cy + p)
    return jnp.where(in_plat, 0.0, jnp.where(in_moat, depth, 0.0))


def _pit(spec, u, v, pit_depth, platform_size=4.0):
    rows, cols, hs = spec.cell_r, spec.cell_c, spec.hscale
    p = max(int(platform_size / hs / 2), 1)
    cx, cy = rows // 2, cols // 2
    in_plat = (u >= cx - p) & (u < cx + p) & (v >= cy - p) & (v < cy + p)
    return jnp.where(in_plat, -pit_depth, 0.0)


# ------------------------------------------------------------ full grid

def cell_height(spec: ProcSpec, gi, gj):
    """Height of global grid cell (gi, gj) — closed form, any int32 shape.

    Reproduces grid._make_subterrain's family selection and difficulty
    scalings (reference terrain.py:109-145) with hash-based randomness.
    Border cells and out-of-range indices are flat 0.
    """
    gi = jnp.asarray(gi, jnp.int32)
    gj = jnp.asarray(gj, jnp.int32)
    bi = gi - spec.border
    bj = gj - spec.border
    inside = ((bi >= 0) & (bi < spec.num_rows * spec.cell_r)
              & (bj >= 0) & (bj < spec.num_cols * spec.cell_c))
    # clamp so every branch sees valid sub-cell coords; masked at the end
    bi = jnp.clip(bi, 0, spec.num_rows * spec.cell_r - 1)
    bj = jnp.clip(bj, 0, spec.num_cols * spec.cell_c - 1)
    i = bi // spec.cell_r
    j = bj // spec.cell_c
    u = bi - i * spec.cell_r
    v = bj - j * spec.cell_c

    if spec.curriculum:
        difficulty = i.astype(jnp.float32) / max(spec.num_rows - 1, 1)
        choice = j.astype(jnp.float32) / spec.num_cols + 0.001
    else:
        du = hash_unif(spec.seed + _S_DIFF, i, j)
        didx = jnp.minimum((du * 3).astype(jnp.int32), 2)
        difficulty = 0.5 + didx.astype(jnp.float32) * 0.25 \
            + jnp.where(didx == 2, -0.1, 0.0)  # {0.5, 0.75, 0.9}
        choice = hash_unif(spec.seed + _S_CHOICE, i, j)

    slope = difficulty * 0.4
    step_height = 0.05 + 0.18 * difficulty
    disc_height = 0.05 + difficulty * 0.2
    stones_size = 1.5 * (1.05 - difficulty)
    stone_distance = jnp.where(difficulty == 0.0, 0.05, 0.1)
    gap_size = 1.0 * difficulty
    pit_depth = 1.0 * difficulty

    p = _thresholds(spec)
    h = jnp.zeros(jnp.broadcast_shapes(u.shape, v.shape), jnp.float32)

    # evaluate only families with probability mass (static pruning)
    if p[0] > 0.0:  # sloped pyramid (negative slope on the first half)
        s = jnp.where(choice < p[0] / 2, -slope, slope)
        hb = _pyramid_sloped(spec, u, v, s)
        h = jnp.where(choice < p[0], hb, h)
    if p[1] > p[0]:  # rough sloped pyramid
        hb = _pyramid_sloped(spec, u, v, slope) + _rough_noise(spec, i, j, u, v)
        h = jnp.where((choice >= p[0]) & (choice < p[1]), hb, h)
    if p[3] > p[1]:  # stairs (up below p[2], down below p[3])
        up_h = (jnp.minimum(step_height, spec.stairs_up_cap)
                if spec.stairs_up_cap > 0.0 else step_height)
        sh = jnp.where(choice < p[2], -up_h, step_height)
        hb = _pyramid_stairs(spec, u, v, sh)
        h = jnp.where((choice >= p[1]) & (choice < p[3]), hb, h)
    if p[4] > p[3]:  # discrete obstacles
        hb = _discrete_obstacles(spec, i, j, u, v, disc_height)
        h = jnp.where((choice >= p[3]) & (choice < p[4]), hb, h)
    if p[5] > p[4]:  # stepping stones
        hb = _stepping_stones(spec, i, j, u, v, stones_size, stone_distance)
        h = jnp.where((choice >= p[4]) & (choice < p[5]), hb, h)
    if p[6] > p[5]:  # gap
        hb = _gap(spec, u, v, gap_size)
        h = jnp.where((choice >= p[5]) & (choice < p[6]), hb, h)
    if len(spec.proportions) > 6:  # pit tail
        hb = _pit(spec, u, v, pit_depth)
        h = jnp.where(choice >= p[6], hb, h)
    return jnp.where(inside, h, 0.0)


class ProceduralTerrain:
    """TerrainGrid-compatible query interface over the closed form.

    Same contracts as terrain/grid.py: `height_at` (bilinear, contact),
    `height_scan_at` (min-of-3-neighbors, reference point_foot.py:1106-1111),
    `surface_at` (cell plane: height + unit normal), plus the curriculum
    metadata the env layer reads.  No tables — every query is VPU math, so
    it runs identically under jit, vmap and inside Pallas kernel bodies.
    """

    def __init__(self, spec: ProcSpec, env_origins: jax.Array,
                 terrain_length: float):
        self.spec = spec
        self.hscale = spec.hscale
        self.border = spec.border * spec.hscale
        self.env_origins = env_origins
        self.num_levels = spec.num_rows
        self.num_types = spec.num_cols
        self.terrain_length = terrain_length

    def _cell(self, x, y):
        R, C = self.spec.shape
        px = jnp.clip((x + self.border) / self.hscale, 0.0, R - 2.0)
        py = jnp.clip((y + self.border) / self.hscale, 0.0, C - 2.0)
        x0 = jnp.floor(px).astype(jnp.int32)
        y0 = jnp.floor(py).astype(jnp.int32)
        return x0, y0, px, py

    def height_at(self, x, y):
        x0, y0, px, py = self._cell(x, y)
        fx = px - x0
        fy = py - y0
        h00 = cell_height(self.spec, x0, y0)
        h10 = cell_height(self.spec, x0 + 1, y0)
        h01 = cell_height(self.spec, x0, y0 + 1)
        h11 = cell_height(self.spec, x0 + 1, y0 + 1)
        return (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
                + h01 * (1 - fx) * fy + h11 * fx * fy)

    def height_scan_at(self, x, y):
        x0, y0, _, _ = self._cell(x, y)
        return jnp.minimum(
            jnp.minimum(cell_height(self.spec, x0, y0),
                        cell_height(self.spec, x0 + 1, y0)),
            cell_height(self.spec, x0, y0 + 1))

    def surface_at(self, x, y):
        x0, y0, px, py = self._cell(x, y)
        h00 = cell_height(self.spec, x0, y0)
        gx = (cell_height(self.spec, x0 + 1, y0) - h00) / self.hscale
        gy = (cell_height(self.spec, x0, y0 + 1) - h00) / self.hscale
        h = (h00 + gx * (px - x0) * self.hscale
             + gy * (py - y0) * self.hscale)
        n = jnp.stack([-gx, -gy, jnp.ones_like(gx)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h, n


def materialize(spec: ProcSpec) -> np.ndarray:
    """Evaluate the closed form over the whole grid -> height table.

    Bit-identical to what the query path computes (same function), so it
    serves as the rendering/origins/parity table."""
    R, C = spec.shape
    gi = jnp.arange(R, dtype=jnp.int32)[:, None]
    gj = jnp.arange(C, dtype=jnp.int32)[None, :]
    # evaluate in row blocks to bound peak memory (R x C x branches)
    rowsz = 128
    out = np.zeros((R, C), np.float32)
    f = jax.jit(lambda a, b: cell_height(spec, a, b))
    for r0 in range(0, R, rowsz):
        out[r0:r0 + rowsz] = np.asarray(f(gi[r0:r0 + rowsz], gj))
    return out


def build_procedural(cfg, seed: int = 0) -> ProceduralTerrain:
    """ProceduralTerrain from a TerrainCfg (grid.build_terrain analogue:
    same curriculum layout, env origins from the materialized table)."""
    hs = cfg.horizontal_scale
    spec = ProcSpec(
        hscale=hs,
        cell_r=int(cfg.terrain_length / hs),
        cell_c=int(cfg.terrain_width / hs),
        border=int(cfg.border_size / hs),
        num_rows=cfg.num_rows,
        num_cols=cfg.num_cols,
        proportions=tuple(cfg.terrain_proportions),
        curriculum=cfg.curriculum,
        seed=seed,
        stairs_up_cap=(-1.0 if cfg.stairs_up_height_cap is None
                       else float(cfg.stairs_up_height_cap)),
    )
    table = materialize(spec)
    origins = np.zeros((cfg.num_rows, cfg.num_cols, 3), np.float32)
    w = max(int(0.5 / hs), 1)
    for i in range(cfg.num_rows):
        for j in range(cfg.num_cols):
            cx = spec.border + i * spec.cell_r + spec.cell_r // 2
            cy = spec.border + j * spec.cell_c + spec.cell_c // 2
            z = table[cx - w:cx + w, cy - w:cy + w].max()
            origins[i, j] = ((cx - spec.border) * hs,
                             (cy - spec.border) * hs, z)
    return ProceduralTerrain(spec, jnp.asarray(origins), cfg.terrain_length)
