"""Terrain generator + grid tests (terrain/heightfield.py, terrain/grid.py).

Deterministic golden-hash style checks the reference never had (SURVEY.md §4)
plus semantic checks of each of the 8 sub-terrain families
(reference utils/terrain.py:109-187).
"""

import numpy as np
import pytest

from pointfoot_tpu.terrain import heightfield as hf
from pointfoot_tpu.terrain.grid import TerrainCfg, build_terrain, flat_grid


def test_pyramid_sloped_monotone_to_center():
    a = hf.pyramid_sloped(np.zeros((80, 80)), 0.1, slope=0.4, platform_size=1.0)
    # center higher than edges for positive slope
    assert a[40, 40] > a[0, 0]
    assert a[0, 0] == 0.0
    inv = hf.pyramid_sloped(np.zeros((80, 80)), 0.1, slope=-0.4)
    assert inv[40, 40] < inv[0, 0]


def test_random_uniform_bounds_and_determinism():
    rng = np.random.default_rng(7)
    a = hf.random_uniform(np.zeros((50, 50)), 0.1, rng, -0.05, 0.05, 0.005, 0.2)
    assert a.min() >= -0.0501 and a.max() <= 0.0501
    b = hf.random_uniform(np.zeros((50, 50)), 0.1,
                          np.random.default_rng(7), -0.05, 0.05, 0.005, 0.2)
    np.testing.assert_array_equal(a, b)


def test_pyramid_stairs_step_heights():
    a = hf.pyramid_stairs(np.zeros((80, 80)), 0.1, step_width=0.31,
                          step_height=0.1, platform_size=1.0)
    levels = np.unique(np.round(a, 6))
    # monotone staircase with ~0.1 increments
    diffs = np.diff(levels)
    np.testing.assert_allclose(diffs, 0.1, atol=1e-9)
    assert a[40, 40] == levels[-1]


def test_discrete_obstacles_center_platform():
    rng = np.random.default_rng(0)
    a = hf.discrete_obstacles(np.zeros((80, 80)), 0.1, rng, 0.15)
    assert a[40, 40] == 0.0
    assert np.abs(a).max() <= 0.15 + 1e-9


def test_stepping_stones_trench():
    rng = np.random.default_rng(1)
    a = hf.stepping_stones(np.zeros((80, 80)), 0.1, rng, stone_size=1.0,
                           stone_distance=0.3, platform_size=2.0)
    assert a.min() == -10.0  # trench
    assert a[40, 40] == 0.0  # platform


def test_gap_and_pit():
    g = hf.gap(np.zeros((80, 80)), 0.1, gap_size=0.6, platform_size=1.0)
    assert g[40, 40] == 0.0
    assert g.min() == -8.0
    p = hf.pit(np.zeros((80, 80)), 0.1, depth=0.7, platform_size=1.0)
    assert p[40, 40] == -0.7


def test_build_terrain_grid_shape_and_origins():
    cfg = TerrainCfg(num_rows=4, num_cols=5, terrain_length=8.0,
                     terrain_width=8.0, border_size=5.0, curriculum=True)
    grid = build_terrain(cfg, seed=0)
    assert grid.env_origins.shape == (4, 5, 3)
    R = 4 * 80 + 2 * 50
    C = 5 * 80 + 2 * 50
    assert grid.height.shape == (R, C)
    # deterministic
    grid2 = build_terrain(cfg, seed=0)
    np.testing.assert_array_equal(np.asarray(grid.height),
                                  np.asarray(grid2.height))


def test_default_proportions_have_no_pits():
    """With the reference's default 5 proportions (sum 1.0), the gap/pit
    tail is unreachable (SURVEY quirk #5): no cell may contain the -8 m
    moat or deep trench, and stairs should dominate (0.35+0.25 mass)."""
    cfg = TerrainCfg(num_rows=4, num_cols=10, border_size=2.0,
                     terrain_length=4.0, terrain_width=4.0, curriculum=True)
    grid = build_terrain(cfg, seed=0)
    h = np.asarray(grid.height)
    assert h.min() > -3.0, h.min()  # no -8/-10 gap/trench flooring


def test_extended_proportions_reach_gap_and_pit():
    cfg = TerrainCfg(num_rows=2, num_cols=8, border_size=2.0,
                     terrain_length=4.0, terrain_width=4.0, curriculum=True,
                     terrain_proportions=(0.1, 0.1, 0.2, 0.1, 0.1, 0.1,
                                          0.2, 0.1))
    grid = build_terrain(cfg, seed=0)
    h = np.asarray(grid.height)
    assert h.min() <= -5.0  # gap moats present


def test_height_sampling_consistency():
    import jax.numpy as jnp

    cfg = TerrainCfg(num_rows=2, num_cols=2, border_size=5.0, curriculum=True)
    grid = build_terrain(cfg, seed=3)
    # bilinear sample at cell centers == stored heights
    h = np.asarray(grid.height)
    x = (np.arange(20, 40) * grid.hscale) - grid.border
    y = (np.arange(30, 50) * grid.hscale) - grid.border
    got = np.asarray(grid.height_at(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, h[20:40, 30:50].diagonal(), atol=1e-5)
    # min-of-3 scan is conservative: <= bilinear at grid nodes
    scan = np.asarray(grid.height_scan_at(jnp.asarray(x), jnp.asarray(y)))
    assert np.all(scan <= got + 1e-5)


def test_flat_grid():
    g = flat_grid(size=20.0, num_levels=2, num_types=2, spacing=3.0)
    assert float(g.height_at(1.0, 1.0)) == 0.0
    assert np.asarray(g.env_origins).shape == (2, 2, 3)
