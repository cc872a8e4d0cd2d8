"""Procedural (gather-free) terrain vs the table representation.

terrain/procedural.py re-derives the curriculum grid as a closed form of
the cell index (hash-based randomness).  Contracts pinned here:

1. query-path equivalence: ProceduralTerrain.{height_at, height_scan_at,
   surface_at} match a TerrainGrid built from `materialize()` of the SAME
   spec — the closed form and the table are one function;
2. structural parity with the numpy generators (heightfield.py): same
   family geometry per curriculum column (slope grade, stair step height
   and count, obstacle height levels, platform flat at origin);
3. determinism: same spec -> same terrain; different seed -> different;
4. the env runs end-to-end on procedural terrain (scan, contact,
   curriculum respawn all through the closed form).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointfoot_tpu.terrain.grid import TerrainCfg, TerrainGrid, _derived_fields
from pointfoot_tpu.terrain.procedural import (
    ProcSpec, build_procedural, cell_height, materialize)


@pytest.fixture(scope="module")
def rough():
    cfg = TerrainCfg()  # default pointfoot_rough curriculum grid
    pt = build_procedural(cfg, seed=0)
    table = materialize(pt.spec)
    min3, slope = _derived_fields(table, pt.spec.hscale)
    tg = TerrainGrid(
        height=jnp.asarray(table), min3=min3, slope=slope,
        hscale=pt.spec.hscale, border=cfg.border_size,
        env_origins=pt.env_origins, num_levels=pt.spec.num_rows,
        num_types=pt.spec.num_cols, terrain_length=cfg.terrain_length)
    return pt, tg, table


def test_queries_match_materialized_table(rough):
    pt, tg, _ = rough
    x = jax.random.uniform(jax.random.PRNGKey(0), (4000,),
                           minval=-30.0, maxval=90.0)
    y = jax.random.uniform(jax.random.PRNGKey(1), (4000,),
                           minval=-30.0, maxval=170.0)
    np.testing.assert_allclose(np.asarray(pt.height_at(x, y)),
                               np.asarray(tg.height_at(x, y)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pt.height_scan_at(x, y)),
                               np.asarray(tg.height_scan_at(x, y)),
                               atol=1e-5)
    ha, na = pt.surface_at(x, y)
    hb, nb = tg.surface_at(x, y)
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(na), np.asarray(nb), atol=1e-4)


def test_family_structure(rough):
    """Per-column geometry mirrors heightfield.py's generators at the same
    difficulty scalings (reference terrain.py:109-145)."""
    pt, _, table = rough
    sp = pt.spec
    b, cr, cc = sp.border, sp.cell_r, sp.cell_c

    def cell(i, j):
        return table[b + i * cr:b + (i + 1) * cr,
                     b + j * cc:b + (j + 1) * cc]

    # column 0/1: sloped pyramid, negative then positive (choice < p0/2).
    # Plateau value = max_h * d at the platform-region corner, with the
    # platform extent computed via the SAME float-truncating int() chain
    # as heightfield.pyramid_sloped (int(3.0/0.1/2) == 14, not 15).
    d5 = 5 / 9  # difficulty at row 5
    max_h = d5 * 0.4 * (cr / 2) * sp.hscale
    cx = (cr - 1) / 2
    plat = int(3.0 / sp.hscale / 2)
    r0, r1 = int(cx) - plat, int(cx) + plat
    d_corner = 1.0 - max(abs(r0 - cx), abs(r1 - 1 - cx)) / cx
    plateau = max_h * d_corner
    # platform (center) sits at the region-corner ramp value; the overall
    # extremum is slightly deeper, just outside the int()-asymmetric
    # platform square — same as the numpy generator
    assert abs(cell(5, 0)[cr // 2, cr // 2] + plateau) < 1e-4
    assert abs(cell(5, 1)[cr // 2, cr // 2] - plateau) < 1e-4
    assert cell(5, 0).min() >= -max_h - 1e-4
    assert cell(5, 1).max() <= max_h + 1e-4
    # mirror symmetry between the inverted and upright slope columns
    assert abs(cell(5, 0).min() + cell(5, 1).max()) < 1e-5
    # rough slope column adds +-0.05 quantized noise on the ramp: its peak
    # must sit within the noise band of the plain ramp's peak
    rough_col = cell(5, 3)
    ramp_peak = cell(5, 1).max()
    assert ramp_peak - 0.05 - 1e-3 <= rough_col.max() <= \
        ramp_peak + 0.05 + 1e-3
    # stairs columns: step height 0.05 + 0.18 * difficulty, 9 rings
    sh = 0.05 + 0.18 * d5
    stairs_dn, stairs_up = cell(5, 5), cell(5, 12)
    assert abs(stairs_up.max() - 9 * sh) < 1e-4
    assert abs(stairs_dn.min() + 9 * sh) < 1e-4
    # step quantization: all heights are integer multiples of sh
    lv = stairs_up / sh
    assert np.abs(lv - np.round(lv)).max() < 1e-4
    # discrete obstacles: heights in {-h, -h/2, 0, h/2, h}
    dh = 0.05 + d5 * 0.2
    disc = cell(5, 17)
    lv = disc / (dh / 2)
    assert np.abs(lv - np.round(lv)).max() < 1e-4
    assert disc.max() <= dh + 1e-6 and disc.min() >= -dh - 1e-6
    # every cell has a platform flat at the spawn (center) — row 9 hardest.
    # Rough-slope columns are exempt: random_uniform noise is added over
    # the whole cell including the platform (heightfield.py order).
    from pointfoot_tpu.terrain.procedural import _thresholds

    p = _thresholds(sp)
    for j in range(sp.num_cols):
        choice = j / sp.num_cols + 0.001
        if p[0] <= choice < p[1]:
            continue
        c = cell(9, j)
        ctr = c[cr // 2 - 5:cr // 2 + 5, cc // 2 - 5:cc // 2 + 5]
        assert ctr.std() < 1e-6, f"column {j} spawn not flat"


def test_determinism_and_seed(rough):
    pt, _, _ = rough
    sp = pt.spec
    gi = jnp.arange(300, 340, dtype=jnp.int32)
    gj = jnp.arange(400, 440, dtype=jnp.int32)[:, None]
    a = cell_height(sp, gi, gj)
    b = cell_height(sp, gi, gj)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sp2 = ProcSpec(**{**sp.__dict__, "seed": 7})
    c = cell_height(sp2, gi, gj)
    # rough-noise / obstacle columns must differ under a different seed
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0.0


def test_env_runs_on_procedural_terrain(monkeypatch):
    from pointfoot_tpu.utils.registry import task_registry

    env = task_registry.make_env(
        "pointfoot_rough", num_envs=8,
        cfg_patch=dict(terrain=dict(procedural=True)))
    from pointfoot_tpu.terrain.procedural import ProceduralTerrain

    assert isinstance(env.terrain, ProceduralTerrain)
    state = env.init_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(5):
        state, out = step(state, 0.1 * jnp.ones((8, 6)))
    assert np.isfinite(np.asarray(out.obs)).all()
    assert np.isfinite(np.asarray(out.reward)).all()
    # height scan actually varies over terrain (not flat-zero fallback)
    hs = env._measured_heights(state.physics)
    assert np.asarray(hs).std() > 1e-4


def test_hash_prefix_bit_exact():
    """hash_prefix/hash_unif_from must reproduce hash_unif(seed, i, j, d)
    EXACTLY — the hoisted prefix is a pure refactor of the mix chain, and
    the terrain realization every committed policy trained on rides it."""
    import numpy as np
    from pointfoot_tpu.terrain.procedural import (
        hash_prefix, hash_unif, hash_unif_from)

    i = jnp.arange(-3, 50, 7)
    j = jnp.arange(0, 53, 7) * 3
    for seed in (0, 2, 12345):
        pfx = hash_prefix(seed, i, j)
        for d in (0, 1, 7, 158):
            a = np.asarray(hash_unif(seed, i, j, d))
            b = np.asarray(hash_unif_from(pfx, d))
            np.testing.assert_array_equal(a, b)
