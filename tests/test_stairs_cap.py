"""stairs_up height-cap deviation (docs/ROUND4_NOTES.md §2): opt-in cap
on the stairs_up step height, identical semantics in the numpy table and
the closed-form procedural paths; default None stays reference-exact."""

import dataclasses

import jax
import numpy as np
import pytest

from pointfoot_tpu.terrain.grid import TerrainCfg, build_terrain
from pointfoot_tpu.terrain.procedural import build_procedural

CAP = 0.12


N_RINGS = 8  # (80-cell cell − 30-cell platform)/2 // 3-cell ring width


def _stairs_up_step(terrain, cfg, level, col):
    """Measured per-ring step height of the stairs cell (level, col):
    total center-to-rim height range over the ring count (height_at
    interpolates each riser over ~2 hscale, so adjacent-sample jumps
    under-read the step; the plateau-to-plateau range does not)."""
    ox, oy = np.asarray(terrain.env_origins[level, col])[:2]
    xs = np.linspace(ox, ox + 0.5 * cfg.terrain_length - 0.2, 160)
    ys = np.full_like(xs, oy)
    h = np.asarray(terrain.height_at(jax.numpy.asarray(xs),
                                     jax.numpy.asarray(ys)))
    return float(h.max() - h.min()) / N_RINGS


@pytest.mark.parametrize("build,kind", [(build_terrain, "table"),
                                        (build_procedural, "procedural")])
def test_stairs_up_cap_applies(build, kind):
    base = TerrainCfg(num_rows=10, num_cols=20)
    col, level = 6, 9  # stairs_up column at max difficulty (step 0.23 m)
    ref = build(base, seed=0)
    capped = build(dataclasses.replace(base, stairs_up_height_cap=CAP),
                   seed=0)
    s_ref = _stairs_up_step(ref, base, level, col)
    s_cap = _stairs_up_step(capped, base, level, col)
    # reference-exact path reaches ~0.23 m at difficulty 1
    assert s_ref > 0.2, (kind, s_ref)
    # range/N_RINGS over-reads by up to ~1 ring of cross-cell edge
    # interpolation; 1.2x still cleanly separates 0.12 from 0.23
    assert s_cap <= CAP * 1.2, (kind, s_cap)
    # stairs_DOWN (col 12) is untouched by the cap
    d_ref = _stairs_up_step(ref, base, level, 12)
    d_cap = _stairs_up_step(capped, base, level, 12)
    np.testing.assert_allclose(d_cap, d_ref, atol=1e-5)
    # low levels below the cap are untouched on the capped path
    lo_ref = _stairs_up_step(ref, base, 1, col)
    lo_cap = _stairs_up_step(capped, base, 1, col)
    np.testing.assert_allclose(lo_cap, lo_ref, atol=1e-5)
