"""Analytic terrain height functions for closed-loop gait/MPC testing.

These are pure `height_fn(x, y) -> z` callables (the physics/contact.py
contract — finite-difference normals are derived automatically, no grid
needed), parameterized by a compact `kind:amp` spec so diagnostics, GIF
rendering and tests share one envelope vocabulary.  All fields are 0 at
the origin so the default spawn height works unchanged.  For gridded
curriculum terrain use terrain/grid.py (TerrainGrid.height_at satisfies
the same contract).
"""

from __future__ import annotations

import jax.numpy as jnp

FLAT = lambda x, y: jnp.zeros_like(jnp.asarray(x, jnp.float32))


def make_terrain(spec: str):
    """`kind:amp` with kind in {flat, slope, wave, bumps, step}.

    slope:g  — ramp of grade g starting 0.5 m ahead
    wave:a   — smooth rolling field, amplitude a [m]
    bumps:a  — two-octave uneven field, amplitude a [m]
    step:h   — single step of height h (down if negative) 1 m ahead
    """
    if not spec or spec == "flat":
        return FLAT
    kind, _, a = spec.partition(":")
    a = float(a or 0.05)
    if kind == "slope":
        return lambda x, y: a * jnp.maximum(
            jnp.asarray(x, jnp.float32) - 0.5, 0.0)
    if kind == "wave":
        return lambda x, y: a * jnp.sin(
            2 * jnp.pi * jnp.asarray(x, jnp.float32) / 1.2) * jnp.sin(
            2 * jnp.pi * jnp.asarray(y, jnp.float32) / 1.7)
    if kind == "bumps":
        def f(x, y):
            x = jnp.asarray(x, jnp.float32)
            y = jnp.asarray(y, jnp.float32)
            z = (0.6 * jnp.sin(5.2 * x + 0.3) * jnp.sin(4.1 * y + 1.1)
                 + 0.4 * jnp.sin(9.7 * x + 2.0) * jnp.sin(8.3 * y + 0.5))
            z0 = (0.6 * jnp.sin(0.3) * jnp.sin(1.1)
                  + 0.4 * jnp.sin(2.0) * jnp.sin(0.5))
            return a * (z - z0)
        return f
    if kind == "step":
        return lambda x, y: a * (jnp.asarray(x, jnp.float32) > 1.0)
    raise ValueError(f"unknown terrain spec {spec!r}")


class AnalyticTerrain:
    """Adapter giving an analytic fn the TerrainGrid `.height_at` face
    (e.g. for utils/visualizer.render_frame's ground-surface plot)."""

    def __init__(self, fn):
        self.height_at = fn
