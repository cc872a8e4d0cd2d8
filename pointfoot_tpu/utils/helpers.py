"""CLI / checkpoint-resolution helpers.

Replaces reference utils/helpers.py: `get_load_path` latest-run resolution
(:103-125) for Orbax checkpoint directories (model_<it>/); config->dict
bridging is unnecessary (configs are dataclasses).
"""

from __future__ import annotations

import os
import re


def get_load_path(root: str, load_run: str = "", checkpoint: str = "") -> str:
    """Resolve the checkpoint to load (reference helpers.py:103-125):
    latest run directory by sort order, latest model_<it> inside it."""
    if not os.path.isdir(root):
        raise FileNotFoundError(f"no runs in {root}")
    if load_run in ("", "-1", -1, None):
        runs = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))
        if not runs:
            raise FileNotFoundError(f"no runs in {root}")
        load_run = runs[-1]
    run_dir = os.path.join(root, load_run)
    if checkpoint in ("", "-1", -1, None):
        models = [d for d in os.listdir(run_dir)
                  if re.fullmatch(r"model_\d+", d)]
        if not models:
            raise FileNotFoundError(f"no checkpoints in {run_dir}")
        models.sort(key=lambda s: int(s.split("_")[1]))
        checkpoint = models[-1]
    else:
        checkpoint = f"model_{checkpoint}"
    return os.path.join(run_dir, checkpoint)


def class_to_dict(obj) -> dict:
    """Dataclass/namespace -> nested dict (reference helpers.py:41-56)."""
    import dataclasses

    if dataclasses.is_dataclass(obj):
        return {f.name: class_to_dict(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return type(obj)(class_to_dict(x) for x in obj)
    return obj
