"""Config system: python-module configs + dotted CLI overrides.

Mirrors the reference's mmcv ``Config.fromfile`` + ``--cfg-options``
semantics (``tools/train.py:62-71,101-103``): each config is a python
module in this package exposing ``get_config() -> dict``; config names
match the reference's (``nuscenes_range``, ``triplane_range_cam``,
``triplane_surf_sam``, ``triplane_occ``, ``triplane_elev``,
``point_triplane``, ``point_triplane_occ``).  ``_base_`` composition is
plain python imports inside the config modules.
"""

from __future__ import annotations

import ast
import copy
import importlib

CONFIG_NAMES = (
    "nuscenes_range",
    "triplane_range_cam",
    "triplane_surf_sam",
    "triplane_occ",
    "triplane_elev",
    "point_triplane",
    "point_triplane_occ",
)


def get_config(name: str) -> dict:
    """Load a named config (accepts a bare name or ``pkg.module``)."""
    name = name.replace(".py", "").split("/")[-1]
    mod = importlib.import_module(f"{__name__}.{name}")
    return copy.deepcopy(mod.get_config())


def apply_overrides(cfg: dict, options) -> dict:
    """Apply ``key.sub=value`` overrides (``--cfg-options`` semantics)."""
    for opt in options or []:
        key, _, raw = opt.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return cfg
