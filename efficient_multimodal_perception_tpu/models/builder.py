"""Registry-style model construction from config dicts.

Mirrors the reference's mmcv registry semantics
(``mmdet3d/models/builder.py:23-69``): configs are nested dicts with a
``type`` key naming the component; the builder resolves the class and
passes the rest as kwargs.  Type names match the reference's registry
names so configs read the same.
"""

from __future__ import annotations

import copy
import functools
from typing import Any, Dict

_REGISTRY: Dict[str, Any] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def get_class(name: str):
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown component type {name!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def build(cfg: dict, **extra):
    """Instantiate a registered component from ``{'type': ..., **kwargs}``."""
    cfg = copy.deepcopy(dict(cfg))
    name = cfg.pop("type")
    cls = get_class(name)
    cfg.update(extra)
    return cls(**cfg)


def _register_all():
    """Populate the registry (deferred imports to avoid cycles)."""
    from .convnext import MaskConvNeXt
    from .mit import MixVisionTransformer, MixVisionTransformerHead
    from .heads import (
        ElevUNetHead,
        OccMlpHead,
        PointMlpHead,
        ResnetBasicBlockHead,
    )
    from .interpnet import InterpNet
    from .joint_encoder import JointEncoder
    from .fpn import GeneralizedLSSFPN
    from .point_projector import PointTriplaneProjector
    from .triplane_mae import TriplaneMAE
    from .triplane_occ import TriplaneOcc
    from .triplane_elev import TriplaneElev
    from .point_triplane import PointTriplane
    from .point_triplane_occ import PointTriplaneOcc

    _REGISTRY.update(
        {
            "MaskConvNeXt": MaskConvNeXt,
            "MaskConvNeXtV2": MaskConvNeXt,  # split-forward is built in
            "MixVisionTransformer": MixVisionTransformer,
            "MixVisionTransformerHigh": functools.partial(
                MixVisionTransformer, high=True
            ),
            "MixVisionTransformerHead": MixVisionTransformerHead,
            "JointEncoder": JointEncoder,
            "InterpNet": InterpNet,
            "Mlp": OccMlpHead,
            "PointMlp": PointMlpHead,
            "Unet": ElevUNetHead,
            "ResnetBasicBlock": ResnetBasicBlockHead,
            "GeneralizedLSSFPN": GeneralizedLSSFPN,
            "PointTriplaneProjector": PointTriplaneProjector,
            "TriplaneMAE": TriplaneMAE,
            "TriplaneOcc": TriplaneOcc,
            "TriplaneElev": TriplaneElev,
            "PointTriplane": PointTriplane,
            "PointTriplaneOcc": PointTriplaneOcc,
        }
    )


def build_model(cfg: dict, **extra):
    """Build a task model (detector-level) from its config dict."""
    if not _REGISTRY:
        _register_all()
    return build(cfg, **extra)
