"""Static-shape batch container.

The reference feeds models ragged python structures (DataContainer lists,
per-sample point tensors, ``img_metas`` dicts —
``mmdet3d/datasets/pipelines/formating.py:187-204``).  The TPU rebuild
replaces all of it with one fixed-shape pytree: padded point sets carry a
validity mask, camera metadata is dense arrays, so the entire train step
jits once and never re-traces.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax

from ..core.geometry import CameraAug


@dataclasses.dataclass
class Batch:
    """One training/eval batch (all leaves device arrays, channels-last).

    Attributes:
        img: ``(B, N_cam, H, W, 3)`` normalized images.
        range_image: ``(B, 32, 1024, 1)``.
        range_points: ``(B, 32, 1024, 3)`` per-pixel 3-D points.
        lidar2img: ``(B, N_cam, 4, 4)``.
        cam_aug: per-camera aug parameters.
        points: ``(B, P, D)`` padded LiDAR points (D=11 with SAM labels:
            x, y, z, intensity, ring, 6 per-camera cluster ids —
            ``configs/nuscenes_surf_sam.py:38-43``).
        points_valid: ``(B, P)`` bool.
        occupancy: ``(B, 200, 200, 16)`` int labels (255 = ignore) or None.
        elevation / elevation_mask: ``(B, 100, 100)`` or None.
    """

    img: jax.Array
    range_image: jax.Array
    range_points: jax.Array
    lidar2img: jax.Array
    cam_aug: CameraAug
    points: Optional[jax.Array] = None
    points_valid: Optional[jax.Array] = None
    occupancy: Optional[jax.Array] = None
    elevation: Optional[jax.Array] = None
    elevation_mask: Optional[jax.Array] = None

    @property
    def batch_size(self) -> int:
        return self.img.shape[0]

    @property
    def num_cams(self) -> int:
        return self.img.shape[1]


jax.tree_util.register_dataclass(
    Batch,
    data_fields=[
        "img",
        "range_image",
        "range_points",
        "lidar2img",
        "cam_aug",
        "points",
        "points_valid",
        "occupancy",
        "elevation",
        "elevation_mask",
    ],
    meta_fields=[],
)

# allow Batch inside jax.export artifacts (tools/export.py); no
# auxdata — the field set is static
try:
    from jax import export as _jexport

    _jexport.register_pytree_node_serialization(
        Batch,
        serialized_name="efficient_multimodal_perception_tpu.Batch",
        serialize_auxdata=lambda aux: b"",
        deserialize_auxdata=lambda b: (),
    )
except (ImportError, AttributeError, ValueError):  # older jax / re-run
    pass
