"""PointTriplaneOcc: occupancy fine-tune of the point family.

Rebuild of ``mmdet3d/models/detectors/point_triplane_occ.py`` (:22-508):
same roi / sample / CE pattern as TriplaneOcc but the latent is the
list-of-planes from the point projector, sampled with per-axis grid_size
normalization (:407-440).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..core.geometry import occupancy_roi
from ..data.batch import Batch
from ..ops.sampling import (
    sample_triplane_list,
    sample_triplane_list_grid_packed,
)
from .builder import build
from .point_family import point_to_cam, voxelize_points


class PointTriplaneOcc(nn.Module):
    """Attributes mirror ``point_triplane_occ.py:40-79``."""

    point_triplane_projector: dict
    camera_encoder: dict
    triplane_encoder: dict
    fpn: dict
    decoder: dict
    voxel_size: tuple = (0.5, 0.5, 0.5)
    occ_range: tuple = (-25, -25, -5, 25, 25, 3)
    triplane_range: tuple = (-25, -25, -5, 25, 25, 3)
    triplane_voxel_size: tuple = (0.4, 0.4, 0.1)
    class_names: Optional[tuple] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.projector = build(
            self.point_triplane_projector,
            dtype=self.dtype,
            name="point_triplane_projector",
        )
        self.camera_net = build(
            self.camera_encoder, dtype=self.dtype, name="camera_encoder"
        )
        self.triplane_net = build(
            self.triplane_encoder, dtype=self.dtype, name="triplane_encoder"
        )
        self.fpn_net = build(self.fpn, dtype=self.dtype, name="fpn")
        self.decoder_net = build(self.decoder, dtype=self.dtype, name="decoder")
        self.occ_bounds, self.ref_3d = occupancy_roi(
            self.occ_range, self.voxel_size
        )

    def __call__(self, batch: Batch, deterministic: bool = True):
        """Returns ``(logits, occ_target, losses)``
        (``point_triplane_occ.py:312-384``)."""
        B, N, H, W, _ = batch.img.shape
        grid_idx, valid = voxelize_points(
            batch.points,
            batch.points_valid,
            self.triplane_range,
            self.triplane_voxel_size,
        )
        img_feats = self.camera_net(
            batch.img.reshape(B * N, H, W, 3), deterministic=deterministic
        )
        img_feats = img_feats.reshape(B, N, *img_feats.shape[1:])
        cam_pt = point_to_cam(
            batch.points, valid, img_feats, batch.lidar2img, batch.cam_aug,
            (H, W),
        )
        tpv = self.projector(
            batch.points, grid_idx, valid, cam_pt, train=not deterministic
        )
        planes = []
        for tp in tpv:
            scales = self.triplane_net(tp, deterministic=deterministic)
            planes.append(self.fpn_net(scales, train=not deterministic))

        grid_size = tuple(self.point_triplane_projector["grid_size"])
        from .heads import OccMlpHead

        if isinstance(self.decoder_net, OccMlpHead):
            # separable center grid -> factorized z-packed readout +
            # block-diagonal head (see triplane_occ.voxel_logits)
            Z = self.ref_3d.shape[2]
            packed = sample_triplane_list_grid_packed(
                planes,
                self.ref_3d[:, 0, 0, 0],
                self.ref_3d[0, :, 0, 1],
                self.ref_3d[0, 0, :, 2],
                self.triplane_range,
                grid_size,
                self.triplane_voxel_size,
            )
            logits = self.decoder_net(packed, packed_z=Z)
        else:
            ref = jnp.broadcast_to(
                jnp.asarray(self.ref_3d)[None], (B, *self.ref_3d.shape)
            )
            voxel_feat = sample_triplane_list(
                planes, ref, self.triplane_range, grid_size,
                self.triplane_voxel_size,
            )  # (B, X, Y, Z, C)
            logits = self.decoder_net(voxel_feat)
        losses = {}
        occ = None
        if batch.occupancy is not None:
            x0, y0, x1, y1 = self.occ_bounds
            occ = batch.occupancy[:, x0 : x1 + 1, y0 : y1 + 1]
            losses["loss"] = self.decoder_net.loss(logits, occ)
        return logits, occ, losses
