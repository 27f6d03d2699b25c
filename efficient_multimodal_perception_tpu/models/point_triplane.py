"""PointTriplane: point-family self-supervised pretraining.

Rebuild of ``mmdet3d/models/detectors/point_triplane.py`` (:22-534):
raw points -> per-point MLP + lifted camera features -> segment-max axis
pools (projector) -> per-plane ConvNeXt+FPN -> list-of-planes triplane ->
reconstruction / contrastive / surface losses.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.batch import Batch
from ..losses.sup_con import sup_con_loss
from ..ops.sampling import sample_triplane_list
from .builder import build
from .point_family import cam_rec_feat, point_to_cam, voxelize_points


class PointTriplane(nn.Module):
    """Attributes mirror ``point_triplane.py:41-56``."""

    point_triplane_projector: dict
    camera_encoder: dict
    triplane_encoder: dict
    fpn: dict
    lidar_decoder: Optional[dict] = None
    camera_decoder: Optional[dict] = None
    surface_decoder: Optional[dict] = None
    color_decoder: Optional[dict] = None
    contrastive: bool = False
    voxel_size: tuple = (0.4, 0.4, 0.1)
    pc_range: tuple = (-25, -25, -5, 25, 25, 3)
    max_sam_clusters: int = 256
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
        if self.camera_decoder is not None:
            self.camera_dec = build(
                self.camera_decoder, dtype=self.dtype, name="camera_decoder"
            )
        if self.surface_decoder is not None:
            self.surface_dec = build(
                self.surface_decoder, dtype=self.dtype, name="surface_decoder"
            )

    def encode_planes(self, batch: Batch, deterministic: bool = True):
        """points+images -> list of 96-ch planes
        (``point_triplane.py:338-357``)."""
        B, N, H, W, _ = batch.img.shape
        grid_idx, valid = voxelize_points(
            batch.points, batch.points_valid, self.pc_range, self.voxel_size
        )
        img_feats = self.camera_net(
            batch.img.reshape(B * N, H, W, 3), deterministic=deterministic
        )
        img_feats = img_feats.reshape(B, N, *img_feats.shape[1:])

        cam_pt = point_to_cam(
            batch.points,
            valid,
            img_feats,
            batch.lidar2img,
            batch.cam_aug,
            (H, W),
        )
        tpv = self.projector(
            batch.points, grid_idx, valid, cam_pt, train=not deterministic
        )

        planes = []
        for tp in tpv:
            scales = self.triplane_net(tp, deterministic=deterministic)
            planes.append(self.fpn_net(scales, train=not deterministic))
        return planes, valid

    def __call__(self, batch: Batch, deterministic: bool = True):
        """Training losses (``point_triplane.py:313-435``)."""
        planes, valid = self.encode_planes(batch, deterministic)
        grid_size = tuple(self.point_triplane_projector["grid_size"])
        B, N, H, W, _ = batch.img.shape
        losses = {}

        feats = sample_triplane_list(
            planes, batch.points[..., :3], self.pc_range, grid_size,
            self.voxel_size,
        )  # (B, P, C)

        if self.camera_decoder is not None:
            canvases = cam_rec_feat(
                feats * valid[..., None].astype(feats.dtype),
                batch.points,
                valid,
                batch.lidar2img,
                batch.cam_aug,
                (H, W),
            )
            cam_pred = self.camera_dec(
                canvases.reshape(B * N, H, W, -1)
            )
            img = batch.img.reshape(B * N, H, W, 3)
            losses["camera_loss"] = self.camera_dec.forward_loss(
                img, cam_pred, jnp.ones_like(img)
            )

        if self.contrastive:
            rng = self.make_rng("sample")
            total = jnp.zeros((), jnp.float32)
            count = jnp.zeros((), jnp.float32)
            for cam in range(6):
                labels = batch.points[..., 5 + cam].astype(jnp.int32)
                v = valid & (labels > 0)
                keys = jax.random.split(jax.random.fold_in(rng, cam), B)
                loss_b, ok_b = jax.vmap(
                    lambda f, l, m, k: sup_con_loss(
                        f, l, m, k, self.max_sam_clusters
                    )
                )(feats, labels, v, keys)
                ok = ok_b.astype(jnp.float32)
                total = total + (loss_b * ok).sum()
                count = count + ok.sum()
            losses["contrastive_loss"] = total / jnp.maximum(count, 1.0)

        if self.surface_decoder is not None:
            losses["surface_loss"] = self.surface_dec(
                batch.points[..., :3], feats, valid, self.make_rng("sample")
            )

        return losses
