"""TriplaneMAE: camera+range self-supervised pretraining model.

Rebuild of ``mmdet3d/models/detectors/triplane.py`` (class TriplaneMAE,
:23-581).  One pure function from a static-shape :class:`Batch` to a loss
dict; the reference's per-sample python loops (camera scatter :379-390,
contrastive :434-462) are batched scatters / vmaps here.

Loss surface (matching the reference key-for-key):
    camera_loss       masked patch MSE of image reconstruction
    range_loss        masked patch MSE of range reconstruction
    surface_loss      InterpNet BCE
    contrastive_loss  SupCon over SAM cluster channels
    color             MSE of per-point color regression (optional head)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.geometry import crop_to_range
from ..data.batch import Batch
from .range_family import encode_triplane
from ..losses.sup_con import sup_con_loss
from ..ops.pallas_kernels import sample_triplane_auto
from ..ops.sampling import sample_triplane
from ..ops.scatter import scatter_set_2d_batch
from .builder import build



def _scatter_points_to_cameras(rc_coors, feats, num_cams, H, W):
    """Scatter per-range-pixel features into per-camera pixel canvases.

    Shared by the camera loss and the viz reconstructions
    (``triplane.py:379-390``).  Validity matches the reference's
    ``coors.long(); coors[..., 0] > 0`` test (truncate, then require a
    strictly positive row).

    Args:
        rc_coors: ``(B, N, RH, RW, 2)`` full-res (row, col) float coords,
            -1 where invalid.
        feats: ``(B, P, C)`` per-range-pixel features (P = RH*RW).

    Returns:
        ``(B * N, H, W, C)`` canvases.
    """
    B, C = feats.shape[0], feats.shape[-1]
    rc = rc_coors.reshape(B, num_cams, -1, 2)
    rows = jnp.floor(rc[..., 0]).astype(jnp.int32)
    cols = jnp.floor(rc[..., 1]).astype(jnp.int32)
    valid = rows > 0
    G, P = B * num_cams, rc.shape[2]
    bcast = jnp.broadcast_to(
        feats[:, None], (B, num_cams, P, C)
    ).reshape(G, P, C)
    return scatter_set_2d_batch(
        rows.reshape(G, P), cols.reshape(G, P), valid.reshape(G, P),
        bcast, H, W,
    )


class TriplaneMAE(nn.Module):
    """Pretraining model: encoder -> triplane -> multi-task recon losses.

    Attributes mirror ``triplane.py:40-53`` (checkpoint handling lives in
    ``train/checkpoint.py`` instead of the module).
    """

    encoder: dict
    neck: dict
    lidar_decoder: Optional[dict] = None
    camera_decoder: Optional[dict] = None
    surface_decoder: Optional[dict] = None
    color_decoder: Optional[dict] = None
    contrastive: bool = False
    voxel_size: tuple = (0.4, 0.4, 0.1)
    pc_range: tuple = (-25, -25, -5, 25, 25, 3)
    max_sam_clusters: int = 256
    embed_dim: int = 768
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder_net = build(self.encoder, dtype=self.dtype, name="encoder")
        self.neck_net = build(self.neck, dtype=self.dtype, name="neck")
        if self.camera_decoder is not None:
            self.camera_dec = build(
                self.camera_decoder, dtype=self.dtype, name="camera_decoder"
            )
        if self.lidar_decoder is not None:
            self.lidar_dec = build(
                self.lidar_decoder, dtype=self.dtype, name="lidar_decoder"
            )
        if self.surface_decoder is not None:
            self.surface_dec = build(
                self.surface_decoder, dtype=self.dtype, name="surface_decoder"
            )
        if self.color_decoder is not None:
            self.color_dec = build(
                self.color_decoder, dtype=self.dtype, name="color_decoder"
            )

    def encode_triplane(self, batch: Batch, deterministic: bool = True):
        """Shared encoder path (``triplane.py:336-368``)."""
        mask_rng = self.make_rng("mask") if self.has_rng("mask") else None
        return encode_triplane(
            self.encoder_net,
            self.neck_net,
            batch,
            self.pc_range,
            self.embed_dim,
            deterministic,
            mask_rng,
        )

    def __call__(self, batch: Batch, deterministic: bool = True):
        """Training losses (``triplane.py:305-484``)."""
        triplane, aux = self.encode_triplane(batch, deterministic)
        B, _, S, _, C = triplane.shape
        RH, RW = aux["range_image"].shape[1:3]
        losses = {}

        # per-range-pixel triplane features (:376)
        range_proj = sample_triplane_auto(
            triplane, aux["range_points"], self.pc_range, self.voxel_size
        )  # (B, RH, RW, C)

        point_mask = aux["range_active"] & (aux["range_image"] > 0)

        if self.camera_decoder is not None:
            losses["camera_loss"] = self._camera_loss(batch, aux, range_proj)

        if self.color_decoder is not None:
            losses["color"] = self._color_loss(batch, aux, range_proj)

        if self.contrastive:
            losses["contrastive_loss"] = self._contrastive_loss(
                batch, triplane
            )

        if self.surface_decoder is not None:
            pts = aux["range_points"].reshape(B, RH * RW, 3)
            has_pt = jnp.any(pts != 0, axis=-1)
            lat = range_proj.reshape(B, RH * RW, C)
            losses["surface_loss"] = self.surface_dec(
                pts, lat, has_pt, self.make_rng("sample")
            )

        if self.lidar_decoder is not None:
            masked = range_proj * point_mask.astype(range_proj.dtype)
            range_pred = self.lidar_dec(masked)
            ones = jnp.ones_like(aux["range_image"])
            losses["range_loss"] = self.lidar_dec.forward_loss(
                aux["range_image"], range_pred, ones
            )

        return losses

    def reconstructions(self, batch: Batch):
        """Decoded reconstructions for visualization
        (``test_pretrain``, ``triplane.py:129-302``).

        Returns a dict with (when decoders exist) ``cam_recon
        (B*N, H, W, 3)`` and ``range_recon (B, 32, 1024, 1)`` images plus
        the triplane; call via ``apply(..., method='reconstructions')``.
        """
        triplane, aux = self.encode_triplane(batch, deterministic=True)
        B = triplane.shape[0]
        RH, RW = aux["range_image"].shape[1:3]
        range_proj = sample_triplane(
            triplane, aux["range_points"], self.pc_range, self.voxel_size
        )
        out = {"triplane": triplane}
        if self.camera_decoder is not None:
            N, H, W = batch.img.shape[1:4]
            C = range_proj.shape[-1]
            scat = _scatter_points_to_cameras(
                aux["rc_coors"], range_proj.reshape(B, -1, C), N, H, W
            )
            pred = self.camera_dec(scat)
            out["cam_recon"] = self.camera_dec.unpatchify(pred)
        if self.lidar_decoder is not None:
            point_mask = aux["range_active"] & (aux["range_image"] > 0)
            masked = range_proj * point_mask.astype(range_proj.dtype)
            pred = self.lidar_dec(masked)
            out["range_recon"] = self.lidar_dec.unpatchify(pred)
        return out

    # ------------------------------------------------------------------
    def _camera_loss(self, batch: Batch, aux, range_proj):
        """Scatter triplane feats to pixels + decode + MSE
        (``triplane.py:379-400``)."""
        B, N, H, W, _ = batch.img.shape
        C = range_proj.shape[-1]
        scat = _scatter_points_to_cameras(
            aux["rc_coors"], range_proj.reshape(B, -1, C), N, H, W
        )
        cam_pred = self.camera_dec(scat)
        img = batch.img.reshape(B * N, H, W, 3)
        ones = jnp.ones_like(img)
        return self.camera_dec.forward_loss(img, cam_pred, ones)

    def _color_loss(self, batch: Batch, aux, range_proj):
        """Per-point color regression (``triplane.py:404-430``)."""
        B, N, H, W, _ = batch.img.shape
        C = range_proj.shape[-1]
        rc = aux["rc_coors"].reshape(B, N, -1, 2)
        # reference validity: coors.long()[..., 0] > 0 (triplane.py:409-413)
        valid = jnp.floor(rc[..., 0]) > 0
        rows = jnp.clip(jnp.floor(rc[..., 0]).astype(jnp.int32), 0, H - 1)
        cols = jnp.clip(jnp.floor(rc[..., 1]).astype(jnp.int32), 0, W - 1)
        img_flat = batch.img.reshape(B, N, H * W, 3)
        colors = jnp.take_along_axis(
            img_flat, (rows * W + cols)[..., None], axis=2
        )  # (B, N, P, 3)
        feats = jnp.broadcast_to(
            range_proj.reshape(B, 1, -1, C), (B, N, rc.shape[2], C)
        )
        pred = self.color_dec(feats)
        m = valid[..., None].astype(pred.dtype)
        return ((pred - colors) ** 2 * m).sum() / jnp.maximum(
            m.sum() * 3, 1.0
        )

    def _contrastive_loss(self, batch: Batch, triplane):
        """SupCon over the 6 SAM label channels (``triplane.py:434-462``)."""
        B = batch.points.shape[0]
        pts = batch.points[..., :3]
        in_range = crop_to_range(pts, self.pc_range) & batch.points_valid
        feats = sample_triplane_auto(
            triplane, pts, self.pc_range, self.voxel_size
        )  # (B, P, C)

        rng = self.make_rng("sample")
        total = jnp.zeros((), jnp.float32)
        count = jnp.zeros((), jnp.float32)
        for cam in range(6):
            labels = batch.points[..., 5 + cam].astype(jnp.int32)
            valid = in_range & (labels > 0)
            keys = jax.random.split(jax.random.fold_in(rng, cam), B)
            loss_b, ok_b = jax.vmap(
                lambda f, l, v, k: sup_con_loss(
                    f, l, v, k, self.max_sam_clusters
                )
            )(feats, labels, valid, keys)
            ok = ok_b.astype(jnp.float32)
            total = total + (loss_b * ok).sum()
            count = count + ok.sum()
        return total / jnp.maximum(count, 1.0)
