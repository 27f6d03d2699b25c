"""Joint camera+range encoder with vectorized cross-modal exchange.

Rebuild of ``mmdet3d/models/backbones/joint_encoder.py``.  The reference's
``interact`` runs a **python loop over batch x 6 cameras** with boolean
fancy indexing (``joint_encoder.py:146-213``) — ragged, host-driven,
serial.  Here the same exchange is three static-shape array ops over all
(batch, camera, range-pixel) triples at once:

1. every range pixel's 3-D point is projected into every camera
   (one einsum, ``core/geometry.py:project_points_to_cameras``),
2. camera features are *gathered* at the projected coords and summed over
   cameras into the range image (the reference's ``+=`` at
   ``joint_encoder.py:209`` accumulates over cameras at fixed range
   pixel; a masked gather-sum reproduces it exactly, collisions included,
   because the range pixel index is dense),
3. a 3-layer MLP positional encoding of the 3-D points is *scattered*
   into the camera feature maps (``joint_encoder.py:212-213``).  Torch's
   advanced-index ``+=`` does NOT accumulate duplicate indices — the last
   write wins — so collisions (several range pixels hitting one camera
   feature pixel) are reproduced with a last-write index scatter
   (``ops/scatter.last_write_winner_batch``) followed by a pe-row gather
   (verified against a torch loop oracle in ``tests/test_interact.py``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.env import compute_backend

from ..core.geometry import CameraAug, project_points_to_cameras
from ..ops.scatter import last_write_winner_batch
from .convnext import MaskConvNeXt, random_active_mask, upsample_mask


class PositionEncoder(nn.Module):
    """3 -> 4*D -> D point-coordinate MLP (``joint_encoder.py:32-36``)."""

    embed_dims: int = 192
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts):
        x = nn.Dense(self.embed_dims * 4, dtype=self.dtype, name="fc1")(pts)
        x = nn.relu(x)
        return nn.Dense(self.embed_dims, dtype=self.dtype, name="fc2")(x)


class JointEncoder(nn.Module):
    """Two-modality encoder with mid-level feature exchange.

    Attributes:
        lidar_encoder / camera_encoder: MaskConvNeXt kwargs (dicts).
        lidar_mask_ratio / camera_mask_ratio: MAE mask ratios; the
            reference carries these in ``mae_cfg`` (mask scale is the
            encoder's final stride).  0.0 disables masking (the shipped
            configs' setting, ``configs/triplane_surf_sam.py:13,16``).
        image_hw: final augmented camera image size.
    """

    lidar_encoder: dict
    camera_encoder: dict
    lidar_mask_ratio: float = 0.0
    camera_mask_ratio: float = 0.0
    lidar_mask_scale: Tuple[int, int] = (1, 32)  # range img -> mask grid
    camera_mask_scale: Tuple[int, int] = (16, 16)
    image_hw: Tuple[int, int] = (256, 512)
    embed_dims: int = 192
    int8: Any = False  # quantized-serving epilogues (True | "static")
    dtype: Any = jnp.float32
    # Max batch rows per interact body; see ``interact`` docstring.
    interact_batch_chunk: int = 4

    def setup(self):
        self.lidar_net = MaskConvNeXt(
            **self.lidar_encoder, int8=self.int8, dtype=self.dtype,
            name="lidar_encoder",
        )
        self.camera_net = MaskConvNeXt(
            **self.camera_encoder, int8=self.int8, dtype=self.dtype,
            name="camera_encoder",
        )
        self.position_encoder = PositionEncoder(
            self.embed_dims, dtype=self.dtype, name="position_encoder"
        )

    def __call__(
        self,
        img: jax.Array,
        range_image: jax.Array,
        range_points: jax.Array,
        lidar2img: jax.Array,
        cam_aug: CameraAug,
        deterministic: bool = True,
        mask_rng: Optional[jax.Array] = None,
    ):
        """Full joint forward (``joint_encoder.py:39-94``).

        Args:
            img: ``(B, N, H, W, 3)`` normalized camera images.
            range_image: ``(B, 32, 1024, 1)`` range image (pre-crop).
            range_points: ``(B, 32, 1024, 3)`` per-pixel 3-D points.
            lidar2img: ``(B, N, 4, 4)``.
            cam_aug: per-camera augmentation params.

        Returns:
            ``(range_features (B, 32, 32, 768), range_active (B,32,1024,1)
            bool, image_features (B, N, 16, 32, 768), img_active or None,
            range_cam_coors (B, N, 32, 1024, 2), range_cam_valid)``.
        """
        B, N, H, W, _ = img.shape
        img_flat = img.reshape(B * N, H, W, 3)

        # --- camera stage 0..1, optional MAE masking ------------------
        img_active = None
        if self.camera_mask_ratio > 0.0:
            mh = H // self.camera_mask_scale[0]
            mw = W // self.camera_mask_scale[1]
            img_active = random_active_mask(
                jax.random.fold_in(mask_rng, 1), B * N, mh, mw,
                self.camera_mask_ratio,
            )
        mid = self.camera_net.forward1(
            img_flat, active_mask=img_active, deterministic=deterministic
        )
        _, h1, w1, c1 = mid.shape
        mid = mid.reshape(B, N, h1, w1, c1)

        # --- range MAE masking (create_masked_input, mask_convnext.py:246-279)
        if self.lidar_mask_ratio > 0.0:
            rh = range_image.shape[1] // self.lidar_mask_scale[0]
            rw = range_image.shape[2] // self.lidar_mask_scale[1]
            range_active_low = random_active_mask(
                jax.random.fold_in(mask_rng, 0), B, rh, rw,
                self.lidar_mask_ratio,
            )
            range_active = upsample_mask(
                range_active_low, range_image.shape[1:3]
            )
            range_image = range_image * range_active.astype(range_image.dtype)
        else:
            range_active_low = None
            range_active = jnp.ones_like(range_image, dtype=bool)

        # --- interact --------------------------------------------------
        fused_range, mid, coors, coors_valid = self.interact(
            mid, range_image, range_points, lidar2img, cam_aug
        )

        # --- range encoder over fused 193-ch input ---------------------
        range_features = self.lidar_net(
            fused_range,
            active_mask=range_active_low,
            deterministic=deterministic,
        )

        # --- camera stages 2..3 ---------------------------------------
        mid = mid.reshape(B * N, h1, w1, c1)
        image_features = self.camera_net.forward2(
            mid, active_mask=img_active, deterministic=deterministic
        )
        image_features = image_features.reshape(
            B, N, *image_features.shape[1:]
        )

        return (
            range_features,
            range_active,
            image_features,
            img_active,
            coors,
            coors_valid,
        )

    def interact(
        self,
        img_features: jax.Array,
        range_image: jax.Array,
        range_points: jax.Array,
        lidar2img: jax.Array,
        cam_aug: CameraAug,
    ):
        """Vectorized cross-modal exchange (``joint_encoder.py:97-215``).

        Past B=4 the body is run in batch chunks of
        ``interact_batch_chunk`` and the results concatenated: XLA's
        batched row-gather emitter degrades once the (B·N, h1·w1, C)
        gather operand crosses ~100 MB (measured v5e: 2.34 ms/sample at
        B<=4 vs 3.26 at B=8; two chunked B=4 gathers inside one jit
        recover the B=4 rate exactly), and the winner-scatter tail
        shows the same super-linearity.  Chunking is semantics-free —
        every op here is independent across batch rows.

        Args:
            img_features: ``(B, N, h1, w1, C)`` mid-level camera features.
            range_image: ``(B, 32, 1024, 1)`` (already MAE-masked).
            range_points: ``(B, 32, 1024, 3)``.

        Returns:
            fused ``(B, 32, 1024, 1 + C)`` range input, updated camera
            features, ``range_cam_coors (B, N, 32, 1024, 2)`` full-res
            (row, col) float coords (-1 where invalid), and their
            validity mask (valid projection & pixel has a point).
        """
        B = img_features.shape[0]
        chunk = self.interact_batch_chunk
        if B <= chunk:
            return self._interact_chunk(
                img_features, range_image, range_points, lidar2img, cam_aug
            )
        outs = []
        for b0 in range(0, B, chunk):
            sl = slice(b0, min(b0 + chunk, B))
            outs.append(self._interact_chunk(
                img_features[sl], range_image[sl], range_points[sl],
                lidar2img[sl],
                jax.tree_util.tree_map(lambda a: a[sl], cam_aug),
            ))
        return tuple(
            jnp.concatenate([o[i] for o in outs], axis=0) for i in range(4)
        )

    def _interact_chunk(
        self,
        img_features: jax.Array,
        range_image: jax.Array,
        range_points: jax.Array,
        lidar2img: jax.Array,
        cam_aug: CameraAug,
    ):
        B, N, h1, w1, C = img_features.shape
        _, RH, RW, _ = range_image.shape
        P = RH * RW
        IH, IW = self.image_hw

        pts = range_points.reshape(B, P, 3)
        coords, in_img = project_points_to_cameras(
            pts, lidar2img, cam_aug, (IH, IW)
        )  # (B, N, P, 2) xy, (B, N, P)

        no_point = jnp.any(
            range_points.reshape(B, P, 3) != 0, axis=-1
        )  # pixel holds a point (joint_encoder.py:138-140)
        unmasked = (range_image > 0).reshape(B, P)  # post-mask occupancy

        valid = in_img & no_point[:, None, :]
        active_valid = valid & unmasked[:, None, :]

        # feature-scale integer coords (trunc==floor for >=0 values,
        # joint_encoder.py:204-206)
        col_f = jnp.floor(coords[..., 0] * (w1 / IW)).astype(jnp.int32)
        row_f = jnp.floor(coords[..., 1] * (h1 / IH)).astype(jnp.int32)
        col_f = jnp.clip(col_f, 0, w1 - 1)
        row_f = jnp.clip(row_f, 0, h1 - 1)
        flat_f = row_f * w1 + col_f  # (B, N, P)

        # (2) gather camera features onto range pixels, sum over cameras.
        # On TPU/bf16 this is a masked one-hot MXU matmul (the XLA
        # gather measured ~7.7 ms true and its backward is a
        # scatter-add; the kernel replaces both with matmuls —
        # ``ops/pallas_kernels.cam_gather_sum``).
        feats_flat = img_features.reshape(B, N, h1 * w1, C)
        # Cost/VMEM gate (measured v5e): the one-hot's MXU work scales
        # with K=h1*w1, the gather's does not.  At MAE shapes
        # (K=8192, C=96: 3.1e11 FLOP/row, 9.4 MB feat block) the kernel
        # fits and wins the forward ~2x; at occ's stage-1 (C=192) the
        # 18.9 MB feat block blows scoped VMEM (48.75M vs 16M) and the
        # ~15 ms MXU floor would lose to the 7.7 ms gather regardless.
        feat_bytes = N * h1 * w1 * C * img_features.dtype.itemsize
        onehot_flops_per_row = 2 * N * h1 * w1 * C * P
        if (
            img_features.dtype == jnp.bfloat16
            and compute_backend() == "tpu"
            and feat_bytes <= 10_000_000
            and onehot_flops_per_row <= 4e11
        ):
            from ..ops.pallas_kernels import cam_gather_sum

            cam_range = cam_gather_sum(
                feats_flat, flat_f, active_valid
            ).reshape(B, RH, RW, C)
        else:
            gathered = jnp.take_along_axis(
                feats_flat, flat_f[..., None], axis=2
            )  # (B, N, P, C)
            cam_range = jnp.sum(
                gathered * active_valid[..., None].astype(gathered.dtype),
                axis=1,
            ).reshape(B, RH, RW, C)

        # (3) scatter positional encodings into camera features.
        # NOTE: torch advanced-index `+=` (joint_encoder.py:213) does NOT
        # accumulate colliding writes — one (unspecified) writer wins per
        # pixel — so this is a last-write scatter, not a segment_sum.
        pe = self.position_encoder(
            range_points.reshape(B, P, 3)
        )  # (B, P, D=C)
        # scatter winner *indices* per (b, cam) — one int per camera
        # pixel — then gather pe rows: identical last-write semantics
        # without ever materializing the (B*N, P, C) pe broadcast.
        flat_bn = flat_f.reshape(B * N, P)
        winner = last_write_winner_batch(
            flat_bn // w1, flat_bn % w1, active_valid.reshape(B * N, P),
            h1, w1,
        ).reshape(B, N, h1 * w1)
        has = winner >= 0
        vals = jnp.take_along_axis(
            pe[:, None], jnp.maximum(winner, 0)[..., None], axis=2
        )  # (B, N, h1*w1, C)
        add = jnp.where(has[..., None], vals.astype(img_features.dtype), 0)
        img_features = img_features + add.reshape(B, N, h1, w1, C)

        # full-res (row, col) coords for the MAE decoders
        # (joint_encoder.py:192; -1 where invalid)
        rc = jnp.stack([coords[..., 1], coords[..., 0]], axis=-1)
        rc = jnp.where(valid[..., None], rc, -1.0)
        rc = rc.reshape(B, N, RH, RW, 2)

        fused = jnp.concatenate(
            [range_image, cam_range.astype(range_image.dtype)], axis=-1
        )
        return fused, img_features, rc, valid.reshape(B, N, RH, RW)
