"""TriplaneOcc: 3-D semantic occupancy fine-tune + eval.

Rebuild of ``mmdet3d/models/detectors/triplane_occ.py`` (:22-415).  The
(99, 99, 16) voxel-center grid is a trace-time constant; the reference's
separate train/test forwards collapse into one ``__call__`` returning
logits + loss (the IoU stats live in ``train/metrics.py``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..core.geometry import occupancy_roi
from ..data.batch import Batch
from ..ops.sampling import grid_sample_2d, normalize_triplane_coords
from .builder import build
from .range_family import encode_triplane


class TriplaneOcc(nn.Module):
    """Occupancy prediction head over a (frozen-able) triplane encoder.

    Attributes mirror ``triplane_occ.py:40-54``; ``ckpt_path`` /
    ``freeze_encoder`` are trainer concerns (``train/checkpoint.py``,
    ``train/trainer.py``) — the module is pure.
    """

    encoder: dict
    neck: dict
    decoder: dict
    voxel_size: tuple = (0.5, 0.5, 0.5)
    occ_range: tuple = (-25, -25, -5, 25, 25, 3)
    triplane_range: tuple = (-25, -25, -5, 25, 25, 3)
    triplane_voxel_size: tuple = (0.4, 0.4, 0.1)
    volume: tuple = (100, 100, 80)  # carried but unused, as in the ref
    class_names: Optional[tuple] = None
    embed_dim: int = 768
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder_net = build(self.encoder, dtype=self.dtype, name="encoder")
        self.neck_net = build(self.neck, dtype=self.dtype, name="neck")
        self.decoder_net = build(self.decoder, dtype=self.dtype, name="decoder")
        self.occ_bounds, self.ref_3d = occupancy_roi(
            self.occ_range, self.voxel_size
        )

    def __call__(self, batch: Batch, deterministic: bool = True):
        """Returns ``(logits (B, X, Y, Z, K), occ_target (B, X, Y, Z),
        losses)`` (``triplane_occ.py:210-288``)."""
        mask_rng = self.make_rng("mask") if self.has_rng("mask") else None
        triplane, _ = encode_triplane(
            self.encoder_net,
            self.neck_net,
            batch,
            self.triplane_range,
            self.embed_dim,
            deterministic,
            mask_rng,
        )

        voxel_feat = self.sample_voxel_centers(triplane)
        logits = self.decoder_net(voxel_feat)

        losses = {}
        occ = None
        if batch.occupancy is not None:
            x0, y0, x1, y1 = self.occ_bounds
            occ = batch.occupancy[:, x0 : x1 + 1, y0 : y1 + 1]
            losses["loss"] = self.decoder_net.loss(logits, occ)
        return logits, occ, losses

    def sample_voxel_centers(self, triplane):
        """Triplane -> (B, X, Y, Z, C) voxel features
        (``triplane_occ.py:321-348``).

        The reference reshapes centers to (b, h, w*d) before grid_sample;
        sampling is pointwise so the reshape is a no-op here.
        """
        B = triplane.shape[0]
        S = triplane.shape[-2]
        ref = jnp.asarray(self.ref_3d)[None]
        ref = jnp.broadcast_to(ref, (B, *ref.shape[1:]))
        coords = normalize_triplane_coords(
            ref, self.triplane_range, self.triplane_voxel_size, S
        )
        xy = grid_sample_2d(triplane[:, 0], coords[..., jnp.array([0, 1])])
        yz = grid_sample_2d(triplane[:, 1], coords[..., jnp.array([1, 2])])
        xz = grid_sample_2d(triplane[:, 2], coords[..., jnp.array([0, 2])])
        return xy + yz + xz
