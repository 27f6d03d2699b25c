"""TriplaneOcc: 3-D semantic occupancy fine-tune + eval.

Rebuild of ``mmdet3d/models/detectors/triplane_occ.py`` (:22-415).  The
(99, 99, 16) voxel-center grid is a trace-time constant; the reference's
separate train/test forwards collapse into one ``__call__`` returning
logits + loss (the IoU stats live in ``train/metrics.py``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.geometry import occupancy_roi
from ..data.batch import Batch
from ..ops.sampling import (
    sample_triplane_grid_mm,
    sample_triplane_grid_mm_packed,
)
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
    freeze_encoder: bool = True  # frozen encoder runs in eval mode
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
        # a frozen encoder runs in eval mode (no stochastic depth),
        # matching the reference's .eval() on it (triplane_occ.py:83-91)
        triplane, _ = encode_triplane(
            self.encoder_net,
            self.neck_net,
            batch,
            self.triplane_range,
            self.embed_dim,
            deterministic or self.freeze_encoder,
            mask_rng,
        )
        if self.freeze_encoder:
            # requires_grad=False semantics: no backward through the
            # encoder at all (the reference pays it and discards grads)
            triplane = jax.lax.stop_gradient(triplane)

        logits = self.voxel_logits(triplane)

        losses = {}
        occ = None
        if batch.occupancy is not None:
            x0, y0, x1, y1 = self.occ_bounds
            occ = batch.occupancy[:, x0 : x1 + 1, y0 : y1 + 1]
            losses["loss"] = self.decoder_net.loss(logits, occ)
        return logits, occ, losses

    def triplane(self, batch: Batch, deterministic: bool = True):
        """Expose the encoded triplane (for PCA viz,
        ``triplane_occ.py:418-465``); call via ``apply(..., method=
        'triplane')``."""
        tri, _ = encode_triplane(
            self.encoder_net,
            self.neck_net,
            batch,
            self.triplane_range,
            self.embed_dim,
            deterministic,
            None,
        )
        return tri

    def sample_voxel_centers(self, triplane):
        """Triplane -> (B, X, Y, Z, C) voxel features
        (``triplane_occ.py:321-348``).

        The voxel-center grid is axis-separable, so the factorized
        matmul readout (``ops/sampling.py:sample_triplane_grid_mm``)
        computes the identical result as two tiny MXU matmuls per plane
        instead of 3*X*Y*Z TPU gathers.
        """
        return sample_triplane_grid_mm(
            triplane,
            self.ref_3d[:, 0, 0, 0],
            self.ref_3d[0, :, 0, 1],
            self.ref_3d[0, 0, :, 2],
            self.triplane_range,
            self.triplane_voxel_size,
        )

    def voxel_logits(self, triplane):
        """Readout + decoder, z-packed when the decoder is the Mlp head.

        The packed route (``sample_triplane_grid_mm_packed`` +
        ``OccMlpHead(packed_z=Z)``) computes the identical per-voxel
        math with a dense Z*C minor dim — ~4x less HBM traffic than the
        lane-padded (..., 32) voxel tensor on TPU.  Non-Mlp decoders
        fall back to the 5-D tensor path.
        """
        from .heads import OccMlpHead

        if isinstance(self.decoder_net, OccMlpHead):
            Z = self.ref_3d.shape[2]
            packed = sample_triplane_grid_mm_packed(
                triplane,
                self.ref_3d[:, 0, 0, 0],
                self.ref_3d[0, :, 0, 1],
                self.ref_3d[0, 0, :, 2],
                self.triplane_range,
                self.triplane_voxel_size,
            )
            return self.decoder_net(packed, packed_z=Z)
        return self.decoder_net(self.sample_voxel_centers(triplane))
