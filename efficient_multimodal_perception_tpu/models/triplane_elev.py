"""TriplaneElev: BEV elevation regression fine-tune.

Rebuild of ``mmdet3d/models/detectors/triplane_elev.py`` (:23-380): frozen
triplane encoder, features sampled at a (100, 100, 80) voxel-center grid
(0.4 m / 0.1 m cells over pc_range [-20, 20]), U-Net head, masked MSE.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.geometry import volume_reference_points
from ..data.batch import Batch
from ..ops.sampling import sample_triplane_grid_mm
from .builder import build
from .range_family import encode_triplane


class TriplaneElev(nn.Module):
    """Elevation model (attributes mirror ``triplane_elev.py:23-66``)."""

    encoder: dict
    neck: dict
    decoder: dict
    volume: tuple = (100, 100, 80)
    voxel_size: tuple = (0.4, 0.4, 0.1)
    pc_range: tuple = (-20, -20, -5, 20, 20, 3)
    triplane_range: tuple = (-25, -25, -5, 25, 25, 3)
    embed_dim: int = 768
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder_net = build(self.encoder, dtype=self.dtype, name="encoder")
        self.neck_net = build(self.neck, dtype=self.dtype, name="neck")
        self.decoder_net = build(self.decoder, dtype=self.dtype, name="decoder")
        # NOTE: the reference stacks (ys, xs, zs) then scales channel i by
        # voxel_size[i] (triplane_elev.py:113-133, 258-261); the grid is
        # symmetric in x/y here so this matches it exactly.
        self.ref_3d = volume_reference_points(
            self.volume, self.voxel_size, self.pc_range
        )

    def __call__(self, batch: Batch, deterministic: bool = True):
        """Returns ``(pred (B, X, Y), losses)``
        (``triplane_elev.py:211-283``)."""
        mask_rng = self.make_rng("mask") if self.has_rng("mask") else None
        # the elev encoder is always frozen+eval in the reference
        # (triplane_elev.py:67-83)
        triplane, _ = encode_triplane(
            self.encoder_net,
            self.neck_net,
            batch,
            self.triplane_range,
            self.embed_dim,
            True,
            mask_rng,
            crop=False,  # elev forward has no range crop (:231)
        )
        triplane = jax.lax.stop_gradient(triplane)

        # sampling normalizes against the *triplane* range/voxels
        # (triplane_elev.py:288-300 uses triplane_range + voxel_size);
        # the grid is axis-separable -> factorized matmul readout.
        voxel_feat = sample_triplane_grid_mm(
            triplane,
            self.ref_3d[:, 0, 0, 0],
            self.ref_3d[0, :, 0, 1],
            self.ref_3d[0, 0, :, 2],
            self.triplane_range,
            self.voxel_size,
        )  # (B, X, Y, Z, C)

        pred = self.decoder_net(voxel_feat, train=not deterministic)

        losses = {}
        if batch.elevation is not None:
            losses["loss"] = self.decoder_net.loss(
                pred, batch.elevation, batch.elevation_mask
            )
        return pred, losses
