"""Shared encoder path of the range family (MAE / Occ / Elev).

The reference duplicates this block verbatim in three detectors
(``triplane.py:336-368``, ``triplane_occ.py:240-274``,
``triplane_elev.py:231-260``); here it is one function.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.geometry import crop_to_range
from ..core.pos_embed import pos_embed_nhwc
from ..data.batch import Batch


def encode_triplane(
    encoder_net,
    neck_net,
    batch: Batch,
    crop_range,
    embed_dim: int = 768,
    deterministic: bool = True,
    mask_rng: Optional[jax.Array] = None,
    crop: bool = True,
):
    """range+camera -> fused strip -> neck -> (B, 3, S, S, C) triplane.

    Args:
        crop_range: 6-list used for the strict-inequality point crop
            (``pc_range`` for MAE, ``triplane_range`` for Occ; Elev skips
            the crop — ``triplane_elev.py:231`` has none).

    Returns:
        ``(triplane, aux)``; aux holds cropped inputs, MAE masks and the
        per-camera projection coords for the decoders.
    """
    if crop:
        m = crop_to_range(batch.range_points, crop_range)
        range_image = batch.range_image * m[..., None].astype(
            batch.range_image.dtype
        )
        range_points = batch.range_points * m[..., None].astype(
            batch.range_points.dtype
        )
    else:
        range_image = batch.range_image
        range_points = batch.range_points

    (
        range_feat,
        range_active,
        image_feat,
        img_active,
        rc_coors,
        rc_valid,
    ) = encoder_net(
        batch.img,
        range_image,
        range_points,
        batch.lidar2img,
        batch.cam_aug,
        deterministic=deterministic,
        mask_rng=mask_rng,
    )

    rpe = pos_embed_nhwc(embed_dim, range_feat.shape[1:3])
    cpe = pos_embed_nhwc(embed_dim, image_feat.shape[2:4])
    range_feat = range_feat + jnp.asarray(rpe, range_feat.dtype)
    image_feat = image_feat + jnp.asarray(cpe, image_feat.dtype)

    B, N, h, w, C = image_feat.shape
    img_strip = image_feat.reshape(B, N * h, w, C)
    combined = jnp.concatenate([range_feat, img_strip], axis=1)

    tri = neck_net(combined)
    B, S, _, C3 = tri.shape
    triplane = tri.reshape(B, S, S, 3, C3 // 3).transpose(0, 3, 1, 2, 4)

    aux = dict(
        range_image=range_image,
        range_points=range_points,
        range_active=range_active,
        img_active=img_active,
        rc_coors=rc_coors,
        rc_valid=rc_valid,
    )
    return triplane, aux
