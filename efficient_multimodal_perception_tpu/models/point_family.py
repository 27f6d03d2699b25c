"""Shared helpers of the point family (PointTriplane / PointTriplaneOcc).

Static-shape rebuilds of ``mmdet3d/models/detectors/point_triplane.py``
helpers: ``voxelize_points`` (:133-161), ``point_to_cam`` (:164-241) and
``cam_rec_feat`` (:243-309).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..core.geometry import (
    CameraAug,
    crop_to_range,
    project_points_to_cameras,
)
from ..ops.sampling import grid_sample_2d, grid_sample_2d_mm
from ..ops.scatter import scatter_set_2d_batch


def voxelize_points(points, points_valid, pc_range, voxel_size):
    """Crop to range + integer grid index (``point_triplane.py:133-161``).

    Returns ``(grid_idx (B, P, 3) int32, valid (B, P))``; padded/cropped
    rows keep index 0 and are masked.
    """
    xyz = points[..., :3]
    lo = jnp.asarray(pc_range[:3], xyz.dtype)
    valid = crop_to_range(xyz, pc_range) & points_valid
    idx = ((xyz - lo) / jnp.asarray(voxel_size, xyz.dtype)).astype(jnp.int32)
    idx = jnp.where(valid[..., None], idx, 0)
    return idx, valid


def point_to_cam(
    points,
    points_valid,
    img_features,
    lidar2img,
    cam_aug: CameraAug,
    image_hw,
):
    """Sample camera features at projected point locations, summed over
    cameras (``point_triplane.py:164-241``).

    NOTE (reference-faithful): the reference normalizes the *swapped*
    (row, col) pair as if it were (x, y) — ``point_triplane.py:230-235``
    feeds grid_sample x = 2*row/H - 1 — i.e. features are sampled at
    transposed locations.  Reproduced exactly for parity.

    Args:
        img_features: ``(B, N, h, w, C)``.

    Returns:
        ``(B, P, C)`` per-point camera features (0 where invalid).
    """
    B, N, h, w, C = img_features.shape
    H, W = image_hw
    coords, in_img = project_points_to_cameras(
        points[..., :3], lidar2img, cam_aug, (H, W)
    )  # (B, N, P, 2) xy
    valid = in_img & points_valid[:, None, :]

    # swapped normalization quirk
    gx = 2.0 * coords[..., 1] / H - 1.0  # row -> grid x
    gy = 2.0 * coords[..., 0] / W - 1.0  # col -> grid y
    grid = jnp.stack([gx, gy], axis=-1)  # (B, N, P, 2)

    P = points.shape[1]
    # Small feature map (16x32 at the production config): the one-hot
    # MXU matmul form beats XLA's batched 4-corner gather on chip (the
    # gather was 113 ms at B=8 — the dominant section of the whole
    # forward; r4 point-family profile).  FLOPs scale with h*w, so big
    # maps keep the gather form; f32 keeps it too (bf16-rounded
    # bilinear weights are a perf-path trade, like the fused kernels —
    # the f32 parity path must stay exact).
    # EMP_DISABLE_GS_MM=1 forces the gather form (compiler-crash triage
    # knob for the B=4 point-train remote-compile failure, VERDICT r4 #3)
    use_mm = (
        h * w <= 2048
        and img_features.dtype == jnp.bfloat16
        and not os.environ.get("EMP_DISABLE_GS_MM")
    )
    sampler = grid_sample_2d_mm if use_mm else grid_sample_2d
    sampled = sampler(
        img_features.reshape(B * N, h, w, C), grid.reshape(B * N, P, 2)
    ).reshape(B, N, P, C)
    sampled = sampled * valid[..., None].astype(sampled.dtype)
    return sampled.sum(axis=1)


def cam_rec_feat(
    point_feats,
    points,
    points_valid,
    lidar2img,
    cam_aug: CameraAug,
    image_hw,
):
    """Scatter per-point features into per-camera pixel canvases
    (``point_triplane.py:243-309``).

    Returns ``(B, N, H, W, C)`` canvases (last-writer-wins collisions,
    like the reference's advanced-index assignment :307).
    """
    B, P, C = point_feats.shape
    N = lidar2img.shape[1]
    H, W = image_hw
    coords, in_img = project_points_to_cameras(
        points[..., :3], lidar2img, cam_aug, (H, W)
    )
    valid = in_img & points_valid[:, None, :]
    rows = jnp.floor(coords[..., 1]).astype(jnp.int32)
    cols = jnp.clip(jnp.floor(coords[..., 0]).astype(jnp.int32), 0, W - 1)

    feats = jnp.broadcast_to(point_feats[:, None], (B, N, P, C))
    out = scatter_set_2d_batch(
        rows.reshape(B * N, P),
        cols.reshape(B * N, P),
        valid.reshape(B * N, P),
        feats.reshape(B * N, P, C),
        H,
        W,
    )
    return out.reshape(B, N, H, W, C)
