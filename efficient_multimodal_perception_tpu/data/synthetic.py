"""Synthetic nuScenes-shaped batches.

Generates statistically plausible batches with the exact shapes/dtypes of
the real loader, for tests, benchmarks, and dry runs on machines without
the nuScenes download.  Camera geometry mimics the 6-camera surround rig
(yaw-spaced pinhole cameras), LiDAR clouds are sampled on the 32-beam
spherical pattern so the range image fills like real data.
"""

from __future__ import annotations

import numpy as np

from ..core.geometry import CameraAug, range_projection_np
from .batch import Batch


def synthetic_batch(
    batch_size: int = 1,
    num_cams: int = 6,
    image_hw=(256, 512),
    point_budget: int = 36864,
    point_dim: int = 11,
    with_occ: bool = False,
    with_elev: bool = False,
    num_classes: int = 5,
    seed: int = 0,
    as_jax: bool = True,
) -> Batch:
    """Build one synthetic :class:`Batch`."""
    rng = np.random.default_rng(seed)
    B, N = batch_size, num_cams
    H, W = image_hw

    img = rng.standard_normal((B, N, H, W, 3)).astype(np.float32) * 0.5

    # 32-beam-ish cloud
    n_pts = min(point_budget, 34000)
    beams = np.deg2rad(np.linspace(-29.5, 9.5, 32))
    range_images = np.zeros((B, 32, 1024, 1), np.float32)
    range_points = np.zeros((B, 32, 1024, 3), np.float32)
    points = np.zeros((B, point_budget, point_dim), np.float32)
    points_valid = np.zeros((B, point_budget), bool)
    for b in range(B):
        pitch = rng.choice(beams, n_pts) + rng.normal(0, 0.002, n_pts)
        yaw = rng.uniform(-np.pi, np.pi, n_pts)
        r = np.abs(rng.gamma(2.0, 8.0, n_pts)) + 2.5
        x = r * np.cos(pitch) * np.sin(yaw)
        y = r * np.cos(pitch) * np.cos(yaw)
        z = r * np.sin(pitch)
        pts = np.stack([x, y, z], 1).astype(np.float32)
        ri, rp = range_projection_np(pts)
        range_images[b, ..., 0] = ri
        range_points[b] = rp
        points[b, :n_pts, :3] = pts
        points[b, :n_pts, 3] = rng.uniform(0, 255, n_pts)  # intensity
        points[b, :n_pts, 4] = rng.integers(0, 32, n_pts)  # ring
        if point_dim >= 11:
            # SAM cluster ids: a few dozen clusters per camera channel
            for c in range(6):
                points[b, :n_pts, 5 + c] = rng.integers(0, 40, n_pts)
        points_valid[b, :n_pts] = True

    # 6-camera surround rig: yaw-spaced pinholes 0.6x downscaled
    lidar2img = np.zeros((B, N, 4, 4), np.float32)
    for b in range(B):
        for c in range(N):
            f = 1266.0 * 0.5
            K = np.array(
                [[f, 0, W / 2, 0], [0, f, H * 0.6, 0], [0, 0, 1, 0],
                 [0, 0, 0, 1]],
                np.float32,
            )
            a = 2 * np.pi * c / N
            Rt = np.array(
                [
                    [np.cos(a), -np.sin(a), 0, 0.0],
                    [0, 0, -1, 1.6],
                    [np.sin(a), np.cos(a), 0, 0.0],
                    [0, 0, 0, 1],
                ],
                np.float32,
            )
            lidar2img[b, c] = K @ Rt

    aug = CameraAug(
        resize=np.full((B, N), 1.0, np.float32),
        crop=np.zeros((B, N, 2), np.float32),
        flip=np.zeros((B, N), bool),
    )

    occupancy = None
    if with_occ:
        occupancy = rng.integers(
            0, num_classes, (B, 200, 200, 16), dtype=np.int32
        )
        ignore = rng.random((B, 200, 200, 16)) < 0.3
        occupancy = np.where(ignore, 255, occupancy).astype(np.int32)

    elevation = elevation_mask = None
    if with_elev:
        elevation = rng.standard_normal((B, 100, 100)).astype(np.float32)
        elevation_mask = (rng.random((B, 100, 100)) > 0.5).astype(np.float32)

    batch = Batch(
        img=img,
        range_image=range_images,
        range_points=range_points,
        lidar2img=lidar2img,
        cam_aug=aug,
        points=points,
        points_valid=points_valid,
        occupancy=occupancy,
        elevation=elevation,
        elevation_mask=elevation_mask,
    )
    if as_jax:
        import jax

        batch = jax.tree.map(jax.numpy.asarray, batch)
    return batch
