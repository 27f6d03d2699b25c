"""grid_sample / triplane sampling parity vs the torch oracle.

The reference's entire latent readout is ``F.grid_sample`` over 3 planes
(``triplane.py:490-514``); these tests pin our gather-4-corner
implementation to torch bit-for-bit (f32 tolerance 1e-6).
"""

import numpy as np
import pytest

from efficient_multimodal_perception_tpu.ops.sampling import (
    grid_sample_2d,
    sample_triplane,
    sample_triplane_list,
)

torch = pytest.importorskip("torch")


def torch_grid_sample(image_nhwc, grid):
    """Oracle: torch F.grid_sample on NCHW."""
    img = torch.from_numpy(np.transpose(image_nhwc, (0, 3, 1, 2)))
    g = torch.from_numpy(grid)
    out = torch.nn.functional.grid_sample(
        img, g, mode="bilinear", padding_mode="zeros", align_corners=False
    )
    return np.transpose(out.numpy(), (0, 2, 3, 1))


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 16, 24, 5)).astype(np.float32)
    # include far out-of-range coords to test zero padding
    grid = rng.uniform(-1.7, 1.7, size=(2, 11, 13, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_2d(img, grid))
    ref = torch_grid_sample(img, grid)
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_grid_sample_exact_corners_and_centers():
    img = np.arange(2 * 4 * 4 * 1, dtype=np.float32).reshape(2, 4, 4, 1)
    grid = np.array(
        [[[[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0], [-2.0, 0.0]]]] * 2,
        dtype=np.float32,
    )
    ours = np.asarray(grid_sample_2d(img, grid))
    ref = torch_grid_sample(img, grid)
    np.testing.assert_allclose(ours, ref, atol=5e-6)


def test_sample_triplane_matches_reference_math():
    """End-to-end: world points -> 3-plane sum, vs a torch re-statement of
    ``triplane.py:490-514`` (voxel normalize + 3 grid_samples + sum)."""
    rng = np.random.default_rng(1)
    B, S, C, N = 2, 16, 8, 50
    pc_range = [-25, -25, -5, 25, 25, 3]
    voxel_size = (0.4, 0.4, 0.1)
    tri = rng.standard_normal((B, 3, S, S, C)).astype(np.float32)
    pts = rng.uniform(-24, 24, size=(B, N, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-4.9, 2.9, size=(B, N))

    ours = np.asarray(sample_triplane(tri, pts, pc_range, voxel_size))

    # torch oracle
    coors = np.zeros_like(pts)
    for i in range(3):
        coors[..., i] = (pts[..., i] - pc_range[i]) / voxel_size[i]
    coors = coors / (S / 2) - 1
    grid = coors[:, None, :, :]  # (B, 1, N, 3)
    ref = np.zeros((B, N, C), dtype=np.float32)
    for p, sel in enumerate([[0, 1], [1, 2], [0, 2]]):
        out = torch_grid_sample(tri[:, p], grid[..., sel].astype(np.float32))
        ref += out[:, 0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_sample_triplane_list_nonsquare():
    """Point-family planes are non-square; per-axis normalization
    (``point_triplane.py:450-462``)."""
    rng = np.random.default_rng(2)
    B, C, N = 1, 4, 40
    grid_size = (128, 128, 80)
    pc_range = [-25, -25, -5, 25, 25, 3]
    voxel_size = (0.390625, 0.390625, 0.1)
    planes = [
        rng.standard_normal((B, 128, 128, C)).astype(np.float32),
        rng.standard_normal((B, 128, 80, C)).astype(np.float32),
        rng.standard_normal((B, 128, 80, C)).astype(np.float32),
    ]
    pts = rng.uniform(-24, 24, size=(B, N, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-4.9, 2.9, size=(B, N))

    ours = np.asarray(
        sample_triplane_list(planes, pts, pc_range, grid_size, voxel_size)
    )

    coors = np.zeros_like(pts)
    for i in range(3):
        coors[..., i] = (pts[..., i] - pc_range[i]) / voxel_size[i]
        coors[..., i] = coors[..., i] / (grid_size[i] / 2) - 1
    grid = coors[:, None, :, :]
    ref = np.zeros((B, N, C), dtype=np.float32)
    for p, sel in enumerate([[0, 1], [1, 2], [0, 2]]):
        out = torch_grid_sample(planes[p], grid[..., sel].astype(np.float32))
        ref += out[:, 0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)
