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


def test_grid_sample_mm_matches_gather_and_torch():
    """The one-hot MXU form (grid_sample_2d_mm) is the same function as
    the gather form — incl. zero padding via the factored per-axis
    masks, grads, and edge coords exactly on pixel borders."""
    import jax
    import jax.numpy as jnp

    from efficient_multimodal_perception_tpu.ops.sampling import (
        grid_sample_2d_mm,
    )

    rng = np.random.default_rng(3)
    img = rng.standard_normal((3, 16, 32, 7)).astype(np.float32)
    grid = rng.uniform(-1.6, 1.6, size=(3, 257, 2)).astype(np.float32)
    # exact borders / corners where the floor-index edge cases live
    grid[0, :8] = [[-1, -1], [1, 1], [0, 0], [-1, 1],
                   [1, -1], [0.999, 0.999], [-0.999, 0.5], [2.0, 0.0]]

    ours = np.asarray(grid_sample_2d_mm(img, grid, precision="highest"))
    base = np.asarray(grid_sample_2d(img, grid))
    ref = torch_grid_sample(
        img, grid.reshape(3, 257, 1, 2)
    ).reshape(3, 257, 7)
    np.testing.assert_allclose(ours, base, atol=5e-6)
    np.testing.assert_allclose(ours, ref, atol=5e-6)

    # grads match the gather form (image grad is the matmul transpose)
    def loss_mm(im):
        return (grid_sample_2d_mm(im, jnp.asarray(grid),
                                  precision="highest") ** 2).sum()

    def loss_g(im):
        return (grid_sample_2d(im, jnp.asarray(grid)) ** 2).sum()

    g_mm = np.asarray(jax.grad(loss_mm)(jnp.asarray(img)))
    g_g = np.asarray(jax.grad(loss_g)(jnp.asarray(img)))
    np.testing.assert_allclose(g_mm, g_g, atol=2e-4, rtol=1e-4)


def test_point_to_cam_mm_dispatch_matches_gather():
    """point_to_cam's bf16 one-hot MXU dispatch is the same sampler to
    bf16 rounding (the f32 path keeps the exact gather form)."""
    import jax.numpy as jnp

    from efficient_multimodal_perception_tpu.core.geometry import CameraAug
    from efficient_multimodal_perception_tpu.models import point_family as pf

    rng = np.random.default_rng(11)
    B, N, P, h, w, C = 2, 3, 513, 16, 32, 24
    H, W = 256, 512
    feats = rng.standard_normal((B, N, h, w, C)).astype(np.float32)
    pts = rng.uniform(-30, 30, (B, P, 3)).astype(np.float32)
    valid = rng.random((B, P)) < 0.9
    l2i = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    l2i[..., 2, 3] = 5.0  # push points in front of the "camera"
    aug = CameraAug.identity(B, N)

    def run(dtype):
        return np.asarray(
            pf.point_to_cam(
                jnp.asarray(pts), jnp.asarray(valid),
                jnp.asarray(feats, dtype), jnp.asarray(l2i), aug, (H, W),
            ),
            np.float32,
        )

    out_f32 = run(jnp.float32)     # gather form (exact)
    out_bf16 = run(jnp.bfloat16)   # mm form (bf16-rounded weights)
    scale = np.abs(out_f32).max() + 1e-6
    assert np.max(np.abs(out_bf16 - out_f32)) / scale < 3e-2
