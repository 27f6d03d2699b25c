"""Factorized voxel-grid readout == dense triplane sampling."""

import numpy as np
import jax.numpy as jnp

from efficient_multimodal_perception_tpu.core.geometry import occupancy_roi
from efficient_multimodal_perception_tpu.ops.sampling import (
    sample_triplane,
    sample_triplane_grid,
    sample_triplane_grid_mm,
)


def test_grid_readout_matches_dense():
    rng = np.random.default_rng(0)
    pc_range = [-25, -25, -5, 25, 25, 3]
    voxel = (0.4, 0.4, 0.1)
    tri = jnp.asarray(
        rng.standard_normal((2, 3, 32, 32, 4)).astype(np.float32)
    )
    _, ref = occupancy_roi(pc_range, (0.5, 0.5, 0.5))
    ref = ref[:9, :9, :]  # small slice for speed

    dense = sample_triplane(
        tri, jnp.asarray(ref)[None].repeat(2, 0), pc_range, voxel
    )
    fact = sample_triplane_grid(
        tri,
        jnp.asarray(ref[:, 0, 0, 0]),
        jnp.asarray(ref[0, :, 0, 1]),
        jnp.asarray(ref[0, 0, :, 2]),
        pc_range,
        voxel,
    )
    np.testing.assert_allclose(np.asarray(fact), np.asarray(dense), atol=2e-5)

    mm = sample_triplane_grid_mm(
        tri,
        ref[:, 0, 0, 0],
        ref[0, :, 0, 1],
        ref[0, 0, :, 2],
        pc_range,
        voxel,
    )
    np.testing.assert_allclose(np.asarray(mm), np.asarray(dense), atol=2e-5)


def test_mm_readout_out_of_range_axes():
    """Out-of-range grid coords must fade to zero exactly like
    grid_sample's zero padding."""
    rng = np.random.default_rng(1)
    tri = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 2)).astype(np.float32))
    pc_range = [0, 0, 0, 8, 8, 8]
    voxel = (1.0, 1.0, 1.0)
    xs = np.array([-5.0, 4.0])  # first x is far outside
    ys = np.array([4.0])
    zs = np.array([4.0])
    mm = np.asarray(
        sample_triplane_grid_mm(tri, xs, ys, zs, pc_range, voxel)
    )
    dense = np.asarray(
        sample_triplane(
            tri,
            jnp.asarray([[[x, 4.0, 4.0] for x in xs]], jnp.float32),
            pc_range,
            voxel,
        )
    )
    np.testing.assert_allclose(mm[0, :, 0, 0], dense[0], atol=1e-5)
