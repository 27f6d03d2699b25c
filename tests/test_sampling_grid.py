"""Factorized voxel-grid readout == dense triplane sampling."""

import numpy as np
import jax.numpy as jnp

from efficient_multimodal_perception_tpu.core.geometry import occupancy_roi
from efficient_multimodal_perception_tpu.ops.sampling import (
    sample_triplane,
    sample_triplane_grid,
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
