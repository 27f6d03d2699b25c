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


def test_packed_readout_matches_mm():
    """Z-packed readout == 5-D mm readout, reshaped."""
    from efficient_multimodal_perception_tpu.ops.sampling import (
        sample_triplane_grid_mm_packed,
    )

    rng = np.random.default_rng(2)
    pc_range = [-25, -25, -5, 25, 25, 3]
    voxel = (0.4, 0.4, 0.1)
    tri = jnp.asarray(
        rng.standard_normal((2, 3, 32, 32, 8)).astype(np.float32)
    )
    _, ref = occupancy_roi(pc_range, (0.5, 0.5, 0.5))
    xs, ys, zs = ref[:, 0, 0, 0], ref[0, :, 0, 1], ref[0, 0, :, 2]
    vox = np.asarray(
        sample_triplane_grid_mm(tri, xs, ys, zs, pc_range, voxel)
    )
    packed = np.asarray(
        sample_triplane_grid_mm_packed(tri, xs, ys, zs, pc_range, voxel)
    )
    np.testing.assert_array_equal(packed.reshape(vox.shape), vox)


def test_list_packed_readout_matches_gather():
    """Point-family factorized packed readout == per-point gather
    sampling on the separable center grid (f32-vs-f64 coord noise)."""
    from efficient_multimodal_perception_tpu.ops.sampling import (
        sample_triplane_list,
        sample_triplane_list_grid_packed,
    )

    rng = np.random.default_rng(3)
    B, C = 2, 8
    planes = [
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in [(B, 32, 32, C), (B, 20, 32, C), (B, 20, 32, C)]
    ]
    pc_range = [-25, -25, -5, 25, 25, 3]
    gs = (32, 32, 20)
    voxel = (1.6, 1.6, 0.4)
    _, ref = occupancy_roi(pc_range, (0.5, 0.5, 0.5))
    ref = ref[:9, :9, :]
    xs, ys, zs = ref[:, 0, 0, 0], ref[0, :, 0, 1], ref[0, 0, :, 2]
    ref_b = jnp.broadcast_to(jnp.asarray(ref)[None], (B, *ref.shape))
    old = np.asarray(
        sample_triplane_list(planes, ref_b, pc_range, gs, voxel)
    )
    new = np.asarray(
        sample_triplane_list_grid_packed(
            planes, xs, ys, zs, pc_range, gs, voxel
        )
    )
    np.testing.assert_allclose(
        new.reshape(old.shape), old, atol=5e-5
    )


def test_occ_head_packed_mode_matches():
    """OccMlpHead packed (block-diagonal) mode == per-voxel mode,
    values and grads."""
    import jax

    from efficient_multimodal_perception_tpu.models.heads import OccMlpHead

    rng = np.random.default_rng(4)
    vox = jnp.asarray(
        rng.standard_normal((2, 9, 9, 16, 32)).astype(np.float32)
    )
    packed = jnp.asarray(np.asarray(vox).reshape(2, 9, 9, 16 * 32))
    head = OccMlpHead(input_dim=32, num_classes=5)
    v = head.init(jax.random.key(0), vox)
    l1 = head.apply(v, vox)
    l2 = head.apply(v, packed, packed_z=16)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-6)
    g1 = jax.grad(lambda p: (head.apply(p, vox) ** 2).mean())(v)
    g2 = jax.grad(
        lambda p: (head.apply(p, packed, packed_z=16) ** 2).mean()
    )(v)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )
