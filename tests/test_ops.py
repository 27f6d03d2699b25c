"""Scatter / segment / radius op tests vs numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from efficient_multimodal_perception_tpu.ops.scatter import (
    masked_segment_max,
    masked_segment_sum,
    point_axis_pools,
    scatter_set_2d,
)
from efficient_multimodal_perception_tpu.ops.radius import radius_neighbors


def test_masked_segment_max_empty_zero():
    feats = jnp.asarray([[1.0, -2.0], [3.0, -4.0], [9.0, 9.0]])
    ids = jnp.asarray([0, 0, 2])
    valid = jnp.asarray([True, True, False])
    out = np.asarray(masked_segment_max(feats, ids, valid, 3))
    # segment 0: max; segment 1 empty -> 0; segment 2 only-invalid -> 0
    np.testing.assert_allclose(out, [[3, -2], [0, 0], [0, 0]])


def test_masked_segment_max_sorted_bitexact_and_grad():
    """The sorted (argsort + indices_are_sorted) form must be
    bit-identical to the unsorted scatter-max, with matching gradients
    (its permutation custom-VJP replaces autodiff's scatter-add bwd
    with a gather — see ops/scatter._permute_rows)."""
    from efficient_multimodal_perception_tpu.ops.scatter import (
        masked_segment_max_sorted,
    )

    rng = np.random.default_rng(3)
    P, C, S = 733, 9, 41
    feats = jnp.asarray(rng.standard_normal((P, C)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, S, P), jnp.int32)
    valid = jnp.asarray(rng.random(P) < 0.85)

    for empty in (0.0, None):
        a = masked_segment_max(feats, ids, valid, S, empty_value=empty)
        b = masked_segment_max_sorted(
            feats, ids, valid, S, empty_value=empty
        )
        assert bool(jnp.array_equal(a, b, equal_nan=True))

    w = jnp.asarray(rng.standard_normal((S, C)), jnp.float32)
    ga = jax.grad(
        lambda f: (masked_segment_max(f, ids, valid, S) * w).sum()
    )(feats)
    gb = jax.grad(
        lambda f: (masked_segment_max_sorted(f, ids, valid, S) * w).sum()
    )(feats)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb))


def test_point_plane_pools_sorted_knob_parity(monkeypatch):
    """point_plane_pools_batch output is invariant to the sorted-xy-pool
    dispatch (EMP_DISABLE_SORTED_POOL triage knob)."""
    from efficient_multimodal_perception_tpu.ops.scatter import (
        point_plane_pools_batch,
    )

    rng = np.random.default_rng(5)
    B, P = 2, 400
    feats = jnp.asarray(rng.standard_normal((B, P, 16)), jnp.bfloat16)
    gi = jnp.asarray(rng.integers(0, [16, 16, 8], (B, P, 3)), jnp.int32)
    valid = jnp.asarray(rng.random((B, P)) < 0.9)
    args = (feats, gi, valid, (16, 16, 8), (4, 4, 4))

    sorted_out = point_plane_pools_batch(*args)
    monkeypatch.setenv("EMP_DISABLE_SORTED_POOL", "1")
    unsorted_out = point_plane_pools_batch(*args)
    for a, b in zip(sorted_out, unsorted_out):
        assert bool(jnp.array_equal(a, b))


def test_masked_segment_sum_collisions():
    feats = jnp.ones((4, 1))
    ids = jnp.asarray([1, 1, 1, 0])
    valid = jnp.asarray([True, True, False, True])
    out = np.asarray(masked_segment_sum(feats, ids, valid, 2))
    np.testing.assert_allclose(out, [[1], [2]])


def test_point_axis_pools_vs_dense_oracle():
    """Direct per-point pooling == scatter-max-to-voxels + axis max-pool
    (the spconv pipeline, point_triplane_projector.py:104-115)."""
    rng = np.random.default_rng(0)
    grid, split = (8, 8, 4), (4, 4, 2)
    P, C = 200, 6
    idx = rng.integers(0, [8, 8, 4], size=(P, 3)).astype(np.int32)
    feats = rng.standard_normal((P, C)).astype(np.float32)
    valid = rng.random(P) > 0.2

    xy, yz, xz = point_axis_pools(
        jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(valid), grid, split
    )

    # oracle: dense voxel grid via scatter max, empty=0 after pooling
    dense = np.full((*grid, C), -np.inf, np.float32)
    for p in range(P):
        if valid[p]:
            i, j, k = idx[p]
            dense[i, j, k] = np.maximum(dense[i, j, k], feats[p])

    def pool(d, axis, out_size):
        k = d.shape[axis] // out_size
        parts = np.split(d, out_size, axis=axis)
        pooled = np.stack([p.max(axis=axis) for p in parts], axis=axis)
        pooled[pooled == -np.inf] = 0.0
        return pooled

    np.testing.assert_allclose(np.asarray(xy), pool(dense, 2, 2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(yz), pool(dense, 0, 4), atol=1e-6)
    np.testing.assert_allclose(np.asarray(xz), pool(dense, 1, 4), atol=1e-6)


def test_scatter_set_2d_drops_invalid():
    canvas = jnp.zeros((4, 4, 2))
    rows = jnp.asarray([1, 3, 2])
    cols = jnp.asarray([1, 3, 0])
    valid = jnp.asarray([True, False, True])
    vals = jnp.asarray([[1.0, 1], [2, 2], [3, 3]])
    out = np.asarray(scatter_set_2d(canvas, rows, cols, valid, vals))
    assert out[1, 1].tolist() == [1, 1]
    assert out[3, 3].tolist() == [0, 0]
    assert out[2, 0].tolist() == [3, 3]


def test_scatter_set_2d_negative_col_not_wrapped():
    """Invalid entries with col=-1 must be dropped, not wrap to the
    last pixel (regression: flat index H*W + (-1) is in bounds)."""
    canvas = jnp.zeros((4, 4, 1))
    out = np.asarray(
        scatter_set_2d(
            canvas,
            jnp.asarray([-1]),
            jnp.asarray([-1]),
            jnp.asarray([False]),
            jnp.asarray([[9.0]]),
        )
    )
    assert out.sum() == 0.0


def test_scatter_set_2d_batch_matches_vmapped_and_grad():
    """Flat batched winner scatter == vmap(scatter_set_2d) bit-exactly
    on adversarial coords (negatives, wraps, past-end, duplicates), and
    its gather-form custom VJP == the autodiff scatter-add gradient."""
    import jax

    from efficient_multimodal_perception_tpu.ops.scatter import (
        scatter_set_2d_batch,
    )

    rng = np.random.default_rng(3)
    G, H, W, C, P = 5, 8, 12, 3, 64
    rows = jnp.asarray(rng.integers(-2, H + 3, (G, P)), jnp.int32)
    cols = jnp.asarray(rng.integers(-2, W + 3, (G, P)), jnp.int32)
    valid = jnp.asarray(rows > 0)
    vals = jnp.asarray(rng.standard_normal((G, P, C)), jnp.float32)

    ref = jax.vmap(
        lambda r, c, v, x: scatter_set_2d(jnp.zeros((H, W, C)), r, c, v, x)
    )(rows, cols, valid, vals)
    out = scatter_set_2d_batch(rows, cols, valid, vals, H, W)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    g_ref = jax.grad(
        lambda x: (
            jax.vmap(
                lambda r, c, v, xx: scatter_set_2d(
                    jnp.zeros((H, W, C)), r, c, v, xx
                )
            )(rows, cols, valid, x)
            ** 2
        ).sum()
    )(vals)
    g_out = jax.grad(
        lambda x: (scatter_set_2d_batch(rows, cols, valid, x, H, W) ** 2).sum()
    )(vals)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               atol=1e-6)


def test_radius_neighbors_vs_bruteforce():
    rng = np.random.default_rng(1)
    Q, S, r, k = 37, 500, 1.0, 8
    q = rng.uniform(-3, 3, (Q, 3)).astype(np.float32)
    s = rng.uniform(-3, 3, (S, 3)).astype(np.float32)
    valid = rng.random(S) > 0.1

    idx, mask = jax.jit(
        lambda a, b, v: radius_neighbors(a, b, v, r, k, chunk=16)
    )(jnp.asarray(q), jnp.asarray(s), jnp.asarray(valid))
    idx, mask = np.asarray(idx), np.asarray(mask)

    d2 = ((q[:, None] - s[None]) ** 2).sum(-1)
    d2[:, ~valid] = np.inf
    for i in range(Q):
        # torch_geometric.radius semantics: FIRST k within radius in
        # support-index order
        within = np.where(d2[i] <= r * r)[0]
        expected = list(within[:k])
        got = list(idx[i][mask[i]])
        assert got == expected, (i, got, expected)


def test_point_axis_pools_batch_matches_vmap():
    """The flat batch-offset form is bit-identical to vmapped
    point_axis_pools (max is exact — no tolerance needed)."""
    import jax

    from efficient_multimodal_perception_tpu.ops.scatter import (
        point_axis_pools_batch,
    )

    rng = np.random.default_rng(5)
    grid, split = (8, 8, 4), (4, 4, 2)
    B, P, C = 3, 200, 6
    idx = rng.integers(0, [8, 8, 4], size=(B, P, 3)).astype(np.int32)
    feats = rng.standard_normal((B, P, C)).astype(np.float32)
    valid = rng.random((B, P)) > 0.2

    ref = jax.vmap(
        lambda f, g, v: point_axis_pools(f, g, v, grid, split)
    )(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(valid))
    out = point_axis_pools_batch(
        jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(valid), grid,
        split,
    )
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))


def test_point_plane_pools_batch_is_transposed_axis_pools():
    """The plane-layout pools are exactly the permute of the axis-pool
    outputs (the projector's reference flatten order,
    point_triplane_projector.py:111-115), bit-identical."""
    from efficient_multimodal_perception_tpu.ops.scatter import (
        point_axis_pools_batch,
        point_plane_pools_batch,
    )

    rng = np.random.default_rng(7)
    grid, split = (8, 8, 4), (4, 4, 2)
    B, P, C = 3, 200, 6
    idx = jnp.asarray(
        rng.integers(0, [8, 8, 4], size=(B, P, 3)).astype(np.int32)
    )
    feats = jnp.asarray(rng.standard_normal((B, P, C)).astype(np.float32))
    valid = jnp.asarray(rng.random((B, P)) > 0.2)

    xy_a, yz_a, xz_a = point_axis_pools_batch(feats, idx, valid, grid, split)
    xy_p, yz_p, xz_p = point_plane_pools_batch(feats, idx, valid, grid, split)
    np.testing.assert_array_equal(np.asarray(xy_p), np.asarray(xy_a))
    np.testing.assert_array_equal(
        np.asarray(yz_p), np.asarray(yz_a.transpose(0, 2, 3, 1, 4))
    )
    np.testing.assert_array_equal(
        np.asarray(xz_p), np.asarray(xz_a.transpose(0, 1, 3, 2, 4))
    )
