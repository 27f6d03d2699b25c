"""Pallas fused triplane sampler vs the XLA reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
    triplane_sample_pallas,
)
from efficient_multimodal_perception_tpu.ops.sampling import (
    normalize_triplane_coords,
    sample_triplane,
)


def test_pallas_sampler_matches_reference():
    rng = np.random.default_rng(0)
    B, S, C, P = 2, 16, 8, 100
    pc_range = [-25, -25, -5, 25, 25, 3]
    voxel = (50 / S, 50 / S, 8 / S)
    tri = jnp.asarray(
        rng.standard_normal((B, 3, S, S, C)).astype(np.float32)
    )
    pts = rng.uniform(-26, 26, (B, P, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-5.5, 3.5, (B, P))

    ref = np.asarray(sample_triplane(tri, jnp.asarray(pts), pc_range, voxel))
    coords = normalize_triplane_coords(
        jnp.asarray(pts), pc_range, voxel, S
    )
    out = np.asarray(
        triplane_sample_pallas(tri, coords, block=32, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_sampler_gradients_match():
    """Custom VJP vs autodiff through the XLA gather sampler."""
    import jax

    rng = np.random.default_rng(3)
    B, S, C, P = 1, 8, 4, 50
    pc_range = [0, 0, 0, 8, 8, 8]
    voxel = (1.0, 1.0, 1.0)
    tri = jnp.asarray(
        rng.standard_normal((B, 3, S, S, C)).astype(np.float32)
    )
    pts = jnp.asarray(rng.uniform(0.5, 7.5, (B, P, 3)).astype(np.float32))
    coords = normalize_triplane_coords(pts, pc_range, voxel, S)

    def loss_ref(t):
        out = sample_triplane(t, pts, pc_range, voxel)
        return jnp.sum(jnp.sin(out))

    def loss_pallas(t):
        out = triplane_sample_pallas(t, coords, block=32, interpret=True)
        return jnp.sum(jnp.sin(out))

    g_ref = np.asarray(jax.grad(loss_ref)(tri))
    g_pal = np.asarray(jax.grad(loss_pallas)(tri))
    np.testing.assert_allclose(g_pal, g_ref, atol=1e-4)


def test_fused_convnext_block_matches_xla():
    """Fused inference block == XLA block path (interpret mode)."""
    import jax

    from efficient_multimodal_perception_tpu.models.convnext import (
        ConvNeXtBlock,
    )
    from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
        _block_fused_impl,
    )

    rng = np.random.default_rng(5)
    N, H, W, C = 2, 16, 32, 8
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    blk = ConvNeXtBlock(C)
    v = blk.init(jax.random.key(0), x)
    ref = blk.apply(v, x)
    p = v["params"]
    out = _block_fused_impl(
        x, p["dwconv_kernel"], p["dwconv_bias"], p["norm_scale"],
        p["norm_bias"], p["pwconv1_kernel"], p["pwconv1_bias"],
        p["pwconv2_kernel"], p["pwconv2_bias"], p["gamma"],
        interpret=True,
    )
    # erf approximation inside the kernel: ~1e-6 relative
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-5
    )


def test_pallas_sampler_padding_blocks():
    """P not a multiple of block; padded points must not corrupt output."""
    rng = np.random.default_rng(1)
    B, S, C, P = 1, 8, 4, 45
    tri = jnp.asarray(
        rng.standard_normal((B, 3, S, S, C)).astype(np.float32)
    )
    coords = jnp.asarray(
        rng.uniform(-0.9, 0.9, (B, P, 3)).astype(np.float32)
    )
    out = np.asarray(
        triplane_sample_pallas(tri, coords, block=32, interpret=True)
    )
    assert out.shape == (B, P, C)
    # compare vs reference math through grid_sample path
    from efficient_multimodal_perception_tpu.ops.sampling import (
        grid_sample_2d,
    )

    ref = (
        np.asarray(grid_sample_2d(tri[:, 0], coords[..., jnp.array([0, 1])]))
        + np.asarray(grid_sample_2d(tri[:, 1], coords[..., jnp.array([1, 2])]))
        + np.asarray(grid_sample_2d(tri[:, 2], coords[..., jnp.array([0, 2])]))
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_attention_pallas_interpret():
    """Fused neck attention == einsum softmax attention (values + the
    XLA-replay gradient), interpret mode."""
    import jax

    from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
        _attn_xla,
        attention_pallas,
    )

    rng = np.random.default_rng(7)
    G, N, hd = 2, 64, 24
    q, k, v = (
        jnp.asarray(rng.standard_normal((G, N, hd)).astype(np.float32))
        for _ in range(3)
    )
    scale = hd**-0.5
    out = np.asarray(attention_pallas(q, k, v, scale, True))
    ref = np.asarray(_attn_xla(q, k, v, scale))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    def loss_pallas(q, k, v):
        return (attention_pallas(q, k, v, scale, True) ** 2).mean()

    def loss_ref(q, k, v):
        return (_attn_xla(q, k, v, scale) ** 2).mean()

    # all three cotangents through the fused flash-style backward
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=f"d{name}"
        )


def test_attention_pallas_rectangular_interpret():
    """Rectangular (Nq != Nk) fused attention — the sr_ratio=4 MAE
    decoder shape class (many queries over few reduced K/V tokens) —
    matches the einsum in values and all three gradients."""
    import jax

    from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
        _attn_xla,
        attention_pallas,
    )

    rng = np.random.default_rng(11)
    G, Nq, Nk, hd = 2, 128, 32, 24
    q = jnp.asarray(rng.standard_normal((G, Nq, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((G, Nk, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((G, Nk, hd)).astype(np.float32))
    scale = hd**-0.5
    out = np.asarray(attention_pallas(q, k, v, scale, True))
    ref = np.asarray(_attn_xla(q, k, v, scale))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    def loss_pallas(q, k, v):
        return (attention_pallas(q, k, v, scale, True) ** 2).mean()

    def loss_ref(q, k, v):
        return (_attn_xla(q, k, v, scale) ** 2).mean()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=f"d{name}"
        )


def test_post_epilogue_bwd_interpret():
    """Fused epilogue backward == jax.vjp of the XLA block math
    (values for every cotangent), interpret mode."""
    import jax

    from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
        _xla_block_math,
        convnext_block_fused,
    )

    rng = np.random.default_rng(11)
    N, H, W, C = 2, 8, 16, 32
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    params = dict(
        dw_k=jnp.asarray(
            (rng.standard_normal((7, 7, 1, C)) * 0.1).astype(np.float32)
        ),
        dw_b=jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1),
        ln_s=jnp.asarray(1 + rng.standard_normal(C).astype(np.float32) * 0.1),
        ln_b=jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1),
        w1=jnp.asarray(
            (rng.standard_normal((C, 4 * C)) * 0.1).astype(np.float32)
        ),
        b1=jnp.asarray(rng.standard_normal(4 * C).astype(np.float32) * 0.1),
        w2=jnp.asarray(
            (rng.standard_normal((4 * C, C)) * 0.1).astype(np.float32)
        ),
        b2=jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1),
        gamma=jnp.asarray(
            rng.standard_normal(C).astype(np.float32) * 0.01
        ),
    )
    order = ("dw_k", "dw_b", "ln_s", "ln_b", "w1", "b1", "w2", "b2",
             "gamma")

    def loss_fused(x, p):
        return (
            convnext_block_fused(x, *[p[k] for k in order]) ** 2
        ).mean()

    def loss_ref(x, p):
        return (_xla_block_math(x, *[p[k] for k in order]) ** 2).mean()

    gx1, gp1 = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx2, gp2 = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(
        np.asarray(gx1), np.asarray(gx2), atol=2e-5
    )
    for kname in order:
        np.testing.assert_allclose(
            np.asarray(gp1[kname]), np.asarray(gp2[kname]), atol=2e-5,
            err_msg=kname,
        )


def test_post_epilogue_bwd_wide_interpret():
    """Wide-C (>384) fused epilogue backward — the variant that emits
    (z, h, dhpre) and forms the weight grads as XLA matmuls — matches
    jax.vjp of the XLA epilogue math, interpret mode."""
    import jax

    from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
        _xla_epilogue_math,
        post_epilogue_bwd_wide,
    )

    rng = np.random.default_rng(7)
    M, C = 32, 512
    y = jnp.asarray(rng.standard_normal((M, C)).astype(np.float32))
    p = [
        jnp.asarray(1 + rng.standard_normal(C).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1),
        jnp.asarray(
            (rng.standard_normal((C, 4 * C)) * 0.05).astype(np.float32)
        ),
        jnp.asarray(rng.standard_normal(4 * C).astype(np.float32) * 0.1),
        jnp.asarray(
            (rng.standard_normal((4 * C, C)) * 0.05).astype(np.float32)
        ),
        jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.01),
    ]
    g = jnp.asarray(rng.standard_normal((M, C)).astype(np.float32))
    _, vjp = jax.vjp(_xla_epilogue_math, y, *p)
    ref = vjp(g)
    got = post_epilogue_bwd_wide(y, g, *p, interpret=True)
    names = ("dy", "dlns", "dlnb", "dw1", "db1", "dw2", "db2", "dgamma")
    for n, a, b in zip(names, got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, err_msg=n
        )


def test_epilogue_fused_interpret():
    """Residual-free fused epilogue: values + grads vs XLA math."""
    import jax

    from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
        _xla_epilogue_math,
        epilogue_fused,
    )

    rng = np.random.default_rng(13)
    N, H, W, C = 2, 8, 16, 32
    y = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    p = [
        jnp.asarray(1 + rng.standard_normal(C).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1),
        jnp.asarray((rng.standard_normal((C, 4 * C)) * 0.1).astype(np.float32)),
        jnp.asarray(rng.standard_normal(4 * C).astype(np.float32) * 0.1),
        jnp.asarray((rng.standard_normal((4 * C, C)) * 0.1).astype(np.float32)),
        jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.01),
    ]
    out = epilogue_fused(y, *p)
    ref = _xla_epilogue_math(y, *p)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5
    )
    g1 = jax.grad(lambda y, *p: (epilogue_fused(y, *p) ** 2).mean(),
                  argnums=tuple(range(8)))(y, *p)
    g2 = jax.grad(lambda y, *p: (_xla_epilogue_math(y, *p) ** 2).mean(),
                  argnums=tuple(range(8)))(y, *p)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        )


def test_pallas_sampler_tiled_backward_matches():
    """H-tiled accumulator backward (VERDICT r2 #3) == untiled grads:
    shrink the accumulator budget so S=8 splits into 4 tiles."""
    import jax

    from efficient_multimodal_perception_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(9)
    B, S, C, P = 2, 8, 4, 70
    tri = jnp.asarray(
        rng.standard_normal((B, 3, S, S, C)).astype(np.float32)
    )
    coords = jnp.asarray(
        rng.uniform(-1.1, 1.1, (B, P, 3)).astype(np.float32)
    )

    def loss(t):
        out = triplane_sample_pallas(t, coords, block=32, interpret=True)
        return jnp.sum(jnp.sin(out))

    g_full = np.asarray(jax.grad(loss)(tri))
    old = pk._BWD_SCOPED_BUDGET
    # forces tile = S//4 (B=2 -> 2 buffered copies in the budget solve)
    pk._BWD_SCOPED_BUDGET = 2 * 3 * (S // 4) * C * S * 4
    try:
        g_tiled = np.asarray(jax.grad(loss)(tri))
    finally:
        pk._BWD_SCOPED_BUDGET = old
    np.testing.assert_allclose(g_tiled, g_full, atol=1e-6)


def test_cam_gather_sum_matches_xla():
    """One-hot-matmul interact gather (VERDICT r2 #8): fwd + feats-grad
    vs the take_along_axis formulation, interpret mode."""
    import jax

    from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
        cam_gather_sum,
    )

    rng = np.random.default_rng(11)
    B, N, K, C, P = 2, 3, 64, 8, 300
    feats = jnp.asarray(
        rng.standard_normal((B, N, K, C)).astype(np.float32)
    )
    idx = jnp.asarray(rng.integers(0, K, (B, N, P)), jnp.int32)
    valid = jnp.asarray(rng.random((B, N, P)) > 0.3)

    def xla(f):
        gathered = jnp.take_along_axis(f, idx[..., None], axis=2)
        return jnp.sum(gathered * valid[..., None].astype(f.dtype), axis=1)

    ref = np.asarray(xla(feats))
    out = np.asarray(cam_gather_sum(feats, idx, valid, True))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    def loss_k(f):
        return jnp.sum(jnp.sin(cam_gather_sum(f, idx, valid, True)))

    def loss_x(f):
        return jnp.sum(jnp.sin(xla(f)))

    g_k = np.asarray(jax.grad(loss_k)(feats))
    g_x = np.asarray(jax.grad(loss_x)(feats))
    np.testing.assert_allclose(g_k, g_x, atol=1e-5)
