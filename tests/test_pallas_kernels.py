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


def test_ln_dense_fused_interpret():
    """ln_dense_fused == LN + matmul (fwd, interpret mode) and its VJP
    == the XLA math's VJP (the bwd is an XLA replay by construction)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
        _xla_ln_dense,
        ln_dense_fused,
    )

    rng = np.random.default_rng(0)
    M, K, N = 64, 128, 256
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(K,)) * 0.2 + 1.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(K,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) / np.sqrt(K), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(N,)) * 0.1, jnp.float32)

    out = ln_dense_fused(x, s, b, w, bias)
    ref = _xla_ln_dense(x, s, b, w, bias, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # no-bias variant
    out_nb = ln_dense_fused(x, s, b, w, None)
    ref_nb = _xla_ln_dense(x, s, b, w, None, 1e-6)
    np.testing.assert_allclose(np.asarray(out_nb), np.asarray(ref_nb),
                               atol=1e-5, rtol=1e-5)

    g_f = jax.grad(lambda *a: ln_dense_fused(*a).sum(), argnums=(0, 1, 2, 3, 4))(
        x, s, b, w, bias)
    g_r = jax.grad(lambda *a: _xla_ln_dense(*a, 1e-6).sum(),
                   argnums=(0, 1, 2, 3, 4))(x, s, b, w, bias)
    for a, r in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-5, rtol=1e-5)


def test_gelu_dense_fused_interpret():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
        _xla_gelu_dense,
        gelu_dense_fused,
    )

    rng = np.random.default_rng(1)
    M, K, N = 64, 256, 128
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) / np.sqrt(K), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(N,)) * 0.1, jnp.float32)

    out = gelu_dense_fused(x, w, bias)
    ref = _xla_gelu_dense(x, w, bias)
    # fwd uses the A&S erf approximation (abs err ~1.5e-7 on erf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    g_f = jax.grad(lambda *a: gelu_dense_fused(*a).sum(),
                   argnums=(0, 1, 2))(x, w, bias)
    g_r = jax.grad(lambda *a: _xla_gelu_dense(*a).sum(),
                   argnums=(0, 1, 2))(x, w, bias)
    for a, r in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-5, rtol=1e-5)


def test_mit_block_fused_prologue_matches_unfused():
    """MiTBlock with fuse_prologue=True (interpret off-TPU) == the stock
    path, fwd + grads — the module-level wiring of ln/gelu_dense_fused."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficient_multimodal_perception_tpu.models.mit import MiTBlock

    kw = dict(dim=128, num_heads=4, mlp_ratio=2, sr_ratio=1)
    m0 = MiTBlock(fuse_prologue=False, **kw)
    m1 = MiTBlock(fuse_prologue=True, **kw)
    x = jax.random.normal(jax.random.key(0), (2, 64, 128), jnp.float32)
    params = m0.init(jax.random.key(1), x, (8, 8))

    y0 = jax.jit(lambda p, xx: m0.apply(p, xx, (8, 8)))(params, x)
    y1 = jax.jit(lambda p, xx: m1.apply(p, xx, (8, 8)))(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=3e-5, rtol=3e-5)

    g0 = jax.grad(lambda p: m0.apply(p, x, (8, 8)).sum())(params)
    g1 = jax.grad(lambda p: m1.apply(p, x, (8, 8)).sum())(params)
    flat0 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(g0)}
    flat1 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(g1)}
    assert set(flat0) == set(flat1)
    for k in flat0:
        np.testing.assert_allclose(np.asarray(flat0[k]),
                                   np.asarray(flat1[k]),
                                   atol=3e-5, rtol=3e-5, err_msg=k)


def test_finite_mlp_fused_interpret():
    """finite_mlp_fused == where(-inf -> 0) + fc1 + relu + fc2 (fwd,
    interpret mode) and its VJP == the XLA replay's VJP; -inf rows get
    exactly the bias-only output and zero input-gradient."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
        _xla_finite_mlp,
        finite_mlp_fused,
    )

    rng = np.random.default_rng(1)
    M, K, N = 64, 256, 128
    x = rng.normal(size=(M, K)).astype(np.float32)
    x[rng.random((M, K)) < 0.3] = -np.inf  # empty pooled cells
    x[3] = -np.inf  # a fully-empty row
    x = jnp.asarray(x)
    w1 = jnp.asarray(rng.normal(size=(K, N)) / np.sqrt(K), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(N,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(N, N)) / np.sqrt(N), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(N,)) * 0.1, jnp.float32)

    out = finite_mlp_fused(x, w1, b1, w2, b2)
    ref = _xla_finite_mlp(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # empty row == bias-only path
    zero_ref = _xla_finite_mlp(jnp.zeros((1, K)), w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out)[3], np.asarray(zero_ref)[0],
                               atol=1e-6)

    g_f = jax.grad(
        lambda *a: finite_mlp_fused(*a).sum(), argnums=(0, 1, 2, 3, 4)
    )(x, w1, b1, w2, b2)
    g_r = jax.grad(
        lambda *a: _xla_finite_mlp(*a).sum(), argnums=(0, 1, 2, 3, 4)
    )(x, w1, b1, w2, b2)
    for a, r in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-5, rtol=1e-5)
    # -inf inputs must not leak gradient (and must not be NaN)
    dx = np.asarray(g_f[0])
    assert np.all(np.isfinite(dx) | np.isinf(np.asarray(x)))
    assert np.all(dx[np.asarray(x) == -np.inf] == 0.0)


def test_raw_pools_plus_finite_mlp_matches_cleaned_dense():
    """The projector's fused formulation — raw (-inf-empty) pools fed
    to finite_mlp_fused — equals the plain path: cleaned (0-empty)
    pools through fc1+relu+fc2."""
    import jax.numpy as jnp
    import numpy as np

    from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
        finite_mlp_fused,
    )
    from efficient_multimodal_perception_tpu.ops.scatter import (
        point_plane_pools_batch,
    )

    rng = np.random.default_rng(2)
    grid, split = (8, 8, 4), (4, 4, 2)
    B, P, C = 2, 64, 128  # sparse: most cells empty
    idx = jnp.asarray(rng.integers(0, [8, 8, 4], size=(B, P, 3)),
                      jnp.int32)
    feats = jnp.asarray(rng.standard_normal((B, P, C)), jnp.float32)
    valid = jnp.asarray(rng.random((B, P)) > 0.3)
    w1 = jnp.asarray(rng.normal(size=(split[2] * C, C)) * 0.05,
                     jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(C, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)

    clean = point_plane_pools_batch(feats, idx, valid, grid, split)[0]
    raw = point_plane_pools_batch(feats, idx, valid, grid, split,
                                  raw=True)[0]
    X, Y = grid[0], grid[1]
    M = B * X * Y
    clean2 = clean.reshape(M, -1)
    raw2 = raw.reshape(M, -1)
    ref = jnp.maximum(clean2 @ w1 + b1, 0.0) @ w2 + b2
    out = finite_mlp_fused(raw2, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
