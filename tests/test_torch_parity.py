"""Component parity vs inline torch re-implementations with shared weights.

The reference stack can't run here (mmcv/mmdet absent), so these tests
rebuild its building blocks in plain torch (same ops the reference uses:
Conv2d, LayerNorm, Linear, exact GELU, softmax attention) and check our
flax modules produce the same outputs under transplanted weights —
f32, atol ~1e-4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_convnext_block_parity():
    """ConvNeXt block vs torch (dwconv -> LN -> MLP -> gamma -> res),
    the SparseConvNeXtBlock dense math (sparse_utils.py:132-233)."""
    from efficient_multimodal_perception_tpu.models.convnext import (
        ConvNeXtBlock,
    )

    rng = np.random.default_rng(0)
    N, H, W, C = 2, 8, 8, 16
    x = rng.standard_normal((N, H, W, C)).astype(np.float32)

    blk = ConvNeXtBlock(C)
    v = blk.init(jax.random.key(0), jnp.asarray(x))
    p = jax.tree.map(np.asarray, v["params"])
    ours = np.asarray(blk.apply(v, jnp.asarray(x)))

    with torch.no_grad():
        xt = t(x).permute(0, 3, 1, 2)  # NCHW
        dw = torch.nn.Conv2d(C, C, 7, padding=3, groups=C)
        # flax HWIO (7,7,1,C) -> torch (C,1,7,7)
        dw.weight.copy_(t(p["dwconv_kernel"]).permute(3, 2, 0, 1))
        dw.bias.copy_(t(p["dwconv_bias"]))
        y = dw(xt).permute(0, 2, 3, 1)  # NHWC
        ln = torch.nn.LayerNorm(C, eps=1e-6)
        ln.weight.copy_(t(p["norm_scale"]))
        ln.bias.copy_(t(p["norm_bias"]))
        y = ln(y)
        fc1 = torch.nn.Linear(C, 4 * C)
        fc1.weight.copy_(t(p["pwconv1_kernel"]).T)
        fc1.bias.copy_(t(p["pwconv1_bias"]))
        fc2 = torch.nn.Linear(4 * C, C)
        fc2.weight.copy_(t(p["pwconv2_kernel"]).T)
        fc2.bias.copy_(t(p["pwconv2_bias"]))
        y = fc2(torch.nn.functional.gelu(fc1(y)))
        y = y * t(p["gamma"])
        ref = (t(x) + y).numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_mit_block_parity():
    """SegFormer block (attention + MixFFN) vs torch (mit.py:74-221)."""
    from efficient_multimodal_perception_tpu.models.mit import MiTBlock

    rng = np.random.default_rng(1)
    B, H, W, C, heads = 1, 4, 8, 16, 4
    x = rng.standard_normal((B, H * W, C)).astype(np.float32)

    blk = MiTBlock(C, num_heads=heads, mlp_ratio=2, sr_ratio=1)
    v = blk.init(jax.random.key(0), jnp.asarray(x), (H, W))
    p = jax.tree.map(np.asarray, v["params"])
    ours = np.asarray(blk.apply(v, jnp.asarray(x), (H, W)))

    with torch.no_grad():
        xt = t(x)

        def linear(d_in, d_out, kernel, bias=None):
            m = torch.nn.Linear(d_in, d_out, bias=bias is not None)
            m.weight.copy_(t(kernel).T)
            if bias is not None:
                m.bias.copy_(t(bias))
            return m

        ln1 = torch.nn.LayerNorm(C)
        ln1.weight.copy_(t(p["norm1"]["scale"]))
        ln1.bias.copy_(t(p["norm1"]["bias"]))
        y = ln1(xt)
        q = linear(C, C, p["attn"]["q"]["kernel"])(y)
        kv = linear(C, 2 * C, p["attn"]["kv"]["kernel"])(y)
        k, vv = kv.chunk(2, dim=-1)
        hd = C // heads

        def split(z):
            return z.reshape(B, -1, heads, hd).permute(0, 2, 1, 3)

        attn = (split(q) @ split(k).transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        o = (attn @ split(vv)).permute(0, 2, 1, 3).reshape(B, -1, C)
        o = linear(
            C, C, p["attn"]["proj"]["kernel"], p["attn"]["proj"]["bias"]
        )(o)
        xt = xt + o

        ln2 = torch.nn.LayerNorm(C)
        ln2.weight.copy_(t(p["norm2"]["scale"]))
        ln2.bias.copy_(t(p["norm2"]["bias"]))
        y = ln2(xt)
        y = linear(
            C, 2 * C, p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"]
        )(y)
        dwc = torch.nn.Conv2d(2 * C, 2 * C, 3, padding=1, groups=2 * C)
        dwc.weight.copy_(t(p["mlp"]["dwconv"]["kernel"]).permute(3, 2, 0, 1))
        dwc.bias.copy_(t(p["mlp"]["dwconv"]["bias"]))
        y2 = y.transpose(1, 2).reshape(B, 2 * C, H, W)
        y = dwc(y2).flatten(2).transpose(1, 2)
        y = torch.nn.functional.gelu(y)
        y = linear(
            2 * C, C, p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"]
        )(y)
        ref = (xt + y).numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_overlap_patch_embed_parity():
    """OverlapPatchEmbed conv+LN vs torch (mit.py:224-282)."""
    from efficient_multimodal_perception_tpu.models.mit import (
        OverlapPatchEmbed,
    )

    rng = np.random.default_rng(2)
    B, H, W, C, E = 1, 16, 32, 8, 12
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    pe = OverlapPatchEmbed((7, 7), (4, 4), E)
    v = pe.init(jax.random.key(0), jnp.asarray(x))
    p = jax.tree.map(np.asarray, v["params"])
    ours, (h, w) = pe.apply(v, jnp.asarray(x))
    ours = np.asarray(ours)

    with torch.no_grad():
        conv = torch.nn.Conv2d(C, E, 7, stride=4, padding=3)
        conv.weight.copy_(t(p["proj"]["kernel"]).permute(3, 2, 0, 1))
        conv.bias.copy_(t(p["proj"]["bias"]))
        y = conv(t(x).permute(0, 3, 1, 2))
        assert y.shape[-2:] == (h, w)
        y = y.flatten(2).transpose(1, 2)
        ln = torch.nn.LayerNorm(E)
        ln.weight.copy_(t(p["norm"]["scale"]))
        ln.bias.copy_(t(p["norm"]["bias"]))
        ref = ln(y).numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_conv_transpose_import_parity():
    """MiT-High upsampler convention check (VERDICT r2 Weak #6): torch
    ``ConvTranspose2d(3, s=2, p=1, output_padding=1)`` vs flax
    ``nn.ConvTranspose(strides=2, padding=SAME)`` under the importer's
    permute+flip weight transform (``import_torch_ckpt._conv_transpose``)
    — one wrong flip and MiT-High checkpoints import scrambled."""
    import sys
    sys.path.insert(0, "tools")
    from import_torch_ckpt import _conv_transpose
    import flax.linen as nn

    rng = np.random.default_rng(5)
    Cin, Cout, H, W = 5, 7, 9, 11
    x = rng.standard_normal((2, H, W, Cin)).astype(np.float32)

    tconv = torch.nn.ConvTranspose2d(
        Cin, Cout, 3, stride=2, padding=1, output_padding=1
    )
    with torch.no_grad():
        ref = (
            tconv(t(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        )
    assert ref.shape == (2, 2 * H, 2 * W, Cout)

    # same settings as the MiT-High upsampler (mit.py:262-268)
    mod = nn.ConvTranspose(
        Cout, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2))
    )
    params = {
        "kernel": jnp.asarray(
            _conv_transpose(tconv.weight.detach().numpy())
        ),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(
            jax.jit(lambda p, x: mod.apply({"params": p}, x))(
                params, jnp.asarray(x)
            )
        )
    np.testing.assert_allclose(ours, ref, atol=1e-5)
