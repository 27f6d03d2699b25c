"""Component-level shape/behavior tests (tiny channels, full spatial)."""

import jax
import jax.numpy as jnp
import numpy as np

from efficient_multimodal_perception_tpu.models.builder import build_model
from efficient_multimodal_perception_tpu.models.convnext import (
    MaskConvNeXt,
    random_active_mask,
    upsample_mask,
)
from efficient_multimodal_perception_tpu.models.fpn import GeneralizedLSSFPN
from efficient_multimodal_perception_tpu.models.mit import (
    MixVisionTransformer,
    MixVisionTransformerHead,
    pixel_shuffle,
)

ARCH = {"depths": (1, 1, 1, 1), "channels": (4, 8, 16, 32)}


def test_convnext_range_shapes():
    """Range encoder: (1,4) stem + (1,2) downsamples keep H=32
    (mask_convnext.py:98-103)."""
    m = MaskConvNeXt(
        arch=ARCH, in_channels=5, stem_patch_size=(1, 4),
        downsample_height=False, norm_out=True,
    )
    x = jnp.zeros((1, 32, 1024, 5))
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 32, 32, 32)


def test_convnext_split_forward_consistent():
    """forward1+forward2 == full forward (mask_convnextv2.py:212-261)."""
    m = MaskConvNeXt(arch=ARCH, stem_patch_size=(2, 2), out_indices=1,
                     norm_out=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 64, 128, 3)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    full = m.apply(v, x)
    mid = m.apply(v, x, method="forward1")
    assert mid.shape == (1, 16, 32, 8)
    out = m.apply(v, mid, method="forward2")
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-6)


def test_convnext_all_scale():
    m = MaskConvNeXt(arch=ARCH, stem_patch_size=(1, 1), out_all_scale=True,
                     in_channels=16)
    x = jnp.zeros((1, 32, 32, 16))
    v = m.init(jax.random.key(0), x)
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 4), (1, 16, 16, 8), (1, 8, 8, 16), (1, 4, 4, 32)
    ]


def test_masking_zeroes_masked_regions():
    """Masked-mode invariant: masked pixels stay identically zero at
    every scale (the SparK sparse-conv contract, sparse_utils.py:27-33)."""
    m = MaskConvNeXt(arch=ARCH, stem_patch_size=(2, 2), norm_out=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 64, 64, 3)), jnp.float32)
    mask = random_active_mask(jax.random.key(3), 2, 4, 4, 0.5)
    xm = x * upsample_mask(mask, (64, 64)).astype(x.dtype)
    v = m.init(jax.random.key(0), xm, active_mask=mask)
    y = m.apply(v, xm, active_mask=mask)  # (2, 4, 4, 32) - mask res
    inactive = ~np.asarray(mask)[..., 0]
    assert np.abs(np.asarray(y)[inactive]).max() == 0.0
    # ratio=0 mask == dense
    ones = jnp.ones((2, 4, 4, 1), bool)
    y_masked = m.apply(v, x, active_mask=ones)
    y_dense = m.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(y_masked), np.asarray(y_dense), atol=1e-6
    )


def test_random_active_mask_keep_count():
    mask = random_active_mask(jax.random.key(0), 4, 8, 8, 0.75)
    counts = np.asarray(mask).reshape(4, -1).sum(1)
    assert (counts == 16).all()  # keep 25% of 64


def test_pixel_shuffle_matches_torch_order():
    import torch

    x = np.random.default_rng(0).standard_normal((1, 3, 5, 16)).astype(
        np.float32
    )
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = (
        torch.pixel_shuffle(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 2
        ).numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_mit_neck_shapes():
    m = MixVisionTransformer(img_size=(128, 32), in_chans=16, embed_dim=16)
    x = jnp.zeros((1, 128, 32, 16))
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 128, 128, 96)


def test_mit_high_neck_shapes():
    m = MixVisionTransformer(img_size=(128, 32), in_chans=16, embed_dim=16,
                             high=True)
    x = jnp.zeros((1, 128, 32, 16))
    v = m.init(jax.random.key(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 256, 256, 96)


def test_mit_head_patch_roundtrip():
    head = MixVisionTransformerHead(
        patch_size=(1, 7), stride=(1, 4), in_chans=8, embed_dim=16,
        actual_patch_size=(1, 4), img_in_chans=1,
    )
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 32, 1024, 1)),
        jnp.float32,
    )
    x = jnp.zeros((1, 32, 1024, 8))
    v = head.init(jax.random.key(0), x)
    pred = head.apply(v, x)
    assert pred.shape == (1, 32, 256, 4)
    # patchify/unpatchify roundtrip
    p = head.patchify(img)
    np.testing.assert_allclose(
        np.asarray(head.unpatchify(p)), np.asarray(img), atol=0
    )
    # loss with ones mask == plain patch MSE
    loss = head.apply(
        v, img, pred, jnp.ones_like(img), method="forward_loss"
    )
    ref = float(jnp.mean((p - pred) ** 2))
    assert abs(float(loss) - ref) < 1e-6


def test_fpn_returns_finest():
    fpn = GeneralizedLSSFPN(in_channels=(4, 8, 16, 32), out_channels=6)
    ins = [
        jnp.zeros((1, 32, 32, 4)), jnp.zeros((1, 16, 16, 8)),
        jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 4, 4, 32)),
    ]
    v = fpn.init(jax.random.key(0), ins, train=False)
    y = fpn.apply(v, ins, train=False)
    assert y.shape == (1, 32, 32, 6)


def test_convnext_dead_registered_params():
    """multiscale reduce_dim convs (mask_convnext.py:207-210) and the
    learnable mask token (:215-226) are REGISTERED but never applied in
    any reference forward — parity = params exist with the right
    shapes/init and the forward is bit-identical to the plain module."""
    kw = dict(arch=ARCH, stem_patch_size=(2, 2), out_indices=1)
    plain = MaskConvNeXt(**kw)
    full = MaskConvNeXt(
        **kw,
        multiscale=True,
        mae_cfg=dict(downsample_scale=8, downsample_dim=768,
                     mask_ratio=0.5, learnable=True),
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 64, 64, 3)), jnp.float32)
    v0 = plain.init(jax.random.key(0), x)
    v1 = full.init(jax.random.key(0), x)

    p = v1["params"]
    for i, c in enumerate(ARCH["channels"]):
        assert p[f"reduce_dim_{i}_kernel"].shape == (1, 1, c, 768)
        assert p[f"reduce_dim_{i}_bias"].shape == (768,)
    # out_indices=1 -> C = downsample_dim // 2**(4-1-1) = 768 // 4
    tok = p["mtoken1"]
    assert tok.shape == (1, 1, 1, 192)
    assert float(jnp.abs(tok).max()) <= 0.02 + 1e-6  # clipped ±1σ
    assert float(jnp.abs(tok).max()) > 0.0

    # dead in forward: same params elsewhere -> identical output
    y0 = plain.apply(v0, x)
    y1 = full.apply({"params": {**v0["params"],
                                **{k: p[k] for k in p
                                   if k.startswith(("reduce_dim_",
                                                    "mtoken"))}}}, x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    # importer maps the torch names onto these params
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from import_torch_ckpt import map_torch_key

    path, tf = map_torch_key("camera_encoder.mtoken1")
    assert path == "camera_encoder/mtoken1"
    w = np.zeros((1, 192, 1, 1), np.float32)
    assert tf(w).shape == (1, 1, 1, 192)
    path, tf = map_torch_key("camera_encoder.reduce_dim.2.weight")
    assert path == "camera_encoder/reduce_dim_2_kernel"
    assert tf(np.zeros((768, 16, 1, 1), np.float32)).shape == (1, 1, 16, 768)
    path, _ = map_torch_key("camera_encoder.reduce_dim.2.bias")
    assert path == "camera_encoder/reduce_dim_2_bias"


def test_sparse_batch_norm_2d_oracle():
    """SparseBatchNorm2d == BN1d over the flat active-pixel set with
    zeros scattered at masked positions (sparse_utils.py:36-75)."""
    import jax.numpy as jnp
    import numpy as np

    from efficient_multimodal_perception_tpu.models.convnext import (
        SparseBatchNorm2d,
    )

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 8, 8, 5
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    mask = rng.random((B, 4, 4, 1)) < 0.6  # stride-2 active mask

    mod = SparseBatchNorm2d()
    y, _ = mod.init_with_output(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(mask), True
    )
    y = np.asarray(y)

    up = np.repeat(np.repeat(mask, 2, axis=1), 2, axis=2)[..., 0]
    act = x[up]                      # (n_active, C)
    mean = act.mean(0)
    var = act.var(0)
    ref_act = (act - mean) / np.sqrt(var + 1e-5)  # scale=1, bias=0 init
    ref = np.zeros_like(x)
    ref[up] = ref_act
    np.testing.assert_allclose(y, ref, atol=1e-5)
