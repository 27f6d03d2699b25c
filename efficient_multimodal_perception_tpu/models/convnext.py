"""Maskable ConvNeXt backbone (flax, NHWC).

From-scratch TPU rebuild of the reference's ``MaskConvNeXt`` /
``MaskConvNeXtV2`` (``mmdet3d/models/backbones/mask_convnext.py``,
``mask_convnextv2.py``) and the SparK-style sparse-conv machinery
(``mmdet3d/models/utils/sparse_utils.py``).  Key differences by design:

* channels-last layout; convs map straight onto the MXU.
* The "sparse masked conv" trick is expressed functionally: dense convs
  followed by a mask multiply (exactly ``sp_conv_forward``,
  ``sparse_utils.py:27-33``).  LayerNorm here is per-pixel over channels,
  so ``LN(x) * mask == SparseLayerNorm`` on active pixels.
* ``forward1`` / ``forward2`` split (camera encoder interjection point,
  ``mask_convnextv2.py:212-261``) are stage-range arguments of one module,
  sharing parameters.
* Stage freezing is an optimizer concern (see ``train/trainer.py``); the
  module only mirrors the eval-mode side effect (no stochastic depth in
  frozen stages, matching torch ``.eval()`` on them,
  ``mask_convnext.py:339-350``).

Supported arch settings mirror ``mask_convnext.py:66-71``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.env import compute_backend
import numpy as np

ARCH_SETTINGS = {
    "tiny": {"depths": (3, 3, 9, 3), "channels": (96, 192, 384, 768)},
    "small": {"depths": (3, 3, 27, 3), "channels": (96, 192, 384, 768)},
    "base": {"depths": (3, 3, 27, 3), "channels": (128, 256, 512, 1024)},
    "large": {"depths": (3, 3, 27, 3), "channels": (192, 384, 768, 1536)},
}


def drop_path(
    x: jax.Array, rate: float, deterministic: bool, rng: Optional[jax.Array]
) -> jax.Array:
    """Per-sample stochastic depth (timm ``DropPath`` semantics)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, mask_shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def upsample_mask(mask: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Nearest-upsample an active mask ``(B, h, w, 1)`` to ``hw``.

    Equivalent to the reference's ``repeat_interleave`` mask upsampling
    (``sparse_utils.py:14-24``).
    """
    H, W = hw
    _, h, w, _ = mask.shape
    return jnp.repeat(jnp.repeat(mask, H // h, axis=1), W // w, axis=2)


class SparseBatchNorm2d(nn.Module):
    """Masked-BN over active pixels (``sparse_utils.py:36-75``).

    The reference's ``SparseBatchNorm2d``/``SparseSyncBatchNorm2d``
    gather active (unmasked) pixels, run BatchNorm1d over that flat
    set, and scatter back with zeros at masked positions.  Dead under
    every shipped config (ConvNeXt stacks are LayerNorm-normed; only
    ``dense_model_to_sparse(sbn=True)`` would reach it) — kept for
    registry-surface parity, sharing the projector's masked-statistics
    BatchNorm.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, active_mask, train: bool = False):
        from .point_projector import MaskedBatchNorm

        B, H, W, C = x.shape
        m = upsample_mask(active_mask, (H, W))[..., 0]  # (B, H, W) bool
        y = MaskedBatchNorm(
            momentum=self.momentum, epsilon=self.epsilon, dtype=self.dtype,
            name="bn",
        )(x, m, train)
        # sp_bn_forward scatters into a zeros canvas: masked pixels are
        # ZERO on output (not pass-through)
        return y * m[..., None].astype(y.dtype)


def random_active_mask(
    rng: jax.Array, batch: int, h: int, w: int, mask_ratio: float
) -> jax.Array:
    """Per-sample random keep-mask at the lowest resolution.

    Port of ``sparse_utils.random_masking`` (``sparse_utils.py:319-329``):
    keeps ``round(h*w*(1-ratio))`` patches per sample, uniformly at random.

    Returns ``(B, h, w, 1)`` bool, True = kept/active.
    """
    len_keep = round(h * w * (1.0 - mask_ratio))
    noise = jax.random.uniform(rng, (batch, h * w))
    rank = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
    active = rank < len_keep
    return active.reshape(batch, h, w, 1)


class ConvNeXtBlock(nn.Module):
    """dwconv7x7 -> LN -> pointwise MLP -> layer scale -> droppath residual.

    Mirrors ``SparseConvNeXtBlock`` (``sparse_utils.py:132-233``); the
    optional ``mask`` multiply after each conv reproduces sparse mode.

    Owns its parameters directly (same shapes/initializers as the flax
    submodules they replace) so the inference-time fused Pallas kernel
    (``ops/pallas_kernels.convnext_block_fused``) and the XLA path share
    weights.  ``fused=True`` is only taken when it is semantically
    identical to the XLA path (no mask, deterministic).
    """

    dim: int
    drop_path_rate: float = 0.0
    layer_scale_init: float = 1e-6
    # quantized-serving epilogue GEMMs (fc1/fc2): True = dynamic
    # per-row scales (fused Pallas kernel), "static" = calibrated
    # per-tensor scales (XLA path; no fused static kernel yet)
    int8: Any = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, mask=None, deterministic: bool = True, fused: bool = False
    ):
        C = self.dim
        dw_k = self.param(
            "dwconv_kernel", nn.initializers.lecun_normal(), (7, 7, 1, C)
        )
        dw_b = self.param("dwconv_bias", nn.initializers.zeros, (C,))
        ln_s = self.param("norm_scale", nn.initializers.ones, (C,))
        ln_b = self.param("norm_bias", nn.initializers.zeros, (C,))
        w1 = self.param(
            "pwconv1_kernel", nn.initializers.lecun_normal(), (C, 4 * C)
        )
        b1 = self.param("pwconv1_bias", nn.initializers.zeros, (4 * C,))
        w2 = self.param(
            "pwconv2_kernel", nn.initializers.lecun_normal(), (4 * C, C)
        )
        b2 = self.param("pwconv2_bias", nn.initializers.zeros, (C,))
        gamma = (
            self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (C,),
            )
            if self.layer_scale_init > 0
            else None
        )

        if fused and mask is None and self.int8 != "static" and (
            deterministic or self.drop_path_rate == 0.0
        ):
            if self.int8:
                from ..ops.pallas_kernels import convnext_block_int8_fused

                return convnext_block_int8_fused(
                    x, dw_k, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma
                )
            from ..ops.pallas_kernels import convnext_block_fused

            return convnext_block_fused(
                x, dw_k, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma
            )

        shortcut = x
        dt = self.dtype
        x = jax.lax.conv_general_dilated(
            x.astype(dt),
            dw_k.astype(dt),
            window_strides=(1, 1),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        ) + dw_b.astype(dt)
        if mask is not None:
            x = x * mask
        if self.int8:
            # quantized-serving epilogue: LN stays f32, the two MLP
            # GEMMs (where the block's MXU FLOPs live) run int8 —
            # dynamic per-row scales, or calibrated per-tensor scales
            # when int8=="static" (ops/quant.quant_dense_site)
            from ..ops.quant import quant_dense, quant_dense_site

            if self.int8 == "static":
                qd = lambda n, a, k, b: quant_dense_site(  # noqa: E731
                    self, n, a, k, b
                )
            else:
                qd = lambda n, a, k, b: quant_dense(a, k, b)  # noqa: E731
            xf = x.astype(jnp.float32)
            mu = xf.mean(axis=-1, keepdims=True)
            var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
            x = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
            x = qd("fc1", x.astype(dt), w1, b1)
            x = nn.gelu(x, approximate=False)
            x = qd("fc2", x, w2, b2)
            if gamma is not None:
                x = x * gamma.astype(x.dtype)
            if mask is not None:
                x = x * mask
        elif dt == jnp.bfloat16 and compute_backend() == "tpu":
            # training path with stochastic depth: the fused epilogue
            # (with its fused Pallas backward) computes f(y); droppath
            # and the residual stay out here.  Masked (SparK) mode works
            # too — both mask multiplies commute with the per-pixel
            # LN+MLP epilogue (pre-LN above, post-MLP below), which is
            # what makes MAE pretrain's backward ride the fused kernels.
            from ..ops.pallas_kernels import epilogue_fused

            x = epilogue_fused(x, ln_s, ln_b, w1, b1, w2, b2, gamma)
            if mask is not None:
                x = x * mask
        else:
            # LayerNorm over channels, f32 statistics (flax semantics)
            xf = x.astype(jnp.float32)
            mu = xf.mean(axis=-1, keepdims=True)
            var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
            x = (
                (xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
            ).astype(dt)
            x = x @ w1.astype(dt) + b1.astype(dt)
            x = nn.gelu(x, approximate=False)
            x = x @ w2.astype(dt) + b2.astype(dt)
            if gamma is not None:
                x = x * gamma.astype(x.dtype)
            if mask is not None:
                x = x * mask
        rng = None if deterministic else self.make_rng("droppath")
        return shortcut + drop_path(x, self.drop_path_rate, deterministic, rng)


class MaskConvNeXt(nn.Module):
    """4-stage ConvNeXt with non-square stem and optional masked mode.

    Attributes mirror the reference config surface
    (``mask_convnext.py:73-97``):

    Attributes:
        arch: one of tiny/small/base/large.
        in_channels: input channels (193 for the fused range input).
        stem_patch_size: stem kernel=stride, e.g. ``(1, 4)`` for range.
        downsample_height: if False, inter-stage downsampling is ``(1, 2)``
            so the 32-row range image keeps its height.
        drop_path_rate: stochastic depth, linear over blocks.
        out_indices: stage whose output is returned (single int).
        norm_out: accepted for config parity but DEAD (see setup note):
            the reference registers the out-norm yet never applies it.
        out_all_scale: return all 4 stage outputs (for FPN).
        frozen_stages: stages with droppath disabled (optimizer handles
            the actual weight freeze).
        multiscale: register the 1x1 ``reduce_dim`` convs
            (``mask_convnext.py:207-210``).  The reference BUILDS these
            (nn.Conv2d(channels[i], 768, 1) per stage) but never calls
            them in any forward — parity means the parameters exist in
            the checkpoint and stay dead.  Off in every shipped config.
        mae_cfg: dict(downsample_scale, downsample_dim, mask_ratio,
            learnable) — the reference's SparK masking config
            (``mask_convnext.py:213-226``).  Only ``learnable`` has a
            parameter effect: it registers ``mtoken{out_indices}``
            (trunc-normal(0.02) clipped to ±0.02), which — like
            reduce_dim — no forward ever reads (every shipped config
            sets learnable=False; masking itself is driven by
            ``active_mask`` / JointEncoder's mask ratios here).
    """

    arch: Any = "tiny"  # name or {"depths": ..., "channels": ...} dict
    in_channels: int = 3
    stem_patch_size: Tuple[int, int] = (4, 4)
    downsample_height: bool = True
    drop_path_rate: float = 0.0
    out_indices: int = 3
    norm_out: bool = False
    out_all_scale: bool = False
    frozen_stages: int = 0
    layer_scale_init: float = 1e-6
    fuse_inference: bool = True  # Pallas fused blocks on TPU inference
    int8: Any = False  # quantized-serving block epilogues (True | "static")
    multiscale: bool = False  # registered-but-dead reduce_dim convs
    mae_cfg: Optional[Any] = None  # SparK cfg; learnable=True -> mtoken
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = (
            ARCH_SETTINGS[self.arch]
            if isinstance(self.arch, str)
            else dict(self.arch)
        )
        depths, channels = cfg["depths"], cfg["channels"]
        self.depths = depths
        self.channels = channels
        down_kernel = (2, 2) if self.downsample_height else (1, 2)

        dpr = list(np.linspace(0, self.drop_path_rate, sum(depths)))

        downs = []
        stages = []
        idx = 0
        for i in range(4):
            if i == 0:
                downs.append(
                    _Stem(channels[0], self.stem_patch_size, self.dtype)
                )
            else:
                downs.append(
                    _Downsample(channels[i], down_kernel, self.dtype)
                )
            blocks = []
            for j in range(depths[i]):
                rate = dpr[idx + j] if i >= self.frozen_stages else 0.0
                blocks.append(
                    ConvNeXtBlock(
                        channels[i],
                        drop_path_rate=rate,
                        layer_scale_init=self.layer_scale_init,
                        int8=self.int8,
                        dtype=self.dtype,
                        name=f"stage{i}_block{j}",
                    )
                )
            idx += depths[i]
            stages.append(blocks)
        self.downsample_layers = downs
        self.stages_ = stages

        # Registered-but-dead parameters, reproduced for checkpoint /
        # importer parity (the reference builds both and never applies
        # either in any forward path):
        if self.multiscale:
            # mask_convnext.py:207-210 — nn.Conv2d(channels[i], 768, 1)
            # per stage (768 hardcoded there too), NHWC HWIO here.
            for i, c in enumerate(channels):
                self.param(
                    f"reduce_dim_{i}_kernel",
                    nn.linear.default_kernel_init,
                    (1, 1, c, 768),
                )
                self.param(
                    f"reduce_dim_{i}_bias", nn.initializers.zeros, (768,)
                )
        mae_cfg = dict(self.mae_cfg) if self.mae_cfg else {}
        if mae_cfg.get("learnable"):
            # mask_convnext.py:215-226 — torch shape
            # (1, downsample_dim // 2**(4-i-1), 1, 1), trunc_normal
            # std=0.02 clipped to [-0.02, 0.02] (i.e. ±1σ); NHWC
            # (1, 1, 1, C) here (importer transposes).
            i = self.out_indices
            c = mae_cfg.get("downsample_dim", 768) // 2 ** (4 - i - 1)
            self.param(
                f"mtoken{i}",
                nn.initializers.truncated_normal(
                    stddev=0.02, lower=-1.0, upper=1.0
                ),
                (1, 1, 1, c),
            )
        # NOTE: norm_out is accepted for config-surface parity but is
        # DEAD, exactly as in the reference: MaskConvNeXt registers
        # ``norm{i}`` (mask_convnext.py:201-205) yet its forward never
        # applies it, and MaskConvNeXtV2 never even registers one.  The
        # stage-3 output feeds the neck un-normalized.

    def run_stages(
        self,
        x,
        start: int,
        end: int,
        active_mask=None,
        deterministic: bool = True,
        collect=False,
    ):
        """Run stages ``[start, end)``; mask is re-applied per resolution."""
        fused = (
            self.fuse_inference
            and deterministic
            and active_mask is None
            and self.dtype == jnp.bfloat16
            and compute_backend() == "tpu"
        )
        from ..parallel.fsdp import batch_constraint

        outs = []
        # ZeRO/FSDP activation pin: the fsdp-sharded conv kernels would
        # otherwise pull channel shardings into the activations and
        # GSPMD "involuntarily fully rematerializes" at every stage
        # boundary (replicate-then-repartition); pinning batch-only
        # shardings here makes it all-gather the KERNELS instead — the
        # actual ZeRO-3 semantics.  No-op outside an fsdp/tp mesh.
        x = batch_constraint(x)
        for i in range(start, end):
            x = self.downsample_layers[i](x)
            x = batch_constraint(x)
            if active_mask is not None:
                m = upsample_mask(active_mask, x.shape[1:3]).astype(x.dtype)
                x = x * m
            else:
                m = None
            for blk in self.stages_[i]:
                # a block with zero droppath is deterministic even in
                # training (frozen stages), so the fused kernel (whose
                # VJP replays the XLA math) applies there too
                blk_fused = fused or (
                    self.fuse_inference
                    and active_mask is None
                    and blk.drop_path_rate == 0.0
                    and self.dtype == jnp.bfloat16
                    and compute_backend() == "tpu"
                )
                x = batch_constraint(blk(
                    x, mask=m, deterministic=deterministic, fused=blk_fused
                ))
            if collect:
                outs.append(x)
        return (x, outs) if collect else x

    def __call__(self, x, active_mask=None, deterministic: bool = True):
        """Full forward.  Returns all scales if ``out_all_scale``."""
        if self.out_all_scale:
            _, outs = self.run_stages(
                x, 0, 4, active_mask, deterministic, collect=True
            )
            return outs
        return self.run_stages(x, 0, 4, active_mask, deterministic)

    def forward1(self, x, active_mask=None, deterministic: bool = True):
        """Stages 0..out_indices inclusive (``mask_convnextv2.py:212-244``)."""
        return self.run_stages(
            x, 0, self.out_indices + 1, active_mask, deterministic
        )

    def forward2(self, x, active_mask=None, deterministic: bool = True):
        """Remaining stages (``mask_convnextv2.py:246-261``)."""
        return self.run_stages(
            x, self.out_indices + 1, 4, active_mask, deterministic
        )


class _PatchConv(nn.Module):
    """kernel==stride VALID conv as a patch matmul.

    Every stem/downsample conv here has kernel == stride (patchify
    semantics, ``mask_convnext.py:104-128``), which is exactly a
    reshape + one matmul.  XLA's general conv path handles the stem's
    3-channel NHWC input poorly on TPU (lane-starved: measured 3.1 ms
    for a 151 MB output at B=4, ~57 GB/s); the explicit formulation
    below — kh strided row groups, each a free minor-dim reshape
    (W, C) -> (W/kw, kw*C), concatenated then matmul'd — keeps every
    step layout-friendly and feeds the MXU one (M, kh*kw*C) @ (., D)
    product.  Param names/shapes/inits are identical to the ``nn.Conv``
    it replaces (HWIO kernel + bias), so checkpoints and the torch
    importer are unaffected; the patch-vector order (kh, kw, C) matches
    the HWIO kernel flatten.

    The matmul form is taken only for lane-starved inputs
    (``kh*kw*C_in <= 32``, i.e. the RGB stem — measured 1.8 ms vs
    3.0 ms); for wide inputs XLA's native kernel==stride conv is
    already the same matmul WITHOUT materializing the row-group concat
    (measured faster at C_in >= 96: profiling the explicit form there
    cost camera fwd1 +7 ms).
    """

    features: int
    kernel: Tuple[int, int]
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        B, H, W, C = x.shape
        k = self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (kh, kw, C, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype
        if kh * kw * C > 32:
            return jax.lax.conv_general_dilated(
                x.astype(dt),
                k.astype(dt),
                window_strides=(kh, kw),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(dt)
        groups = [
            x[:, i::kh].reshape(B, H // kh, W // kw, kw * C)
            for i in range(kh)
        ]
        xp = groups[0] if kh == 1 else jnp.concatenate(groups, axis=-1)
        w = k.reshape(kh * kw * C, self.features)
        return xp.astype(dt) @ w.astype(dt) + b.astype(dt)


class _Stem(nn.Module):
    dim: int
    kernel: Tuple[int, int]
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = _PatchConv(self.dim, self.kernel, self.dtype, name="conv")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)


class _Downsample(nn.Module):
    dim: int
    kernel: Tuple[int, int]
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return _PatchConv(self.dim, self.kernel, self.dtype, name="conv")(x)
