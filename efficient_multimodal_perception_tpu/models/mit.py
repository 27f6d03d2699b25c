"""MixVisionTransformer neck + reconstruction decoder head (flax, NHWC).

Rebuild of the reference's SegFormer-style modules:

* ``MixVisionTransformer`` neck mapping the fused 768-ch (128, 32) feature
  map to the (128, 128, 96) triplane (``mmdet3d/models/necks/mit.py:286-379``)
  and its ``High`` 256x256 variant (``mit.py:381-479``).
* ``MixVisionTransformerHead`` MAE reconstruction decoder
  (``mmdet3d/models/dense_heads/mit_decoder.py:286-440``) with
  patchify/unpatchify and the masked-MSE ``forward_loss``.

The neck's quirky square reshape — 4096 tokens from a (128, 32) grid
reinterpreted as a 64x64 image (``mit.py:366-372``) — is reproduced
exactly; it is the mechanism that turns the stacked camera+range strip
into a square triplane.

Attention is 2 blocks x 4 heads; both the neck's full (sr=1) attention
over 4096 tokens and the decoders' rectangular sr_ratio=4 attention
(8192 queries x 512 reduced K/V) dispatch to the repo's fused Pallas
kernel on TPU (``ops/pallas_kernels.attention_pallas`` — the f32 score
tile stays in VMEM; the einsum form materializes ~0.8 GB of scores per
decoder pass at B=2 pretrain).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.env import compute_backend


def _use_fused_attn(dtype, n_q: int, n_kv: int) -> bool:
    """Dispatch to the repo fused attention when the materialized
    (B, h, Nq, Nk) f32 softmax would be real HBM traffic: the sr=1 neck
    (4096x4096, ~1 GB at B=4, einsum measured 4.0 ms/block) and the
    sr_ratio=4 MAE decoders (8192 queries x 512 reduced K/V — ~0.8 GB
    f32 scores at B=2 pretrain).  Tiny score tensors (< ~1M entries per
    group-head) keep the einsum.  The stock flash kernel wants
    head_dim % 128 (padding the neck's hd=256 measured a wash), so this
    dispatches to the repo's own ``ops/pallas_kernels.attention_pallas``
    -- exact f32 softmax, K/V VMEM-resident, rectangular Nq != Nk
    supported, no head padding."""
    from ..parallel.fsdp import ambient_model_axis

    return (
        dtype == jnp.bfloat16
        and compute_backend() == "tpu"
        and n_q % 512 == 0
        and n_kv % 128 == 0
        and n_q * n_kv >= 1_000_000
        # a Pallas call has no GSPMD partitioning rule: under tensor
        # parallelism the einsum path (which GSPMD head-splits) wins
        and ambient_model_axis() == 1
    )


def _sp_constraint(x):
    """Megatron sequence parallelism: tokens sharded over 'model'.

    Applied to the (B, N, C) residual stream between the TP regions
    (LN + residual adds are elementwise over tokens), so their
    activations hold 1/tp of the sequence and GSPMD turns the TP
    all-reduces into reduce-scatter + all-gather pairs.  No-op outside
    a mesh with a real 'model' axis.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.fsdp import ambient_model_axis

    if ambient_model_axis() <= 1 or x.shape[1] % ambient_model_axis():
        return x
    return jax.lax.with_sharding_constraint(x, P(None, "model", None))


def fused_prologue_active(shape, dtype, int8) -> bool:
    """Shape-level dispatch predicate for the fused LN->GEMM /
    GELU->GEMM Pallas prologues (``ops/pallas_kernels.ln_dense_fused``
    / ``gelu_dense_fused``).

    XLA cannot fuse the LayerNorm row reduction into the following dot,
    so each of the neck block's LNs costs an extra HBM round trip of the
    (B*4096, 1024) token stream and the MixFFN GELU one of the
    (B*4096, 2048) hidden stream.  Structural requirements: bf16 on TPU,
    no tensor parallelism (a Pallas call has no GSPMD rule), row count
    tileable, 128-lane channel dims.

    Shared with ``bench.py::_fused_prologue_flops`` so the FLOPs the
    cost analysis can't see (the prologues are custom calls) are added
    back under EXACTLY the dispatch condition (VERDICT r4 #1).
    """
    import os

    from ..parallel.fsdp import ambient_model_axis

    B, N, C = shape
    return (
        not int8
        and not os.environ.get("EMP_DISABLE_FUSED_PROLOGUE")
        and dtype == jnp.bfloat16
        and compute_backend() == "tpu"
        and ambient_model_axis() == 1
        and (B * N) % 1024 == 0
        and C % 128 == 0
    )


def _use_fused_prologue(x, int8) -> bool:
    return fused_prologue_active(x.shape, x.dtype, int8)


def _dense(int8, features: int, use_bias: bool, dtype, name: str):
    """``nn.Dense`` or its int8-GEMM drop-in (same param tree).

    The int8 path (``ops/quant.py``) is the opt-in quantized serving
    mode — symmetric int8 hitting the v5e MXU's 2x int8 rate on the
    neck's big matmuls.  ``int8=True`` = dynamic per-row activation
    scales; ``int8="static"`` = calibrated per-tensor scales (the
    ``"quant"`` variable collection carries the amaxes).
    """
    if int8:
        from ..ops.quant import Int8Dense

        return Int8Dense(
            features, use_bias=use_bias, static=int8 == "static", name=name
        )
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def _fused_attn(q, k, v, scale):
    """(B, h, Nq/Nk, hd) -> repo fused attention over flattened heads."""
    from ..ops.pallas_kernels import attention_pallas

    B, h, Nq, hd = q.shape
    Nk = k.shape[2]
    out = attention_pallas(
        q.reshape(B * h, Nq, hd),
        k.reshape(B * h, Nk, hd),
        v.reshape(B * h, Nk, hd),
        scale,
    )
    return out.reshape(B, h, Nq, hd)


class EfficientAttention(nn.Module):
    """SegFormer attention with optional K/V spatial reduction.

    Mirrors ``mit.py:74-156``: q from all tokens, k/v optionally from a
    ``sr_ratio``-strided conv of the token grid (a 64x seq reduction for
    the decoders' ``sr_ratio=4``).
    """

    dim: int
    num_heads: int = 8
    sr_ratio: int = 1
    qkv_bias: bool = False
    int8: bool = False  # quantized-serving GEMMs (q/kv/proj)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int], ln=None):
        B, N, C = x.shape
        H, W = hw
        h = self.num_heads
        hd = C // h
        scale = hd**-0.5

        if ln is not None:
            # fused LN -> q,kv prologue (sr==1 only: with spatial
            # reduction the normalized tokens feed the sr conv too, so
            # the LN output must materialize anyway).  One kernel pass
            # over the concatenated q|kv weights; the LN'd tokens never
            # touch HBM.
            assert self.sr_ratio == 1
            from ..ops.pallas_kernels import ln_dense_fused

            wq = self.get_variable("params", "q")["kernel"]
            wkv = self.get_variable("params", "kv")["kernel"]
            w = jnp.concatenate([wq, wkv], axis=1)
            bias = None
            if self.qkv_bias:
                bias = jnp.concatenate(
                    [self.get_variable("params", "q")["bias"],
                     self.get_variable("params", "kv")["bias"]], axis=0
                )
            qkv = ln_dense_fused(
                x.reshape(B * N, C), ln[0], ln[1], w, bias
            ).reshape(B, N, 3 * C)
            q, kv = qkv[..., :C], qkv[..., C:]
            k, v = jnp.split(kv, 2, axis=-1)
            q = q.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
            k = k.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)
            v = v.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)
            if _use_fused_attn(x.dtype, N, k.shape[2]):
                out = _fused_attn(q, k, v, scale)
            else:
                attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
                attn = jax.nn.softmax(
                    attn.astype(jnp.float32), axis=-1
                ).astype(x.dtype)
                out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
            return _dense(self.int8, C, True, self.dtype, "proj")(out)

        q = _dense(self.int8, C, self.qkv_bias, self.dtype, "q")(x)
        if self.sr_ratio > 1:
            x_ = x.reshape(B, H, W, C)
            x_ = nn.Conv(
                C,
                (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                padding="VALID",
                dtype=self.dtype,
                name="sr",
            )(x_)
            x_ = x_.reshape(B, -1, C)
            x_ = nn.LayerNorm(dtype=self.dtype, name="sr_norm")(x_)
        else:
            x_ = x
        kv = _dense(self.int8, 2 * C, self.qkv_bias, self.dtype, "kv")(x_)
        k, v = jnp.split(kv, 2, axis=-1)

        q = q.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)

        if _use_fused_attn(x.dtype, N, k.shape[2]):
            out = _fused_attn(q, k, v, scale)
        else:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
            attn = jax.nn.softmax(
                attn.astype(jnp.float32), axis=-1
            ).astype(x.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return _dense(self.int8, C, True, self.dtype, "proj")(out)


class MixFFN(nn.Module):
    """fc1 -> 3x3 depthwise conv on the token grid -> GELU -> fc2.

    Mirrors ``Mlp``+``DWConv`` (``mit.py:16-71,483-510``).
    """

    dim: int
    hidden_dim: int
    int8: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int], ln=None):
        B, N, C = x.shape
        H, W = hw
        if ln is not None:
            # fused LN -> fc1 (the LN'd tokens never touch HBM)
            from ..ops.pallas_kernels import ln_dense_fused

            p = self.get_variable("params", "fc1")
            x = ln_dense_fused(
                x.reshape(B * N, C), ln[0], ln[1], p["kernel"], p["bias"]
            ).reshape(B, N, self.hidden_dim)
        else:
            x = _dense(self.int8, self.hidden_dim, True, self.dtype,
                       "fc1")(x)
        x = x.reshape(B, H, W, self.hidden_dim)
        x = nn.Conv(
            self.hidden_dim,
            (3, 3),
            padding=1,
            feature_group_count=self.hidden_dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        x = x.reshape(B, N, self.hidden_dim)
        if ln is not None:
            # fused GELU -> fc2 (saves the (B*N, hidden) round trip)
            from ..ops.pallas_kernels import gelu_dense_fused

            p = self.get_variable("params", "fc2")
            return gelu_dense_fused(
                x.reshape(B * N, self.hidden_dim), p["kernel"], p["bias"]
            ).reshape(B, N, self.dim)
        x = nn.gelu(x, approximate=False)
        return _dense(self.int8, self.dim, True, self.dtype, "fc2")(x)


class MiTBlock(nn.Module):
    """Pre-norm attention + MixFFN block (``mit.py:159-221``)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    sp: bool = False  # sequence-parallel residual stream (Megatron SP)
    int8: bool = False
    # fused LN->GEMM / GELU->GEMM prologues: None = auto-dispatch
    # (TPU + bf16 + no TP), False = never, True = force (tests; falls
    # back to interpret mode off-TPU)
    fuse_prologue: bool | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        sp = _sp_constraint if self.sp else (lambda y: y)
        fuse = (
            _use_fused_prologue(x, self.int8)
            if self.fuse_prologue is None
            else self.fuse_prologue
        )
        # init must run the unfused path: it is what declares the
        # LayerNorm/Dense params the fused path reads via get_variable
        fuse = fuse and not self.is_initializing() and self.sr_ratio == 1
        attn = EfficientAttention(
            self.dim,
            num_heads=self.num_heads,
            sr_ratio=self.sr_ratio,
            int8=self.int8,
            dtype=self.dtype,
            name="attn",
        )
        mlp = MixFFN(
            self.dim,
            int(self.dim * self.mlp_ratio),
            int8=self.int8,
            dtype=self.dtype,
            name="mlp",
        )
        x = sp(x)
        if fuse:
            n1 = self.get_variable("params", "norm1")
            x = sp(x + attn(x, hw, ln=(n1["scale"], n1["bias"])))
            n2 = self.get_variable("params", "norm2")
            x = sp(x + mlp(x, hw, ln=(n2["scale"], n2["bias"])))
            return x
        x = sp(x + attn(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x), hw))
        x = sp(x + mlp(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), hw))
        return x


class OverlapPatchEmbed(nn.Module):
    """Conv patch embed with overlap + LN (``mit.py:224-282``)."""

    patch_size: Tuple[int, int]
    stride: Tuple[int, int]
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ph, pw = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            (ph, pw),
            strides=self.stride,
            padding=((ph // 2, ph // 2), (pw // 2, pw // 2)),
            dtype=self.dtype,
            name="proj",
        )(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x, (H, W)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC pixel shuffle, matching ``torch.nn.PixelShuffle`` channel order."""
    B, H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H * r, W * r, c)


class MixVisionTransformer(nn.Module):
    """The triplane former (``mit.py:286-379``).

    (B, 128, 32, 768) fused strip -> 1x1 patch embed (4096 tokens, dim
    ``embed_dim``) -> 2 blocks -> square 64x64 reshape -> pixel shuffle x2
    -> conv3x3 256->128 -> ReLU -> conv3x3 128->96 -> (B, 128, 128, 96),
    interpreted downstream as 3 planes x 32 channels.
    """

    img_size: Tuple[int, int] = (128, 32)
    patch_size: int = 1
    in_chans: int = 768
    embed_dim: int = 768
    high: bool = False  # MixVisionTransformerHigh variant (mit.py:381-479)
    sp: bool = False  # sequence-parallel blocks (set by --sp under TP)
    int8: bool = False  # quantized-serving GEMMs in the blocks
    fuse_prologue: bool | None = None  # see MiTBlock.fuse_prologue
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..parallel.fsdp import batch_constraint

        # encoder→neck boundary pin: stops the blocks' TP shardings from
        # propagating back into the encoder (GSPMD involuntary-full-
        # rematerialization fix, parallel/fsdp.batch_constraint)
        x = batch_constraint(x)
        B = x.shape[0]
        x, (H, W) = OverlapPatchEmbed(
            (self.patch_size, self.patch_size),
            (1, 1),
            self.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        dim = int((H * W) ** 0.5)
        assert dim * dim == H * W, "token count must be square (mit.py:367)"
        for i in range(2):
            x = MiTBlock(
                self.embed_dim,
                num_heads=4,
                mlp_ratio=2,
                sr_ratio=1,
                sp=self.sp,
                int8=self.int8,
                fuse_prologue=self.fuse_prologue,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, (H, W))
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(B, dim, dim, self.embed_dim)
        x = pixel_shuffle(x, 2)
        if not self.high:
            x = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
            x = nn.relu(x)
            x = nn.Conv(96, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
        else:
            x = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
            x = nn.relu(x)
            # torch ConvTranspose2d(3, s=2, p=1, output_padding=1) doubles
            # the size, padding the dilated input (k-1-p, k-1-p+op) =
            # (1, 2) per axis.  flax "SAME" resolves to the MIRRORED
            # (2, 1) at k=3/s=2, shifting the map one pixel — explicit
            # padding keeps torch parity (test_conv_transpose_import_parity).
            x = nn.ConvTranspose(
                256, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2)),
                dtype=self.dtype, name="conv_transpose",
            )(x)
            x = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
            x = nn.relu(x)
            x = nn.Conv(96, (3, 3), padding=1, dtype=self.dtype, name="conv3")(x)
        return x


class MixVisionTransformerHead(nn.Module):
    """MAE reconstruction decoder (``mit_decoder.py:286-440``).

    Patch-embeds the scattered triplane features, runs 2 sr_ratio=4
    blocks, and predicts ``p0*p1*img_chans`` values per patch.
    """

    patch_size: Tuple[int, int] = (7, 7)
    stride: Tuple[int, int] = (4, 4)
    in_chans: int = 32
    embed_dim: int = 96
    actual_patch_size: Tuple[int, int] = (4, 4)
    img_in_chans: int = 3
    norm_pix_loss: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        x, (H, W) = OverlapPatchEmbed(
            tuple(self.patch_size),
            tuple(self.stride),
            self.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        for i in range(2):
            x = MiTBlock(
                self.embed_dim,
                num_heads=4,
                mlp_ratio=2,
                sr_ratio=4,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, (H, W))
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(B, H, W, self.embed_dim)
        p0, p1 = self.actual_patch_size
        x = nn.Conv(
            p0 * p1 * self.img_in_chans,
            (1, 1),
            dtype=self.dtype,
            name="decoder_pred",
        )(x)
        return x

    def patchify(self, imgs: jax.Array) -> jax.Array:
        """(B, H, W, C) -> (B, h, w, p0*p1*C), reference channel order.

        ``mit_decoder.py:379-398`` flattens as (p0, p1, C) with einsum
        ``nchpwq->npqchw``; channels-last equivalent below.
        """
        p0, p1 = self.actual_patch_size
        B, H, W, C = imgs.shape
        h, w = H // p0, W // p1
        x = imgs.reshape(B, h, p0, w, p1, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # B h w p0 p1 C
        return x.reshape(B, h, w, p0 * p1 * C)

    def unpatchify(self, x: jax.Array) -> jax.Array:
        """Inverse of :meth:`patchify` (``mit_decoder.py:400-418``)."""
        p0, p1 = self.actual_patch_size
        B, h, w, _ = x.shape
        C = self.img_in_chans
        x = x.reshape(B, h, w, p0, p1, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, h * p0, w * p1, C)

    def forward_loss(self, imgs, pred, mask):
        """Masked patch-MSE (``mit_decoder.py:420-440``).

        Args:
            imgs: ``(B, H, W, C)`` target image.
            pred: ``(B, h, w, p0*p1*C)`` patch predictions.
            mask: ``(B, H, W, C)`` weight (1 = supervise).
        """
        target = self.patchify(imgs)
        m = self.patchify(mask)
        loss = (pred - target) ** 2
        return (loss * m).sum() / m.sum()
