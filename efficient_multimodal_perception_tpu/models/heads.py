"""Task heads: occupancy MLP, point MLP, elevation U-Net, resnet block.

Rebuilds of ``mmdet3d/models/dense_heads/{mlp,point_mlp,unet,
resnet_basic_block}.py``.  All 1x1x1 Conv3d stacks become plain Dense
layers over channels-last voxel tensors — on TPU these are pure MXU
matmuls over the (X*Y*Z) batch of voxels.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def cross_entropy_ignore(
    logits: jax.Array, targets: jax.Array, ignore_index: int = 255
) -> jax.Array:
    """Mean CE with ignore_index, matching ``F.cross_entropy``
    (``mlp.py:85``)."""
    valid = targets != ignore_index
    tgt = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    v = valid.astype(nll.dtype)
    return (nll * v).sum() / jnp.maximum(v.sum(), 1.0)


class _Kernel(nn.Module):
    """Bare kernel parameter with an ``nn.Dense``-compatible tree path
    (``<name>/kernel``) and initializer, for heads that apply the same
    weights in more than one algebraic form."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.linear.default_kernel_init, self.shape
        )


class OccMlpHead(nn.Module):
    """Occupancy head: C -> 2C -> C -> num_classes 1x1x1 convs
    (``mlp.py:18-70``).

    Two call modes sharing one param tree (identical to the plain
    ``nn.Dense`` stack, so checkpoints/importer are unaffected):

    * ``__call__(x)`` — per-voxel MLP over ``(..., C)``.
    * ``__call__(x_packed, packed_z=Z)`` — consumes the z-packed
      ``(B, X, Y, Z*C)`` readout (``ops/sampling.
      sample_triplane_grid_mm_packed``) and applies the SAME weights as
      block-diagonal ``kron(I_Z, W)`` matmuls.  Same math per voxel,
      but the tensors keep a dense 512-lane minor dim instead of a
      4x-lane-padded C=32, which cuts the head+readout HBM traffic ~4x
      on TPU.
    """

    input_dim: int
    num_classes: int
    int8: Any = False  # quantized-serving GEMMs (True | "static")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, packed_z: int | None = None):
        C = self.input_dim
        k1 = _Kernel((C, 2 * C), name="conv1")()
        k2 = _Kernel((2 * C, C), name="conv2")()
        k3 = _Kernel((C, self.num_classes), name="conv3")()
        dt = self.dtype
        if self.int8 == "static":
            from ..ops.quant import quant_dense_site

            sites = iter(("mm1", "mm2", "mm3", "mm1", "mm2", "mm3"))
            mm = lambda a, k: quant_dense_site(  # noqa: E731
                self, next(sites), a, k
            )
        elif self.int8:
            from ..ops.quant import quant_dense

            mm = lambda a, k: quant_dense(a, k)  # noqa: E731
        else:
            mm = lambda a, k: a @ k.astype(a.dtype)  # noqa: E731
        if packed_z is None:
            x = nn.relu(mm(x.astype(dt), k1))
            x = nn.relu(mm(x, k2))
            return mm(x, k3)

        Z = packed_z
        eye = jnp.eye(Z, dtype=k1.dtype)
        x = nn.relu(mm(x.astype(dt), jnp.kron(eye, k1)))
        x = nn.relu(mm(x, jnp.kron(eye, k2)))
        x = mm(x, jnp.kron(eye, k3))
        B, X, Y, _ = x.shape
        return x.reshape(B, X, Y, Z, self.num_classes)

    def loss(self, pred, target):
        """CE with ignore 255 (``mlp.py:73-88``)."""
        return cross_entropy_ignore(pred, target)


class PointMlpHead(nn.Module):
    """Per-point MLP head (color decoder, ``point_mlp.py:24-43``):
    two relu-then-Linear(C, C) layers followed by ``fc_out`` — note the
    activation comes BEFORE each hidden linear in the reference."""

    input_dim: int
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Dense(
                self.input_dim, dtype=self.dtype, name=f"mlp_{i}"
            )(nn.relu(x))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc_out")(x)


def masked_mse_loss(pred, target, mask):
    """Masked MSE, sum/mask-count (``unet.py:66-82``)."""
    m = mask.astype(jnp.float32)
    loss = (pred.astype(jnp.float32) * m - target.astype(jnp.float32) * m) ** 2
    return loss.sum() / (m.sum() + 1e-8)


class _ResBlock(nn.Module):
    """torchvision ``BasicBlock`` (the smp resnet34 encoder's unit):
    conv-bn-relu-conv-bn + (1x1 conv + bn) shortcut when the shape
    changes, final relu.  Param names mirror torch's for the importer
    (``conv1/bn1/conv2/bn2/downsample``)."""

    dim: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        r = x
        y = nn.Conv(
            self.dim, (3, 3), strides=self.stride, padding=1, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn1"
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="bn2"
        )(y)
        if r.shape != y.shape:
            r = nn.Conv(
                self.dim, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="down_conv",
            )(x)
            r = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name="down_bn",
            )(r)
        return nn.relu(y + r)


class ElevUNetHead(nn.Module):
    """Elevation head: Conv3d collapse + resnet34-style U-Net.

    Weight-mappable restatement of ``unet.py:19-63`` (which wraps
    ``segmentation_models_pytorch.Unet(resnet34)``): a 3x3x3 conv
    collapses features to 1 channel, the height axis becomes the channel
    axis, the map is padded to 128x128, run through the smp topology —
    resnet34 encoder (stem conv7x7/s2 + maxpool + stages (3,4,6,3)),
    UnetDecoder with channels (256,128,64,32,16), nearest 2x upsampling,
    skips [layer3, layer2, layer1, stem-relu] (smp drops the identity
    skip: the LAST decoder block concatenates nothing), Conv2dReLU pairs
    (conv3x3 no-bias + BN + ReLU), 3x3 segmentation head — then cropped
    back.  Verified against the torch restatement in
    ``tests/torch_ref.py`` on shared weights.
    """

    input_dim: int
    height_dim: int
    pad: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: ``(B, X, Y, Z, C)`` voxel features -> ``(B, X, Y)`` heights."""
        B, X, Y, Z, C = x.shape
        # 3-D conv collapse to one channel (unet.py:27-37)
        y = nn.Conv(
            1, (3, 3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="proj",
        )(x)
        y = nn.relu(y)[..., 0]  # (B, X, Y, Z)
        y = jnp.pad(
            y, ((0, 0), (self.pad, self.pad), (self.pad, self.pad), (0, 0))
        )

        # resnet34-style encoder over the Z-as-channels map
        stem = nn.Conv(
            64, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype,
            name="stem",
        )(y)
        stem = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype, name="stem_bn"
        )(stem)
        stem = nn.relu(stem)
        feats = [y, stem]
        h = nn.max_pool(stem, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (depth, dim) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512))
        ):
            for j in range(depth):
                stride = 2 if (j == 0 and i > 0) else 1
                h = _ResBlock(
                    dim, stride, dtype=self.dtype, name=f"enc{i}_{j}"
                )(h, train)
            feats.append(h)

        # U-Net decoder: upsample + skip concat + double conv.  smp's
        # UnetDecoder drops the identity (full-res input) skip, so the
        # last block upsamples without concatenation.
        dec_dims = (256, 128, 64, 32, 16)
        skips = feats[-2:0:-1]  # [enc2, enc1, enc0, stem] — no input skip
        for i, dim in enumerate(dec_dims):
            bh, bw = h.shape[1] * 2, h.shape[2] * 2
            h = jax.image.resize(
                h, (h.shape[0], bh, bw, h.shape[3]), "nearest"
            )
            if i < len(skips):
                h = jnp.concatenate([h, skips[i]], axis=-1)
            for j in range(2):
                h = nn.Conv(
                    dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name=f"dec{i}_{j}",
                )(h)
                h = nn.BatchNorm(
                    use_running_average=not train, dtype=self.dtype,
                    name=f"dec{i}_{j}_bn",
                )(h)
                h = nn.relu(h)
        out = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="head")(h)
        out = out[..., 0]
        return out[:, self.pad : self.pad + X, self.pad : self.pad + Y]

    def loss(self, pred, target, mask):
        return masked_mse_loss(pred, target, mask)


class ResnetBasicBlockHead(nn.Module):
    """Lighter elevation head (``resnet_basic_block.py:10-69``)."""

    input_dim: int
    height_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, X, Y, Z, C = x.shape
        y = nn.Conv(
            1, (3, 3, 3), padding=1, use_bias=False, dtype=self.dtype
        )(x)
        y = nn.relu(y)[..., 0]  # (B, X, Y, Z) -> Z as channels
        y = _ResBlock(self.height_dim, 1, dtype=self.dtype)(y, train)
        return nn.Conv(1, (1, 1), dtype=self.dtype)(y)[..., 0]

    def loss(self, pred, target, mask):
        return masked_mse_loss(pred, target, mask)
