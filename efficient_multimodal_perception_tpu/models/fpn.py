"""Generalized LSS FPN (flax, NHWC).

Rebuild of ``mmdet3d/models/necks/fpn.py`` (GeneralizedLSSFPN, :8-121):
top-down upsample -> concat -> 1x1 ConvModule -> 3x3 ConvModule, returning
only the finest level.  ConvModule = conv + BN + ReLU (mmcv defaults used
by the point-family configs, ``configs/point_triplane.py:56-71``).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ConvModule(nn.Module):
    dim: int
    kernel: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.kernel[0] // 2
        x = nn.Conv(
            self.dim, self.kernel, padding=pad, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


class GeneralizedLSSFPN(nn.Module):
    """Attributes mirror ``fpn.py:26-37``; ``num_outs``/``start_level``
    kept for config parity (shipped configs use defaults)."""

    in_channels: Sequence[int] = (96, 192, 384, 768)
    out_channels: int = 96
    num_outs: int = 3
    start_level: int = 0
    align_corners: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        """inputs: list of 4 NHWC maps, coarse->fine order [s0..s3]."""
        assert len(inputs) == len(self.in_channels)
        laterals = list(inputs)
        used = len(laterals) - 1
        for i in range(used - 1, -1, -1):
            up = _resize_bilinear(
                laterals[i + 1], laterals[i].shape[1:3], self.align_corners
            )
            x = jnp.concatenate([laterals[i], up], axis=-1)
            x = _ConvModule(
                self.out_channels, (1, 1), dtype=self.dtype,
                name=f"lateral{i}",
            )(x, train)
            laterals[i] = _ConvModule(
                self.out_channels, (3, 3), dtype=self.dtype, name=f"fpn{i}"
            )(x, train)
        return laterals[0]


def _resize_bilinear(x: jax.Array, hw, align_corners: bool) -> jax.Array:
    """Bilinear resize matching ``F.interpolate(mode='bilinear')``."""
    B, H, W, C = x.shape
    out_h, out_w = hw
    if align_corners:
        ys = jnp.linspace(0.0, H - 1.0, out_h)
        xs = jnp.linspace(0.0, W - 1.0, out_w)
    else:
        ys = (jnp.arange(out_h) + 0.5) * (H / out_h) - 0.5
        xs = (jnp.arange(out_w) + 0.5) * (W / out_w) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0, y1 = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0, x1 = x0.astype(jnp.int32), x1.astype(jnp.int32)

    top = x[:, y0][:, :, x0] * (1 - wx)[None, None, :, None] + x[:, y0][
        :, :, x1
    ] * wx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - wx)[None, None, :, None] + x[:, y1][
        :, :, x1
    ] * wx[None, None, :, None]
    return top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]
