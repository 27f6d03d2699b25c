"""Point -> triplane projector (the spconv/torch_scatter replacement).

Rebuild of ``mmdet3d/models/backbones/point_triplane_projector.py``.  The
reference pipeline — per-point MLP, ``torch_scatter.scatter_max`` voxel
dedup, ``spconv.SparseConvTensor`` over a 128x128x80 grid, three axis-wise
``SparseMaxPool3d`` collapses (:66-117) — reduces to ONE masked
``segment_max`` from points directly into each pooled cell grid
(``ops/scatter.py:point_axis_pools``): max-of-max equals max-over-union,
and spconv's empty-voxel->0 densification is reproduced by zero-filling
empty segments.  No sparse tensor, no unique, no shuffle (shuffle only
randomized scatter tie-breaking, and max is order-invariant).

Plane flatten orders match the reference's permutes exactly:
    xy: (X, Y, sz*C)  [z-major]   -> plane (X, Y)
    yz: (Y, Z, sx*C)              -> plane (Y, Z)
    xz: (X, Z, sy*C)              -> plane (X, Z)
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.env import compute_backend

from ..ops.scatter import point_plane_pools_batch


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid rows of a padded point set.

    Matches ``nn.BatchNorm1d(track_running_stats=True)`` on the
    concatenated valid points (``point_triplane_projector.py:31-47``):
    batch statistics are computed over valid rows only.
    """

    momentum: float = 0.9  # torch default 0.1 "new weight" == 0.9 decay
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, valid, train: bool):
        C = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if train:
            m = valid.astype(jnp.float32)[..., None]
            n = jnp.maximum(m.sum(), 1.0)
            mean = (x.astype(jnp.float32) * m).sum(
                axis=tuple(range(x.ndim - 1))
            ) / n
            var = (
                ((x.astype(jnp.float32) - mean) ** 2) * m
            ).sum(axis=tuple(range(x.ndim - 1))) / n
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon)
        out = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return out.astype(self.dtype)


class PointTriplaneProjector(nn.Module):
    """Attributes mirror ``point_triplane_projector.py:24-64``."""

    grid_size: Sequence[int] = (128, 128, 80)
    in_channels: int = 5
    out_channels: int = 128
    base_channels: int = 128
    split: Sequence[int] = (25, 25, 20)
    track_running_stats: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, grid_idx, valid, cam_feats, train: bool = False):
        """Args:
            points: ``(B, P, >=5)`` padded points (xyzir used).
            grid_idx: ``(B, P, 3)`` int voxel indices.
            valid: ``(B, P)`` bool (in-range & real).
            cam_feats: ``(B, P, 768)`` per-point camera features.

        Returns:
            3-list of NHWC planes: xy ``(B, X, Y, C)``, yz ``(B, Y, Z, C)``,
            xz ``(B, X, Z, C)``.
        """
        B, P, _ = points.shape
        C = self.out_channels
        x = points[..., : self.in_channels]

        # point MLP: BN -> (Linear, BN, ReLU) x3 -> Linear  (:31-47)
        x = MaskedBatchNorm(dtype=self.dtype, name="bn_in")(x, valid, train)
        for i, dim in enumerate((64, 128, 256)):
            x = nn.Dense(dim, dtype=self.dtype, name=f"fc{i}")(x)
            x = MaskedBatchNorm(dtype=self.dtype, name=f"bn{i}")(
                x, valid, train
            )
            x = nn.relu(x)
        x = nn.Dense(C, dtype=self.dtype, name="fc_out")(x)

        cam = nn.Dense(C, dtype=self.dtype, name="reduce_cam_channels")(
            cam_feats
        )
        feats = x + cam  # (:103)

        X, Y, Z = self.grid_size
        sx, sy, sz = self.split
        # the plane MLPs absorb the pools' empty-cell->0 fix (spconv
        # .dense() semantics) when the fused Pallas path is available —
        # the where(finite) cleanup over ~590 MB of pooled planes (B=4)
        # is a full HBM round trip XLA cannot fuse into the fc1 dot
        fused = (
            self.dtype == jnp.bfloat16
            and compute_backend() == "tpu"
            and C % 128 == 0
            and not self.is_initializing()
        )
        # one flat batch-offset scatter per pool (vmap lowers to a
        # batched scatter, ~1.7x slower on TPU; see ops/scatter.py),
        # emitted directly in plane-flatten order so the reference's
        # permutes (:111-115) become free reshapes (no relayout)
        xy, yz, xz = point_plane_pools_batch(
            feats, grid_idx, valid, self.grid_size, self.split, raw=fused
        )  # (B,X,Y,sz,C), (B,Y,Z,sx,C), (B,X,Z,sy,C)

        # axis-flatten + per-plane MLP, matching the reference permutes
        xy = xy.reshape(B, X, Y, sz * C)
        yz = yz.reshape(B, Y, Z, sx * C)
        xz = xz.reshape(B, X, Z, sy * C)

        def plane_mlp(t, name):
            fc1 = nn.Dense(C, dtype=self.dtype, name=f"{name}_fc1")
            fc2 = nn.Dense(C, dtype=self.dtype, name=f"{name}_fc2")
            M = t.shape[0] * t.shape[1] * t.shape[2]
            if fused and M % 128 == 0:
                from ..ops.pallas_kernels import finite_mlp_fused

                p1 = self.get_variable("params", f"{name}_fc1")
                p2 = self.get_variable("params", f"{name}_fc2")
                out = finite_mlp_fused(
                    t.reshape(M, t.shape[-1]),
                    p1["kernel"], p1["bias"], p2["kernel"], p2["bias"],
                )
                return out.reshape(*t.shape[:3], C)
            if fused:  # raw pools but untileable rows: clean inline
                t = jnp.where(t == -jnp.inf, 0.0, t)
            return fc2(nn.relu(fc1(t)))

        return [
            plane_mlp(xy, "mlp_xy"),
            plane_mlp(yz, "mlp_yz"),
            plane_mlp(xz, "mlp_xz"),
        ]
