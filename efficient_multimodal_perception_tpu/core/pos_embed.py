"""2-D sine-cosine positional embeddings.

Port of the reference's numpy implementation
(``mmdet3d/models/utils/pos_embed.py:20-69``, itself from MAE).  The
reference recomputes this on the host with numpy **every step**
(``triplane.py:350-358``); here it is a pure function evaluated once at
trace time, so XLA constant-folds it into the compiled program.
"""

from __future__ import annotations

import numpy as np


def get_2d_sincos_pos_embed(embed_dim: int, grid_size) -> np.ndarray:
    """``(H * W, D)`` sincos embedding; w-major grid like the reference."""
    grid_h = np.arange(grid_size[0], dtype=np.float32)
    grid_w = np.arange(grid_size[1], dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first
    grid = grid.reshape([2, 1, grid_size[0], grid_size[1]])
    emb_h = _1d_sincos(embed_dim // 2, grid[0])
    emb_w = _1d_sincos(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def _1d_sincos(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def pos_embed_nhwc(embed_dim: int, grid_size) -> np.ndarray:
    """``(H, W, D)`` layout for NHWC feature maps.

    The reference reshapes the ``(H*W, D)`` table to ``(D, H, W)`` via
    ``permute(1, 0).view(D, H, -1)`` (``triplane.py:354-355``); this is
    the channels-last equivalent.
    """
    h, w = grid_size
    return get_2d_sincos_pos_embed(embed_dim, grid_size).reshape(h, w, embed_dim)
