"""Fixed-K radius neighbor search.

TPU replacement for ``torch_geometric.nn.radius`` (CUDA), used by the
implicit-surface decoder (``mmdet3d/models/dense_heads/interpnet.py:5,44,65``).
torch_geometric returns up to ``max_num_neighbors=32`` support points
per query within ``r``, scanning supports in index order and keeping the
FIRST ``k`` found.  That exact contract is reproduced with TPU-native
building blocks only:

* squared distances as ``|q|^2 + |s|^2 - 2 q.s`` — one MXU matmul, no
  ``(chunk, S, 3)`` broadcast;
* the running neighbor count as a two-level cumulative sum computed by
  *triangular-matrix matmuls* (XLA's lane-axis ``cumsum`` over
  ``(256, 32768)`` rows measured 7 ms; the MXU formulation is ~0.2 ms);
* the index of the j-th neighbor by a block-level binary search (8
  steps over 256 block sums) plus an in-block count — all gathers are
  ``(chunk, k)``-sized.

Measured at the InterpNet shapes (Q=2048, S=32768) on v5e: 12.4 ms as a
nearest-K ``top_k`` (round 1), 14.9 ms as XLA cumsum+searchsorted,
9.3 ms in this form (chunk=256; larger chunks measured slower).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLK = 128  # lane-sized inner block for the two-level cumsum


@functools.lru_cache(maxsize=8)
def _lower_tri_np(n: int) -> np.ndarray:
    """(n, n) lower-triangular ones (inclusive), cached as NUMPY — a
    cached ``jnp`` array created under a trace would leak the tracer
    into later traces."""
    return np.tril(np.ones((n, n), np.float32))


def _lower_tri(n: int):
    return jnp.asarray(_lower_tri_np(n))


def radius_neighbors(
    queries: jax.Array,
    supports: jax.Array,
    support_valid: jax.Array,
    radius: float,
    k: int = 32,
    chunk: int = 256,
):
    """For each query, the FIRST ``k`` supports (in support-index order)
    within ``radius`` — ``torch_geometric.nn.radius`` semantics.

    Args:
        queries: ``(Q, 3)``.
        supports: ``(S, 3)`` padded support set.
        support_valid: ``(S,)`` bool.
        radius: search radius.
        k: max neighbors per query.
        chunk: query chunk size (bounds the transient distance matrix to
            ``chunk x S`` so it stays VMEM-friendly).

    Returns:
        ``idx (Q, k)`` support indices (clipped valid), ``mask (Q, k)``
        bool = pair is a real neighbor.
    """
    Q = queries.shape[0]
    S = supports.shape[0]
    pad_q = (-Q) % chunk
    qpad = jnp.pad(queries, ((0, pad_q), (0, 0)))
    qchunks = qpad.reshape(-1, chunk, 3)

    pad_s = (-S) % _BLK
    sp = jnp.pad(supports, ((0, pad_s), (0, 0)))
    vp = jnp.pad(support_valid, (0, pad_s))
    SP = S + pad_s
    NB = SP // _BLK

    s2 = jnp.sum(sp * sp, axis=-1)
    st = sp.T  # (3, SP)
    lt_in = _lower_tri(_BLK)
    lt_out = _lower_tri(NB)
    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)
    r2 = radius * radius
    n_steps = max(1, (NB - 1).bit_length())

    def one_chunk(qc):
        q2 = jnp.sum(qc * qc, axis=-1)
        # precision="highest": default matmul precision is bf16 on TPU,
        # and with LiDAR-frame coords (tens of m) the q.s term is
        # O(1e3) m^2 — bf16 rounding there is O(1) m^2, the same order
        # as InterpNet's r^2=1.0 threshold.  K=3 so f32 is free.  The
        # cumsum matmuls below stay at default precision (0/1 and
        # small-int operands are exact in bf16).
        d2 = q2[:, None] + s2[None, :] - 2.0 * jnp.matmul(
            qc, st, precision="highest"
        )  # (chunk, SP)
        within = (d2 <= r2) & vp[None, :] & (
            jnp.arange(SP, dtype=jnp.int32)[None, :] < S
        )
        w = within.astype(jnp.float32).reshape(chunk, NB, _BLK)
        # two-level inclusive cumsum via triangular matmuls (f32 counts
        # are exact: <= S < 2^24)
        intra = jnp.einsum("cbl,ml->cbm", w, lt_in)  # (chunk, NB, BLK)
        bsum = intra[..., -1]  # (chunk, NB)
        bcum = bsum @ lt_out.T  # (chunk, NB) inclusive over blocks
        total = bcum[:, -1:]

        # block holding rank j: first nb with bcum >= j+1 (binary search
        # over the NB block sums; every gather is (chunk, k))
        lo = jnp.zeros((chunk, k), jnp.int32)
        hi = jnp.full((chunk, k), NB - 1, jnp.int32)
        target = jnp.broadcast_to(ranks[None, :], lo.shape)
        for _ in range(n_steps):
            mid = (lo + hi) >> 1
            ge = jnp.take_along_axis(bcum, mid, axis=1) >= target
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + 1)
        nb_j = jnp.minimum(lo, NB - 1)  # (chunk, k)

        # rank within the block, then its lane position: the number of
        # in-block prefix sums strictly below the target rank
        prev = jnp.take_along_axis(bcum, nb_j, axis=1) - jnp.take_along_axis(
            bsum, nb_j, axis=1
        )
        r_in = target - prev  # 1-based rank inside the block
        rows = jnp.take_along_axis(
            intra, nb_j[..., None], axis=1
        )  # (chunk, k, BLK)
        pos = jnp.sum(
            (rows < r_in[..., None]).astype(jnp.int32), axis=-1
        )
        idx = nb_j * _BLK + jnp.minimum(pos, _BLK - 1)
        mask = target <= total
        return jnp.minimum(idx, S - 1), mask

    idx, mask = jax.lax.map(one_chunk, qchunks)
    idx = idx.reshape(-1, k)[:Q]
    mask = mask.reshape(-1, k)[:Q]
    return idx, mask
