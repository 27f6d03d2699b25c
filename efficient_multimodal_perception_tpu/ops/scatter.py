"""Segment/scatter ops: the TPU replacement for spconv + torch_scatter.

The reference's point-family projector
(``mmdet3d/models/backbones/point_triplane_projector.py:66-117``) builds a
``spconv.SparseConvTensor`` over a 128x128x80 grid, per-voxel-dedups points
with ``torch_scatter.scatter_max`` and then runs three axis-wise
``SparseMaxPool3d`` collapses.  Both CUDA libraries reduce to one primitive
here: a masked ``segment_max`` from points directly into the *pooled* cell
grid (max of per-voxel maxes == max over the union of points, and spconv's
"empty voxels produce 0 in .dense()" convention is reproduced by writing 0
into empty segments).  No sparse tensor is ever materialized — XLA lowers
the whole thing to one scatter.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def masked_segment_max(
    feats: jax.Array,
    seg_ids: jax.Array,
    valid: jax.Array,
    num_segments: int,
    empty_value: float = 0.0,
) -> jax.Array:
    """Per-segment max over valid rows; empty segments get ``empty_value``.

    Args:
        feats: ``(P, C)`` features.
        seg_ids: ``(P,)`` int segment ids in ``[0, num_segments)``.
        valid: ``(P,)`` bool; invalid rows are routed to a slop segment.
        num_segments: number of real segments.
        empty_value: fill for empty segments; ``None`` skips the
            cleanup pass and leaves ``-inf`` there (for consumers that
            fuse the finite-or-zero fix into their own prologue, e.g.
            ``ops/pallas_kernels.finite_mlp_fused`` — the cleanup is a
            full HBM round trip of the pooled planes otherwise).

    Returns:
        ``(num_segments, C)``.
    """
    neg = jnp.asarray(-jnp.inf, feats.dtype)
    ids = jnp.where(valid, seg_ids, num_segments)
    out = jax.ops.segment_max(
        jnp.where(valid[:, None], feats, neg), ids, num_segments=num_segments + 1
    )[:num_segments]
    if empty_value is None:
        return out
    return jnp.where(jnp.isfinite(out), out, empty_value)


@jax.custom_vjp
def _permute_rows(feats, order, inv_order):
    """``feats[order]`` with a gather (not scatter-add) backward.

    ``order`` is a *permutation*, so the transpose of the gather is the
    gather by the inverse permutation — XLA's autodiff would instead
    emit a (P, C) scatter-add, the exact op class the sorted pool
    rewrite exists to avoid (same insight as the MAE camera-scatter
    VJP, round-3 ledger).
    """
    return feats[order]


def _permute_rows_fwd(feats, order, inv_order):
    return feats[order], inv_order


def _permute_rows_bwd(inv_order, g):
    return g[inv_order], None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def masked_segment_max_sorted(
    feats: jax.Array,
    seg_ids: jax.Array,
    valid: jax.Array,
    num_segments: int,
    empty_value: float = 0.0,
) -> jax.Array:
    """:func:`masked_segment_max` via argsort + sorted ``segment_max``.

    XLA:TPU's unsorted scatter-max degrades badly for some id layouts:
    at the point projector's production shapes (B=8, P=36864, C=128,
    grid 128x128x80) the xy-plane pool costs 24.5 ms unsorted but
    9.4 ms as argsort + row-permute + ``indices_are_sorted=True``
    segment_max — *including* the 2.4 ms argsort (r5 chip A/B,
    ``tools/profile_proj.py``).  The yz/xz pools LOSE from sorting
    (6.9 -> 8.9 ms), so callers pick per pool.  Values are bit-identical
    to the unsorted form (max is order-independent).
    """
    ids = jnp.where(valid, seg_ids, num_segments)
    order = jnp.argsort(ids)
    inv_order = jnp.argsort(order)
    ids_s = ids[order]
    neg = jnp.asarray(-jnp.inf, feats.dtype)
    feats_s = _permute_rows(
        jnp.where(valid[:, None], feats, neg), order, inv_order
    )
    out = jax.ops.segment_max(
        feats_s, ids_s, num_segments=num_segments + 1,
        indices_are_sorted=True,
    )[:num_segments]
    if empty_value is None:
        return out
    return jnp.where(jnp.isfinite(out), out, empty_value)


def masked_segment_sum(
    feats: jax.Array, seg_ids: jax.Array, valid: jax.Array, num_segments: int
) -> jax.Array:
    """Per-segment sum over valid rows (collision-accumulating scatter).

    Used where the reference relies on ``+=`` scatter accumulation
    (``joint_encoder.py:209,213``) — unlike ``.at[].set`` this reproduces
    additive collisions deterministically.
    """
    ids = jnp.where(valid, seg_ids, num_segments)
    zeros = jnp.where(valid[..., None], feats, 0)
    return jax.ops.segment_sum(zeros, ids, num_segments=num_segments + 1)[
        :num_segments
    ]


def scatter_set_2d(
    canvas: jax.Array,
    rows: jax.Array,
    cols: jax.Array,
    valid: jax.Array,
    values: jax.Array,
) -> jax.Array:
    """Write ``values`` into ``canvas[row, col]`` where valid.

    Matches the reference's advanced-index assignment
    (``triplane.py:390``, ``joint_encoder.py:213``): torch applies the
    writes serially in index order, so on duplicate targets the LAST
    writer wins.  Reproduced deterministically here: a ``scatter-max``
    of writer indices picks the highest ``p`` per target, then a gather
    fetches that writer's value — bit-identical to a torch serial loop,
    which the full-model parity test relies on
    (``tests/test_full_parity.py``).

    Args:
        canvas: ``(H, W, C)``.
        rows/cols: ``(P,)`` int coords.
        valid: ``(P,)`` bool.
        values: ``(P, C)``.
    """
    H, W, C = canvas.shape
    winner = last_write_winner(rows, cols, valid, H, W)
    has = winner >= 0
    vals = values[jnp.maximum(winner, 0)]
    flat = canvas.reshape(-1, C)
    out = jnp.where(has[:, None], vals.astype(flat.dtype), flat)
    return out.reshape(canvas.shape)


def last_write_winner(
    rows: jax.Array, cols: jax.Array, valid: jax.Array, H: int, W: int
) -> jax.Array:
    """Index of the LAST valid writer per flat target, -1 if none.

    The index-only core of :func:`scatter_set_2d`: scattering winner
    *indices* (one int per target) instead of value rows keeps the
    scatter tiny; callers gather their values afterwards (cheap, and
    the gather's transpose-grad is a scatter-add, which is exactly the
    correct gradient of a last-write scatter).

    Args:
        rows/cols: ``(P,)`` int coords.
        valid: ``(P,)`` bool.

    Returns:
        ``(H*W,)`` int32 winner point index, -1 where no writer.
    """
    P = rows.shape[0]
    # route invalid rows to the out-of-bounds flat index directly —
    # computing rows*W+cols with e.g. cols=-1 would wrap back in bounds
    flat_idx = jnp.where(valid, rows * W + cols, H * W)
    order = jnp.arange(P, dtype=jnp.int32)
    return (
        jnp.full((H * W,), -1, jnp.int32)
        .at[flat_idx]
        .max(order, mode="drop")
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def scatter_set_2d_batch(
    rows: jax.Array,
    cols: jax.Array,
    valid: jax.Array,
    values: jax.Array,
    H: int,
    W: int,
) -> jax.Array:
    """Batched :func:`scatter_set_2d` into fresh zero canvases.

    One FLAT winner scatter over all G canvases instead of a vmapped
    per-canvas scatter (XLA lowers the batched scatter dimension
    poorly — r2 ledger: 24.6 ms vmapped vs 14.4 ms flat at the
    interact shapes).  Bit-identical to
    ``vmap(scatter_set_2d)(zeros, ...)``: a flat index outside
    ``[0, H*W)`` is dropped (the unbatched scatter's ``mode="drop"``
    did exactly that), so a wrapping write never crosses canvases.

    The VJP exploits that each point writes exactly ONE pixel, so the
    winner map is a partial inverse of ``p -> t_p``: the exact
    ``d_values`` is a masked row *gather* ``won ? d_out[t_p] : 0``
    instead of the T-row scatter-add autodiff would emit (a ~27 ms
    backward at the MAE camera-loss shapes, vs ~1 ms gathered).

    Args:
        rows/cols: ``(G, P)`` int coords.
        valid: ``(G, P)`` bool.
        values: ``(G, P, C)``.

    Returns:
        ``(G, H, W, C)`` canvases (zero where no valid writer).
    """
    out, _ = _scatter_set_2d_batch_fwd_impl(rows, cols, valid, values, H, W)
    return out


def _scatter_set_2d_batch_fwd_impl(rows, cols, valid, values, H, W):
    G, P = rows.shape
    T = H * W
    idx_in = rows * W + cols
    keep = valid & (idx_in >= 0) & (idx_in < T)
    winner = last_write_winner_batch(rows, cols, keep, H, W)  # (G, T)
    has = winner >= 0
    vals = jnp.take_along_axis(
        values, jnp.maximum(winner, 0)[..., None], axis=1
    )  # (G, T, C)
    out = jnp.where(has[..., None], vals, jnp.zeros((), values.dtype))
    # won[g, p]: did point p's write survive to pixel t_p?
    t_safe = jnp.where(keep, idx_in, 0)
    won = keep & (
        jnp.take_along_axis(winner, t_safe, axis=1)
        == jnp.arange(P, dtype=winner.dtype)[None]
    )
    return out.reshape(G, H, W, values.shape[-1]), (t_safe, won)


def _scatter_set_2d_batch_fwd(rows, cols, valid, values, H, W):
    out, (t_safe, won) = _scatter_set_2d_batch_fwd_impl(
        rows, cols, valid, values, H, W
    )
    return out, (t_safe, won)


def _scatter_set_2d_batch_bwd(H, W, res, g):
    # out.dtype == values.dtype (the forward casts nothing), so the
    # cotangent's dtype is already the right d_values dtype.
    t_safe, won = res
    G, P = t_safe.shape
    g_flat = g.reshape(G, H * W, g.shape[-1])
    d_vals = jnp.take_along_axis(g_flat, t_safe[..., None], axis=1)
    d_vals = jnp.where(won[..., None], d_vals, 0)
    f0 = lambda x: jnp.zeros(x.shape, jax.dtypes.float0)
    return (f0(t_safe), f0(t_safe), f0(won), d_vals)


scatter_set_2d_batch.defvjp(
    _scatter_set_2d_batch_fwd, _scatter_set_2d_batch_bwd
)


def last_write_winner_batch(
    rows: jax.Array, cols: jax.Array, valid: jax.Array, H: int, W: int
) -> jax.Array:
    """Batched :func:`last_write_winner` over a leading group axis.

    One flat scatter-max over all groups (group offset folded into the
    target index) instead of a vmapped per-group scatter — measured
    1.7x faster on v5e (XLA lowers the batched scatter dimension
    poorly: 24.6 ms vmapped vs 14.4 ms flat at the interact shapes).

    Args:
        rows/cols: ``(G, P)`` int coords.
        valid: ``(G, P)`` bool.

    Returns:
        ``(G, H*W)`` int32 winner point index (within its group), -1
        where no writer.
    """
    G, P = rows.shape
    T = H * W
    base = jnp.arange(G, dtype=jnp.int32)[:, None] * T
    flat_idx = jnp.where(valid, rows * W + cols + base, G * T).reshape(-1)
    order = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32), (G, P)
    ).reshape(-1)
    winner = (
        jnp.full((G * T,), -1, jnp.int32)
        .at[flat_idx]
        .max(order, mode="drop")
    )
    return winner.reshape(G, T)


def point_axis_pools(
    feats: jax.Array,
    grid_idx: jax.Array,
    valid: jax.Array,
    grid_size,
    split,
):
    """The three axis-collapsed dense pools of the point projector.

    Equivalent of ``point_triplane_projector.py:53-58,111-115``: with grid
    (X, Y, Z) and split (sx, sy, sz), pooling kernels are (1,1,Z/sz),
    (X/sx,1,1) and (1,Y/sy,1), so the pooled shapes are

        xy: (X, Y, sz)   yz: (sx, Y, Z)   xz: (X, sy, Z)

    Returns dense pooled tensors (channels last) ready for the axis-flatten
    + per-plane MLP:
        ``xy (B?, X, Y, sz, C), yz (sx, Y, Z, C), xz (X, sy, Z, C)``
    for a single sample (batch handled by vmap or batch-offset ids).

    Args:
        feats: ``(P, C)`` per-point features.
        grid_idx: ``(P, 3)`` int voxel indices in [0, grid).
        valid: ``(P,)`` mask.
        grid_size: (X, Y, Z).
        split: (sx, sy, sz) pooled resolutions.
    """
    X, Y, Z = grid_size
    sx, sy, sz = split
    kx, ky, kz = X // sx, Y // sy, Z // sz
    gx, gy, gz = grid_idx[:, 0], grid_idx[:, 1], grid_idx[:, 2]

    xy_id = (gx * Y + gy) * sz + gz // kz
    yz_id = ((gx // kx) * Y + gy) * Z + gz
    xz_id = (gx * sy + gy // ky) * Z + gz

    C = feats.shape[-1]
    xy = masked_segment_max(feats, xy_id, valid, X * Y * sz).reshape(X, Y, sz, C)
    yz = masked_segment_max(feats, yz_id, valid, sx * Y * Z).reshape(sx, Y, Z, C)
    xz = masked_segment_max(feats, xz_id, valid, X * sy * Z).reshape(X, sy, Z, C)
    return xy, yz, xz


def point_axis_pools_batch(feats, grid_idx, valid, grid_size, split):
    """Batched :func:`point_axis_pools` as ONE flat segment_max per pool.

    ``vmap`` of a segment reduction lowers to a *batched* scatter, which
    XLA:TPU executes markedly slower than a single flat scatter over
    batch-offset ids (same finding as the MAE winner scatter: one-flat
    14.4 ms vs vmapped 24.6 ms isolated, round-2 ledger).

    Args:
        feats: ``(B, P, C)``; grid_idx ``(B, P, 3)``; valid ``(B, P)``.

    Returns:
        xy ``(B, X, Y, sz, C)``, yz ``(B, sx, Y, Z, C)``,
        xz ``(B, X, sy, Z, C)`` — identical to the vmapped form.
    """
    B, P, C = feats.shape
    X, Y, Z = grid_size
    sx, sy, sz = split
    kx, ky, kz = X // sx, Y // sy, Z // sz
    gx, gy, gz = grid_idx[..., 0], grid_idx[..., 1], grid_idx[..., 2]
    off = jnp.arange(B, dtype=gx.dtype)[:, None]
    flat_feats = feats.reshape(B * P, C)
    flat_valid = valid.reshape(B * P)

    def pool(seg_id, nseg, shape):
        ids = (seg_id + off * nseg).reshape(B * P)
        out = masked_segment_max(flat_feats, ids, flat_valid, B * nseg)
        return out.reshape(B, *shape, C)

    xy = pool((gx * Y + gy) * sz + gz // kz, X * Y * sz, (X, Y, sz))
    yz = pool(((gx // kx) * Y + gy) * Z + gz, sx * Y * Z, (sx, Y, Z))
    xz = pool((gx * sy + gy // ky) * Z + gz, X * sy * Z, (X, sy, Z))
    return xy, yz, xz


def point_plane_pools_batch(feats, grid_idx, valid, grid_size, split,
                            raw: bool = False):
    """:func:`point_axis_pools_batch` with plane-flatten output layouts.

    The projector flattens the pooled axis into channels
    (``point_triplane_projector.py:111-115`` permutes then reshapes);
    with the axis-pool layouts that costs two full-tensor relayouts
    (yz ``(B,sx,Y,Z,C)->(B,Y,Z,sx,C)`` and xz alike, ~65 MB/sample
    each r+w).  Segment ids are arbitrary labels, so emitting the
    scatter *directly* in plane order is free — same one-flat-scatter
    per pool, zero transposes downstream.

    Returns:
        xy ``(B, X, Y, sz, C)``, yz ``(B, Y, Z, sx, C)``,
        xz ``(B, X, Z, sy, C)`` — each ``reshape(B, H, W, k*C)`` away
        from the plane-MLP input, and exactly the transpose of the
        :func:`point_axis_pools_batch` outputs.  ``raw=True`` leaves
        ``-inf`` in empty cells (see :func:`masked_segment_max`).
    """
    B, P, C = feats.shape
    X, Y, Z = grid_size
    sx, sy, sz = split
    kx, ky, kz = X // sx, Y // sy, Z // sz
    gx, gy, gz = grid_idx[..., 0], grid_idx[..., 1], grid_idx[..., 2]
    off = jnp.arange(B, dtype=gx.dtype)[:, None]
    flat_feats = feats.reshape(B * P, C)
    flat_valid = valid.reshape(B * P)
    empty = None if raw else 0.0

    # The xy pool's unsorted scatter-max is the projector's hot spot on
    # TPU (24.5 ms of the 35.4 ms pool total at B=8 production shapes);
    # the argsort+sorted-segment_max form runs it at 9.4 ms while the
    # smaller yz/xz scatters are FASTER unsorted (r5 chip A/B,
    # tools/profile_proj.py; bit-identical outputs either way).
    # EMP_DISABLE_SORTED_POOL=1 restores the unsorted form (triage).
    xy_impl = (
        masked_segment_max
        if os.environ.get("EMP_DISABLE_SORTED_POOL")
        else masked_segment_max_sorted
    )

    def pool(seg_id, nseg, shape, impl=masked_segment_max):
        ids = (seg_id + off * nseg).reshape(B * P)
        out = impl(
            flat_feats, ids, flat_valid, B * nseg, empty_value=empty
        )
        return out.reshape(B, *shape, C)

    xy = pool((gx * Y + gy) * sz + gz // kz, X * Y * sz, (X, Y, sz),
              impl=xy_impl)
    yz = pool((gy * Z + gz) * sx + gx // kx, Y * Z * sx, (Y, Z, sx))
    xz = pool((gx * Z + gz) * sy + gy // ky, X * Z * sy, (X, Z, sy))
    return xy, yz, xz
