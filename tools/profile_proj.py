#!/usr/bin/env python
"""Sub-section timing of the point projector (the spconv replacement).

Splits the 30 ms ``projector`` section of ``tools/profile_point.py``
into: point-MLP chain (BN+Dense), camera reduce, the three flat
segment_max axis pools (``ops/scatter.point_axis_pools_batch``), and
the per-plane MLPs — to find where the scatter time actually goes.
Also A/Bs the vmapped vs flat pool forms at production shapes.

    python tools/profile_proj.py [batch_size] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from efficient_multimodal_perception_tpu.ops.scatter import (
        masked_segment_max,
        point_axis_pools,
        point_axis_pools_batch,
    )

    P, C = 36864, 128
    grid, split = (128, 128, 80), (25, 25, 20)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((B, P, C)), jnp.bfloat16
    )
    idx = jnp.asarray(
        rng.integers(0, [128, 128, 80], size=(B, P, 3)), jnp.int32
    )
    valid = jnp.asarray(rng.random((B, P)) < 0.94)

    def flat(f, g, v):
        return sum(
            t.astype(jnp.float32).sum()
            for t in point_axis_pools_batch(f, g, v, grid, split)
        )

    def vmapped(f, g, v):
        return sum(
            t.astype(jnp.float32).sum()
            for t in jax.vmap(
                lambda ff, gg, vv: point_axis_pools(ff, gg, vv,
                                                    grid, split)
            )(f, g, v)
        )

    def one_pool_xy(f, g, v):
        X, Y, Z = grid
        sz = split[2]
        kz = Z // sz
        gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
        ids = (gx * Y + gy) * sz + gz // kz
        ids = ids + jnp.arange(B, dtype=ids.dtype)[:, None] * (X * Y * sz)
        out = masked_segment_max(
            f.reshape(B * P, C), ids.reshape(-1), v.reshape(-1),
            B * X * Y * sz,
        )
        return out.astype(jnp.float32).sum()

    def sorted_pool_xy(f, g, v):
        # A/B: does sorting ids first make the TPU scatter cheaper?
        X, Y, Z = grid
        sz = split[2]
        kz = Z // sz
        gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
        nseg = X * Y * sz
        ids = (gx * Y + gy) * sz + gz // kz
        ids = ids + jnp.arange(B, dtype=ids.dtype)[:, None] * nseg
        ids = jnp.where(v, ids, B * nseg).reshape(-1)
        order = jnp.argsort(ids)
        ids_s = ids[order]
        f_s = f.reshape(B * P, C)[order]
        neg = jnp.asarray(-jnp.inf, f.dtype)
        out = jax.ops.segment_max(
            jnp.where((ids_s < B * nseg)[:, None], f_s, neg),
            ids_s,
            num_segments=B * nseg + 1,
            indices_are_sorted=True,
        )[: B * nseg]
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        return out.astype(jnp.float32).sum()

    def combined(f, g, v):
        # all three pools as ONE scatter: concat segment-id spaces and
        # tile the rows 3x (442k rows, one output init instead of 3)
        X, Y, Z = grid
        sx, sy, sz = split
        kx, ky, kz = X // sx, Y // sy, Z // sz
        gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
        n_xy, n_yz, n_xz = X * Y * sz, Y * Z * sx, X * Z * sy
        xy_id = (gx * Y + gy) * sz + gz // kz
        yz_id = (gy * Z + gz) * sx + gx // kx + n_xy
        xz_id = (gx * Z + gz) * sy + gy // ky + n_xy + n_yz
        nseg = n_xy + n_yz + n_xz
        off = jnp.arange(B, dtype=gx.dtype)[:, None] * nseg
        ids = jnp.stack([xy_id + off, yz_id + off, xz_id + off], 0)
        ids = jnp.where(v[None], ids, B * nseg).reshape(-1)
        f3 = jnp.broadcast_to(f.reshape(1, B * P, C), (3, B * P, C))
        neg = jnp.asarray(-jnp.inf, f.dtype)
        out = jax.ops.segment_max(
            jnp.where(
                (ids < B * nseg)[:, None], f3.reshape(-1, C), neg
            ),
            ids,
            num_segments=B * nseg + 1,
        )[: B * nseg]
        out = jnp.where(jnp.isfinite(out), out, 0.0)
        return out.astype(jnp.float32).sum()

    def _pool_ids(g, v):
        X, Y, Z = grid
        sx, sy, sz = split
        kx, ky, kz = X // sx, Y // sy, Z // sz
        gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
        n_xy, n_yz, n_xz = X * Y * sz, Y * Z * sx, X * Z * sy
        xy_id = (gx * Y + gy) * sz + gz // kz
        yz_id = (gy * Z + gz) * sx + gx // kx + n_xy
        xz_id = (gx * Z + gz) * sy + gy // ky + n_xy + n_yz
        nseg = n_xy + n_yz + n_xz
        off = jnp.arange(B, dtype=gx.dtype)[:, None] * nseg
        ids = jnp.stack([xy_id + off, yz_id + off, xz_id + off], 0)
        return jnp.where(v[None], ids, B * nseg), nseg

    def combined_sorted(f, g, v):
        # ONE argsort over all 3*B*P ids + gather + sorted segment_max
        ids, nseg = _pool_ids(g, v)
        ids = ids.reshape(-1)
        order = jnp.argsort(ids)
        ids_s = ids[order]
        f3 = jnp.broadcast_to(
            f.reshape(1, B * P, C), (3, B * P, C)
        ).reshape(-1, C)[order]
        neg = jnp.asarray(-jnp.inf, f.dtype)
        out = jax.ops.segment_max(
            jnp.where((ids_s < B * nseg)[:, None], f3, neg),
            ids_s, num_segments=B * nseg + 1, indices_are_sorted=True,
        )[: B * nseg]
        return jnp.where(jnp.isfinite(out), out, 0.0).astype(
            jnp.float32).sum()

    def sorted3(f, g, v):
        # three per-pool argsort+sorted-segment_max passes
        ids3, nseg = _pool_ids(g, v)
        ff = f.reshape(B * P, C)
        neg = jnp.asarray(-jnp.inf, f.dtype)
        tot = 0.0
        for k in range(3):
            ids = ids3[k].reshape(-1)
            order = jnp.argsort(ids)
            ids_s = ids[order]
            f_s = ff[order]
            out = jax.ops.segment_max(
                jnp.where((ids_s < B * nseg)[:, None], f_s, neg),
                ids_s, num_segments=B * nseg + 1,
                indices_are_sorted=True,
            )[: B * nseg]
            tot = tot + jnp.where(
                jnp.isfinite(out), out, 0.0).astype(jnp.float32).sum()
        return tot

    def combined_sorted_key(f, g, v):
        # sort KEYS only; apply the permutation as sort-by-key pairs:
        # argsort int32 + one gather vs sort of (key,row-id) — same
        # thing, here to isolate the argsort cost itself
        ids, nseg = _pool_ids(g, v)
        ids = ids.reshape(-1)
        order = jnp.argsort(ids)
        return order.astype(jnp.float32).sum()

    # --- per-pool (correct per-pool nseg) unsorted vs sorted ----------
    X, Y, Z = grid
    sx, sy, sz = split
    kx, ky, kz = X // sx, Y // sy, Z // sz

    def _one_pool(f, g, v, which, sort):
        gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]
        if which == "xy":
            sid, nseg = (gx * Y + gy) * sz + gz // kz, X * Y * sz
        elif which == "yz":
            sid, nseg = (gy * Z + gz) * sx + gx // kx, Y * Z * sx
        else:
            sid, nseg = (gx * Z + gz) * sy + gy // ky, X * Z * sy
        ids = sid + jnp.arange(B, dtype=sid.dtype)[:, None] * nseg
        ids = jnp.where(v, ids, B * nseg).reshape(-1)
        ff = f.reshape(B * P, C)
        neg = jnp.asarray(-jnp.inf, f.dtype)
        if sort:
            order = jnp.argsort(ids)
            ids = ids[order]
            ff = ff[order]
        out = jax.ops.segment_max(
            jnp.where((ids < B * nseg)[:, None], ff, neg),
            ids, num_segments=B * nseg + 1, indices_are_sorted=sort,
        )[: B * nseg]
        return jnp.where(jnp.isfinite(out), out, 0.0)

    def make_single(which, sort):
        def fn(f, g, v):
            return _one_pool(f, g, v, which, sort).astype(
                jnp.float32).sum()
        return fn

    def hybrid(f, g, v):
        # sorted xy (the expensive scatter) + unsorted yz/xz
        tot = _one_pool(f, g, v, "xy", True).astype(jnp.float32).sum()
        tot += _one_pool(f, g, v, "yz", False).astype(jnp.float32).sum()
        tot += _one_pool(f, g, v, "xz", False).astype(jnp.float32).sum()
        return tot

    def all_sorted(f, g, v):
        tot = 0.0
        for w in ("xy", "yz", "xz"):
            tot += _one_pool(f, g, v, w, True).astype(jnp.float32).sum()
        return tot

    for name, fn in [
        ("pools_flat", flat),
        ("yz_unsorted", make_single("yz", False)),
        ("xz_unsorted", make_single("xz", False)),
        ("yz_sorted", make_single("yz", True)),
        ("xz_sorted", make_single("xz", True)),
        ("hybrid", hybrid),
        ("all_sorted", all_sorted),
    ]:
        try:
            dt = timeit(jax.jit(fn), feats, idx, valid, iters=iters)
            print(f"{name:14s} {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:14s} ERROR {type(e).__name__}: {e}"[:240],
                  flush=True)


if __name__ == "__main__":
    main()
