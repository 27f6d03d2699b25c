#!/usr/bin/env python
"""Variants for the scatter_set_2d_batch FORWARD on chip.

The (G, T, C) take_along_axis by winner dominates the op (bench_scatter:
193 ms at G=12 random / ~17 ms in-model).  Winners are unique per
target, so the canvas can instead be built by a row scatter whose
indices are ALL unique (losers routed to distinct slop slots) — XLA can
vectorize a unique-indices set.  Also tries segment_sum.

Distributions: "random" (worst case) and "modellike" (~20% valid,
row-sorted coords — closer to projective rc_coors).

    python tools/bench_scatter2.py [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from efficient_multimodal_perception_tpu.ops.scatter import (  # noqa: E402
    last_write_winner_batch,
    scatter_set_2d_batch,
)

H, W, C, P = 256, 512, 32, 32768
T = H * W


def timeit(fn, args, iters):
    # Sync through a jitted scalar reduction of the output: pulling the
    # raw (G, H, W, C) canvas through the ~30 MB/s tunnel INSIDE the
    # timed loop amortizes ~110 ms/iter of transfer into every row (the
    # first run of this script did exactly that — treat those numbers
    # as deltas only).  The reduce-fusion may hide one HBM write of the
    # output; fine for A/B comparisons.
    red = jax.jit(lambda *a: jnp.sum(
        jax.tree_util.tree_leaves(fn(*a))[0].astype(jnp.float32)))
    np.asarray(red(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def v_unique_set(rows, cols, valid, values):
    """Unique-indices row scatter: winners to their pixel, losers to a
    distinct slop slot each -> every index distinct."""
    G = rows.shape[0]
    idx_in = rows * W + cols
    keep = valid & (idx_in >= 0) & (idx_in < T)
    winner = last_write_winner_batch(rows, cols, keep, H, W)
    t_safe = jnp.where(keep, idx_in, 0)
    won = keep & (
        jnp.take_along_axis(winner, t_safe, axis=1)
        == jnp.arange(P, dtype=winner.dtype)[None]
    )
    base = jnp.arange(G, dtype=jnp.int32)[:, None]
    slot = jnp.where(won, t_safe + base * T,
                     G * T + base * P + jnp.arange(P, dtype=jnp.int32))
    out = jnp.zeros((G * T + G * P, C), values.dtype)
    out = out.at[slot.reshape(-1)].set(
        values.reshape(-1, C), unique_indices=True, mode="promise_in_bounds"
    )
    return out[: G * T].reshape(G, H, W, C)


def v_segsum(rows, cols, valid, values):
    G = rows.shape[0]
    idx_in = rows * W + cols
    keep = valid & (idx_in >= 0) & (idx_in < T)
    winner = last_write_winner_batch(rows, cols, keep, H, W)
    t_safe = jnp.where(keep, idx_in, 0)
    won = keep & (
        jnp.take_along_axis(winner, t_safe, axis=1)
        == jnp.arange(P, dtype=winner.dtype)[None]
    )
    base = jnp.arange(G, dtype=jnp.int32)[:, None]
    seg = jnp.where(won, t_safe + base * T, G * T)
    vals = jnp.where(won[..., None], values, 0)
    out = jax.ops.segment_sum(
        vals.reshape(-1, C), seg.reshape(-1), num_segments=G * T + 1
    )[: G * T]
    return out.reshape(G, H, W, C)


def make_inputs(G, dist, seed=0):
    rng = np.random.default_rng(seed)
    if dist == "random":
        rows = rng.integers(0, H, (G, P))
        cols = rng.integers(0, W, (G, P))
        valid = rng.random((G, P)) < 0.7
    else:  # modellike: sparse, row-coherent
        rows = np.sort(rng.integers(0, H, (G, P)), axis=1)
        cols = rng.integers(0, W, (G, P))
        valid = rng.random((G, P)) < 0.2
    vals = rng.standard_normal((G, P, C))
    return jax.device_put(
        (jnp.asarray(rows, jnp.int32), jnp.asarray(cols, jnp.int32),
         jnp.asarray(valid), jnp.asarray(vals, jnp.bfloat16)),
        jax.devices()[0],
    )


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    f_cur = jax.jit(lambda r, c, v, x: scatter_set_2d_batch(r, c, v, x, H, W))
    f_uni = jax.jit(v_unique_set)
    f_seg = jax.jit(v_segsum)

    # correctness first (CPU-sized check on device is fine)
    r, c, v, x = make_inputs(2, "random", 7)
    a = np.asarray(f_cur(r, c, v, x), np.float32)
    b = np.asarray(f_uni(r, c, v, x), np.float32)
    s = np.asarray(f_seg(r, c, v, x), np.float32)
    print("unique == gather:", bool((a == b).all()),
          "| segsum == gather:", bool((a == s).all()), flush=True)

    for dist in ("random", "modellike"):
        for G in (12, 24):
            args = make_inputs(G, dist)
            print(f"--- {dist} G={G} ---", flush=True)
            print(f"current gather {timeit(f_cur, args, iters)*1e3:8.2f} ms",
                  flush=True)
            print(f"unique set     {timeit(f_uni, args, iters)*1e3:8.2f} ms",
                  flush=True)
            print(f"segment_sum    {timeit(f_seg, args, iters)*1e3:8.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
