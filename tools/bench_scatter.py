#!/usr/bin/env python
"""On-chip component bench of scatter_set_2d_batch at MAE camera-loss
shapes: is the 16.8 ms forward the winner scatter-max or the (G, T, C)
row gather — and does G-chunking the gather help past the ~100 MB knee?

    python tools/bench_scatter.py [iters]

NEVER run concurrently with another TPU process.
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


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    H, W, C, P = 256, 512, 32, 32768
    T = H * W
    for G in (6, 12, 24):
        rng = np.random.default_rng(0)
        rows = jnp.asarray(rng.integers(0, H, (G, P)), jnp.int32)
        cols = jnp.asarray(rng.integers(0, W, (G, P)), jnp.int32)
        valid = jnp.asarray(rng.random((G, P)) < 0.7)
        vals = jnp.asarray(
            rng.standard_normal((G, P, C)), jnp.bfloat16
        )
        args = jax.device_put((rows, cols, valid, vals), jax.devices()[0])
        rows, cols, valid, vals = args

        f_win = jax.jit(lambda r, c, v: last_write_winner_batch(
            r, c, v, H, W))
        f_full = jax.jit(lambda r, c, v, x: scatter_set_2d_batch(
            r, c, v, x, H, W))

        def chunked(r, c, v, x, gc):
            outs = []
            for g0 in range(0, G, gc):
                sl = slice(g0, min(g0 + gc, G))
                outs.append(scatter_set_2d_batch(
                    r[sl], c[sl], v[sl], x[sl], H, W))
            return jnp.concatenate(outs, 0)

        f_c6 = jax.jit(lambda r, c, v, x: chunked(r, c, v, x, 6))
        f_c3 = jax.jit(lambda r, c, v, x: chunked(r, c, v, x, 3))

        def grad_full(r, c, v, x):
            return jax.grad(lambda xx: jnp.sum(
                scatter_set_2d_batch(r, c, v, xx, H, W)
                .astype(jnp.float32)))(x)

        f_g = jax.jit(grad_full)

        out_mb = G * T * C * 2 / 1e6
        print(f"--- G={G} (out {out_mb:.0f} MB) ---", flush=True)
        print(f"winner only   {timeit(f_win, (rows, cols, valid), iters)*1e3:7.2f} ms", flush=True)
        print(f"full fwd      {timeit(f_full, (rows, cols, valid, vals), iters)*1e3:7.2f} ms", flush=True)
        print(f"fwd chunk 6   {timeit(f_c6, (rows, cols, valid, vals), iters)*1e3:7.2f} ms", flush=True)
        print(f"fwd chunk 3   {timeit(f_c3, (rows, cols, valid, vals), iters)*1e3:7.2f} ms", flush=True)
        print(f"fwd+bwd       {timeit(f_g, (rows, cols, valid, vals), iters)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
