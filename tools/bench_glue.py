#!/usr/bin/env python
"""Microbench the encoder glue: stem, downsample, and fwd1 cumulative.

The stage blocks only explain ~9 ms of camera fwd1's 31.9 ms (B=4);
this isolates where the rest goes.

    python tools/bench_glue.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    import flax.linen as nn

    from efficient_multimodal_perception_tpu.models.convnext import (
        MaskConvNeXt,
    )

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    # camera encoder of triplane_occ: tiny arch, stem 2x2, imgs 256x512
    # (configs/_base.py:convnext_camera) -> stage0 runs at (24,128,256,96)
    net = MaskConvNeXt(
        arch="tiny", in_channels=3, stem_patch_size=(2, 2),
        out_indices=1, dtype=dt,
    )
    x = jnp.asarray(
        rng.standard_normal((24, 256, 512, 3)).astype(np.float32)
    ).astype(dt)
    v = jax.jit(lambda xx: net.init(jax.random.key(0), xx))(x)

    def cum(n_stages):
        def fn(v, xx):
            return net.apply(
                v, xx, 0, n_stages,
                method=lambda m, a, s, e: m.run_stages(a, s, e),
            ).sum()
        return jax.jit(fn)

    def stem_only(v, xx):
        return net.apply(
            v, xx, method=lambda m, a: m.downsample_layers[0](a)
        ).sum()

    def stem_conv_only(v, xx):
        p = v["params"]["downsample_layers_0"]["conv"]
        return (jax.lax.conv_general_dilated(
            xx, p["kernel"].astype(dt), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"].astype(dt)).sum()

    mid = jax.jit(
        lambda v, xx: net.apply(
            v, xx, 0, 1, method=lambda m, a, s, e: m.run_stages(a, s, e)
        )
    )(v, x)  # (24, 64, 128, 96)

    def ds1_only(v, xx):
        return net.apply(
            v, xx, method=lambda m, a: m.downsample_layers[1](a)
        ).sum()

    def ln_only(v, xx):
        p = v["params"]["downsample_layers_1"]["norm"]
        xf = xx.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return (((xf - mu) * jax.lax.rsqrt(var + 1e-6)
                 * p["scale"] + p["bias"]).astype(dt)).sum()

    rows = [
        ("stem conv only", jax.jit(stem_conv_only), (v, x)),
        ("stem conv+LN", jax.jit(stem_only), (v, x)),
        ("stem+stage0 (3 blk)", cum(1), (v, x)),
        ("ds1 LN only (on mid)", jax.jit(ln_only), (v, mid)),
        ("ds1 LN+conv", jax.jit(ds1_only), (v, mid)),
        ("fwd1 = stages 0-1", cum(2), (v, x)),
    ]
    for name, fn, args in rows:
        t = timeit(fn, *args)
        print(f"{name:24s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
