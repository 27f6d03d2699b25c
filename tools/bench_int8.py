#!/usr/bin/env python
"""Microbench: int8 vs bf16 matmul throughput on the TPU chip.

Decision gate for an int8 quantized serving path: v5e's MXU advertises
2x int8 throughput (394 TOPS vs 197 bf16 TFLOPS).  This measures whether
XLA actually hits that path from `lax.dot_general` with int8 operands
(`preferred_element_type=int32`), at the shapes the model would
quantize:

  big     — square-ish chained matmul (the 161 TF/s bf16 reference point)
  epi0    — ConvNeXt stage0 epilogue fc1: (B8 tokens=1.57M, 96) @ (96, 384)
  epi1    — stage1 fc1: (393216, 192) @ (192, 768)
  neck    — MiT fc1: (B8*4096, 1024) @ (1024, 2048)

Protocol (CLAUDE.md timing rules): everything under ONE jit with a
`lax.fori_loop` chaining iterations (per-dispatch tunnel overhead would
swamp a single matmul), hard-sync by pulling one scalar.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time(fn, *args, iters: int = 3) -> float:
    """Seconds per call of the jitted fn (which internally loops)."""
    c = jax.jit(fn).lower(*args).compile()
    np.asarray(c(*args))  # warmup + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = c(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def bench_shape(M: int, K: int, N: int, loops: int = 32):
    kx = jax.random.key(0)
    xb = jax.random.normal(kx, (M, K), jnp.bfloat16)
    wb = jax.random.normal(kx, (K, N), jnp.bfloat16)
    wb_back = jax.random.normal(kx, (N, K), jnp.bfloat16)
    xi = jax.random.randint(kx, (M, K), -127, 127, jnp.int8)
    wi = jax.random.randint(kx, (K, N), -127, 127, jnp.int8)
    wi_back = jax.random.randint(kx, (N, K), -127, 127, jnp.int8)

    def run_bf16(x, w, w_back):
        def body(_, acc):
            y = acc @ w  # (M, N)
            return (y @ w_back).astype(jnp.bfloat16)  # (M, K)

        out = lax.fori_loop(0, loops, body, x)
        return out.astype(jnp.float32).sum()

    def run_int8(x, w, w_back):
        def body(_, acc):
            y = lax.dot_general(
                acc, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # requantize to int8 (shift keeps it cheap and in-range)
            y8 = (y >> 8).astype(jnp.int8)
            z = lax.dot_general(
                y8, w_back, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return (z >> 8).astype(jnp.int8)

        out = lax.fori_loop(0, loops, body, x)
        return out.astype(jnp.int32).sum()

    flops = 2 * M * N * (K + K) * loops  # two matmuls per loop body
    tb = _time(run_bf16, xb, wb, wb_back)
    ti = _time(run_int8, xi, wi, wi_back)
    return flops / tb / 1e12, flops / ti / 1e12


def main():
    shapes = {
        "big": (4096, 4096, 4096, 64),
        "epi0": (1572864, 96, 384, 8),
        "epi1": (393216, 192, 768, 16),
        "neck": (32768, 1024, 2048, 32),
    }
    for name, (M, K, N, loops) in shapes.items():
        tf_b, tf_i = bench_shape(M, K, N, loops)
        print(
            f"{name:6s} M={M} K={K} N={N}: bf16 {tf_b:7.1f} TF/s | "
            f"int8 {tf_i:7.1f} TOP/s | ratio {tf_i / tf_b:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
