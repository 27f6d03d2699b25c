"""Chip battery for the int8 quantized serving path (session-10 queue).

Sections (fault-isolated, one JSON line each):

1. Raw int8-vs-bf16 MXU ratios at the model's GEMM shapes
   (``tools/bench_int8.py``) — the decision gate: if XLA's
   ``dot_general(int8, int8, preferred=int32)`` doesn't hit the v5e's
   2x int8 MXU path, the whole direction is a ledger NEGATIVE.
2. triplane_occ inference B=8: bf16 baseline vs ``--int8``
   (dynamic-quant GEMMs in encoder epilogues + neck + head).
3. Pallas int8 dot probe: does Mosaic accept an in-kernel
   ``jnp.dot(int8, int8, preferred_element_type=int32)``?  Gates the
   phase-2 fused int8 epilogue kernel.

Usage: ``python tools/measure_int8.py [--iters N] [--only 1,2,3]``.
NEVER run concurrently with another TPU process (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _pallas_int8_probe():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(
            x_ref[:], w_ref[:], preferred_element_type=jnp.int32
        )

    x = jnp.arange(256 * 128, dtype=jnp.int32).reshape(256, 128) % 13 - 6
    w = jnp.arange(128 * 256, dtype=jnp.int32).reshape(128, 256) % 7 - 3
    x8, w8 = x.astype(jnp.int8), w.astype(jnp.int8)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(x8.shape, lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w8.shape, lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (256, 256), lambda: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
    )(x8, w8)
    want = np.asarray(x) @ np.asarray(w)
    ok = np.array_equal(np.asarray(out), want)
    return {"pallas_int8_dot": "ok" if ok else "WRONG RESULT"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--only", default=None)
    args = p.parse_args()
    only = set((args.only or "1,2,3").split(","))

    err = bench._preflight()
    if err is not None:
        print(json.dumps({"error": err}))
        return

    jobs = []
    if "1" in only:
        import bench_int8  # noqa: E402  (tools/ on sys.path when run as script)

        def raw():
            out = {}
            for name, (M, K, N, loops) in {
                "big": (4096, 4096, 4096, 64),
                "epi1": (393216, 192, 768, 16),
                "neck": (32768, 1024, 2048, 32),
            }.items():
                tf_b, tf_i = bench_int8.bench_shape(M, K, N, loops)
                out[name] = {
                    "bf16_tf": round(tf_b, 1),
                    "int8_top": round(tf_i, 1),
                    "ratio": round(tf_i / tf_b, 2),
                }
            return out

        jobs.append(("raw_matmul_ratios", raw))
    if "3" in only:
        jobs.append(("pallas_int8_probe", _pallas_int8_probe))
    if "2" in only:
        jobs += [
            ("infer_B8_bf16", lambda: bench.bench_infer(8, args.iters)),
            ("infer_B8_int8",
             lambda: bench.bench_infer(8, args.iters, int8=True)),
            ("occ_train_B8_int8",
             lambda: bench.bench_occ_train(
                 8, max(10, args.iters // 3), int8=True)),
        ]

    for name, fn in jobs:
        try:
            out = {"name": name, "result": fn()}
        except Exception as e:
            out = {"name": name, "error": f"{type(e).__name__}: {e}"[:400]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
