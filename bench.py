#!/usr/bin/env python
"""Benchmark: triplane_occ inference throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": "triplane_occ samples/sec/chip", "value": N,
     "unit": "samples/s", "vs_baseline": N / 10.0}

Baseline: the driver's north star is >= 10 nuScenes samples/sec/chip on
v5e (BASELINE.md).  The model is the shipped ``triplane_occ`` config
(ConvNeXt-tiny x2 + MiT-1024 neck + 99x99x16 voxel readout + MLP head)
run in bf16 compute / f32 params, batched to fill the chip.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from efficient_multimodal_perception_tpu.configs import get_config
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model

    cfg = get_config("triplane_occ")
    cfg["model"]["dtype"] = jnp.bfloat16
    model = build_model(cfg["model"])
    batch = synthetic_batch(
        batch_size, with_occ=False, point_budget=4096, seed=0
    )

    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b)
    )(batch)

    @jax.jit
    def infer(variables, batch):
        logits, _, _ = model.apply(variables, batch, deterministic=True)
        return jnp.argmax(logits, axis=-1).astype(jnp.int8)

    import numpy as np

    # warmup / compile; NOTE: hard-sync via host transfer — through the
    # axon tunnel, block_until_ready returns before execution finishes.
    np.asarray(infer(variables, batch))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, batch)
    np.asarray(out)
    dt = time.perf_counter() - t0

    sps = batch_size * iters / dt
    print(
        json.dumps(
            {
                "metric": "triplane_occ samples/sec/chip",
                "value": round(sps, 2),
                "unit": "samples/s",
                "vs_baseline": round(sps / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
