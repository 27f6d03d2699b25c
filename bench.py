#!/usr/bin/env python
"""Benchmark: triplane_occ throughput on one TPU chip.

Prints ONE JSON line, e.g.:
    {"metric": "triplane_occ samples/sec/chip", "value": N,
     "unit": "samples/s", "vs_baseline": N / 10.0, "mfu": ...}

Baseline: the driver's north star is >= 10 nuScenes samples/sec/chip on
v5e (BASELINE.md).  The model is the shipped ``triplane_occ`` config
(ConvNeXt-tiny x2 + MiT-1024 neck + 99x99x16 voxel readout + MLP head)
run in bf16 compute / f32 params, batched to fill the chip.

``--train`` benches the frozen fine-tune train step instead (adds a
second long compile through the remote compiler).  ``mfu`` is estimated
from XLA's cost analysis against the v5e bf16 peak (197 TF/s/chip).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

V5E_PEAK_FLOPS = 197e12  # bf16, per chip


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("batch_size", nargs="?", type=int, default=4)
    p.add_argument("iters", nargs="?", type=int, default=30)
    p.add_argument("--train", action="store_true",
                   help="bench the train step instead of inference")
    return p.parse_args()


def _flops_of(jitted, *args) -> float:
    """Per-invocation FLOPs from XLA cost analysis (0.0 if the backend
    doesn't report)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    args = parse_args()
    batch_size, iters = args.batch_size, args.iters

    from efficient_multimodal_perception_tpu.configs import get_config
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model

    cfg = get_config("triplane_occ")
    cfg["model"]["dtype"] = jnp.bfloat16
    model = build_model(cfg["model"])

    import numpy as np

    if args.train:
        batch_size = min(batch_size, 2)
        batch = synthetic_batch(
            batch_size, with_occ=True, point_budget=4096, seed=0
        )
        from efficient_multimodal_perception_tpu.train.trainer import (
            frozen_stage_tokens,
            init_state,
            make_optimizer,
            make_train_step,
        )

        freeze = tuple(cfg["model_init"].get("freeze", ())) + (
            frozen_stage_tokens(cfg["model"])
        )
        rng_names = ("sample", "droppath")
        opt_probe = make_optimizer(cfg, 1000, None, ())
        state = init_state(model, batch, opt_probe, 0, rng_names)
        import dataclasses

        optimizer = make_optimizer(cfg, 1000, state.params, freeze)
        state = dataclasses.replace(
            state, opt_state=optimizer.init(state.params)
        )
        step_fn = make_train_step(model, optimizer, rng_names)
        rng = jax.random.key(0)

        state, logs = step_fn(state, batch, rng)  # compile + warmup
        np.asarray(logs["loss"])
        flops = _flops_of(step_fn, state, batch, rng)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, logs = step_fn(state, batch, rng)
        np.asarray(logs["loss"])
        dt = time.perf_counter() - t0
        metric = "triplane_occ train samples/sec/chip"
        base = 10.0
    else:
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

        # warmup / compile; NOTE: hard-sync via host transfer — through
        # the axon tunnel, block_until_ready returns before execution
        # finishes.
        np.asarray(infer(variables, batch))
        flops = _flops_of(infer, variables, batch)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(variables, batch)
        np.asarray(out)
        dt = time.perf_counter() - t0
        metric = "triplane_occ samples/sec/chip"
        base = 10.0

    # XLA cost analysis can't see inside custom calls: the fused neck
    # attention (ops/pallas_kernels.attention_pallas, 2 blocks x 4
    # heads x 4096 tokens x hd=256) contributes 2*2*2*N^2*hd per head.
    if flops > 0:
        n_tok, hd, heads, blocks = 4096, 256, 4, 2
        flops += blocks * heads * batch_size * 2 * 2 * n_tok**2 * hd

    sps = batch_size * iters / dt
    step_s = dt / iters
    result = {
        "metric": metric,
        "value": round(sps, 2),
        "unit": "samples/s",
        "vs_baseline": round(sps / base, 3),
    }
    if flops > 0:
        result["mfu"] = round(flops / step_s / V5E_PEAK_FLOPS, 4)
        result["tflops_per_step"] = round(flops / 1e12, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
