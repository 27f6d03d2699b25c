#!/usr/bin/env python
"""Export a trained model as a portable serving artifact (StableHLO).

The reference deploys torch modules; the TPU-native serving story is a
serialized ``jax.export`` artifact: one file containing the StableHLO
of the jitted inference function plus its calling convention, loadable
in any process (CPU or TPU, same or newer jax) WITHOUT the model code:

    python tools/export.py triplane_occ --checkpoint ckpts/step_90000 \
        --out /models/occ.stablehlo [--batch-size 4]
    # smoke-check an artifact against the in-process model:
    python tools/export.py triplane_occ --out /models/occ.stablehlo \
        --validate

Inference functions per family (same outputs ``tools/test.py`` scores):

* occupancy (TriplaneOcc / PointTriplaneOcc): batch -> int8 class map
  ``(B, 99, 99, 16)``.
* elevation (TriplaneElev): batch -> f32 heights ``(B, X, Y)``.
* pretrain (TriplaneMAE / PointTriplane): batch -> loss dict (useful
  for on-device eval loops).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument(
        "--bf16", action="store_true",
        help="bf16 compute dtype (the TPU serving configuration)",
    )
    p.add_argument(
        "--int8", action="store_true",
        help="export the dynamic-int8 quantized graph (ops/quant.py)",
    )
    p.add_argument(
        "--validate", action="store_true",
        help="deserialize the artifact and compare against the live "
        "model on a synthetic batch",
    )
    p.add_argument(
        "--platform", default=None,
        help="lowering platform (default: current backend); e.g. 'tpu' "
        "to cross-export a TPU artifact from a CPU host",
    )
    return p.parse_args()


def build_infer_fn(model, model_type):
    import jax
    import jax.numpy as jnp

    if model_type in ("TriplaneOcc", "PointTriplaneOcc"):

        def infer(variables, batch):
            logits, _, _ = model.apply(variables, batch, deterministic=True)
            return jnp.argmax(logits, axis=-1).astype(jnp.int8)

    elif model_type == "TriplaneElev":

        def infer(variables, batch):
            pred, _ = model.apply(variables, batch, deterministic=True)
            return pred.astype(jnp.float32)

    else:  # pretrain families: loss dict

        def infer(variables, batch):
            out = model.apply(
                variables, batch, deterministic=True,
                rngs={"sample": jax.random.key(1)},
            )
            losses = out[-1] if isinstance(out, tuple) else out
            return {k: jnp.asarray(v, jnp.float32) for k, v in losses.items()}

    return infer


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from efficient_multimodal_perception_tpu.configs import get_config
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model
    from efficient_multimodal_perception_tpu.train import checkpoint as ckpt

    cfg = get_config(args.config)
    if args.bf16:
        cfg["model"]["dtype"] = jnp.bfloat16
    if args.int8:
        from efficient_multimodal_perception_tpu.ops.quant import enable_int8

        enable_int8(cfg["model"])
    model = build_model(cfg["model"])
    model_type = cfg["model"]["type"]

    batch = synthetic_batch(
        args.batch_size,
        point_budget=cfg.get("data", {}).get("point_budget", 4096),
        with_occ=model_type.endswith("Occ"),
        with_elev=model_type == "TriplaneElev",
        seed=0,
    )
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            b, deterministic=True,
        )
    )(batch)
    if args.checkpoint:
        restored = ckpt.restore_params_only(args.checkpoint)
        variables = {**variables, "params": restored.get("params", restored)}

    infer = build_infer_fn(model, model_type)
    jitted = jax.jit(infer)

    platforms = [args.platform] if args.platform else None
    exported = jexport.export(jitted, platforms=platforms)(variables, batch)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(
        f"wrote {args.out}: {len(blob) / 1e6:.1f} MB, "
        f"platforms={exported.platforms}, "
        f"out_avals={[str(a) for a in jax.tree.leaves(exported.out_avals)]}"
    )

    if args.validate:
        with open(args.out, "rb") as f:
            back = jexport.deserialize(f.read())
        got = back.call(variables, batch)
        want = jitted(variables, batch)
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(w, np.float32),
                atol=1e-5,
            )
        print("validate: deserialized artifact matches the live model")


if __name__ == "__main__":
    main()
