"""Validation evaluation shared by tools/test.py and the train loop.

The EvalHook surface of the reference runner (``mmdet3d/apis/test.py``;
the shipped configs disable it during (pre)training with
``interval=epochs+1`` but the machinery exists) — here a plain function
over a batch iterator.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import aggregate_iou, evaluation_semantic


def evaluate(
    model,
    variables,
    batches: Iterable,
    model_type: str,
    num_classes: int = 5,
    class_names=(),
) -> dict:
    """Run eval over ``batches`` and aggregate task metrics.

    Returns a metric dict: occupancy configs get ``ce / iou / miou /
    per_class``; elevation gets ``mse``; pretrain models get the mean
    total loss.
    """
    is_occ = model_type in ("TriplaneOcc", "PointTriplaneOcc")
    is_elev = model_type == "TriplaneElev"

    fwd = jax.jit(
        lambda v, b: model.apply(
            v, b, deterministic=True, rngs={"sample": jax.random.key(1)}
        )
    )

    scores, ces, mses, losses = [], [], [], []
    for b in batches:
        out = fwd(variables, b)
        if is_occ:
            logits, occ, loss = out
            pred = jnp.argmax(logits, axis=-1)
            scores.append(
                np.asarray(evaluation_semantic(pred, occ, num_classes))
            )
            ces.append(float(loss["loss"]))
        elif is_elev:
            _, loss = out
            mses.append(float(loss["loss"]))
        else:
            ld = out[-1] if isinstance(out, tuple) else out
            losses.append(
                float(sum(v for k, v in ld.items() if "loss" in k))
            )

    if is_occ:
        agg = aggregate_iou(np.concatenate(scores, axis=0))
        out = {"ce": float(np.mean(ces)), "iou": agg["iou"],
               "miou": agg["miou"]}
        for name, v in zip(class_names, agg["per_class"][1:]):
            out[f"iou_{name}"] = v
        return out
    if is_elev:
        return {"mse": float(np.mean(mses))}
    return {"val_loss": float(np.mean(losses))}


def make_val_batches(
    dataset, batch_size: int, limit: int | None = None
) -> Callable[[], Iterable]:
    """Factory of single-pass val batch iterators."""

    def gen():
        n = len(dataset) if limit is None else min(limit, len(dataset))
        for i in range(0, n - batch_size + 1, batch_size):
            yield jax.tree.map(
                jnp.asarray, dataset.batch(list(range(i, i + batch_size)))
            )

    return gen
