"""Validation evaluation shared by tools/test.py and the train loop.

The EvalHook surface of the reference runner (``mmdet3d/apis/test.py``;
the shipped configs disable it during (pre)training with
``interval=epochs+1`` but the machinery exists) — here a plain function
over a batch iterator.

Sharded eval: the reference evaluates strictly at B=1 on one GPU
(``tools/test.py:182``, ``apis/test.py:33-35``; its ``multi_gpu_test``
never feeds the custom IoU aggregation).  Here ``evaluate`` takes any
batch size and an optional data mesh: per-SAMPLE scores and losses are
computed inside the jit (so B = n_devices rides the mesh) and
concatenated on host, which makes B=8 bit-identical to B=1 — the
per-sample CE is computed explicitly rather than relying on the model's
batch-mean loss, reproducing the reference's sample-at-a-time
aggregation exactly (``apis/test.py:44-74``).

Eval randomness: surface/contrastive losses at eval draw query points
from the ``sample`` stream.  The reference redraws per forward
(``interpnet.py:141-183``); we fold the batch index into a fixed
``eval_seed`` — redrawn per batch like the reference, deterministic
across runs.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import aggregate_iou, evaluation_semantic


def per_sample_ce(
    logits: jax.Array, targets: jax.Array, ignore_index: int = 255
) -> jax.Array:
    """(B,) valid-voxel-mean CE per sample — what ``F.cross_entropy``
    returns for each B=1 eval step in the reference
    (``triplane_occ.py:186-191``)."""
    B = logits.shape[0]
    lg = logits.reshape(B, -1, logits.shape[-1]).astype(jnp.float32)
    tg = targets.reshape(B, -1)
    valid = tg != ignore_index
    tgt = jnp.where(valid, tg, 0)
    logp = jax.nn.log_softmax(lg, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    v = valid.astype(nll.dtype)
    return (nll * v).sum(axis=1) / jnp.maximum(v.sum(axis=1), 1.0)


def per_sample_masked_mse(
    pred: jax.Array, target: jax.Array, mask: jax.Array
) -> jax.Array:
    """(B,) masked MSE per sample (``unet.py:66-82`` at B=1)."""
    B = pred.shape[0]
    m = mask.reshape(B, -1).astype(jnp.float32)
    d = (pred.reshape(B, -1) * m - target.reshape(B, -1) * m).astype(
        jnp.float32
    )
    return (d * d).sum(axis=1) / (m.sum(axis=1) + 1e-8)


def evaluate(
    model,
    variables,
    batches: Iterable,
    model_type: str,
    num_classes: int = 5,
    class_names=(),
    mesh=None,
    eval_seed: int = 1,
) -> dict:
    """Run eval over ``batches`` and aggregate task metrics.

    Returns a metric dict: occupancy configs get ``ce / iou / miou /
    per_class``; elevation gets ``mse``; pretrain models get the mean
    total loss.  ``mesh``: shard each batch's leading axis over the data
    mesh (use batch_size = n_devices).
    """
    is_occ = model_type in ("TriplaneOcc", "PointTriplaneOcc")
    is_elev = model_type == "TriplaneElev"

    @jax.jit
    def fwd(v, b, key):
        out = model.apply(v, b, deterministic=True, rngs={"sample": key})
        if is_occ:
            logits, occ, _ = out
            pred = jnp.argmax(logits, axis=-1)
            return (
                evaluation_semantic(pred, occ, num_classes),
                per_sample_ce(logits, occ),
            )
        if is_elev:
            pred, _ = out
            return per_sample_masked_mse(
                pred, b.elevation, b.elevation_mask
            )
        ld = out[-1] if isinstance(out, tuple) else out
        return sum(v for k, v in ld.items() if "loss" in k)

    if mesh is not None:
        from ..parallel.mesh import shard_batch
    base_key = jax.random.key(eval_seed)

    scores, ces, mses, losses = [], [], [], []
    for i, b in enumerate(batches):
        if mesh is not None:
            b = shard_batch(b, mesh)
        out = fwd(variables, b, jax.random.fold_in(base_key, i))
        if is_occ:
            s, ce = out
            scores.append(np.asarray(s))
            ces.append(np.asarray(ce))
        elif is_elev:
            mses.append(np.asarray(out))
        else:
            losses.append(float(out))

    if is_occ:
        agg = aggregate_iou(np.concatenate(scores, axis=0))
        out = {
            "ce": float(np.concatenate(ces).mean()),
            "iou": agg["iou"],
            "miou": agg["miou"],
        }
        for name, v in zip(class_names, agg["per_class"][1:]):
            out[f"iou_{name}"] = v
        return out
    if is_elev:
        return {"mse": float(np.concatenate(mses).mean())}
    return {"val_loss": float(np.mean(losses))}


def make_val_batches(
    dataset, batch_size: int, limit: Optional[int] = None
) -> Callable[[], Iterable]:
    """Factory of single-pass val batch iterators."""

    def gen():
        n = len(dataset) if limit is None else min(limit, len(dataset))
        for i in range(0, n - batch_size + 1, batch_size):
            yield jax.tree.map(
                jnp.asarray, dataset.batch(list(range(i, i + batch_size)))
            )

    return gen
