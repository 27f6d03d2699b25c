"""Occupancy IoU metrics, matching the reference bit-for-bit.

``evaluation_semantic`` ports ``triplane_occ.py:468-500`` (per-class
(tp, gt, pred) counts with gt==255 ignored; class 0 = geometry IoU), and
``aggregate_iou`` ports the aggregation in ``mmdet3d/apis/test.py:44-74``
— per-sample score tensors are **meaned over samples, then ratioed**
(exactly what the reference does; the mean-vs-sum choice cancels in the
ratio anyway), with mIoU = nanmean over classes 1..K-1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def evaluation_semantic(
    pred: jax.Array, gt: jax.Array, class_num: int
) -> jax.Array:
    """Per-sample per-class (tp, g, p) counts.

    Args:
        pred: ``(B, ...)`` int predicted classes.
        gt: ``(B, ...)`` int labels, 255 = ignore.
        class_num: number of classes incl. the geometry pseudo-class 0.

    Returns:
        ``(B, class_num, 3)`` float32 counts (tp, gt-count, pred-count).
    """
    B = pred.shape[0]
    p = pred.reshape(B, -1)
    g = gt.reshape(B, -1)
    mask = g != 255

    # Histogram formulation (shape-generic, no python loop over
    # classes): masked-out voxels land in an overflow bucket that is
    # sliced away; tp per class j>=1 is the histogram of gt where
    # pred agrees.  Class 0 is the reference's geometry pseudo-class
    # (any-nonzero vs any-nonzero), recovered from the same histograms
    # by inclusion-exclusion.
    ignore = jnp.int32(class_num)
    gm = jnp.where(mask, g, ignore).astype(jnp.int32)
    pm = jnp.where(mask, p, ignore).astype(jnp.int32)

    def hist(x):
        return jax.vmap(
            lambda row: jnp.bincount(row, length=class_num + 1)
        )(x)[:, :class_num]

    gcount = hist(gm)
    pcount = hist(pm)
    tpcount = hist(jnp.where(gm == pm, gm, ignore))
    nz = mask.sum(axis=1)
    g0 = nz - gcount[:, 0]
    p0 = nz - pcount[:, 0]
    both_zero = (mask & (g == 0) & (p == 0)).sum(axis=1)
    tp0 = nz - gcount[:, 0] - pcount[:, 0] + both_zero

    scores = jnp.stack([tpcount, gcount, pcount], axis=-1)
    scores = scores.at[:, 0].set(jnp.stack([tp0, g0, p0], axis=-1))
    return scores.astype(jnp.float32)


def aggregate_iou(scores: np.ndarray) -> dict:
    """Aggregate stacked per-sample scores into IoU / mIoU.

    Args:
        scores: ``(num_samples, class_num, 3)``.

    Returns:
        dict with ``iou`` (class 0, geometry), ``miou`` (nanmean of
        classes 1..), ``per_class`` list.
    """
    mean = np.asarray(scores, np.float64).mean(axis=0)  # test.py:54-71
    tp, g, p = mean[:, 0], mean[:, 1], mean[:, 2]
    denom = g + p - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(denom > 0, tp / denom, np.nan)
    return {
        "iou": float(iou[0]),
        "miou": float(np.nanmean(iou[1:])) if len(iou) > 1 else float("nan"),
        "per_class": [float(v) for v in iou],
    }
