"""IoU metric parity vs a literal port of the reference loop."""

import numpy as np
import jax.numpy as jnp

from efficient_multimodal_perception_tpu.train.metrics import (
    aggregate_iou,
    evaluation_semantic,
)


def reference_eval(pred, gt, class_num):
    """Literal numpy port of triplane_occ.py:468-500."""
    results = []
    for i in range(pred.shape[0]):
        g, p = gt[i], pred[i]
        mask = g != 255
        score = np.zeros((class_num, 3))
        for j in range(class_num):
            if j == 0:
                score[j][0] = ((g[mask] != 0) & (p[mask] != 0)).sum()
                score[j][1] = (g[mask] != 0).sum()
                score[j][2] = (p[mask] != 0).sum()
            else:
                score[j][0] = ((g[mask] == j) & (p[mask] == j)).sum()
                score[j][1] = (g[mask] == j).sum()
                score[j][2] = (p[mask] == j).sum()
        results.append(score)
    return np.stack(results)


def reference_aggregate(scores):
    """Literal port of apis/test.py:44-74 (mean counts then ratio)."""
    mean = scores.mean(axis=0)
    ious = []
    for j in range(mean.shape[0]):
        tp, g, p = mean[j]
        ious.append(tp / (g + p - tp) if (g + p - tp) > 0 else np.nan)
    return ious


def test_evaluation_semantic_matches_reference():
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 5, (3, 10, 10, 4)).astype(np.int32)
    gt = rng.integers(0, 5, (3, 10, 10, 4)).astype(np.int32)
    gt[rng.random(gt.shape) < 0.2] = 255

    ours = np.asarray(evaluation_semantic(jnp.asarray(pred), jnp.asarray(gt), 5))
    ref = reference_eval(pred, gt, 5)
    np.testing.assert_allclose(ours, ref)

    agg = aggregate_iou(ours)
    ref_ious = reference_aggregate(ref)
    assert abs(agg["iou"] - ref_ious[0]) < 1e-9
    np.testing.assert_allclose(agg["per_class"], ref_ious)
    assert abs(agg["miou"] - np.nanmean(ref_ious[1:])) < 1e-9
