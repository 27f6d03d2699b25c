"""Trainer unit tests: schedule, loss aggregation, evaluator."""

import numpy as np
import jax
import jax.numpy as jnp

from efficient_multimodal_perception_tpu.train.trainer import (
    cosine_schedule,
    normalize_output,
    total_loss,
)


def test_cosine_schedule_warmup_and_tail():
    lr = 2.5e-4
    sched = cosine_schedule(
        lr, total_steps=1000, warmup_iters=20, warmup_ratio=0.1,
        min_lr_ratio=0.1,
    )
    assert abs(float(sched(0)) - lr * 0.1) < 1e-9
    # at warmup_iters the cosine branch starts near base lr
    assert abs(float(sched(20)) - lr) < 1e-3 * lr
    # mid-run between min and max
    mid = float(sched(500))
    assert lr * 0.1 < mid < lr
    # end approaches min_lr_ratio * lr
    assert abs(float(sched(1000)) - lr * 0.1) < 1e-8


def test_total_loss_key_filter():
    """Only keys containing 'loss' sum into the total
    (triplane.py:571) — e.g. the 'color' entry is logged, not summed."""
    losses = {
        "camera_loss": jnp.asarray(1.0),
        "range_loss": jnp.asarray(2.0),
        "color": jnp.asarray(100.0),
    }
    assert float(total_loss(losses)) == 3.0


def test_normalize_output():
    d = {"loss": 1}
    assert normalize_output(d) is d
    assert normalize_output((None, None, d)) is d


def test_evaluator_occ_metrics():
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from tiny import tiny_occ

    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model
    from efficient_multimodal_perception_tpu.train.evaluator import evaluate

    model = build_model(tiny_occ())
    b = synthetic_batch(1, point_budget=2048, with_occ=True, seed=0)
    variables = jax.jit(
        lambda x: model.init({"params": jax.random.key(0)}, x)
    )(b)
    metrics = evaluate(model, variables, [b], "TriplaneOcc", 5,
                       ("vehicle",))
    assert set(metrics) >= {"ce", "iou", "miou", "iou_vehicle"}
    assert np.isfinite(metrics["ce"])
