"""Masked (mask_ratio > 0) MAE path: the SparK sparse-conv mode.

The shipped configs use ratio 0.0 (``configs/triplane_surf_sam.py:13,16``)
but the machinery is a first-class feature of the reference
(``mask_convnext.py:246-337``); this exercises mask creation, mask-aware
encoding and the rng plumbing end-to-end.
"""

import dataclasses

import jax
import numpy as np

from efficient_multimodal_perception_tpu.data.synthetic import synthetic_batch
from efficient_multimodal_perception_tpu.models.builder import build_model
from efficient_multimodal_perception_tpu.train.trainer import (
    init_state,
    make_optimizer,
    make_train_step,
)

from tiny import tiny_mae

SCHED = dict(
    optimizer=dict(type="AdamW", lr=1e-3, betas=(0.95, 0.99),
                   weight_decay=0.001),
    grad_clip=35.0,
    lr_config=dict(warmup_iters=2, warmup_ratio=0.1, min_lr_ratio=0.1),
)


def test_masked_mae_train_step():
    cfg = tiny_mae(contrastive=False, surface=False)
    cfg["encoder"]["lidar_mask_ratio"] = 0.75
    cfg["encoder"]["camera_mask_ratio"] = 0.75

    model = build_model(cfg)
    batch = synthetic_batch(1, point_budget=1024, seed=0)
    rngs = ("sample", "droppath", "mask")
    opt = make_optimizer(SCHED, 10, None, ())
    state = init_state(model, batch, opt, seed=0, rng_names=rngs)
    step = make_train_step(model, opt, rng_names=rngs, donate=False)
    _, logs = step(state, batch, jax.random.key(3))
    for k in ("camera_loss", "range_loss", "loss"):
        assert np.isfinite(float(logs[k])), logs
    assert float(logs["grad_norm"]) > 0


def test_mask_changes_losses():
    """Different mask rngs must change the masked reconstruction loss."""
    cfg = tiny_mae(contrastive=False, surface=False)
    cfg["encoder"]["lidar_mask_ratio"] = 0.5
    model = build_model(cfg)
    batch = synthetic_batch(1, point_budget=1024, seed=1)
    rngs = {
        "params": jax.random.key(0),
        "sample": jax.random.key(1),
        "mask": jax.random.key(2),
    }
    v = jax.jit(lambda b: model.init(rngs, b, deterministic=True))(batch)

    def run(mask_seed):
        out = jax.jit(
            lambda vv, b: model.apply(
                vv, b, deterministic=True,
                rngs={"sample": jax.random.key(1),
                      "mask": jax.random.key(mask_seed)},
            )
        )(v, batch)
        return float(out["range_loss"])

    assert run(10) != run(11)
