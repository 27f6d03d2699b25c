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


def test_grad_accumulation_matches_full_batch():
    """accum_steps=2 == one full-batch step (DDP-averaging semantics).

    Uses a toy model whose loss is a per-sample mean, so the mean of
    micro-batch means equals the full-batch mean exactly (up to f32
    reduction order).
    """
    import dataclasses

    import flax.linen as nn

    from efficient_multimodal_perception_tpu.train.trainer import (
        init_state,
        make_optimizer,
        make_train_step,
    )

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, batch, deterministic=True):
            x = batch["x"]
            y = nn.Dense(4)(nn.tanh(nn.Dense(8)(x)))
            loss = jnp.mean((y - batch["t"]) ** 2)
            return {"rec_loss": loss}

    cfg = {
        "optimizer": dict(type="AdamW", lr=1e-3, betas=(0.95, 0.99),
                          weight_decay=1e-3),
        "grad_clip": 35.0,
        "lr_config": dict(warmup_iters=5, warmup_ratio=0.1,
                          min_lr_ratio=0.1),
    }
    k = jax.random.key(0)
    batch = {
        "x": jax.random.normal(k, (4, 6)),
        "t": jax.random.normal(jax.random.fold_in(k, 1), (4, 4)),
    }
    model = Toy()
    opt = make_optimizer(cfg, 100, None)

    def run(accum):
        state = init_state(model, batch, opt, seed=0)
        step = make_train_step(model, opt, donate=False,
                               accum_steps=accum)
        logs = None
        for _ in range(3):
            state, logs = step(state, batch, jax.random.key(5))
        return jax.device_get(state.params), logs

    p1, l1 = run(1)
    p2, l2 = run(2)
    np.testing.assert_allclose(
        float(l1["rec_loss"]), float(l2["rec_loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_freeze_prefixes_step_matches_and_skips_frozen_bwd():
    """``freeze_prefixes`` in make_train_step (stop_gradient on frozen
    params) is update-neutral vs the optimizer-only freeze:

    * trainable params take bit-identical updates (the frozen grads were
      already discarded by optax.set_to_zero),
    * frozen params stay bit-identical to init,
    * grad_norm now counts trainable params only (torch
      ``clip_grad_norm_`` semantics — requires_grad=False params have no
      grad), so it must be <= the old all-params norm.
    """
    import dataclasses

    from efficient_multimodal_perception_tpu.configs.tiny import tiny_occ
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model
    from efficient_multimodal_perception_tpu.train.trainer import (
        init_state,
        make_optimizer,
        make_train_step,
    )

    cfg = {
        "optimizer": dict(type="AdamW", lr=1e-3, betas=(0.95, 0.99),
                          weight_decay=1e-3),
        "grad_clip": 35.0,
        "lr_config": dict(warmup_iters=5, warmup_ratio=0.1,
                          min_lr_ratio=0.1),
    }
    freeze = ("encoder",)
    model = build_model(tiny_occ())
    batch = synthetic_batch(2, with_occ=True, point_budget=512, seed=0)

    def run(freeze_in_step):
        opt_probe = make_optimizer(cfg, 100, None)
        state = init_state(model, batch, opt_probe, seed=0,
                           rng_names=("droppath",))
        opt = make_optimizer(cfg, 100, state.params, freeze)
        state = dataclasses.replace(state, opt_state=opt.init(state.params))
        step = make_train_step(
            model, opt, rng_names=("droppath",), donate=False,
            freeze_prefixes=freeze if freeze_in_step else (),
        )
        logs = None
        for _ in range(2):
            state, logs = step(state, batch, jax.random.key(5))
        return jax.device_get(state.params), logs

    p_old, l_old = run(False)
    p_new, l_new = run(True)
    flat_old = jax.tree_util.tree_leaves_with_path(p_old)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(p_new))
    for path, a in flat_old:
        b = flat_new[path]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(l_new["grad_norm"]) <= float(l_old["grad_norm"]) + 1e-6
    assert float(l_new["grad_norm"]) > 0.0
    np.testing.assert_allclose(float(l_old["loss"]), float(l_new["loss"]),
                               rtol=1e-6)


def test_remat_step_matches():
    """remat=True (jax.checkpoint over the forward) is numerics-neutral.

    Uses the tiny occupancy model (real encoder/neck/head with droppath
    rngs and a non-trivial backward) — params after 2 steps must be
    bit-compatible with the un-remat'd step.
    """
    from efficient_multimodal_perception_tpu.configs.tiny import tiny_occ
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model
    from efficient_multimodal_perception_tpu.train.trainer import (
        init_state,
        make_optimizer,
        make_train_step,
    )

    cfg = {
        "optimizer": dict(type="AdamW", lr=1e-3, betas=(0.95, 0.99),
                          weight_decay=1e-3),
        "grad_clip": 35.0,
        "lr_config": dict(warmup_iters=5, warmup_ratio=0.1,
                          min_lr_ratio=0.1),
    }
    model = build_model(tiny_occ())
    batch = synthetic_batch(2, with_occ=True, point_budget=512, seed=0)
    opt = make_optimizer(cfg, 100, None)

    def run(remat):
        state = init_state(model, batch, opt, seed=0,
                           rng_names=("droppath",))
        step = make_train_step(model, opt, rng_names=("droppath",),
                               donate=False, remat=remat)
        logs = None
        for _ in range(2):
            state, logs = step(state, batch, jax.random.key(5))
        return jax.device_get(state.params), logs

    p0, l0 = run(False)
    p1, l1 = run(True)
    np.testing.assert_allclose(float(l0["loss"]), float(l1["loss"]),
                               rtol=1e-6)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1))
    )
    assert worst < 1e-6, worst
