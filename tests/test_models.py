"""Model-level tests: one train step per family on tiny configs.

Covers SURVEY.md §4's "integration: one tiny train step per config (loss
finite, grads flow, frozen params stay frozen)".
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_multimodal_perception_tpu.data.synthetic import synthetic_batch
from efficient_multimodal_perception_tpu.models.builder import build_model
from efficient_multimodal_perception_tpu.train.trainer import (
    init_state,
    make_optimizer,
    make_train_step,
)

from tiny import tiny_elev, tiny_mae, tiny_occ, tiny_point

SCHED = dict(
    optimizer=dict(type="AdamW", lr=1e-3, betas=(0.95, 0.99),
                   weight_decay=0.001),
    grad_clip=35.0,
    lr_config=dict(warmup_iters=2, warmup_ratio=0.1, min_lr_ratio=0.1),
)
RNGS = ("sample", "droppath")


def one_step(model_cfg, batch, freeze=()):
    model = build_model(model_cfg)
    opt0 = make_optimizer(SCHED, 10, None, ())
    state = init_state(model, batch, opt0, seed=0, rng_names=RNGS)
    opt = make_optimizer(SCHED, 10, state.params, freeze)
    state = dataclasses.replace(state, opt_state=opt.init(state.params))
    step = make_train_step(model, opt, rng_names=RNGS, donate=False)
    new_state, logs = step(state, batch, jax.random.key(7))
    return state, new_state, {k: float(v) for k, v in logs.items()}


def test_mae_train_step():
    batch = synthetic_batch(1, point_budget=2048, seed=0)
    state, new_state, logs = one_step(tiny_mae(), batch)
    for k in ("camera_loss", "range_loss", "surface_loss",
              "contrastive_loss", "loss"):
        assert np.isfinite(logs[k]), logs
    assert logs["grad_norm"] > 0
    # params moved
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        new_state.params,
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_occ_train_step_freeze():
    batch = synthetic_batch(1, point_budget=2048, with_occ=True, seed=1)
    state, new_state, logs = one_step(
        tiny_occ(), batch, freeze=("encoder", "neck")
    )
    assert np.isfinite(logs["loss"])

    def maxdiff(tree_a, tree_b):
        d = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), tree_a, tree_b
        )
        return max(jax.tree.leaves(d))

    # frozen encoder/neck unchanged; decoder trained
    assert maxdiff(state.params["encoder"], new_state.params["encoder"]) == 0
    assert maxdiff(state.params["neck"], new_state.params["neck"]) == 0
    assert maxdiff(state.params["decoder"], new_state.params["decoder"]) > 0


def test_point_triplane_train_step():
    batch = synthetic_batch(1, point_budget=2048, seed=2)
    state, new_state, logs = one_step(tiny_point(), batch)
    for k in ("camera_loss", "surface_loss", "contrastive_loss"):
        assert np.isfinite(logs[k]), logs


def test_point_occ_forward():
    batch = synthetic_batch(1, point_budget=2048, with_occ=True, seed=3)
    model = build_model(tiny_point(occ=True))
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b)
    )(batch)
    logits, occ, losses = jax.jit(
        lambda v, b: model.apply(v, b, deterministic=True)
    )(variables, batch)
    assert logits.shape == (1, 99, 99, 16, 5)
    assert np.isfinite(float(losses["loss"]))


def test_elev_train_step():
    batch = synthetic_batch(1, point_budget=2048, with_elev=True, seed=4)
    state, new_state, logs = one_step(
        tiny_elev(), batch, freeze=("encoder", "neck")
    )
    assert np.isfinite(logs["loss"])


@pytest.mark.parametrize("n_dev", [8])
def test_data_parallel_step(n_dev):
    """The same train step over an 8-device CPU mesh (SURVEY.md §4)."""
    from efficient_multimodal_perception_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
    )

    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:n_dev])
    batch = synthetic_batch(n_dev, point_budget=2048, with_occ=True, seed=5)
    with mesh:
        batch = shard_batch(batch, mesh)
        state, new_state, logs = one_step(tiny_occ(), batch)
    assert np.isfinite(logs["loss"])


def test_data_parallel_full_shape_forward():
    """ONE full-size (config-built, real channel counts) forward sharded
    over the 8-device CPU mesh — insurance that the production shapes
    shard, not just the tiny ones (VERDICT r1 Weak #5)."""
    from efficient_multimodal_perception_tpu.configs import get_config
    from efficient_multimodal_perception_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:8])
    cfg = get_config("triplane_occ")
    model = build_model(cfg["model"])
    batch = synthetic_batch(8, point_budget=4096, with_occ=True, seed=6)
    with mesh:
        batch = shard_batch(batch, mesh)
        variables = jax.jit(
            lambda b: model.init({"params": jax.random.key(0)}, b)
        )(batch)
        logits, occ, losses = jax.jit(
            lambda v, b: model.apply(v, b, deterministic=True)
        )(variables, batch)
    assert logits.shape == (8, 99, 99, 16, 5)
    assert np.isfinite(float(losses["loss"]))
