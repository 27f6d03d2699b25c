"""Flat fused AdamW == the optax chain, bit-for-bit-ish (f32).

Locks train/flat_opt.flat_adamw to
``chain(clip_by_global_norm, adamw)`` (and its multi_transform-frozen
variant) over several steps, including a step whose gradient norm
exceeds the clip threshold.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from efficient_multimodal_perception_tpu.train.flat_opt import flat_adamw
from efficient_multimodal_perception_tpu.train.trainer import (
    cosine_schedule,
    make_optimizer,
)

CFG = {
    "optimizer": dict(type="AdamW", lr=2.5e-4, betas=(0.95, 0.99),
                      weight_decay=1e-3),
    "grad_clip": 35.0,
    "lr_config": dict(warmup_iters=20, warmup_ratio=0.1, min_lr_ratio=0.1),
}


def _tree(seed, scale=1.0):
    k = jax.random.split(jax.random.key(seed), 6)
    return {
        "encoder": {
            "stage0_0": {"dwconv": {"kernel":
                         scale * jax.random.normal(k[0], (7, 7, 1, 24))}},
            "norm": {"scale": scale * jax.random.normal(k[1], (24,))},
        },
        "neck": {
            "attn": {"q": {"kernel":
                     scale * jax.random.normal(k[2], (32, 32))}},
            "mlp": {"fc1": {"bias": scale * jax.random.normal(k[3], (64,))}},
        },
        "head": {"fc": {"kernel": scale * jax.random.normal(k[4], (32, 5)),
                        "bias": scale * jax.random.normal(k[5], (5,))}},
    }


def _assert_close(a, b, tol=2e-6):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    for x, y in zip(fa, fb):
        x, y = np.asarray(x), np.asarray(y)
        denom = np.maximum(np.abs(x).max(), 1e-30)
        assert np.abs(x - y).max() / denom < tol, np.abs(x - y).max()


def _run(opt, params, grad_seq):
    state = opt.init(params)
    for g in grad_seq:
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


def test_flat_adamw_matches_optax_chain():
    params = _tree(0)
    # step 2 has a huge gradient so the clip branch actually triggers
    grads = [_tree(10, 0.1), _tree(11, 400.0), _tree(12, 0.5)]
    sched = cosine_schedule(2.5e-4, 100, 20, 0.1, 0.1)

    ref_opt = optax.chain(
        optax.clip_by_global_norm(35.0),
        optax.adamw(sched, b1=0.95, b2=0.99, weight_decay=1e-3),
    )
    got_opt = flat_adamw(sched, b1=0.95, b2=0.99, weight_decay=1e-3,
                         grad_clip=35.0)
    _assert_close(_run(ref_opt, params, grads),
                  _run(got_opt, params, grads))


def test_flat_adamw_frozen_matches_multi_transform():
    params = _tree(1)
    grads = [_tree(20, 0.3), _tree(21, 2.0)]
    ref_opt = make_optimizer(CFG, 100, params, ("encoder", "neck"))
    fused_cfg = {**CFG, "optimizer": {**CFG["optimizer"], "fused": True}}
    got_opt = make_optimizer(fused_cfg, 100, params, ("encoder", "neck"))

    ref = _run(ref_opt, params, grads)
    got = _run(got_opt, params, grads)
    _assert_close(ref, got)
    # frozen subtrees stayed bit-identical to the originals
    for name in ("encoder", "neck"):
        _assert_close(got[name], params[name], tol=0.0 + 1e-30)


def test_flat_adamw_under_jit_and_grad_norm_semantics():
    params = _tree(2)
    g = _tree(30, 1.0)
    sched = 1e-3
    opt = flat_adamw(sched, grad_clip=35.0)
    state = opt.init(params)

    @jax.jit
    def step(p, s, g):
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    p1, s1 = step(params, state, g)
    assert int(s1.count) == 1
    assert np.isfinite(jax.tree_util.tree_leaves(p1)[0]).all()
    # mask=None means every leaf moved
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params, p1,
    )
    assert all(v > 0 for v in jax.tree_util.tree_leaves(moved))
