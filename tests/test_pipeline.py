"""GPipe pipeline parallelism == sequential stage application.

``parallel/pipeline.py`` must be an exact reformulation: the pipelined
forward and its gradients (autodiff straight through ppermute) match
running the K stages in order, for a toy residual block and for the
real MiT neck blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from efficient_multimodal_perception_tpu.parallel.pipeline import (
    pipeline_apply,
    sequential_apply,
    stack_stage_params,
)
from jax.sharding import Mesh


def _pipe_mesh(k):
    return Mesh(np.array(jax.devices()[:k]), ("pipe",))


def _toy_stage(params, x):
    return x + jnp.tanh(x @ params["w1"]) @ params["w2"]


def _toy_params(key, d, hidden):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (d, hidden)) * 0.3,
        "w2": jax.random.normal(k2, (hidden, d)) * 0.3,
    }


def test_pipeline_forward_and_grads_match_sequential():
    K, B, D = 4, 8, 16
    keys = jax.random.split(jax.random.key(0), K)
    stacked = stack_stage_params([_toy_params(k, D, 32) for k in keys])
    x = jax.random.normal(jax.random.key(1), (B, D))
    mesh = _pipe_mesh(K)

    ref = sequential_apply(_toy_stage, stacked, x)
    got = jax.jit(
        lambda p, x: pipeline_apply(_toy_stage, p, x, mesh, n_microbatches=2)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=1e-6, rtol=1e-6)

    # gradients flow through ppermute: d(loss)/d(params) and d/dx match
    def loss_seq(p, x):
        return jnp.sum(sequential_apply(_toy_stage, p, x) ** 2)

    def loss_pipe(p, x):
        return jnp.sum(pipeline_apply(_toy_stage, p, x, mesh, 2) ** 2)

    g_ref = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
    g_got = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_pipeline_mit_neck_blocks():
    """The real neck blocks (MiTBlock) pipeline over 2 stages."""
    from efficient_multimodal_perception_tpu.models.mit import MiTBlock

    D, H, W = 32, 16, 8
    block = MiTBlock(D, num_heads=4, mlp_ratio=2, sr_ratio=1)
    x = jax.random.normal(jax.random.key(2), (4, H * W, D))
    p0 = block.init(jax.random.key(3), x, (H, W))["params"]
    p1 = block.init(jax.random.key(4), x, (H, W))["params"]
    stacked = stack_stage_params([p0, p1])

    def stage(p, x):
        return block.apply({"params": p}, x, (H, W))

    ref = sequential_apply(stage, stacked, x)
    mesh = _pipe_mesh(2)
    got = jax.jit(
        lambda p, x: pipeline_apply(stage, p, x, mesh, n_microbatches=2)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=2e-6, rtol=1e-5)
