"""Flat (fused) AdamW: the whole optimizer as a handful of big vector ops.

The reference's optimizer is torch AdamW driven by mmcv's
Fp16OptimizerHook (``configs/cosine_2x.py``, grad-clip 35); optax's
per-leaf equivalent (``trainer.make_optimizer``) is mathematically right
but compiles to one fusion *per parameter tensor* — a few hundred tiny
HBM-bound kernels whose launch overhead dominates on TPU (ledger:
~13 ms of a 141 ms MAE step for ~7 ms of theoretical HBM traffic).

This module packs every trainable leaf into ONE contiguous f32 vector and
runs clip → Adam → weight-decay → lr on the flat vectors, so XLA emits a
fixed handful of full-bandwidth kernels regardless of how many parameter
tensors the model has.  Exact-parity with the optax chain is locked by
``tests/test_flat_opt.py``.

Drop-in: ``flat_adamw(...)`` returns an ``optax.GradientTransformation``
with the same ``(updates, state, params)`` contract, selected via
``optimizer.fused=True`` in a config (``trainer.make_optimizer``).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class FlatAdamState(NamedTuple):
    count: jax.Array  # int32 scalar
    mu: jax.Array     # (total,) f32
    nu: jax.Array     # (total,) f32


def _trainable_leaves(tree, mask):
    """(leaves, trainable_flags) in tree order; mask=None => all trainable."""
    leaves = jax.tree_util.tree_leaves(tree)
    if mask is None:
        return leaves, [True] * len(leaves)
    flags = jax.tree_util.tree_leaves(mask)
    assert len(flags) == len(leaves), "mask/param tree mismatch"
    return leaves, [bool(f) for f in flags]


def _flatten(leaves, flags):
    parts = [jnp.ravel(x).astype(jnp.float32)
             for x, f in zip(leaves, flags) if f]
    if not parts:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def flat_adamw(
    learning_rate,
    b1: float = 0.95,
    b2: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 1e-3,
    grad_clip: Optional[float] = 35.0,
    mask: Any = None,
) -> optax.GradientTransformation:
    """Fused-equivalent of
    ``chain(clip_by_global_norm(grad_clip), adamw(lr, b1, b2, wd))``,
    optionally restricted to ``mask``-True leaves (frozen leaves get zero
    updates, exactly like ``multi_transform({False: set_to_zero()})``;
    the clip norm is taken over trainable leaves only, matching the
    masked chain).
    """

    def init(params):
        leaves, flags = _trainable_leaves(params, mask)
        total = sum(int(x.size) for x, f in zip(leaves, flags) if f)
        return FlatAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros((total,), jnp.float32),
            nu=jnp.zeros((total,), jnp.float32),
        )

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("flat_adamw needs params (weight decay)")
        g_leaves, flags = _trainable_leaves(updates, mask)
        p_leaves, _ = _trainable_leaves(params, mask)
        g = _flatten(g_leaves, flags)
        p = _flatten(p_leaves, flags)

        if grad_clip is not None:
            # optax.clip_by_global_norm law: scale only when norm exceeds
            g_norm = jnp.sqrt(jnp.sum(g * g))
            scale = jnp.where(
                g_norm < grad_clip, 1.0, grad_clip / g_norm
            )
            g = g * scale

        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        lr = (learning_rate(state.count)
              if callable(learning_rate) else learning_rate)
        upd = -lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * p)

        # unflatten back into the update pytree; frozen leaves -> zeros
        out, off = [], 0
        for leaf, f in zip(g_leaves, flags):
            if f:
                n = int(leaf.size)
                out.append(upd[off:off + n].reshape(leaf.shape)
                           .astype(leaf.dtype))
                off += n
            else:
                out.append(jnp.zeros_like(leaf))
        treedef = jax.tree_util.tree_structure(updates)
        return (
            jax.tree_util.tree_unflatten(treedef, out),
            FlatAdamState(count=count, mu=mu, nu=nu),
        )

    return optax.GradientTransformation(init, update)
