"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (its only strategy is NCCL
DDP, SURVEY.md §2k); this is a TPU-side extension in the same family as
``parallel/fsdp.py``.  It targets the repeated-block regions of a model
(the MiT neck's transformer blocks, ``models/mit.py::MiTBlock``): each
pipeline stage owns a contiguous slice of blocks, activations flow
between neighbouring stages over ICI via ``lax.ppermute``, and
microbatching keeps every stage busy except the usual K-1-tick
fill/drain bubble.

Design notes (TPU-first):

* Written with ``shard_map`` + ``ppermute`` + ``lax.scan`` — a single
  SPMD program, no per-stage processes.  ``ppermute`` is linear, so
  ``jax.grad`` through the pipelined forward *is* the pipelined
  backward (the transpose permutes in reverse); no hand-written
  schedule is needed for correctness.
* Stage weights are stacked on a leading axis sharded over ``pipe``;
  each device physically holds only its own stage's slice.
* The schedule is plain GPipe (fill, steady state, drain).  Bubble
  fraction is (K-1)/(M+K-1) for K stages and M microbatches.

Correctness is locked by ``tests/test_pipeline.py``: pipelined forward
and gradients match the sequential block stack exactly.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(params_list):
    """Stack per-stage param pytrees along a new leading 'stage' axis.

    All stages must share one treedef (same block topology) — true for
    the repeated transformer blocks this targets.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def pipeline_apply(
    stage_fn: Callable,
    stacked_params,
    x: jax.Array,
    mesh: Mesh,
    n_microbatches: int,
    axis_name: str = "pipe",
):
    """Run ``x`` through K pipelined stages of ``stage_fn``.

    Args:
        stage_fn: ``(params_k, x_mb) -> y_mb``; activation shape must be
            preserved (x -> x), the usual repeated-block contract.
        stacked_params: pytree with a leading stage axis of size K
            (from :func:`stack_stage_params`), sharded or shardable over
            ``axis_name``.
        x: global batch ``(B, ...)``; ``B`` must divide into
            ``n_microbatches`` equal microbatches.
        mesh: mesh containing ``axis_name`` (size K).
        n_microbatches: M; the GPipe bubble is (K-1)/(M+K-1).

    Returns:
        ``(B, ...)`` output of applying the K stages in sequence.
    """
    K = mesh.shape[axis_name]
    B = x.shape[0]
    assert B % n_microbatches == 0, (B, n_microbatches)
    M = n_microbatches
    mb = B // M
    x_mb = x.reshape(M, mb, *x.shape[1:])

    # The stage axis of the params is split over 'pipe'; x and the
    # output are replicated across it.  (To compose with DP, shard the
    # batch over a 'data' axis by extending these specs — the SPMD body
    # is agnostic to extra axes.)
    pspec = P(axis_name)
    rep = P()

    def spmd(params_local, x_all):
        # params_local: this stage's params (leading axis length 1)
        params_k = jax.tree.map(lambda p: p[0], params_local)
        idx = jax.lax.axis_index(axis_name)
        T = M + K - 1

        def tick(carry, t):
            # state: the activation currently resident on this stage
            state = carry
            # stage 0 injects microbatch t (clamped; masked later)
            inj = x_all[jnp.minimum(t, M - 1)]
            inp = jnp.where(idx == 0, inj, state)
            out = stage_fn(params_k, inp)
            # shift activations to the next stage; the last stage's
            # output is collected below from the permuted ring slot
            nxt = jax.lax.ppermute(
                out, axis_name, [(i, (i + 1) % K) for i in range(K)]
            )
            # microbatch t exits stage K-1 at tick t + K - 1; after the
            # ring shift it sits on stage 0's slot, so collect it there.
            y = jnp.where(idx == 0, nxt, jnp.zeros_like(nxt))
            return nxt, (y, t)

        state0 = jnp.zeros_like(x_all[0])
        _, (ys, ts) = jax.lax.scan(tick, state0, jnp.arange(T))
        # ys[t] is valid output for microbatch t-(K-1) when t >= K-1
        out = ys[K - 1 :]
        # only stage 0's copy is non-zero; psum broadcasts it everywhere
        return jax.lax.psum(out, axis_name)

    fn = jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(pspec, rep),
        out_specs=rep,
        check_vma=False,
    )
    out_mb = fn(stacked_params, x_mb)
    return out_mb.reshape(B, *x.shape[1:])


def sequential_apply(stage_fn, stacked_params, x):
    """Reference semantics: the K stages applied in order (no pipeline)."""
    K = jax.tree.leaves(stacked_params)[0].shape[0]
    for k in range(K):
        params_k = jax.tree.map(lambda p: p[k], stacked_params)
        x = stage_fn(params_k, x)
    return x
