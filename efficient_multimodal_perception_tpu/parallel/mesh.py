"""Device mesh + sharding helpers.

The reference's only parallelism is NCCL data-parallel DDP
(``configs/default_runtime.py:13``, ``tools/train.py:141-148``); the TPU
equivalent is a 1-D ``('data',)`` mesh with the batch sharded over it and
parameters replicated — XLA's SPMD partitioner emits the gradient psums
that DDP's allreduce hooks did.  The mesh axes are kept open-ended so
tensor axes can be added later without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None, axis_names=("data",)
) -> Mesh:
    """1-D data mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding for every leaf of a Batch pytree.

    On a 1-D ``('data',)`` mesh this is plain DP.  On a 2/3-D FSDP/TP
    mesh (``parallel/fsdp.make_mesh_2d``) the batch shards over *both*
    the data and fsdp axes — FSDP is ZeRO over the data-parallel ranks,
    so every (data, fsdp) coordinate holds a distinct batch slice while
    ``model`` coordinates replicate it.
    """
    axes = tuple(a for a in ("data", "fsdp") if a in mesh.axis_names)
    return NamedSharding(mesh, P(axes if len(axes) > 1 else "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on the mesh, batch axis split over 'data'.

    Single-process: ``batch`` is the global batch, ``device_put`` splits
    it. Multi-process (``jax.distributed.initialize`` ran): each process
    passes only its OWN slice of the global batch — the
    DistributedSampler contract of the reference
    (``tools/train.py:141-148``) — and
    ``jax.make_array_from_process_local_data`` assembles the global
    sharded array without any cross-host gather of the data itself.
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            s, np.asarray(x)
        ),
        batch,
    )


def process_local_indices(
    order: np.ndarray,
    global_batch: int,
    step: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> np.ndarray:
    """This process's sample indices for global step ``step``.

    The DistributedSampler law (reference ``tools/train.py:141-148`` +
    mmcv DistributedGroupSampler): the epoch ``order`` is identical on
    every process (same shuffle seed); step ``i``'s global batch is
    ``order[i*B : (i+1)*B]`` and process ``r`` contributes the contiguous
    sub-slice ``[r*B_local : (r+1)*B_local]`` of it, so concatenating all
    processes' slices in rank order reconstructs the single-process
    global batch exactly.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if global_batch % process_count:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{process_count} processes"
        )
    local = global_batch // process_count
    start = step * global_batch + process_index * local
    return order[start : start + local]
