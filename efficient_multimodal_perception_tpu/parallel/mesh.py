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
    """Leading-axis batch sharding for every leaf of a Batch pytree."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on the mesh, batch axis split over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
