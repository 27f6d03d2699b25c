"""FSDP-style parameter/optimizer sharding + tensor-parallel rules.

The reference's only parallelism is NCCL DDP (SURVEY.md §2k:
``configs/default_runtime.py:13``); params and Adam moments are fully
replicated on every GPU.  On TPU the same 1-D data mesh gives two free
extensions, both emitted entirely by XLA's SPMD partitioner (no manual
collectives — the scaling-book recipe: pick a mesh, annotate shardings,
let GSPMD insert the all-gathers/reduce-scatters over ICI):

* **FSDP / ZeRO-3**: every large TrainState leaf (params, Adam mu/nu) is
  stored sharded along its largest divisible axis over the ``fsdp`` mesh
  axis.  XLA all-gathers a weight just before use and reduce-scatters its
  gradient, so per-chip HBM holds ``1/n_fsdp`` of the state while the
  train step stays the exact same traced function.
* **Tensor parallel**: Megatron-style column/row rules for the MiT neck
  (``models/mit.py``) — q/kv/fc1 kernels column-sharded over ``model``,
  proj/fc2 row-sharded — GSPMD propagates the activation shardings and
  inserts the psums.

Both are validated on the 8-virtual-CPU-device mesh (SURVEY §4 strategy)
against the replicated DP step: same params after training steps.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(
    devices=None,
    data: int = 1,
    fsdp: int = 1,
    model: int = 1,
) -> Mesh:
    """Mesh over (data, fsdp, model) axes; sizes must multiply to #devices.

    Axis order puts ``model`` innermost so tensor-parallel collectives ride
    the fastest ICI links, then ``fsdp``, then ``data`` (which tolerates
    DCN across slices) — the standard TPU mesh layout.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data * fsdp * model != n:
        raise ValueError(f"data*fsdp*model = {data*fsdp*model} != {n} devices")
    arr = np.array(devices).reshape(data, fsdp, model)
    return Mesh(arr, ("data", "fsdp", "model"))


def ambient_model_axis() -> int:
    """Size of the 'model' axis of the ambient ``with mesh:`` context (or 1).

    Trace-time introspection used by the neck to decide whether
    tensor/sequence-parallel sharding constraints can resolve — outside
    any mesh (unit tests, single-chip inference) they must not be
    emitted at all.
    """
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
        return dict(getattr(m, "shape", {})).get("model", 1)
    except Exception:
        return 1


def _path_str(path) -> str:
    # str() the key itself too: multi_transform's inner_states dict is
    # keyed by the label values (True/False), not strings
    return "/".join(str(p.key) if hasattr(p, "key") else str(p)
                    for p in path)


# Megatron-style rules for the MiT neck's transformer blocks
# (mit.py Attention/MixFFN):  (regex, axis-to-shard) where axis -1 =
# column parallel (output features), 0 = row parallel (input features).
_TP_RULES = (
    (re.compile(r"neck/.*attn/(q|kv)/kernel$"), -1),
    (re.compile(r"neck/.*attn/(q|kv)/bias$"), -1),
    (re.compile(r"neck/.*attn/proj/kernel$"), 0),
    (re.compile(r"neck/.*mlp/fc1/kernel$"), -1),
    (re.compile(r"neck/.*mlp/fc1/bias$"), -1),
    (re.compile(r"neck/.*mlp/dwconv/kernel$"), -1),
    (re.compile(r"neck/.*mlp/dwconv/bias$"), -1),
    (re.compile(r"neck/.*mlp/fc2/kernel$"), 0),
)


def _tp_spec(path: str, shape, model_size: int) -> Optional[tuple]:
    """(axis index, 'model') for a TP-matched leaf, else None."""
    if model_size <= 1:
        return None
    for rule, axis in _TP_RULES:
        if rule.search(path):
            ax = axis % len(shape)
            if shape[ax] % model_size == 0:
                return (ax, "model")
    return None


def _fsdp_axis(shape, fsdp_size: int, taken: Optional[int]) -> Optional[int]:
    """Largest axis divisible by the fsdp size, skipping a TP-taken axis."""
    best, best_len = None, 0
    for i, d in enumerate(shape):
        if i == taken:
            continue
        if d % fsdp_size == 0 and d > best_len:
            best, best_len = i, d
    return best


def leaf_spec(
    path: str,
    shape,
    mesh: Mesh,
    min_size: int = 2**15,
) -> P:
    """PartitionSpec for one TrainState leaf.

    TP rules claim their axis first; FSDP then shards the largest
    remaining divisible axis of any leaf with ``size >= min_size`` (small
    leaves stay replicated — gathering them costs more than it saves).
    Works identically for params and Adam moments because optax's
    mu/nu mirror the param shapes leaf-for-leaf.
    """
    model_size = mesh.shape.get("model", 1)
    fsdp_size = mesh.shape.get("fsdp", 1)
    ndim = len(shape)
    spec = [None] * ndim
    tp = _tp_spec(path, shape, model_size)
    taken = None
    if tp is not None:
        taken = tp[0]
        spec[taken] = tp[1]
    size = int(np.prod(shape)) if ndim else 1
    if fsdp_size > 1 and size >= min_size:
        ax = _fsdp_axis(shape, fsdp_size, taken)
        if ax is not None:
            spec[ax] = "fsdp"
    return P(*spec)


def state_shardings(state: Any, mesh: Mesh, min_size: int = 2**15):
    """NamedSharding pytree for a TrainState (params + opt_state + stats).

    Every leaf's spec is derived from its own path/shape, so the Adam
    moments inside arbitrary optax state nesting (multi_transform masked
    trees included — MaskedNode leaves have no children and are skipped
    by tree_map) shard consistently with their params.
    """

    def one(path, leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, leaf_spec(_path_str(path), shape, mesh,
                                             min_size))

    return jax.tree_util.tree_map_with_path(one, state)


def shard_state(state: Any, mesh: Mesh, min_size: int = 2**15):
    """Place a (host or replicated) TrainState onto its FSDP/TP layout."""
    sh = state_shardings(state, mesh, min_size)
    return jax.tree.map(jax.device_put, state, sh), sh
