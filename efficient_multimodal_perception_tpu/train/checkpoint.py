"""Checkpointing: orbax save/restore + name/shape-filtered partial load.

Covers the reference's mmcv CheckpointHook (interval-based epoch saves,
``configs/triplane_surf_sam.py:133-136``), ``--resume-from``
(``tools/train.py:130-131``) and the shape-tolerant pretrain->finetune
restore ``_load_state_dict`` (``triplane.py:101-124``,
``triplane_occ.py:94-116``): only entries whose path exists in the target
with a matching shape are adopted; everything else keeps its fresh init.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(work_dir: str) -> str:
    return os.path.join(os.path.abspath(work_dir), "checkpoints")


_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def wait_for_saves() -> None:
    """Block until every in-flight async save has committed to disk.

    Call before reading a just-written checkpoint and at train exit
    (tools/train.py does both).
    """
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(
    work_dir: str,
    step: int,
    state: Any,
    max_keep: Optional[int] = None,
    meta: Optional[dict] = None,
    async_save: bool = False,
) -> str:
    """Save a full TrainState pytree under ``work_dir/checkpoints/<step>``.

    ``max_keep`` prunes the oldest saves beyond the newest ``max_keep``
    (mmcv CheckpointHook ``max_keep_ckpts``,
    ``configs/triplane_surf_sam.py:133-136``).  ``meta`` (config text,
    CLASSES, …) is written as a sibling ``step_<N>.meta.json`` — the
    counterpart of the meta dict mmcv embeds in the checkpoint file
    (reference ``tools/train.py:213-222``).

    ``async_save=True`` hands the device arrays to a background commit
    (orbax AsyncCheckpointer) and returns as soon as they are snapshotted
    — training resumes while the host writes; :func:`wait_for_saves`
    joins.  Pruning only ever removes *older* steps, which by
    construction are already committed, so it is safe in-flight.
    """
    path = os.path.join(_ckpt_dir(work_dir), f"step_{step}")
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
    if meta is not None:
        import json

        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)
    if max_keep is not None and max_keep > 0:
        for _, old in _list_checkpoints(work_dir)[:-max_keep]:
            import shutil

            shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(old + ".meta.json"):
                os.remove(old + ".meta.json")
    return path


def _list_checkpoints(work_dir: str):
    """(step, path) pairs sorted by step, oldest first."""
    d = _ckpt_dir(work_dir)
    if not os.path.isdir(d):
        return []
    return sorted(
        (int(m.group(1)), os.path.join(d, f))
        for f in os.listdir(d)
        if (m := re.match(r"step_(\d+)$", f))
    )

def latest_checkpoint(work_dir: str) -> Optional[str]:
    steps = _list_checkpoints(work_dir)
    return steps[-1][1] if steps else None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree with the exact structure of ``target``."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)


def restore_params_only(path: str) -> Any:
    """Restore without a target structure (raw nested dict)."""
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path)


def partial_load(params: Any, source: Any) -> Tuple[Any, int, int]:
    """Adopt every source entry whose path+shape matches the target.

    Port of ``_load_state_dict`` (``triplane.py:101-124``).

    Returns:
        ``(merged_params, n_adopted, n_target_leaves)``.
    """
    tgt_flat = jax.tree_util.tree_flatten_with_path(params)
    src_flat = jax.tree_util.tree_flatten_with_path(source)[0]

    def key(path):
        return tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )

    src_map = {key(p): v for p, v in src_flat}
    merged = []
    adopted = 0
    for path, v in tgt_flat[0]:
        s = src_map.get(key(path))
        if s is not None and tuple(np.shape(s)) == tuple(np.shape(v)):
            merged.append(jax.numpy.asarray(s, v.dtype))
            adopted += 1
        else:
            merged.append(v)
    return (
        jax.tree_util.tree_unflatten(tgt_flat[1], merged),
        adopted,
        len(merged),
    )
