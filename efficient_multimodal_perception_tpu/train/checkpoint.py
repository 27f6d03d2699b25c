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


def save_checkpoint(work_dir: str, step: int, state: Any) -> str:
    """Save a full TrainState pytree under ``work_dir/checkpoints/<step>``."""
    path = os.path.join(_ckpt_dir(work_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path

def latest_checkpoint(work_dir: str) -> Optional[str]:
    d = _ckpt_dir(work_dir)
    if not os.path.isdir(d):
        return None
    steps = [
        (int(m.group(1)), os.path.join(d, f))
        for f in os.listdir(d)
        if (m := re.match(r"step_(\d+)$", f))
    ]
    return max(steps)[1] if steps else None


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
