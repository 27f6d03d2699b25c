"""tiny_occ_run: CLI-runnable tiny TriplaneOcc config (debug/CI).

Not a reference config — a shipped debug profile: the tiny topology from
``configs/tiny.py`` wrapped with the real schedule/runtime fragments so
``tools/train.py tiny_occ_run --synthetic`` exercises the full CLI →
config → trainer → checkpoint path in seconds on CPU (the verify/CI
drive; full-size configs need minutes of compile per step graph).
"""

from ._base import data_nuscenes, runtime, schedule_cosine
from .tiny import tiny_occ


def get_config():
    cfg = dict(
        name="tiny_occ_run",
        model=tiny_occ(),
        model_init=dict(ckpt_path=None, freeze=("encoder", "neck")),
        data=data_nuscenes(load_occ=True),
        **schedule_cosine(warmup_ratio=0.5),
        **runtime(),
    )
    # debug-profile sizing: one sample per device, tiny point budget
    cfg["data"]["samples_per_device"] = 1
    cfg["data"]["point_budget"] = 512
    return cfg
