"""Structured training metrics logging.

Covers the reference's TextLoggerHook + TensorBoard/WandB hooks
(``configs/default_runtime.py:6-11``, ``configs/triplane_surf_sam.py:
138-146``) with a dependency-light writer: text lines + CSV always, and
TensorBoard event files when ``tensorboardX``/``torch.utils.tensorboard``
is importable (gated — not required).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Optional


class MetricLogger:
    """Append-only text+CSV logger with optional TensorBoard mirror."""

    def __init__(
        self,
        work_dir: str,
        use_tensorboard: bool = True,
        wandb_project: Optional[str] = None,
        wandb_name: Optional[str] = None,
    ):
        os.makedirs(work_dir, exist_ok=True)
        self.txt = open(os.path.join(work_dir, "train.log"), "a")
        self.csv_path = os.path.join(work_dir, "metrics.csv")
        self._csv_fields: Optional[list] = None
        self._csv = None
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(work_dir, "tb"))
            except Exception:
                self.tb = None
        # WandbLoggerHook equivalent (configs/triplane_surf_sam.py:138-146)
        # — gated: the package isn't bundled and the image has no egress.
        self.wandb = None
        if wandb_project:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=wandb_project, name=wandb_name)
            except Exception:
                self.wandb = None

    def log(self, step: int, metrics: dict):
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        line = f"[{stamp}] step {step} " + " ".join(
            f"{k}={v:.6g}" for k, v in metrics.items()
        )
        self.txt.write(line + "\n")
        self.txt.flush()

        if self._csv is None:
            self._csv_fields = ["step"] + sorted(metrics)
            new = not os.path.exists(self.csv_path)
            self._csv = open(self.csv_path, "a", newline="")
            self._writer = csv.DictWriter(
                self._csv, fieldnames=self._csv_fields, extrasaction="ignore"
            )
            if new:
                self._writer.writeheader()
        self._writer.writerow({"step": step, **metrics})
        self._csv.flush()

        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, v, step)
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def close(self):
        self.txt.close()
        if self._csv:
            self._csv.close()
        if self.tb is not None:
            self.tb.close()
