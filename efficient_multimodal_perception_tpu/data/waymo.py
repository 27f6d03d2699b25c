"""Waymo dataset reader (KITTI-format infos).

Rebuild of ``mmdet3d/datasets/waymo_dataset.py:14-204`` — present in the
reference but unused by any shipped config; carried here for the same
dataset-registry completeness.  Consumes KITTI-format info pkls
(``waymo_infos_{train,val}.pkl`` with ``point_cloud.velodyne_path``,
``image.image_path``, ``calib`` matrices, ``annos``) and yields samples
in the same dict schema as :class:`NuScenesDataset`.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


class WaymoDataset:
    """Minimal Waymo reader with the NuScenesDataset sample interface."""

    CLASSES = ("Car", "Pedestrian", "Cyclist")

    def __init__(self, cfg: dict, split: str = "train", load_interval: int = 1):
        self.cfg = cfg
        self.root = cfg["data_root"]
        ann = cfg["ann_train"] if split == "train" else cfg["ann_val"]
        with open(os.path.join(self.root, ann), "rb") as f:
            data = pickle.load(f)
        infos = data["infos"] if isinstance(data, dict) else data
        self.infos = infos[::load_interval]
        self.is_train = split == "train"

    def __len__(self):
        return len(self.infos)

    def sample(self, index: int) -> dict:
        info = self.infos[index]
        pc = info["point_cloud"]
        pts_path = os.path.join(self.root, pc["velodyne_path"])
        pts = np.fromfile(pts_path, np.float32).reshape(
            -1, pc.get("num_features", 6)
        )
        out = dict(points=pts)

        calib = info.get("calib", {})
        if "image" in info and calib:
            rect = calib.get("R0_rect", np.eye(4))
            trv2c = calib.get("Tr_velo_to_cam", np.eye(4))
            p0 = calib.get("P0", np.eye(4))
            out["lidar2img"] = (p0 @ rect @ trv2c).astype(np.float32)
            out["img_path"] = os.path.join(
                self.root, info["image"]["image_path"]
            )

        annos = info.get("annos")
        if annos is not None:
            loc = np.asarray(annos["location"], np.float32).reshape(-1, 3)
            dims = np.asarray(annos["dimensions"], np.float32).reshape(-1, 3)
            rots = np.asarray(annos["rotation_y"], np.float32).reshape(-1, 1)
            out["gt_bboxes_3d"] = np.concatenate([loc, dims, rots], axis=1)
            out["gt_names"] = np.asarray(annos["name"])
        return out
