"""WaymoDataset fixture test (VERDICT r1 Weak #6: wire or cut).

Builds a tiny KITTI-format info pkl + velodyne bin on disk and checks
``data/waymo.py`` parses it into the NuScenesDataset-style sample dict
(reference reader: ``mmdet3d/datasets/waymo_dataset.py:14-204``).
"""

import os
import pickle

import numpy as np

from efficient_multimodal_perception_tpu.data.waymo import WaymoDataset


def _write_fixture(root):
    os.makedirs(os.path.join(root, "velodyne"), exist_ok=True)
    rng = np.random.default_rng(0)
    infos = []
    for i in range(3):
        pts = rng.standard_normal((100 + i, 6)).astype(np.float32)
        rel = f"velodyne/{i:06d}.bin"
        pts.tofile(os.path.join(root, rel))
        infos.append(
            dict(
                point_cloud=dict(velodyne_path=rel, num_features=6),
                image=dict(image_path=f"image_0/{i:06d}.png"),
                calib=dict(
                    R0_rect=np.eye(4, dtype=np.float32),
                    Tr_velo_to_cam=np.eye(4, dtype=np.float32),
                    P0=np.diag([2.0, 2.0, 1.0, 1.0]).astype(np.float32),
                ),
                annos=dict(
                    location=rng.standard_normal((2, 3)),
                    dimensions=np.abs(rng.standard_normal((2, 3))) + 1,
                    rotation_y=rng.standard_normal((2,)),
                    name=np.array(["Car", "Pedestrian"]),
                ),
            )
        )
    with open(os.path.join(root, "waymo_infos_train.pkl"), "wb") as f:
        pickle.dump(dict(infos=infos), f)


def test_waymo_reader_roundtrip(tmp_path):
    root = str(tmp_path)
    _write_fixture(root)
    cfg = dict(
        data_root=root,
        ann_train="waymo_infos_train.pkl",
        ann_val="waymo_infos_train.pkl",
    )
    ds = WaymoDataset(cfg, split="train")
    assert len(ds) == 3

    s = ds.sample(1)
    assert s["points"].shape == (101, 6)
    assert s["points"].dtype == np.float32
    # lidar2img = P0 @ R0 @ Tr with identity extrinsics -> P0
    np.testing.assert_allclose(
        s["lidar2img"], np.diag([2.0, 2.0, 1.0, 1.0]), atol=0
    )
    assert s["img_path"].endswith("image_0/000001.png")
    assert s["gt_bboxes_3d"].shape == (2, 7)
    assert list(s["gt_names"]) == ["Car", "Pedestrian"]


def test_waymo_load_interval(tmp_path):
    root = str(tmp_path)
    _write_fixture(root)
    cfg = dict(
        data_root=root,
        ann_train="waymo_infos_train.pkl",
        ann_val="waymo_infos_train.pkl",
    )
    ds = WaymoDataset(cfg, split="val", load_interval=2)
    assert len(ds) == 2
    assert ds.sample(1)["points"].shape == (102, 6)
