"""Data-layer tests: transforms, wrappers, detection formatting, prep."""

import numpy as np

from efficient_multimodal_perception_tpu.data.detection_eval import (
    boxes_to_global,
)
from efficient_multimodal_perception_tpu.data.nuscenes import (
    quaternion_matrix,
)
from efficient_multimodal_perception_tpu.data.prep import make_elevation
from efficient_multimodal_perception_tpu.data.transforms import (
    global_rot_scale_trans,
    point_shuffle,
    points_range_filter,
    random_flip_3d,
)
from efficient_multimodal_perception_tpu.data.wrappers import (
    CBGSDataset,
    ConcatDataset,
    RepeatDataset,
)


def test_quaternion_matrix_identity_and_yaw():
    np.testing.assert_allclose(quaternion_matrix([1, 0, 0, 0]), np.eye(3))
    yaw = 0.7
    q = [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]
    R = quaternion_matrix(q)
    c, s = np.cos(yaw), np.sin(yaw)
    np.testing.assert_allclose(
        R, [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-6
    )


def test_global_rot_scale_trans_consistency():
    """Points and box centers must transform identically."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (50, 5)).astype(np.float32)
    boxes = np.concatenate(
        [pts[:3, :3], np.ones((3, 3)), np.zeros((3, 1))], axis=1
    ).astype(np.float32)
    s = dict(points=pts.copy(), gt_bboxes_3d=boxes.copy())
    s = global_rot_scale_trans(s, np.random.default_rng(1))
    np.testing.assert_allclose(
        s["points"][:3, :3], s["gt_bboxes_3d"][:3, :3], atol=1e-5
    )


def test_random_flip_3d_horizontal():
    pts = np.array([[1.0, 2.0, 3.0]], np.float32)
    s = dict(points=pts.copy(), gt_bboxes_3d=None)
    s = random_flip_3d(s, np.random.default_rng(0),
                       flip_ratio_bev_horizontal=1.0)
    np.testing.assert_allclose(s["points"], [[1, -2, 3]])
    assert s["pcd_horizontal_flip"]


def test_point_shuffle_and_range_filter():
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    s = point_shuffle(dict(points=pts.copy()), np.random.default_rng(0))
    assert sorted(s["points"][:, 0].tolist()) == pts[:, 0].tolist()
    s = points_range_filter(
        dict(points=pts.copy()), [-1, -1, -1, 10, 11, 12]
    )
    assert len(s["points"]) < 10


class _FakeDS:
    num_classes = 3

    def __len__(self):
        return 6

    def sample(self, i):
        return {"i": i}

    def batch(self, idx):
        return [self.sample(i) for i in idx]

    def get_cat_ids(self, i):
        return {i % 3} if i < 3 else {0}


def test_wrappers():
    ds = _FakeDS()
    r = RepeatDataset(ds, 3)
    assert len(r) == 18 and r.sample(7)["i"] == 1
    c = ConcatDataset([ds, ds])
    assert len(c) == 12 and c.sample(8)["i"] == 2
    cb = CBGSDataset(ds)
    # class-balanced indices over-sample rare classes 1 and 2
    assert len(cb) > 0
    assert all(0 <= i < 6 for i in cb.sample_indices)


def test_boxes_to_global_identity_calibration():
    info = dict(
        token="t",
        lidar2ego_rotation=[1, 0, 0, 0],
        lidar2ego_translation=[0, 0, 0],
        ego2global_rotation=[1, 0, 0, 0],
        ego2global_translation=[100, 50, 0],
    )
    boxes = np.array([[1.0, 2, 0, 4, 2, 2, 0.0, 1.0, 0.0]])
    out = boxes_to_global(boxes, [0.9], [0], info, ["car"])
    assert out[0]["sample_token"] == "t"
    np.testing.assert_allclose(out[0]["translation"], [101, 52, 1])
    assert out[0]["size"] == [2.0, 4.0, 2.0]  # (w, l, h)
    assert out[0]["detection_name"] == "car"


def test_make_elevation_max_height():
    pts = np.array(
        [[1.0, 1.0, 0.5], [1.1, 1.05, 2.0], [-30, 0, 1.0]], np.float32
    )
    d = make_elevation(pts, remove_self_radius=0.0)
    ix, iy = int((1.0 + 20) / 0.4), int((1.0 + 20) / 0.4)
    assert d["mask"][ix, iy] == 1
    assert d["elevation"][ix, iy] == 2.0  # max-z wins
    assert d["mask"].sum() == 1  # out-of-range point dropped


def test_corners_used_by_obj_dump(tmp_path):
    from efficient_multimodal_perception_tpu.core.boxes import corners_3d
    from efficient_multimodal_perception_tpu.utils.visualization import (
        save_boxes_obj,
        save_points_obj,
    )

    boxes = np.array([[0.0, 0, 0, 4, 2, 2, 0.3]])
    save_boxes_obj(corners_3d(boxes), str(tmp_path / "b.obj"))
    save_points_obj(np.zeros((5, 3)), str(tmp_path / "p.obj"))
    assert (tmp_path / "b.obj").exists() and (tmp_path / "p.obj").exists()


def test_waymo_dataset_fixture(tmp_path):
    """WaymoDataset consumes a KITTI-format infos pkl + velodyne bins
    (waymo_dataset.py:14-204 schema) and yields the common sample dict."""
    import os
    import pickle

    from efficient_multimodal_perception_tpu.data.waymo import WaymoDataset

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "velodyne"), exist_ok=True)
    rng = np.random.default_rng(0)
    infos = []
    for s in range(2):
        vp = f"velodyne/{s:06d}.bin"
        pts = rng.uniform(-50, 50, (400, 6)).astype(np.float32)
        pts.tofile(os.path.join(root, vp))
        infos.append(
            dict(
                point_cloud=dict(velodyne_path=vp, num_features=6),
                image=dict(image_path=f"image_0/{s:06d}.png"),
                calib=dict(
                    R0_rect=np.eye(4, dtype=np.float32),
                    Tr_velo_to_cam=np.eye(4, dtype=np.float32),
                    P0=np.eye(4, dtype=np.float32),
                ),
                annos=dict(
                    location=rng.uniform(-10, 10, (3, 3)),
                    dimensions=rng.uniform(1, 4, (3, 3)),
                    rotation_y=rng.uniform(-3, 3, (3,)),
                    name=np.array(["Car", "Pedestrian", "Cyclist"]),
                ),
            )
        )
    for split in ("train", "val"):
        with open(os.path.join(root, f"waymo_infos_{split}.pkl"), "wb") as f:
            pickle.dump(dict(infos=infos), f)

    cfg = dict(
        data_root=root,
        ann_train="waymo_infos_train.pkl",
        ann_val="waymo_infos_val.pkl",
    )
    ds = WaymoDataset(cfg, split="val")
    assert len(ds) == 2
    s = ds.sample(0)
    assert s["points"].shape == (400, 6)
    assert s["lidar2img"].shape == (4, 4)
    assert s["gt_bboxes_3d"].shape == (3, 7)
    assert list(s["gt_names"]) == ["Car", "Pedestrian", "Cyclist"]
    # load_interval subsetting (waymo_dataset.py load_interval semantics)
    assert len(WaymoDataset(cfg, split="train", load_interval=2)) == 1


def test_points_to_image_depth_pinhole():
    """2.5-D depth annotations: a hand-built pinhole camera oracle.

    Camera looks down +x (lidar) = +z (camera); fx=fy=100, cx=320,
    cy=240.  A point at lidar (10, 1, 2) must land at
    u = cx - fy_ratio..., computed explicitly below.
    """
    import numpy as np

    from efficient_multimodal_perception_tpu.data.transforms import (
        points_to_image_depth,
    )

    # lidar->camera: camera z = lidar x, camera x = -lidar y,
    # camera y = -lidar z (standard front-cam rig)
    l2c = np.array(
        [
            [0, -1, 0, 0],
            [0, 0, -1, 0],
            [1, 0, 0, 0],
            [0, 0, 0, 1],
        ],
        np.float64,
    )
    K = np.array(
        [
            [100, 0, 320, 0],
            [0, 100, 240, 0],
            [0, 0, 1, 0],
            [0, 0, 0, 1],
        ],
        np.float64,
    )
    l2i = K @ l2c
    pts = np.array(
        [
            [10.0, 1.0, 2.0],   # visible: u=320-100*(1/10)=310, v=240-20=220
            [0.5, 0.0, 0.0],    # closer than min_dist -> dropped
            [10.0, 40.0, 0.0],  # projects far out of frame -> dropped
            [-5.0, 0.0, 0.0],   # behind the camera -> dropped
        ]
    )
    out = points_to_image_depth(pts, l2i, l2c, (480, 640), min_dist=1.0)
    assert out.shape == (1, 3)
    np.testing.assert_allclose(out[0], [310.0, 220.0, 10.0], atol=1e-4)


def test_multi_scale_flip_aug_3d_variants():
    """TTA enumeration matches the reference grid + double-flip quirk
    (test_time_aug.py:80-107): K = scales * ratios * h_aug * v_aug *
    directions, pcd flips applied geometrically, collate dict-of-lists.
    """
    from efficient_multimodal_perception_tpu.data.transforms import (
        multi_scale_flip_aug_3d,
    )

    pts = np.array([[1.0, 2.0, 3.0], [-4.0, 5.0, -6.0]], np.float32)
    sample = dict(points=pts.copy(), gt_bboxes_3d=None)

    out = multi_scale_flip_aug_3d(
        sample,
        img_scale=(800, 448),
        pts_scale_ratio=[0.95, 1.0, 1.05],
        flip=True,
        pcd_horizontal_flip=True,
        pcd_vertical_flip=True,
    )
    # 1 scale * 3 ratios * 1 flip_aug([True]) * 2 h * 2 v * 1 direction
    assert len(out["points"]) == 12
    assert out["scale"] == [(800, 448)] * 12
    # reference loop order: ratio outermost of the varying axes, then
    # h, then v — variant 0 is (0.95, h=False, v=False)
    np.testing.assert_allclose(out["points"][0], pts * 0.95, atol=1e-6)
    assert out["pcd_horizontal_flip"][:4] == [False, False, True, True]
    assert out["pcd_vertical_flip"][:4] == [False, True, False, True]
    # h flips y, v flips x; variant 3 = both at ratio 0.95
    np.testing.assert_allclose(
        out["points"][3], pts * 0.95 * np.array([-1, -1, 1]), atol=1e-6
    )
    # ratio 1.0 block starts at variant 4 and is untouched geometry
    np.testing.assert_allclose(out["points"][4], pts)
    assert out["pcd_scale_factor"][4] == 1.0

    # per-variant downstream transforms run AFTER the TTA geometry
    out2 = multi_scale_flip_aug_3d(
        sample,
        transforms=(lambda s: points_range_filter(s, [0, 0, -9, 9, 9, 9]),),
        flip=False,
    )
    assert len(out2["points"]) == 1 and len(out2["points"][0]) == 1

    # flip=False with defaults: exactly one un-augmented variant
    out3 = multi_scale_flip_aug_3d(sample)
    assert len(out3["points"]) == 1
    np.testing.assert_allclose(out3["points"][0], pts)
    assert out3["flip"] == [False]
