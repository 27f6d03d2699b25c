"""Box geometry tests vs brute-force oracles."""

import numpy as np

from efficient_multimodal_perception_tpu.core.boxes import (
    circle_nms,
    corners_bev,
    nms_bev,
    points_in_boxes,
    rotated_iou_bev,
)


def test_corners_axis_aligned():
    box = np.array([[1.0, 2.0, 0.0, 4.0, 2.0, 1.0, 0.0]])
    c = corners_bev(box)[0]
    assert set(map(tuple, np.round(c, 6))) == {
        (3.0, 3.0), (-1.0, 3.0), (-1.0, 1.0), (3.0, 1.0)
    }


def test_points_in_boxes_rotated():
    box = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, np.pi / 4]])
    pts = np.array(
        [
            [0, 0, 1.0],       # center
            [1.2, 1.2, 1.0],   # along rotated long axis
            [1.2, -1.2, 1.0],  # off the rotated short axis
            [0, 0, 3.0],       # above
        ]
    )
    m = points_in_boxes(pts, box)[:, 0]
    assert m.tolist() == [True, True, False, False]


def test_rotated_iou_vs_rasterized():
    rng = np.random.default_rng(0)
    boxes_a = np.array([[0.0, 0, 0, 3, 2, 1, 0.3]])
    boxes_b = np.array([[0.5, 0.4, 0, 2.5, 2.2, 1, -0.6]])
    iou = rotated_iou_bev(boxes_a, boxes_b)[0, 0]

    # rasterized oracle
    xs = np.linspace(-4, 4, 900)
    ys = np.linspace(-4, 4, 900)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size) + 0.5], 1)
    in_a = points_in_boxes(pts, boxes_a)[:, 0]
    in_b = points_in_boxes(pts, boxes_b)[:, 0]
    oracle = (in_a & in_b).sum() / (in_a | in_b).sum()
    assert abs(iou - oracle) < 0.01


def test_nms_bev_suppresses_overlaps():
    boxes = np.array(
        [
            [0.0, 0, 0, 4, 2, 1, 0.0],
            [0.1, 0, 0, 4, 2, 1, 0.0],  # heavy overlap with 0
            [10.0, 0, 0, 4, 2, 1, 0.0],
        ]
    )
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms_bev(boxes, scores, thresh=0.5)
    assert keep.tolist() == [0, 2]


def test_circle_nms():
    b = np.array([[0.0, 0.0, 0], [0.5, 0.0, 0], [5.0, 0.0, 0]])
    keep = circle_nms(b, thresh=1.0)
    assert keep == [0, 2]


def test_box_mode_convert_roundtrips_and_examples():
    """Box3DMode.convert law (box_3d_mode.py:63-170): rotated center,
    permuted sizes, yaw/velocity carried untouched."""
    from efficient_multimodal_perception_tpu.core.boxes import (
        CAM,
        DEPTH,
        LIDAR,
        box_mode_convert,
        point_mode_convert,
    )

    box = np.array([[10.0, 2.0, -1.0, 4.0, 2.0, 1.5, 0.3, 1.0, -2.0]])
    # LiDAR (x fwd, y left, z up) -> CAM (x right, y down, z fwd):
    # x_cam = -y_l, y_cam = -z_l, z_cam = x_l; sizes (dx,dy,dz)->(dy,dz,dx)
    cam = box_mode_convert(box, LIDAR, CAM)
    np.testing.assert_allclose(cam[0, :3], [-2.0, 1.0, 10.0])
    np.testing.assert_allclose(cam[0, 3:6], [2.0, 1.5, 4.0])
    np.testing.assert_allclose(cam[0, 6:], box[0, 6:])  # yaw quirk: untouched

    # all 6 directed pairs round-trip to identity
    for a, b in [(LIDAR, CAM), (CAM, DEPTH), (LIDAR, DEPTH)]:
        back = box_mode_convert(box_mode_convert(box, a, b), b, a)
        np.testing.assert_allclose(back, box, atol=1e-12)

    # centers convert exactly like points
    pts = box[:, :3].copy()
    np.testing.assert_allclose(
        point_mode_convert(pts, LIDAR, DEPTH),
        box_mode_convert(box, LIDAR, DEPTH)[:, :3],
    )

    # 4x4 homogeneous rt_mat (real sensor extrinsics path)
    rt = np.eye(4)
    rt[:3, 3] = [1.0, 2.0, 3.0]
    shifted = box_mode_convert(box, LIDAR, CAM, rt_mat=rt)
    np.testing.assert_allclose(shifted[0, :3], box[0, :3] + [1, 2, 3])
    # sizes still permuted by the (src, dst) rule even with custom rt
    np.testing.assert_allclose(shifted[0, 3:6], [2.0, 1.5, 4.0])
