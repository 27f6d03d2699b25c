"""SAM point-labeling geometry (model-free parts)."""

import numpy as np

from efficient_multimodal_perception_tpu.data.sam_masks import (
    label_points_with_masks,
)


def test_label_points_with_masks():
    H, W = 8, 8
    # identity-ish projection: x->col, y->row with unit depth
    l2i = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float64,
    )
    pts = np.array(
        [
            [2.0, 3.0, 1.0],   # -> col 2, row 3 (in mask 1)
            [6.0, 6.0, 1.0],   # -> col 6, row 6 (in mask 2)
            [20.0, 1.0, 1.0],  # out of image
            [1.0, 1.0, 1.0],   # in neither mask
        ]
    )
    m1 = np.zeros((H, W), bool)
    m1[3, 2] = True
    m2 = np.zeros((H, W), bool)
    m2[6, 6] = True
    masks = [dict(segmentation=m1), dict(segmentation=m2)]
    labels = label_points_with_masks(pts, l2i, (H, W), masks)
    assert labels.tolist() == [1.0, 2.0, 0.0, 0.0]


def test_label_overlap_max_wins():
    H, W = 4, 4
    l2i = np.eye(4)
    pts = np.array([[1.0, 1.0, 1.0]])
    m1 = np.ones((H, W), bool)
    m2 = np.ones((H, W), bool)
    labels = label_points_with_masks(
        pts, l2i, (H, W), [dict(segmentation=m1), dict(segmentation=m2)]
    )
    assert labels[0] == 2.0  # np.maximum over mask order
