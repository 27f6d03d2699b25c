"""nuScenes detection formatting + (gated) official evaluation.

Rebuild of the detection-eval surface of ``NuScenesDataset``
(``mmdet3d/datasets/nuscenes_dataset.py``): ``output_to_nusc_box``
(:624-664), ``lidar_nusc_box_to_global`` (:667-702), ``_format_bbox``
(:352-419) and ``_evaluate_single`` (:421-476).  The triplane models
never emit boxes, but the dataset layer carries the machinery so
detection heads can plug in; the official metric computation requires
the nuScenes devkit and is gated behind an import.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from .nuscenes_converter import CAMERA_TYPES  # noqa: F401  (shared consts)

DEFAULT_ATTRIBUTES = {
    "car": "vehicle.parked",
    "pedestrian": "pedestrian.moving",
    "trailer": "vehicle.parked",
    "truck": "vehicle.parked",
    "bus": "vehicle.moving",
    "motorcycle": "cycle.without_rider",
    "construction_vehicle": "vehicle.parked",
    "bicycle": "cycle.without_rider",
    "barrier": "",
    "traffic_cone": "",
}


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _yaw_quat(yaw):
    return np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])


def _rot_by_quat(q, v):
    w, x, y, z = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    return R @ np.asarray(v)


def boxes_to_global(boxes, scores, labels, info, class_names, eval_configs=None):
    """LiDAR-frame boxes -> global-frame nuScenes result dicts.

    Combines ``output_to_nusc_box`` + ``lidar_nusc_box_to_global``:
    boxes ``(N, 9) = (x, y, z, dx, dy, dz, yaw, vx, vy)`` (box bottom z),
    transformed lidar->ego->global with the info's quaternions.  The
    reference's yaw convention: nusc_yaw = -yaw - pi/2 (:645).
    """
    l2e_q = np.asarray(info["lidar2ego_rotation"], np.float64)
    l2e_t = np.asarray(info["lidar2ego_translation"], np.float64)
    e2g_q = np.asarray(info["ego2global_rotation"], np.float64)
    e2g_t = np.asarray(info["ego2global_translation"], np.float64)

    out = []
    for i in range(len(boxes)):
        b = np.asarray(boxes[i], np.float64)
        center = b[:3].copy()
        center[2] += b[5] / 2  # bottom -> gravity center
        yaw = -b[6] - np.pi / 2
        q = _yaw_quat(yaw)
        vel = np.array([b[7], b[8], 0.0]) if len(b) > 8 else np.zeros(3)

        center = _rot_by_quat(l2e_q, center) + l2e_t
        q = _quat_mul(l2e_q, q)
        vel = _rot_by_quat(l2e_q, vel)
        center = _rot_by_quat(e2g_q, center) + e2g_t
        q = _quat_mul(e2g_q, q)
        vel = _rot_by_quat(e2g_q, vel)

        name = class_names[int(labels[i])]
        attr = DEFAULT_ATTRIBUTES.get(name, "")
        # wlh order: nuScenes boxes are (w, l, h) = (dy, dx, dz)
        out.append(
            dict(
                sample_token=info["token"],
                translation=center.tolist(),
                size=[float(b[4]), float(b[3]), float(b[5])],
                rotation=q.tolist(),
                velocity=[float(vel[0]), float(vel[1])],
                detection_name=name,
                detection_score=float(scores[i]),
                attribute_name=attr,
            )
        )
    return out


def format_results(
    results, infos, class_names, out_dir: str,
) -> str:
    """Write the nuScenes submission JSON (``_format_bbox`` :352-419).

    Args:
        results: list of ``(boxes, scores, labels)`` per sample.
        infos: matching info dicts (for tokens + calibration).

    Returns:
        path of the written ``results_nusc.json``.
    """
    annos = {}
    for (boxes, scores, labels), info in zip(results, infos):
        annos[info["token"]] = boxes_to_global(
            boxes, scores, labels, info, class_names
        )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "results_nusc.json")
    with open(path, "w") as f:
        json.dump(
            dict(
                meta=dict(
                    use_camera=True, use_lidar=True, use_radar=False,
                    use_map=False, use_external=False,
                ),
                results=annos,
            ),
            f,
        )
    return path


def evaluate_nusc(
    result_path: str,
    data_root: str,
    version: str = "v1.0-trainval",
    eval_set: str = "val",
) -> Optional[dict]:
    """Official NDS/mAP evaluation (``_evaluate_single`` :421-476).

    Returns None (with a message) when the nuScenes devkit is absent.
    """
    try:
        from nuscenes import NuScenes
        from nuscenes.eval.detection.config import config_factory
        from nuscenes.eval.detection.evaluate import NuScenesEval
    except ImportError:
        print("nuscenes devkit not available; wrote submission JSON only")
        return None

    nusc = NuScenes(version=version, dataroot=data_root, verbose=False)
    cfg = config_factory("detection_cvpr_2019")
    out_dir = os.path.dirname(result_path)
    ev = NuScenesEval(
        nusc, config=cfg, result_path=result_path, eval_set=eval_set,
        output_dir=out_dir, verbose=False,
    )
    ev.main(render_curves=False)
    with open(os.path.join(out_dir, "metrics_summary.json")) as f:
        return json.load(f)
