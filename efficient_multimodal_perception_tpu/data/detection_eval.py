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


def quaternion_yaw(q) -> float:
    """Yaw of the rotated x-axis (devkit ``quaternion_yaw``)."""
    v = _rot_by_quat(np.asarray(q, np.float64), np.array([1.0, 0, 0]))
    return float(np.arctan2(v[1], v[0]))


def boxes_from_submission(results: dict, infos) -> list:
    """Submission ``results`` dict -> global-frame ``nds.EvalBox`` list.

    ``infos`` supplies the ego position (``ego2global_translation``)
    per token for the devkit's class-range filtering.
    """
    from .nds import EvalBox

    ego = {
        i["token"]: np.asarray(i["ego2global_translation"], np.float64)
        for i in infos
    }
    out = []
    for token, dets in results.items():
        for d in dets:
            out.append(
                EvalBox(
                    sample_token=token,
                    translation=np.asarray(d["translation"], np.float64),
                    size=np.asarray(d["size"], np.float64),
                    yaw=quaternion_yaw(d["rotation"]),
                    velocity=np.asarray(d["velocity"], np.float64),
                    name=d["detection_name"],
                    score=float(d["detection_score"]),
                    attribute_name=d.get("attribute_name", ""),
                    ego_translation=ego.get(token),
                )
            )
    return out


def gt_boxes_from_info(info) -> list:
    """Info-dict ground truth -> global-frame ``nds.EvalBox`` list.

    The converter stores lidar-frame gravity centers, (w, l, h) dims,
    the ``-yaw - pi/2`` yaw convention (``nuscenes_converter.py:201``),
    and lidar-frame velocities; this replays the lidar->ego->global
    chain the devkit's GT loader reads straight from the DB.  Attributes
    ride in ``gt_attrs`` when the converter recorded them ("" otherwise,
    degrading AAE to its maximum — same as an attribute-less class).
    """
    from .nds import EvalBox

    l2e_q = np.asarray(info["lidar2ego_rotation"], np.float64)
    l2e_t = np.asarray(info["lidar2ego_translation"], np.float64)
    e2g_q = np.asarray(info["ego2global_rotation"], np.float64)
    e2g_t = np.asarray(info["ego2global_translation"], np.float64)
    attrs = info.get("gt_attrs")
    num_pts = info.get("num_lidar_pts")
    num_rpts = info.get("num_radar_pts")

    out = []
    gt = np.asarray(info["gt_boxes"], np.float64)
    vel = np.asarray(info["gt_velocity"], np.float64)
    for i in range(len(gt)):
        center = _rot_by_quat(l2e_q, gt[i, :3]) + l2e_t
        center = _rot_by_quat(e2g_q, center) + e2g_t
        yaw_lidar = -gt[i, 6] - np.pi / 2
        q = _quat_mul(e2g_q, _quat_mul(l2e_q, _yaw_quat(yaw_lidar)))
        v = _rot_by_quat(l2e_q, np.array([vel[i, 0], vel[i, 1], 0.0]))
        v = _rot_by_quat(e2g_q, v)
        npts = -1
        if num_pts is not None:
            npts = int(num_pts[i])
            if num_rpts is not None:
                npts += int(num_rpts[i])
        out.append(
            EvalBox(
                sample_token=info["token"],
                translation=center,
                size=gt[i, 3:6],
                yaw=quaternion_yaw(q),
                velocity=v[:2],
                name=str(info["gt_names"][i]),
                attribute_name="" if attrs is None else str(attrs[i]),
                ego_translation=e2g_t,
                num_pts=npts,
            )
        )
    return out


def evaluate_native(result_path: str, infos, class_names=None) -> dict:
    """Devkit-free NDS/mAP on the submission JSON + info-dict GT.

    Local rebuild of the metric the reference gets from ``NuScenesEval``
    (``_evaluate_single`` :421-476) — see ``nds.py`` for the protocol
    math.  Returns the same summary schema ``evaluate_nusc`` yields.
    """
    from . import nds

    with open(result_path) as f:
        results = json.load(f)["results"]
    preds = boxes_from_submission(results, infos)
    tokens = set(results)
    gts = []
    for info in infos:
        if info["token"] in tokens and "gt_boxes" in info:
            gts.extend(gt_boxes_from_info(info))
    names = tuple(class_names) if class_names else tuple(nds.CLASS_RANGE)
    metrics = nds.evaluate_detection(gts, preds, class_names=names)
    metrics["detail"] = nds.summary_to_detail(metrics, names)
    return metrics


def evaluate_nusc(
    result_path: str,
    data_root: str,
    version: str = "v1.0-trainval",
    eval_set: str = "val",
    infos=None,
) -> Optional[dict]:
    """Official NDS/mAP evaluation (``_evaluate_single`` :421-476).

    Falls back to the local ``nds.py`` metric when the devkit is absent
    and ``infos`` (with GT) were provided; else returns None.
    """
    try:
        from nuscenes import NuScenes
        from nuscenes.eval.detection.config import config_factory
        from nuscenes.eval.detection.evaluate import NuScenesEval
    except ImportError:
        if infos is not None:
            print("nuscenes devkit absent; using native nds.py metric")
            return evaluate_native(result_path, infos)
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
