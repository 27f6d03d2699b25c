"""Devkit-free nuScenes detection metric (NDS / mAP / TP errors).

Rebuilds the metric math that the reference delegates to the external
``nuscenes-devkit`` (``mmdet3d/datasets/nuscenes_dataset.py:421-476``
calls ``NuScenesEval`` and reads back ``metrics_summary.json``), so the
evaluation capability exists locally even though the devkit is absent
from this image.  Semantics follow the ``detection_cvpr_2019`` protocol:

* per-class, per-distance-threshold greedy matching of score-sorted
  predictions to ground truth by 2-D center distance;
* 101-point recall-interpolated precision; AP is the normalized mean of
  ``clip(precision - 0.1, 0)`` over recalls above 0.1;
* TP errors (ATE/ASE/AOE/AVE/AAE) accumulated as cumulative means over
  true positives at the TP threshold (2.0 m), re-sampled onto the same
  recall grid via the confidence curve, averaged between recall 0.1 and
  the max recall achieved;
* ``NDS = (5 * mAP + sum(max(0, 1 - err))) / 10``.

Everything is plain numpy on host — the metric runs on a handful of
thousands of boxes, far below any accelerator-worthy scale.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# detection_cvpr_2019 protocol constants.
CLASS_RANGE: Dict[str, float] = {
    "car": 50.0,
    "truck": 50.0,
    "bus": 50.0,
    "trailer": 50.0,
    "construction_vehicle": 50.0,
    "pedestrian": 40.0,
    "motorcycle": 40.0,
    "bicycle": 40.0,
    "traffic_cone": 30.0,
    "barrier": 30.0,
}
DIST_THS: Tuple[float, ...] = (0.5, 1.0, 2.0, 4.0)
DIST_TH_TP: float = 2.0
MIN_RECALL: float = 0.1
MIN_PRECISION: float = 0.1
MEAN_AP_WEIGHT: float = 5.0
N_ELEM: int = 101
TP_METRICS: Tuple[str, ...] = (
    "trans_err", "scale_err", "orient_err", "vel_err", "attr_err"
)
# Metrics that are undefined for some classes (devkit leaves them out
# of the per-metric mean).
LEAVE_OUT: Dict[str, Tuple[str, ...]] = {
    "traffic_cone": ("vel_err", "orient_err", "attr_err"),
    "barrier": ("vel_err", "attr_err"),
}
ERR_NAME_MAPPING = {
    "trans_err": "mATE",
    "scale_err": "mASE",
    "orient_err": "mAOE",
    "vel_err": "mAVE",
    "attr_err": "mAAE",
}


@dataclasses.dataclass
class EvalBox:
    """One box in the global frame (prediction or ground truth)."""

    sample_token: str
    translation: np.ndarray  # (3,) global xyz
    size: np.ndarray  # (3,) wlh
    yaw: float
    velocity: np.ndarray  # (2,) global vx, vy
    name: str
    score: float = -1.0  # predictions only
    attribute_name: str = ""
    ego_translation: Optional[np.ndarray] = None  # (2,) or (3,) ego xy(z)
    num_pts: int = -1  # GT only; -1 = unknown (kept)

    @property
    def ego_dist(self) -> float:
        if self.ego_translation is None:
            return 0.0
        d = np.asarray(self.translation[:2], np.float64) - np.asarray(
            self.ego_translation[:2], np.float64
        )
        return float(np.hypot(d[0], d[1]))


def filter_eval_boxes(
    boxes: Sequence[EvalBox], class_range: Dict[str, float] = CLASS_RANGE
) -> List[EvalBox]:
    """Range + empty-box filtering (devkit ``filter_eval_boxes``):
    drop boxes farther from the ego vehicle than the class range and GT
    boxes with zero lidar/radar points."""
    out = []
    for b in boxes:
        if b.name not in class_range:
            continue
        if b.ego_dist > class_range[b.name]:
            continue
        if b.num_pts == 0:
            continue
        out.append(b)
    return out


def center_distance(a: EvalBox, b: EvalBox) -> float:
    d = np.asarray(a.translation[:2], np.float64) - np.asarray(
        b.translation[:2], np.float64
    )
    return float(np.hypot(d[0], d[1]))


def scale_iou(gt: EvalBox, pred: EvalBox) -> float:
    """IoU of the two boxes aligned in translation and rotation —
    pure wlh volume overlap."""
    ga = np.asarray(gt.size, np.float64)
    pa = np.asarray(pred.size, np.float64)
    inter = float(np.prod(np.minimum(ga, pa)))
    union = float(np.prod(ga) + np.prod(pa) - inter)
    return inter / union if union > 0 else 0.0


def yaw_diff(gt: EvalBox, pred: EvalBox, period: float) -> float:
    d = (gt.yaw - pred.yaw + period / 2) % period - period / 2
    return abs(float(d))


def velocity_l2(gt: EvalBox, pred: EvalBox) -> float:
    d = np.asarray(gt.velocity, np.float64) - np.asarray(
        pred.velocity, np.float64
    )
    return float(np.hypot(d[0], d[1]))


def attr_acc(gt: EvalBox, pred: EvalBox) -> float:
    """1.0 on attribute match, 0.0 on mismatch, nan when the GT carries
    no attribute (cones/barriers) — nans are skipped by ``_cummean``."""
    if not gt.attribute_name:
        return float("nan")
    return float(gt.attribute_name == pred.attribute_name)


def _cummean(x: np.ndarray) -> np.ndarray:
    """Cumulative mean ignoring nans; all-nan prefix yields 1.0
    (maximum error), matching the devkit's convention."""
    if x.size == 0:
        return x.astype(np.float64)
    valid = ~np.isnan(x)
    if not valid.any():
        return np.ones_like(x, dtype=np.float64)
    s = np.nancumsum(x.astype(np.float64))
    n = np.cumsum(valid)
    return np.where(n > 0, s / np.maximum(n, 1), 1.0)


@dataclasses.dataclass
class MetricData:
    """Recall-gridded curves for one (class, dist_th) pair."""

    recall: np.ndarray
    precision: np.ndarray
    confidence: np.ndarray
    trans_err: np.ndarray
    scale_err: np.ndarray
    orient_err: np.ndarray
    vel_err: np.ndarray
    attr_err: np.ndarray

    @property
    def max_recall_ind(self) -> int:
        nz = np.nonzero(self.confidence)[0]
        return int(nz[-1]) if nz.size else 0

    @classmethod
    def no_predictions(cls) -> "MetricData":
        z = np.zeros(N_ELEM)
        return cls(
            recall=np.linspace(0, 1, N_ELEM), precision=z, confidence=z,
            trans_err=np.ones(N_ELEM), scale_err=np.ones(N_ELEM),
            orient_err=np.ones(N_ELEM), vel_err=np.ones(N_ELEM),
            attr_err=np.ones(N_ELEM),
        )


def accumulate(
    gt_boxes: Sequence[EvalBox],
    pred_boxes: Sequence[EvalBox],
    class_name: str,
    dist_th: float,
) -> MetricData:
    """Greedy score-ordered matching for one class at one threshold."""
    npos = sum(1 for b in gt_boxes if b.name == class_name)
    preds = [b for b in pred_boxes if b.name == class_name]
    if npos == 0 or not preds:
        return MetricData.no_predictions()
    preds = sorted(preds, key=lambda b: -b.score)

    gt_by_sample: Dict[str, List[EvalBox]] = {}
    for b in gt_boxes:
        if b.name == class_name:
            gt_by_sample.setdefault(b.sample_token, []).append(b)

    taken = set()
    tp, fp, conf = [], [], []
    match: Dict[str, List[float]] = {k: [] for k in TP_METRICS}
    match["conf"] = []
    period = np.pi if class_name == "barrier" else 2 * np.pi
    for p in preds:
        best, best_d = None, float(dist_th)
        for j, g in enumerate(gt_by_sample.get(p.sample_token, ())):
            if (p.sample_token, j) in taken:
                continue
            d = center_distance(g, p)
            if d < best_d:
                best, best_d = j, d
        conf.append(p.score)
        if best is None:
            tp.append(0)
            fp.append(1)
            continue
        taken.add((p.sample_token, best))
        g = gt_by_sample[p.sample_token][best]
        tp.append(1)
        fp.append(0)
        match["trans_err"].append(center_distance(g, p))
        match["scale_err"].append(1.0 - scale_iou(g, p))
        match["orient_err"].append(yaw_diff(g, p, period))
        match["vel_err"].append(velocity_l2(g, p))
        match["attr_err"].append(1.0 - attr_acc(g, p))
        match["conf"].append(p.score)

    # devkit: zero MATCHES (not just zero preds) also short-circuits to
    # the no-predictions curve.
    if not match["conf"]:
        return MetricData.no_predictions()

    tp_c = np.cumsum(tp).astype(np.float64)
    fp_c = np.cumsum(fp).astype(np.float64)
    prec = tp_c / (tp_c + fp_c)
    rec = tp_c / npos
    rec_interp = np.linspace(0, 1, N_ELEM)
    prec_i = np.interp(rec_interp, rec, prec, right=0)
    conf_i = np.interp(rec_interp, rec, np.asarray(conf, np.float64),
                       right=0)

    curves = {}
    for key in TP_METRICS:
        if not match["conf"]:
            curves[key] = np.ones(N_ELEM)
            continue
        tmp = _cummean(np.asarray(match[key], np.float64))
        # resample the per-TP cumulative means onto the recall grid via
        # the (decreasing) confidence curve
        curves[key] = np.interp(
            conf_i[::-1], np.asarray(match["conf"], np.float64)[::-1],
            tmp[::-1],
        )[::-1]
    return MetricData(
        recall=rec_interp, precision=prec_i, confidence=conf_i, **curves
    )


def calc_ap(md: MetricData, min_recall: float = MIN_RECALL,
            min_precision: float = MIN_PRECISION) -> float:
    # devkit algo.py::calc_ap SLICES off the low-recall bins (the mean
    # runs over the remaining 90 entries), it does not zero them.
    prec = md.precision[round(100 * min_recall) + 1:].copy()
    prec -= min_precision
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - min_precision)


def calc_tp(md: MetricData, metric_name: str,
            min_recall: float = MIN_RECALL) -> float:
    first = round(100 * min_recall) + 1
    last = md.max_recall_ind
    if last < first:
        return 1.0
    return float(np.mean(getattr(md, metric_name)[first:last + 1]))


def evaluate_detection(
    gt_boxes: Sequence[EvalBox],
    pred_boxes: Sequence[EvalBox],
    class_names: Sequence[str] = tuple(CLASS_RANGE),
    class_range: Dict[str, float] = CLASS_RANGE,
) -> dict:
    """Full metric: returns the same summary fields the reference reads
    out of the devkit's ``metrics_summary.json`` (``label_aps``,
    ``label_tp_errors``, ``tp_errors``, ``mean_ap``, ``nd_score``)."""
    gts = filter_eval_boxes(gt_boxes, class_range)
    preds = filter_eval_boxes(pred_boxes, class_range)

    label_aps: Dict[str, Dict[str, float]] = {}
    label_tp: Dict[str, Dict[str, float]] = {}
    for name in class_names:
        label_aps[name] = {}
        for th in DIST_THS:
            md = accumulate(gts, preds, name, th)
            label_aps[name][f"{th:g}"] = calc_ap(md)
        md_tp = accumulate(gts, preds, name, DIST_TH_TP)
        label_tp[name] = {}
        for metric in TP_METRICS:
            if metric in LEAVE_OUT.get(name, ()):
                label_tp[name][metric] = float("nan")
            else:
                label_tp[name][metric] = calc_tp(md_tp, metric)

    mean_ap = float(
        np.mean([v for aps in label_aps.values() for v in aps.values()])
    )
    tp_errors = {}
    for metric in TP_METRICS:
        vals = [
            label_tp[n][metric]
            for n in class_names
            if metric not in LEAVE_OUT.get(n, ())
        ]
        tp_errors[metric] = float(np.nanmean(vals)) if vals else 1.0
    tp_scores = [max(0.0, 1.0 - tp_errors[m]) for m in TP_METRICS]
    nd_score = (MEAN_AP_WEIGHT * mean_ap + sum(tp_scores)) / (
        MEAN_AP_WEIGHT + len(TP_METRICS)
    )
    return {
        "label_aps": label_aps,
        "label_tp_errors": label_tp,
        "tp_errors": tp_errors,
        "mean_ap": mean_ap,
        "nd_score": nd_score,
    }


def summary_to_detail(metrics: dict, class_names: Sequence[str],
                      result_name: str = "pts_bbox") -> dict:
    """Flatten a metric summary into the reference's logged key schema
    (``nuscenes_dataset.py:459-476``)."""
    prefix = f"{result_name}_NuScenes"
    detail = {}
    for name in class_names:
        for k, v in metrics["label_aps"][name].items():
            detail[f"{prefix}/{name}_AP_dist_{k}"] = round(float(v), 4)
        for k, v in metrics["label_tp_errors"][name].items():
            detail[f"{prefix}/{name}_{k}"] = round(float(v), 4)
    for k, v in metrics["tp_errors"].items():
        detail[f"{prefix}/{ERR_NAME_MAPPING[k]}"] = round(float(v), 4)
    detail[f"{prefix}/NDS"] = metrics["nd_score"]
    detail[f"{prefix}/mAP"] = metrics["mean_ap"]
    return detail
