"""SAM automatic mask generation + LiDAR point labeling.

Rebuild of ``sam/create_sam_masks.py`` + the vendored
``sam/automatic_mask_generator.py`` on top of the bundled
``transformers`` SAM implementation instead of the segment-anything
package: a point-grid automatic mask generator (AMG) prompts SAM with a
regular grid, filters by predicted IoU + stability score, dedups with
box NMS (``core/boxes.nms_bev`` on axis-aligned boxes), then labels each
LiDAR point with the index of the mask its camera projection falls in —
producing the (N, 11) float32 bins the contrastive loss consumes
(``configs/nuscenes_surf_sam.py:38-43``).

Model weights must be available locally (the image has no egress); pass
a path or HF id reachable offline.  All entry points are import-gated.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..core.boxes import nms_bev


class AutomaticMaskGenerator:
    """Minimal AMG over ``transformers.SamModel``.

    Mirrors the behavior of the vendored generator
    (``sam/automatic_mask_generator.py:35-378``): ``points_per_side``
    grid prompts, multimask output, pred-IoU + stability filtering,
    box-NMS dedup.
    """

    def __init__(
        self,
        model_path: str = "facebook/sam-vit-huge",
        points_per_side: int = 32,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_offset: float = 1.0,
        box_nms_thresh: float = 0.7,
        points_per_batch: int = 64,
        device: str = "cpu",
    ):
        import torch
        from transformers import SamModel, SamProcessor

        self.torch = torch
        self.model = SamModel.from_pretrained(model_path).to(device).eval()
        self.processor = SamProcessor.from_pretrained(model_path)
        self.device = device
        self.points_per_side = points_per_side
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_offset = stability_offset
        self.box_nms_thresh = box_nms_thresh
        self.points_per_batch = points_per_batch

    def _point_grid(self, h: int, w: int) -> np.ndarray:
        n = self.points_per_side
        xs = (np.arange(n) + 0.5) / n * w
        ys = (np.arange(n) + 0.5) / n * h
        gx, gy = np.meshgrid(xs, ys)
        return np.stack([gx.ravel(), gy.ravel()], axis=-1)

    def generate(self, image: np.ndarray) -> List[dict]:
        """Returns ``[{segmentation (H, W) bool, predicted_iou, area,
        bbox}, ...]`` sorted by area descending (like the reference's
        output consumed at ``create_sam_masks.py:157-163``)."""
        torch = self.torch
        h, w = image.shape[:2]
        pts = self._point_grid(h, w)

        masks, ious = [], []
        with torch.no_grad():
            inputs = self.processor(image, return_tensors="pt").to(
                self.device
            )
            embeddings = self.model.get_image_embeddings(
                inputs["pixel_values"]
            )
            for i in range(0, len(pts), self.points_per_batch):
                chunk = pts[i : i + self.points_per_batch]
                pin = self.processor(
                    image,
                    input_points=[[[list(p)] for p in chunk]],
                    return_tensors="pt",
                ).to(self.device)
                out = self.model(
                    input_points=pin["input_points"],
                    image_embeddings=embeddings,
                    multimask_output=True,
                )
                low = out.pred_masks[0]  # (n_pts, 3, h', w')
                iou = out.iou_scores[0]  # (n_pts, 3)
                up = self.processor.image_processor.post_process_masks(
                    [low], pin["original_sizes"][0:1],
                    pin["reshaped_input_sizes"][0:1],
                    binarize=False,
                )[0]  # (n_pts, 3, H, W) logits
                for j in range(up.shape[0]):
                    for k in range(up.shape[1]):
                        score = float(iou[j, k])
                        if score < self.pred_iou_thresh:
                            continue
                        logits = up[j, k]
                        stab = self._stability(logits)
                        if stab < self.stability_score_thresh:
                            continue
                        masks.append((logits > 0).cpu().numpy())
                        ious.append(score)

        if not masks:
            return []
        boxes, keep_idx = [], []
        for m in masks:
            ys, xs = np.nonzero(m)
            if len(ys) == 0:
                boxes.append([0, 0, 0, 0, 0, 1, 0])
                continue
            cx, cy = (xs.min() + xs.max()) / 2, (ys.min() + ys.max()) / 2
            boxes.append(
                [cx, cy, 0, xs.max() - xs.min() + 1,
                 ys.max() - ys.min() + 1, 1, 0]
            )
        keep = nms_bev(
            np.asarray(boxes, np.float64),
            np.asarray(ious),
            self.box_nms_thresh,
            max_out=len(masks),
        )
        anns = [
            dict(
                segmentation=masks[i],
                predicted_iou=ious[i],
                area=int(masks[i].sum()),
            )
            for i in keep
        ]
        anns.sort(key=lambda a: a["area"], reverse=True)
        return anns

    def _stability(self, logits) -> float:
        t = self.stability_offset
        hi = (logits > t).sum().item()
        lo = (logits > -t).sum().item()
        return hi / max(lo, 1)


def label_points_with_masks(
    points_xyz: np.ndarray,
    lidar2image: np.ndarray,
    image_hw,
    masks: List[dict],
) -> np.ndarray:
    """Label each point with the 1-based index of the mask it lands in.

    Mirrors ``create_sam_masks.py:153-163``: project, bounds-check, and
    take the max mask index per point (later masks in generation order
    win via ``np.maximum``).

    Returns ``(N,)`` float labels (0 = no mask / not visible).
    """
    H, W = image_hw
    hom = np.concatenate(
        [points_xyz, np.ones_like(points_xyz[:, :1])], axis=1
    )
    cam = hom @ lidar2image.T
    xy = cam[:, :2] / np.maximum(cam[:, 2:3], 1e-5)
    valid = (
        (xy[:, 0] >= 0) & (xy[:, 0] < W) & (xy[:, 1] >= 0) & (xy[:, 1] < H)
    )
    cols = np.clip(xy[:, 0].astype(int), 0, W - 1)
    rows = np.clip(xy[:, 1].astype(int), 0, H - 1)
    labels = np.zeros(len(points_xyz), np.float32)
    for i, ann in enumerate(masks):
        hit = ann["segmentation"][rows, cols] & valid
        labels = np.maximum(labels, (i + 1) * hit.astype(np.float32))
    return labels


def create_sam_labeled_points(
    data_root: str,
    ann_file: str,
    save_path: str,
    model_path: str = "facebook/sam-vit-huge",
    device: str = "cpu",
    limit: Optional[int] = None,
):
    """Full offline pipeline: infos -> per-sample (N, 11) labeled bins."""
    from .nuscenes import camera_matrices, load_infos

    gen = AutomaticMaskGenerator(model_path=model_path, device=device)
    os.makedirs(save_path, exist_ok=True)
    infos = load_infos(os.path.join(data_root, ann_file))
    if limit:
        infos = infos[:limit]
    for info in infos:
        from PIL import Image

        pts = np.fromfile(
            os.path.join(data_root, info["lidar_path"]), np.float32
        ).reshape(-1, 5)
        labels = np.zeros((len(pts), 6), np.float32)
        l2is, _ = camera_matrices(info)
        for c, cam in enumerate(info["cams"].values()):
            img = np.asarray(
                Image.open(os.path.join(data_root, cam["data_path"]))
            )
            masks = gen.generate(img)
            labels[:, c] = label_points_with_masks(
                pts[:, :3], l2is[c], img.shape[:2], masks
            )
        out = np.concatenate([pts, labels], axis=1).astype(np.float32)
        out.tofile(
            os.path.join(
                save_path, os.path.split(info["lidar_path"])[-1]
            )
        )
