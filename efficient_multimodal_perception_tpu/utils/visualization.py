"""Evaluation-time visualization dumps.

Rebuild of the reference's test artifacts (SURVEY.md §4 "visual
inspection"): MAE reconstruction grids (``triplane.py:616-771``),
PCA-colored triplanes (``triplane_occ.py:418-465``), re-projected point
clouds (``triplane.py:773-807``), and pred/gt occupancy npz volumes
(``triplane_occ.py:199-201``).  All functions take numpy arrays
(channels-last) and write into ``out_dir``.
"""

from __future__ import annotations

import os

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406])
IMAGENET_STD = np.array([0.229, 0.224, 0.225])


def _ensure(out_dir, sub):
    d = os.path.join(out_dir, sub)
    os.makedirs(d, exist_ok=True)
    return d


def save_image_grid(
    originals: np.ndarray,
    recons: np.ndarray,
    mask: np.ndarray,
    out_dir: str,
    count: int,
):
    """Per-camera original/masked/reconstruction/composite grid.

    Port of ``vis_image`` (``triplane.py:616-674``).

    Args:
        originals/recons: ``(N, H, W, 3)`` normalized images.
        mask: ``(N, H, W, 1)`` 1 = supervised/reconstructed region.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = _ensure(out_dir, "cam")
    raw = _ensure(out_dir, "raw")
    n = originals.shape[0]
    fig, axes = plt.subplots(n, 4, figsize=(24, 3 * n))
    axes = np.atleast_2d(axes)
    inv_mask = 1.0 - mask
    for i in range(n):
        x = originals[i] * IMAGENET_STD + IMAGENET_MEAN
        y = recons[i] * IMAGENET_STD + IMAGENET_MEAN
        m = inv_mask[i]
        panels = [
            ("original", x),
            ("masked", x * (1 - m)),
            ("reconstruction", y),
            ("recon + visible", x * (1 - m) + y * m),
        ]
        for j, (title, img) in enumerate(panels):
            axes[i, j].imshow(np.clip(img, 0, 1))
            axes[i, j].set_title(title)
            axes[i, j].axis("off")
        plt.imsave(
            os.path.join(raw, f"scene{count}_cam{i}_reconstruction.png"),
            np.clip(y, 0, 1),
        )
    fig.savefig(os.path.join(d, f"{count}.png"))
    plt.close(fig)


def save_range_grid(
    original: np.ndarray, recon: np.ndarray, mask: np.ndarray,
    out_dir: str, count: int, vmax: float = 50.0,
):
    """Range-image reconstruction strip (``vis_range_image``,
    ``triplane.py:676-771``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = _ensure(out_dir, "range")
    x, y, m = original[..., 0], recon[..., 0], 1.0 - mask[..., 0]
    fig, axes = plt.subplots(4, 1, figsize=(24, 12))
    for ax, (title, img) in zip(
        axes,
        [
            ("original", x),
            ("masked", x * (1 - m)),
            ("reconstruction", y),
            ("reconstruction + visible", x * (1 - m) + y * m),
        ],
    ):
        ax.imshow(img, vmin=0, vmax=vmax)
        ax.set_title(title)
        ax.axis("off")
    fig.savefig(os.path.join(d, f"{count}.png"))
    plt.close(fig)


def save_reprojected_points(
    range_points: np.ndarray, range_pred: np.ndarray, mask: np.ndarray,
    out_dir: str, count: int,
    fov_up_deg: float = 10.0, fov_down_deg: float = -30.0,
):
    """Back-project predicted ranges to 3-D and dump pred/gt clouds
    (``save_points``, ``triplane.py:773-807``)."""
    d = _ensure(out_dir, "points")
    H, W = range_pred.shape[:2]
    fov_up = np.deg2rad(fov_up_deg)
    fov_down = np.deg2rad(fov_down_deg)
    fov = abs(fov_up) + abs(fov_down)

    i, j = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pitch = (1.0 - i / H) * fov - abs(fov_down)
    yaw = (2.0 * j / W - 1.0) * np.pi
    r = range_pred[..., 0] if range_pred.ndim == 3 else range_pred
    x = r * np.sin(yaw) * np.cos(pitch)
    y = r * np.cos(yaw) * np.cos(pitch)
    z = r * np.sin(pitch)
    m = mask[..., 0] if mask.ndim == 3 else mask
    pred = np.stack([x, y, z, 1 - m], -1)[r > 1e-3].reshape(-1, 4)
    gt = np.concatenate(
        [range_points, 1 - m[..., None]], axis=-1
    ).reshape(-1, 4)
    np.save(os.path.join(d, f"pred_points_{count}.npy"), pred)
    np.save(os.path.join(d, f"gt_points_{count}.npy"), gt)


def save_triplane_pca(triplane: np.ndarray, out_dir: str, count: int):
    """PCA-colored triplane figure (``vis_triplane``,
    ``triplane_occ.py:418-465``); dependency-light PCA via SVD.

    Args:
        triplane: ``(3, S, S, C)`` planes.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = _ensure(out_dir, "triplane")
    fig, axes = plt.subplots(3, 1, figsize=(24, 12))
    names = ["xy", "yz", "xz"]
    for i in range(3):
        flat = triplane[i].reshape(-1, triplane.shape[-1]).astype(np.float64)
        flat = flat - flat.mean(0)
        _, _, vt = np.linalg.svd(flat, full_matrices=False)
        pca = (flat @ vt[:3].T).reshape(*triplane.shape[1:3], 3)
        lo, hi = pca.min(), pca.max()
        axes[i].imshow((pca - lo) / max(hi - lo, 1e-9))
        axes[i].set_title(names[i])
        axes[i].axis("off")
    fig.savefig(os.path.join(d, f"{count}.png"))
    plt.close(fig)


def save_points_obj(points: np.ndarray, path: str):
    """Dump a point cloud as a wavefront .obj (vertex cloud).

    Dependency-light stand-in for the reference's trimesh dumps
    (``core/visualizer/show_result.py:74-126``).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for p in np.asarray(points).reshape(-1, points.shape[-1]):
            f.write(f"v {p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")


def save_boxes_obj(corners: np.ndarray, path: str):
    """Dump (N, 8, 3) box corners as .obj wireframes."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ]
    with open(path, "w") as f:
        for b in corners:
            for v in b:
                f.write(f"v {v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for i in range(len(corners)):
            base = i * 8 + 1
            for a, b_ in edges:
                f.write(f"l {base + a} {base + b_}\n")


def save_occupancy_npz(
    pred_occ: np.ndarray, gt_occ: np.ndarray, points: np.ndarray,
    out_dir: str, count: int,
):
    """pred/gt/points npz dump (``triplane_occ.py:199-201``)."""
    os.makedirs(out_dir, exist_ok=True)
    np.savez(
        os.path.join(out_dir, str(count)),
        pred_occ=pred_occ, gt_occ=gt_occ, points=points.reshape(-1, 3),
    )
