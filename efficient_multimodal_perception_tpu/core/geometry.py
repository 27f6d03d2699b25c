"""Pure-jnp geometry: range projection, camera projection, voxel grids.

Replaces, with static-shape vectorized math, the reference's

* spherical range-image projection (``tools/create_range_images.py:66-120``),
* LiDAR->image projection + augmentation adjustment, which the reference
  runs as a python loop over batch x 6 cameras
  (``mmdet3d/models/backbones/joint_encoder.py:97-215``,
  ``mmdet3d/models/detectors/point_triplane.py:164-241``),
* occupancy ROI / voxel-center grids (``triplane_occ.py:291-318``,
  ``triplane_elev.py:113-133``).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

# Range image spec, fixed by the reference (create_range_images.py:10-13).
RANGE_H = 32
RANGE_W = 1024
FOV_UP_DEG = 10.0
FOV_DOWN_DEG = -30.0


# ---------------------------------------------------------------------------
# Spherical range projection
# ---------------------------------------------------------------------------

def range_projection_np(
    points: np.ndarray,
    proj_h: int = RANGE_H,
    proj_w: int = RANGE_W,
    fov_up_deg: float = FOV_UP_DEG,
    fov_down_deg: float = FOV_DOWN_DEG,
    remove_self_radius: float = 2.0,
):
    """Numpy spherical projection, bit-identical to the offline script.

    Mirrors ``create_range_images.py:56-120``: self-vehicle removal,
    yaw = atan2(x, y), far-to-near ordering so the nearest point wins each
    pixel (z-buffer by sort order).

    Args:
        points: ``(N, >=3)`` float array of LiDAR xyz[...].

    Returns:
        ``(range_image (H, W), range_points (H, W, 3))`` float32 arrays.
    """
    pts = np.asarray(points, dtype=np.float64)
    if remove_self_radius > 0:
        close = (np.abs(pts[:, 0]) < remove_self_radius) & (
            np.abs(pts[:, 1]) < remove_self_radius
        )
        pts = pts[~close]

    fov_up = fov_up_deg / 180.0 * np.pi
    fov_down = fov_down_deg / 180.0 * np.pi
    fov = abs(fov_down) + abs(fov_up)

    depth = np.linalg.norm(pts[:, :3], 2, axis=1)
    yaw = np.arctan2(pts[:, 0], pts[:, 1])
    pitch = np.arcsin(pts[:, 2] / (depth + 1e-8))

    proj_x = 0.5 * (yaw / np.pi + 1.0) * proj_w
    proj_y = (1.0 - (pitch + abs(fov_down)) / fov) * proj_h

    proj_x = np.clip(np.floor(proj_x), 0, proj_w - 1).astype(np.int32)
    proj_y = np.clip(np.floor(proj_y), 0, proj_h - 1).astype(np.int32)

    order = np.argsort(depth)[::-1]
    depth, proj_x, proj_y, pts = depth[order], proj_x[order], proj_y[order], pts[order]

    range_img = np.zeros((proj_h, proj_w), dtype=np.float64)
    range_pts = np.zeros((proj_h, proj_w, 3), dtype=np.float64)
    range_img[proj_y, proj_x] = depth
    range_pts[proj_y, proj_x] = pts[:, :3]
    return range_img.astype(np.float32), range_pts.astype(np.float32)


def range_projection(
    points: jax.Array,
    valid: jax.Array,
    proj_h: int = RANGE_H,
    proj_w: int = RANGE_W,
    fov_up_deg: float = FOV_UP_DEG,
    fov_down_deg: float = FOV_DOWN_DEG,
) -> tuple[jax.Array, jax.Array]:
    """Device-side, jit-able range projection over a padded point set.

    Z-buffering is expressed as a segment-min over pixel ids instead of
    the reference's sort + last-write scatter — same nearest-point-wins
    result, but deterministic and XLA-friendly.

    Args:
        points: ``(P, 3)`` padded points.
        valid: ``(P,)`` bool mask of real points.

    Returns:
        ``(range_image (H, W), range_points (H, W, 3))``.
    """
    fov_up = fov_up_deg / 180.0 * math.pi
    fov_down = fov_down_deg / 180.0 * math.pi
    fov = abs(fov_down) + abs(fov_up)

    depth = jnp.linalg.norm(points[:, :3], axis=1)
    yaw = jnp.arctan2(points[:, 0], points[:, 1])
    pitch = jnp.arcsin(points[:, 2] / (depth + 1e-8))

    px = jnp.clip(jnp.floor(0.5 * (yaw / math.pi + 1.0) * proj_w), 0, proj_w - 1)
    py = jnp.clip(
        jnp.floor((1.0 - (pitch + abs(fov_down)) / fov) * proj_h), 0, proj_h - 1
    )
    pix = (py * proj_w + px).astype(jnp.int32)
    pix = jnp.where(valid, pix, proj_h * proj_w)  # park padding in a slop bin

    num_pix = proj_h * proj_w
    inf = jnp.full((), jnp.inf, depth.dtype)
    masked_depth = jnp.where(valid, depth, inf)
    best = jax.ops.segment_min(masked_depth, pix, num_segments=num_pix + 1)
    # winner-takes-pixel gather: a point wins iff its depth equals the min.
    is_winner = valid & (masked_depth == best[pix])
    # Resolve exact-tie duplicates by segment_min over point index.
    idx = jnp.arange(points.shape[0], dtype=jnp.int32)
    win_idx = jax.ops.segment_min(
        jnp.where(is_winner, idx, points.shape[0]), pix, num_segments=num_pix + 1
    )[:num_pix]
    hit = win_idx < points.shape[0]
    win_idx = jnp.clip(win_idx, 0, points.shape[0] - 1)

    img = jnp.where(hit, depth[win_idx], 0.0).reshape(proj_h, proj_w)
    pts = jnp.where(hit[:, None], points[win_idx, :3], 0.0).reshape(
        proj_h, proj_w, 3
    )
    return img, pts


# ---------------------------------------------------------------------------
# Camera projection + augmentation adjustment
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class CameraAug:
    """Static-shape per-camera augmentation parameters.

    The reference carries these as python dicts in ``img_metas``
    (``imgs_aug`` built by ``ImageAug3D``, ``transforms_3d.py:45-77``);
    here they are dense arrays so projection can be jitted.

    Attributes:
        resize: ``(B, N)`` scale factors.
        crop: ``(B, N, 2)`` crop offsets (w, h) in resized pixels.
        flip: ``(B, N)`` bool horizontal flip flags.
    """

    resize: jax.Array
    crop: jax.Array
    flip: jax.Array

    @staticmethod
    def identity(batch: int, num_cams: int):
        return CameraAug(
            resize=jnp.ones((batch, num_cams), jnp.float32),
            crop=jnp.zeros((batch, num_cams, 2), jnp.float32),
            flip=jnp.zeros((batch, num_cams), bool),
        )


jax.tree_util.register_dataclass(
    CameraAug, data_fields=["resize", "crop", "flip"], meta_fields=[]
)

try:  # allow CameraAug inside jax.export artifacts (tools/export.py)
    from jax import export as _jexport

    _jexport.register_pytree_node_serialization(
        CameraAug,
        serialized_name="efficient_multimodal_perception_tpu.CameraAug",
        serialize_auxdata=lambda aux: b"",
        deserialize_auxdata=lambda b: (),
    )
except (ImportError, AttributeError, ValueError):
    pass


def project_points_to_cameras(
    points: jax.Array,
    lidar2img: jax.Array,
    aug: CameraAug,
    image_hw: tuple[int, int],
) -> tuple[jax.Array, jax.Array]:
    """Project LiDAR points into every camera, vectorized over B x N_cam.

    Replaces the per-batch/per-camera loops of ``joint_encoder.py:146-213``
    and ``point_triplane.py:201-236``.  Pipeline per the reference:
    homogeneous transform, perspective divide with z clamped at 1e-5
    (``joint_encoder.py:129-130``), scale by aug resize, subtract crop,
    mirror x on flip, bounds check against the final image size.  The
    reference's rotation step uses angle 0 (identity) and is omitted.

    Args:
        points: ``(B, ..., 3)`` LiDAR-frame xyz.
        lidar2img: ``(B, N, 4, 4)`` projection matrices.
        aug: :class:`CameraAug` with ``(B, N)`` leaves.
        image_hw: final augmented image size ``(H, W)``.

    Returns:
        ``coords``: ``(B, N, ..., 2)`` (x, y) pixel coords in the final
        image; ``valid``: ``(B, N, ...)`` bool in-bounds mask.
    """
    H, W = image_hw
    B = points.shape[0]
    pt_shape = points.shape[1:-1]
    pts = points.reshape(B, -1, 3)
    hom = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    # (B, N, 4, 4) @ (B, P, 4) -> (B, N, P, 4).  Full f32: pixel coords
    # are precision-critical and the default matmul precision is bf16.
    cam = jnp.einsum("bnij,bpj->bnpi", lidar2img, hom, precision="highest")
    xy = cam[..., 0:2] / jnp.maximum(cam[..., 2:3], 1e-5)

    resize = aug.resize[:, :, None, None]
    crop = aug.crop[:, :, None, :]
    x = xy[..., 0] * resize[..., 0] - crop[..., 0]
    y = xy[..., 1] * resize[..., 0] - crop[..., 1]
    x = jnp.where(aug.flip[:, :, None], W - x, x)

    valid = (x >= 0) & (x < W) & (y >= 0) & (y < H)
    coords = jnp.stack([x, y], axis=-1)
    return (
        coords.reshape(B, coords.shape[1], *pt_shape, 2),
        valid.reshape(B, valid.shape[1], *pt_shape),
    )


# ---------------------------------------------------------------------------
# Voxel-center reference grids
# ---------------------------------------------------------------------------

def occupancy_roi(occ_range, voxel_size):
    """Occupancy crop bounds + voxel-center grid.

    Bit-for-bit port of ``TriplaneOcc.roi`` (``triplane_occ.py:291-318``):
    the global occupancy grid spans [-50, 50] m; with occ_range
    [-25, 25] x [-25, 25] x [-5, 3] and 0.5 m voxels the crop is 99 x 99
    and Z = 16 (note: 99, not 100 — the +/-0.5 rounding in the reference).

    Returns:
        ``(bounds (min_x, min_y, max_x, max_y), ref_3d (X, Y, Z, 3))``
        with ``ref_3d`` holding world-frame voxel centers (numpy f32).
    """
    min_x = int((abs(-50 - occ_range[0]) + 0.5) / voxel_size[0])
    min_y = int((abs(-50 - occ_range[1]) + 0.5) / voxel_size[1])
    max_x = int((abs(50 - occ_range[0]) - 0.5) / voxel_size[0])
    max_y = int((abs(50 - occ_range[1]) - 0.5) / voxel_size[1])

    X = max_x - min_x + 1
    Y = max_y - min_y + 1
    Z = int((occ_range[5] - occ_range[2]) / voxel_size[2])

    xs = np.arange(X, dtype=np.float32)[:, None, None]
    ys = np.arange(Y, dtype=np.float32)[None, :, None]
    zs = np.arange(Z, dtype=np.float32)[None, None, :]
    ref = np.stack(np.broadcast_arrays(xs, ys, zs), axis=-1)
    ref[..., 0] = (ref[..., 0] + 0.5) * voxel_size[0] + occ_range[0]
    ref[..., 1] = (ref[..., 1] + 0.5) * voxel_size[1] + occ_range[1]
    ref[..., 2] = (ref[..., 2] + 0.5) * voxel_size[2] + occ_range[2]
    return (min_x, min_y, max_x, max_y), ref


def volume_reference_points(volume, voxel_size, pc_range):
    """Voxel-center grid for the elevation head.

    Port of ``TriplaneElev.get_reference_points`` + the world-frame
    scaling at ``triplane_elev.py:258-261``.  NOTE the reference stacks
    (ys, xs, zs) — i.e. channel 0 varies along the H axis — and then
    scales channel i by voxel_size[i]; reproduced exactly.

    Returns:
        ``(H, W, Z, 3)`` world-frame centers (numpy f32).
    """
    H, W, Z = volume
    ys = np.linspace(0.5, H - 0.5, H, dtype=np.float32)[:, None, None]
    xs = np.linspace(0.5, W - 0.5, W, dtype=np.float32)[None, :, None]
    zs = np.linspace(0.5, Z - 0.5, Z, dtype=np.float32)[None, None, :]
    ref = np.stack(np.broadcast_arrays(ys, xs, zs), axis=-1)
    for i in range(3):
        ref[..., i] = ref[..., i] * voxel_size[i] + pc_range[i]
    return ref


def crop_to_range(points: jax.Array, pc_range, eps: float = 0.0) -> jax.Array:
    """Strict-inequality in-range mask (``triplane.py:336-343``)."""
    lo = jnp.asarray(pc_range[:3]) + eps
    hi = jnp.asarray(pc_range[3:]) - eps
    return jnp.all((points > lo) & (points < hi), axis=-1)
