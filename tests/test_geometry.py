"""Geometry tests: range projection round-trip, camera projection oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from efficient_multimodal_perception_tpu.core import geometry as geo


def make_cloud(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(2.5, 60, n)
    yaw = rng.uniform(-np.pi, np.pi, n)
    pitch = rng.uniform(np.deg2rad(-29.5), np.deg2rad(9.5), n)
    x = r * np.cos(pitch) * np.sin(yaw)
    y = r * np.cos(pitch) * np.cos(yaw)
    z = r * np.sin(pitch)
    return np.stack([x, y, z], axis=1).astype(np.float32)


def test_range_projection_np_zbuffer():
    """Nearest point must win each pixel (create_range_images.py:106-120)."""
    pts = np.array(
        [[0.0, 10.0, 0.0], [0.0, 5.0, 0.0], [0.0, 20.0, 0.0]], np.float32
    )
    img, rpts = geo.range_projection_np(pts)
    yy, xx = np.nonzero(img)
    assert len(yy) == 1
    assert np.isclose(img[yy[0], xx[0]], 5.0)
    np.testing.assert_allclose(rpts[yy[0], xx[0]], [0, 5, 0], atol=1e-6)


def test_range_projection_jnp_matches_numpy():
    pts = make_cloud()
    img_np, pts_np = geo.range_projection_np(pts, remove_self_radius=0.0)
    P = 6144
    pad = np.zeros((P, 3), np.float32)
    pad[: len(pts)] = pts
    valid = np.zeros(P, bool)
    valid[: len(pts)] = True
    img_j, pts_j = jax.jit(geo.range_projection)(
        jnp.asarray(pad), jnp.asarray(valid)
    )
    np.testing.assert_allclose(np.asarray(img_j), img_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pts_j), pts_np, atol=1e-4)


def test_project_points_to_cameras_oracle():
    """Vectorized projection vs a literal python port of
    joint_encoder.py:146-206 (resize/crop/flip adjust + bounds)."""
    rng = np.random.default_rng(3)
    B, N, P = 2, 3, 100
    H, W = 256, 512
    pts = rng.uniform(-30, 30, (B, P, 3)).astype(np.float32)
    # realistic projective matrices: intrinsics @ [R|t] with yaw-only R
    l2i = np.zeros((B, N, 4, 4), np.float32)
    for b in range(B):
        for c in range(N):
            f = rng.uniform(800, 1300)
            K = np.array(
                [[f, 0, 800, 0], [0, f, 450, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                np.float32,
            )
            a = rng.uniform(-np.pi, np.pi)
            R = np.array(
                [
                    [np.cos(a), -np.sin(a), 0, rng.uniform(-2, 2)],
                    [0, 0, -1, rng.uniform(-2, 2)],
                    [np.sin(a), np.cos(a), 0, rng.uniform(-2, 2)],
                    [0, 0, 0, 1],
                ],
                np.float32,
            )
            l2i[b, c] = K @ R
    resize = rng.uniform(0.4, 0.7, (B, N)).astype(np.float32)
    crop = rng.uniform(0, 60, (B, N, 2)).astype(np.float32)
    flip = rng.random((B, N)) > 0.5

    aug = geo.CameraAug(
        resize=jnp.asarray(resize), crop=jnp.asarray(crop), flip=jnp.asarray(flip)
    )
    coords, valid = geo.project_points_to_cameras(
        jnp.asarray(pts), jnp.asarray(l2i), aug, (H, W)
    )
    coords, valid = np.asarray(coords), np.asarray(valid)

    for b in range(B):
        for c in range(N):
            hom = np.concatenate([pts[b], np.ones((P, 1), np.float32)], 1)
            cam = hom @ l2i[b, c].T
            xy = cam[:, :2] / np.maximum(cam[:, 2:3], 1e-5)
            x = xy[:, 0] * resize[b, c] - crop[b, c, 0]
            y = xy[:, 1] * resize[b, c] - crop[b, c, 1]
            if flip[b, c]:
                x = W - x
            v = (x >= 0) & (x < W) & (y >= 0) & (y < H)
            # Behind-camera points project to huge coords where f32
            # summation order matters; they are invalid either way, so
            # compare coordinates only where the oracle says valid.
            np.testing.assert_allclose(
                coords[b, c, v, 0], x[v], rtol=1e-4, atol=2e-2
            )
            np.testing.assert_allclose(
                coords[b, c, v, 1], y[v], rtol=1e-4, atol=2e-2
            )
            np.testing.assert_array_equal(valid[b, c], v)


def test_occupancy_roi_reference_values():
    """Exact numbers from triplane_occ.py:291-318 with the shipped config."""
    bounds, ref = geo.occupancy_roi([-25, -25, -5, 25, 25, 3], (0.5, 0.5, 0.5))
    assert bounds == (51, 51, 149, 149)
    assert ref.shape == (99, 99, 16, 3)
    np.testing.assert_allclose(ref[0, 0, 0], [-24.75, -24.75, -4.75])
    np.testing.assert_allclose(ref[-1, -1, -1], [24.25, 24.25, 2.75])


def test_volume_reference_points():
    ref = geo.volume_reference_points((100, 100, 80), (0.4, 0.4, 0.1), [-20, -20, -5])
    assert ref.shape == (100, 100, 80, 3)
    np.testing.assert_allclose(ref[0, 0, 0], [-19.8, -19.8, -4.95])


def test_crop_to_range():
    pts = jnp.array([[0.0, 0, 0], [30, 0, 0], [0, 0, -6]])
    m = geo.crop_to_range(pts, [-25, -25, -5, 25, 25, 3])
    assert m.tolist() == [True, False, False]
