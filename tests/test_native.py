"""Native C++ prep kernels vs their numpy references."""

import numpy as np
import pytest

from efficient_multimodal_perception_tpu.core.geometry import (
    range_projection_np,
)
from efficient_multimodal_perception_tpu.data import native
from efficient_multimodal_perception_tpu.data.prep import make_elevation


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("native library unavailable (no compiler?)")
    return lib


def make_cloud(n=30000, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(0.5, 60, n)
    yaw = rng.uniform(-np.pi, np.pi, n)
    pitch = rng.uniform(np.deg2rad(-29.5), np.deg2rad(9.5), n)
    return np.stack(
        [
            r * np.cos(pitch) * np.sin(yaw),
            r * np.cos(pitch) * np.cos(yaw),
            r * np.sin(pitch),
        ],
        axis=1,
    ).astype(np.float32)


def test_native_range_projection(lib):
    pts = make_cloud()
    img_n, rpts_n = native.range_projection_native(pts)
    img_p, rpts_p = range_projection_np(pts)
    np.testing.assert_allclose(img_n, img_p, atol=2e-4)
    np.testing.assert_allclose(rpts_n, rpts_p, atol=2e-4)


def test_native_occ_densify(lib):
    rng = np.random.default_rng(1)
    n = 5000
    sp = np.stack(
        [
            rng.integers(0, 200, n),
            rng.integers(0, 200, n),
            rng.integers(0, 16, n),
            rng.integers(0, 17, n),
        ],
        axis=1,
    ).astype(np.int32)
    out = native.occ_densify_native(sp)
    # numpy reference (loading.py:88-104)
    labels = native._REMAP_LUT[sp[:, 3]]
    dense = np.zeros((200, 200, 16), np.int32)
    dense[sp[:, 0], sp[:, 1], sp[:, 2]] = labels
    # collisions: both last-write in row order; identical here
    np.testing.assert_array_equal(out, dense)


def test_native_elevation(lib):
    pts = make_cloud(seed=2)
    elev_n, mask_n = native.elevation_raster_native(pts)
    ref = make_elevation(pts)
    np.testing.assert_allclose(mask_n, ref["mask"], atol=0)
    np.testing.assert_allclose(elev_n, ref["elevation"], atol=1e-5)
