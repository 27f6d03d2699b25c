"""JointEncoder.interact vs a literal loop oracle.

The cross-modal exchange is the most intricate vectorization in the
rebuild (reference python loop at ``joint_encoder.py:146-213``); this
re-states those semantics as an explicit numpy loop and checks the
batched implementation reproduces them: camera-feature gather-sum onto
range pixels, last-write positional-embedding scatter, stored projection
coords and masks.
"""

import numpy as np
import jax
import jax.numpy as jnp

from efficient_multimodal_perception_tpu.core.geometry import CameraAug
from efficient_multimodal_perception_tpu.models.joint_encoder import (
    JointEncoder,
)

ENC = dict(
    arch={"depths": (1, 1, 1, 1), "channels": (4, 8, 16, 32)},
    out_indices=1,
    norm_out=True,
    stem_patch_size=(2, 2),
)
LID = dict(
    arch={"depths": (1, 1, 1, 1), "channels": (4, 8, 16, 32)},
    out_indices=3,
    norm_out=True,
    in_channels=9,  # 1 + C1=8
    stem_patch_size=(1, 4),
    downsample_height=False,
)


def test_interact_matches_loop_oracle():
    rng = np.random.default_rng(0)
    B, N = 1, 2
    IH, IW = 64, 128
    RH, RW = 8, 64
    h1, w1, C = 16, 32, 8  # stride-4 mid features

    enc = JointEncoder(
        lidar_encoder=LID,
        camera_encoder=ENC,
        embed_dims=C,
        image_hw=(IH, IW),
    )

    img_feats = rng.standard_normal((B, N, h1, w1, C)).astype(np.float32)
    range_image = rng.uniform(0, 40, (B, RH, RW, 1)).astype(np.float32)
    # ~30% empty pixels, ~10% masked (range_image zeroed)
    empty = rng.random((B, RH, RW)) < 0.3
    range_points = rng.uniform(-20, 20, (B, RH, RW, 3)).astype(np.float32)
    range_points[empty] = 0.0
    range_image[empty] = 0.0
    masked = (rng.random((B, RH, RW)) < 0.1) & ~empty
    range_image[masked] = 0.0

    # simple forward-looking pinhole cameras
    l2i = np.zeros((B, N, 4, 4), np.float32)
    for c in range(N):
        K = np.array(
            [[80.0, 0, IW / 2, 0], [0, 80.0, IH / 2, 0], [0, 0, 1, 0],
             [0, 0, 0, 1]], np.float32,
        )
        a = np.pi * c
        R = np.array(
            [[np.cos(a), -np.sin(a), 0, 0], [0, 0, -1, 1.0],
             [np.sin(a), np.cos(a), 0, 0], [0, 0, 0, 1]], np.float32,
        )
        l2i[:, c] = K @ R
    aug = CameraAug(
        resize=jnp.full((B, N), 0.8, jnp.float32),
        crop=jnp.asarray(rng.uniform(0, 5, (B, N, 2)).astype(np.float32)),
        flip=jnp.asarray([[False, True]]),
    )

    variables = enc.init(
        jax.random.key(0),
        jnp.asarray(img_feats),
        jnp.asarray(range_image),
        jnp.asarray(range_points),
        jnp.asarray(l2i),
        aug,
        method="interact",
    )
    fused, new_feats, rc, rc_valid = enc.apply(
        variables,
        jnp.asarray(img_feats),
        jnp.asarray(range_image),
        jnp.asarray(range_points),
        jnp.asarray(l2i),
        aug,
        method="interact",
    )
    pe_all = np.asarray(
        enc.apply(
            variables,
            jnp.asarray(range_points.reshape(B, -1, 3)),
            method=lambda m, p: m.position_encoder(p),
        )
    )  # (B, P, C) positional embeddings from the same params

    # ---- oracle loop (joint_encoder.py:146-213 semantics) -------------
    aug_np = jax.tree.map(np.asarray, aug)
    P = RH * RW
    pts = range_points.reshape(B, P, 3)
    no_point = (pts != 0).any(-1)
    unmasked = (range_image > 0).reshape(B, P)

    cam_range = np.zeros((B, P, C), np.float32)
    exp_feats = img_feats.copy()
    exp_rc = np.full((B, N, P, 2), -1.0, np.float32)
    exp_valid = np.zeros((B, N, P), bool)

    for b in range(B):
        for c in range(N):
            hom = np.concatenate([pts[b], np.ones((P, 1), np.float32)], 1)
            cam = hom @ l2i[b, c].T
            xy = cam[:, :2] / np.maximum(cam[:, 2:3], 1e-5)
            x = xy[:, 0] * aug_np.resize[b, c] - aug_np.crop[b, c, 0]
            y = xy[:, 1] * aug_np.resize[b, c] - aug_np.crop[b, c, 1]
            if aug_np.flip[b, c]:
                x = IW - x
            in_img = (x >= 0) & (x < IW) & (y >= 0) & (y < IH)
            valid = in_img & no_point[b]
            active = valid & unmasked[b]
            exp_rc[b, c, valid] = np.stack([y[valid], x[valid]], 1)
            exp_valid[b, c] = valid
            rows = np.clip((y * h1 / IH).astype(int), 0, h1 - 1)
            cols = np.clip((x * w1 / IW).astype(int), 0, w1 - 1)
            for p in np.nonzero(active)[0]:
                cam_range[b, p] += img_feats[b, c, rows[p], cols[p]]
            # last-write pos-embed scatter: torch applies the writes
            # serially, so on duplicate targets the LAST p wins — the
            # serial loop below reproduces that exactly, and the
            # vectorized scatter_set_2d is deterministic last-write
            for p in np.nonzero(active)[0]:
                exp_feats[b, c, rows[p], cols[p]] = (
                    img_feats[b, c, rows[p], cols[p]] + pe_all[b, p]
                )

    fused = np.asarray(fused)
    np.testing.assert_allclose(
        fused[..., 0:1], range_image, atol=1e-6
    )
    np.testing.assert_allclose(
        fused[..., 1:].reshape(B, P, C), cam_range, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(rc_valid).reshape(B, N, P), exp_valid
    )
    got_rc = np.asarray(rc).reshape(B, N, P, 2)
    np.testing.assert_allclose(got_rc, exp_rc, atol=1e-3)

    # pos-embed scatter: exact last-write equality, collisions included
    got_feats = np.asarray(new_feats)
    np.testing.assert_allclose(got_feats, exp_feats, atol=1e-5)


def test_interact_batch_chunking_is_exact():
    """interact past B=chunk splits into batch chunks (the XLA batched
    row-gather degrades super-linearly past ~100 MB of gather operand);
    the split must be bit-exact vs the unchunked body."""
    rng = np.random.default_rng(1)
    B, N = 6, 2
    IH, IW = 32, 64
    RH, RW = 4, 32
    h1, w1, C = 8, 16, 8

    kw = dict(
        lidar_encoder=LID, camera_encoder=ENC, embed_dims=C,
        image_hw=(IH, IW),
    )
    enc_chunked = JointEncoder(**kw, interact_batch_chunk=4)
    enc_plain = JointEncoder(**kw, interact_batch_chunk=64)

    img_feats = jnp.asarray(
        rng.standard_normal((B, N, h1, w1, C)).astype(np.float32)
    )
    range_image = jnp.asarray(
        rng.uniform(0, 40, (B, RH, RW, 1)).astype(np.float32)
    )
    range_points = jnp.asarray(
        rng.uniform(-20, 20, (B, RH, RW, 3)).astype(np.float32)
    )
    l2i = np.zeros((B, N, 4, 4), np.float32)
    l2i[..., 0, 0] = 40.0
    l2i[..., 1, 1] = 40.0
    l2i[..., 0, 2] = IW / 2
    l2i[..., 1, 2] = IH / 2
    l2i[..., 2, 2] = 1.0
    l2i[..., 3, 3] = 1.0
    l2i = jnp.asarray(l2i)
    aug = CameraAug.identity(B, N)

    args = (img_feats, range_image, range_points, l2i, aug)
    variables = enc_chunked.init(jax.random.key(0), *args, method="interact")
    out_c = enc_chunked.apply(variables, *args, method="interact")
    out_p = enc_plain.apply(variables, *args, method="interact")
    for a, b in zip(out_c, out_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
