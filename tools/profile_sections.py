#!/usr/bin/env python
"""Per-section timing of the triplane_occ inference path on the chip.

Times each stage of the forward separately (jitted, hard-synced via a
small host transfer — block_until_ready does not block through the axon
tunnel) to direct kernel work at the actual bottleneck.

    python tools/profile_sections.py [batch_size] [iters] [--int8]

``--int8`` profiles the quantized serving variant (ops/quant.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    int8 = "--int8" in sys.argv
    argv = [a for a in sys.argv if a != "--int8"]
    B = int(argv[1]) if len(argv) > 1 else 4
    iters = int(argv[2]) if len(argv) > 2 else 20

    from efficient_multimodal_perception_tpu.configs import get_config
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model

    cfg = get_config("triplane_occ")
    cfg["model"]["dtype"] = jnp.bfloat16
    if int8:
        from efficient_multimodal_perception_tpu.ops.quant import enable_int8

        enable_int8(cfg["model"])
    model = build_model(cfg["model"])
    batch = synthetic_batch(B, point_budget=4096, seed=0)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b)
    )(batch)

    enc = model.bind(variables)

    # ---- section functions (each jitted separately) ----
    def full(v, b):
        logits, _, _ = model.apply(v, b, deterministic=True)
        return logits.sum()

    def tri_only(v, b):
        return model.apply(v, b, method="triplane").sum()

    def enc_cam1(v, b):
        imgs = b.img.reshape(-1, *b.img.shape[2:])
        return model.apply(
            v, imgs,
            method=lambda m, x: m.encoder_net.camera_net.forward1(x),
        ).sum()

    def enc_interact(v, b, mid):
        return jax.tree_util.tree_leaves(model.apply(
            v, mid, b.range_image, b.range_points, b.lidar2img, b.cam_aug,
            method=lambda m, *a: m.encoder_net.interact(*a),
        ))[0].sum()

    def enc_lidar(v, fused):
        return model.apply(
            v, fused,
            method=lambda m, x: m.encoder_net.lidar_net(x),
        ).sum()

    def enc_cam2(v, mid_flat):
        return model.apply(
            v, mid_flat,
            method=lambda m, x: m.encoder_net.camera_net.forward2(x),
        ).sum()

    def neck_fn(v, comb):
        return model.apply(
            v, comb, method=lambda m, x: m.neck_net(x)
        ).sum()

    def readout(v, tri):
        return model.apply(
            v, tri, method=lambda m, t: m.sample_voxel_centers(t)
        ).sum()

    def decoder_fn(v, vox):
        return model.apply(
            v, vox, method=lambda m, x: m.decoder_net(x)
        ).sum()

    # ---- build intermediates once ----
    imgs = batch.img.reshape(-1, *batch.img.shape[2:])
    mid_flat = jax.jit(
        lambda v, x: model.apply(
            v, x, method=lambda m, xx: m.encoder_net.camera_net.forward1(xx)
        )
    )(variables, imgs)
    mid = mid_flat.reshape(B, 6, *mid_flat.shape[1:])
    fused, new_mid, _, _ = jax.jit(
        lambda v, b, m_: model.apply(
            v, m_, b.range_image, b.range_points, b.lidar2img, b.cam_aug,
            method=lambda mm, *a: mm.encoder_net.interact(*a),
        )
    )(variables, batch, mid)
    range_feat = jax.jit(
        lambda v, x: model.apply(
            v, x, method=lambda m, xx: m.encoder_net.lidar_net(xx)
        )
    )(variables, fused)
    img_feat = jax.jit(
        lambda v, x: model.apply(
            v, x, method=lambda m, xx: m.encoder_net.camera_net.forward2(xx)
        )
    )(variables, new_mid.reshape(-1, *new_mid.shape[2:]))
    h, w, C = img_feat.shape[1:]
    comb = jnp.concatenate(
        [range_feat, img_feat.reshape(B, 6 * h, w, C)], axis=1
    )
    tri = jax.jit(
        lambda v, x: model.apply(v, x, method=lambda m, xx: m.neck_net(xx))
    )(variables, comb)
    S, C3 = tri.shape[1], tri.shape[-1]
    tri = tri.reshape(B, S, S, 3, C3 // 3).transpose(0, 3, 1, 2, 4)
    vox = jax.jit(
        lambda v, t: model.apply(
            v, t, method=lambda m, tt: m.sample_voxel_centers(tt)
        )
    )(variables, tri)

    sections = [
        ("camera fwd1 (stages 0-1, 6N imgs)", jax.jit(enc_cam1),
         (variables, batch)),
        ("interact", jax.jit(enc_interact), (variables, batch, mid)),
        ("lidar encoder (193ch)", jax.jit(enc_lidar), (variables, fused)),
        ("camera fwd2 (stages 2-3)", jax.jit(enc_cam2),
         (variables, new_mid.reshape(-1, *new_mid.shape[2:]))),
        ("MiT neck", jax.jit(neck_fn), (variables, comb)),
        ("voxel readout", jax.jit(readout), (variables, tri)),
        ("decoder head", jax.jit(decoder_fn), (variables, vox)),
        ("readout+head packed", jax.jit(
            lambda v, t: model.apply(
                v, t, method=lambda m, tt: m.voxel_logits(tt)
            ).sum()
        ), (variables, tri)),
        ("triplane (enc+neck)", jax.jit(tri_only), (variables, batch)),
        ("FULL forward", jax.jit(full), (variables, batch)),
    ]
    print(f"B={B}, dtype=bf16, backend={jax.default_backend()}")
    total = 0.0
    for name, fn, args in sections:
        dt = timeit(fn, *args, iters=iters)
        print(f"{name:38s} {dt * 1e3:8.2f} ms  "
              f"({dt * 1e3 / B:6.2f} ms/sample)")


if __name__ == "__main__":
    main()
