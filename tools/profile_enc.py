#!/usr/bin/env python
"""Coarse per-piece fwd/bwd timing of the MAE JointEncoder on chip.

Pieces (each one whole jitted graph, production freeze applied):

    cam1    camera forward1 (stem+stage0 frozen, stage1 trainable)
    cam12   + camera forward2 (stages 2..3)
    lidar   lidar full stack on a synthetic fused (B,32,1024,193) input

profile_train.py's "encoder" section = cam1 + interact + lidar + cam2;
diffs here bound each piece's share.

    python tools/profile_enc.py [batch_size] [iters]

NEVER run concurrently with another TPU process.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _sync_scalar(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def timeit(compiled, args, iters):
    _sync_scalar(compiled(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    _sync_scalar(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    import bench
    from efficient_multimodal_perception_tpu.configs import get_config
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model
    from efficient_multimodal_perception_tpu.train.trainer import (
        freeze_mask,
        frozen_stage_tokens,
    )

    cfg = get_config("triplane_range_cam")
    cfg["model"]["dtype"] = jnp.bfloat16
    model = build_model(cfg["model"])
    batch = synthetic_batch(
        B, with_occ=False, point_budget=cfg["data"]["point_budget"], seed=0
    )
    rng_names = ("sample", "droppath")
    state, _ = bench._make_train_state(cfg, model, batch, rng_names,
                                       frozen=True)
    state = jax.device_put(state, jax.devices()[0])
    batch = bench._device_batch(batch)
    rng = jax.random.key(0)

    freeze = tuple(cfg["model_init"].get("freeze", ())) + (
        frozen_stage_tokens(cfg["model"])
    )

    def stopped(params):
        trainable = freeze_mask(params, freeze)
        return jax.tree.map(
            lambda p, t: p if t else jax.lax.stop_gradient(p),
            params, trainable,
        )

    def rngs_of(rng):
        return {n: jax.random.fold_in(rng, i)
                for i, n in enumerate(rng_names)}

    Bn, N, H, W, _ = batch.img.shape
    img_flat = batch.img.reshape(Bn * N, H, W, 3)
    fused = jnp.zeros((B, 32, 1024, 193), jnp.bfloat16) + 0.1

    def cam1(params, rng):
        params = stopped(params)

        def run(m):
            mid = m.encoder_net.camera_net.forward1(
                img_flat, deterministic=False
            )
            return jnp.sum(mid.astype(jnp.float32))

        return model.apply({"params": params}, rngs=rngs_of(rng), method=run)

    def cam12(params, rng):
        params = stopped(params)

        def run(m):
            mid = m.encoder_net.camera_net.forward1(
                img_flat, deterministic=False
            )
            out = m.encoder_net.camera_net.forward2(
                mid, deterministic=False
            )
            return jnp.sum(out.astype(jnp.float32))

        return model.apply({"params": params}, rngs=rngs_of(rng), method=run)

    def lidar(params, rng):
        params = stopped(params)

        def run(m):
            out = m.encoder_net.lidar_net(fused, deterministic=False)
            return jnp.sum(out.astype(jnp.float32))

        return model.apply({"params": params}, rngs=rngs_of(rng), method=run)

    rows = {}
    for name, f in (("cam1", cam1), ("cam12", cam12), ("lidar", lidar)):
        jf = jax.jit(f)
        jg = jax.jit(lambda p, r, f=f: jax.value_and_grad(f)(p, r))
        for tag, fn in ((name + " fwd", jf), (name + " grad", jg)):
            compiled = fn.lower(state.params, rng).compile()
            dt = timeit(compiled, (state.params, rng), iters)
            rows[tag] = dt
            print(f"{tag:12s} {dt * 1e3:8.2f} ms", flush=True)

    print("\n--- pieces (ms) ---")
    c1f, c1g = rows["cam1 fwd"], rows["cam1 grad"]
    c2f, c2g = rows["cam12 fwd"], rows["cam12 grad"]
    lf, lg = rows["lidar fwd"], rows["lidar grad"]
    ms = 1e3
    print(f"camera fwd1   fwd {c1f*ms:7.2f}  fwd+bwd {c1g*ms:7.2f}")
    print(f"camera fwd2   fwd {(c2f-c1f)*ms:7.2f}  fwd+bwd {(c2g-c1g)*ms:7.2f}")
    print(f"lidar full    fwd {lf*ms:7.2f}  fwd+bwd {lg*ms:7.2f}")


if __name__ == "__main__":
    main()
