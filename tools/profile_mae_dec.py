#!/usr/bin/env python
"""Section profile INSIDE the MAE decoders+loss region.

profile_train.py showed decoders+loss = 30 ms fwd / 51 ms bwd at
range_cam B=2 — the second-largest step component.  This times nested
prefixes of that region (each one whole jitted graph, hard-synced):

    base      encode_triplane
    +sample   + range_proj (fused Pallas sampler over 32k range pixels)
    +scatter  + camera canvases (flat winner scatter, 12x(256,512,32))
    +camdec   + camera MiT head forward
    +camloss  + camera patch-MSE
    full      + lidar decoder + its loss  (== the whole loss)

    python tools/profile_mae_dec.py [batch_size] [iters]

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
    from efficient_multimodal_perception_tpu.models.triplane_mae import (
        _scatter_points_to_cameras,
    )
    from efficient_multimodal_perception_tpu.ops.pallas_kernels import (
        sample_triplane_auto,
    )
    from efficient_multimodal_perception_tpu.train.trainer import (
        freeze_mask,
        frozen_stage_tokens,
        total_loss,
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

    pc_range = tuple(cfg["model"]["pc_range"])
    voxel = tuple(cfg["model"]["voxel_size"])

    def stage(params, batch, rng, upto):
        params = stopped(params)

        def run(m):
            tri, aux = m.encode_triplane(batch, deterministic=False)
            acc = jnp.sum(tri.astype(jnp.float32))
            if upto == "base":
                return acc
            range_proj = sample_triplane_auto(
                tri, aux["range_points"], pc_range, voxel
            )
            acc = jnp.sum(range_proj.astype(jnp.float32))
            if upto == "sample":
                return acc
            Bn, N, H, W, _ = batch.img.shape
            C = range_proj.shape[-1]
            scat = _scatter_points_to_cameras(
                aux["rc_coors"], range_proj.reshape(Bn, -1, C), N, H, W
            )
            acc = jnp.sum(scat.astype(jnp.float32))
            if upto == "scatter":
                return acc
            pred = m.camera_dec(scat)
            acc = jnp.sum(pred.astype(jnp.float32))
            if upto == "camdec":
                return acc
            img = batch.img.reshape(Bn * N, H, W, 3)
            ones = jnp.ones_like(img)
            acc = m.camera_dec.forward_loss(img, pred, ones)
            if upto == "camloss":
                return acc
            raise ValueError(upto)

        return model.apply(
            {"params": params}, rngs=rngs_of(rng), method=run
        )

    def loss_full(params, batch, rng):
        params = stopped(params)
        losses = model.apply(
            {"params": params}, batch,
            deterministic=False, rngs=rngs_of(rng),
        )
        if isinstance(losses, tuple):
            losses = losses[-1]
        return total_loss(losses)

    names = ["base", "sample", "scatter", "camdec", "camloss"]
    rows = {}
    for name in names:
        f = jax.jit(lambda p, b, r, n=name: stage(p, b, r, n))
        fg = jax.jit(
            lambda p, b, r, n=name: jax.value_and_grad(
                lambda pp: stage(pp, b, r, n)
            )(p)
        )
        for tag, fn in ((name + " fwd", f), (name + " grad", fg)):
            compiled = fn.lower(state.params, batch, rng).compile()
            dt = timeit(compiled, (state.params, batch, rng), iters)
            rows[tag] = dt
            print(f"{tag:16s} {dt * 1e3:8.2f} ms", flush=True)

    for tag, fn in (
        ("full fwd", jax.jit(loss_full)),
        ("full grad", jax.jit(
            lambda p, b, r: jax.value_and_grad(loss_full)(p, b, r))),
    ):
        compiled = fn.lower(state.params, batch, rng).compile()
        dt = timeit(compiled, (state.params, batch, rng), iters)
        rows[tag] = dt
        print(f"{tag:16s} {dt * 1e3:8.2f} ms", flush=True)

    print("\n--- diffs (ms): cost of each added piece ---")
    prev_f, prev_g = rows["base fwd"], rows["base grad"]
    for name in names[1:] + ["full"]:
        f, g = rows[name + " fwd"], rows[name + " grad"]
        print(f"{name:10s} fwd {(f - prev_f) * 1e3:7.2f}   "
              f"fwd+bwd {(g - prev_g) * 1e3:7.2f}")
        prev_f, prev_g = f, g


if __name__ == "__main__":
    main()
