#!/usr/bin/env python
"""Per-section fwd/bwd timing of a train step on the chip.

Times nested prefixes of the train graph (encoder -> +neck -> +losses ->
+optimizer), each as ONE jitted graph hard-synced through a scalar host
transfer, then reports the diffs:

    encoder        fwd / bwd
    neck           (encode_triplane - encoder)
    decoders+loss  (full loss - encode_triplane)
    optimizer      (train step - full grad)

This is the methodology behind the r3 perf ledger's MAE section profile
(CLAUDE.md).  Per-op micro-benches through the axon tunnel are
dispatch-dominated and useless; whole-graph diffs like these are the
only trustworthy section numbers.

    python tools/profile_train.py [config] [batch_size] [iters] [--fused]

NEVER run concurrently with another TPU process.
"""

from __future__ import annotations

import argparse
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
    out = compiled(*args)  # warmup
    _sync_scalar(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    _sync_scalar(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default="triplane_range_cam")
    p.add_argument("batch_size", nargs="?", type=int, default=1)
    p.add_argument("iters", nargs="?", type=int, default=20)
    p.add_argument("--fused", action="store_true",
                   help="fused flat AdamW in the optimizer sections")
    p.add_argument("--unfrozen", action="store_true",
                   help="grad ALL params (default matches production: "
                        "model_init.freeze + frozen_stages stop_grads)")
    args = p.parse_args()

    import bench
    from efficient_multimodal_perception_tpu.configs import get_config
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model
    from efficient_multimodal_perception_tpu.train.trainer import (
        total_loss,
    )

    cfg = get_config(args.config)
    cfg["model"]["dtype"] = jnp.bfloat16
    cfg["optimizer"]["fused"] = args.fused
    model = build_model(cfg["model"])
    batch = synthetic_batch(
        args.batch_size,
        with_occ=cfg["model"]["type"] == "TriplaneOcc",
        point_budget=cfg["data"]["point_budget"],
        seed=0,
    )
    rng_names = ("sample", "droppath")
    state, step_fn = bench._make_train_state(
        cfg, model, batch, rng_names, frozen=not args.unfrozen
    )

    from efficient_multimodal_perception_tpu.train.trainer import (
        freeze_mask, frozen_stage_tokens,
    )
    freeze = ()
    if not args.unfrozen:
        freeze = tuple(cfg["model_init"].get("freeze", ())) + (
            frozen_stage_tokens(cfg["model"])
        )

    def stopped(params):
        """stop_gradient on frozen params — same masking the production
        train step applies (trainer.make_train_step), so section grads
        measure what production actually computes."""
        if not freeze:
            return params
        trainable = freeze_mask(params, freeze)
        return jax.tree.map(
            lambda p, t: p if t else jax.lax.stop_gradient(p),
            params, trainable,
        )
    # params are re-passed to every compiled call below — they must be
    # committed on-device or each call re-uploads them (see
    # bench._cpu_init docstring)
    state = jax.device_put(state, jax.devices()[0])
    batch = bench._device_batch(batch)
    rng = jax.random.key(0)

    def rngs_of(rng):
        return {n: jax.random.fold_in(rng, i)
                for i, n in enumerate(rng_names)}

    def leaf_sum(tree):
        return sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        )

    # --- nested prefix functions -------------------------------------
    def enc_only(params, batch, rng):
        params = stopped(params)
        out = model.apply(
            {"params": params},
            batch.img, batch.range_image, batch.range_points,
            batch.lidar2img, batch.cam_aug,
            rngs=rngs_of(rng),
            method=lambda m, *a: m.encoder_net(*a, deterministic=False),
        )
        return leaf_sum(out)

    def tri_only(params, batch, rng):
        params = stopped(params)
        tri, _ = model.apply(
            {"params": params}, batch,
            deterministic=False, rngs=rngs_of(rng),
            method="encode_triplane",
        )
        return jnp.sum(tri.astype(jnp.float32))

    def loss_full(params, batch, rng):
        params = stopped(params)
        losses = model.apply(
            {"params": params}, batch,
            deterministic=False, rngs=rngs_of(rng),
        )
        if isinstance(losses, tuple):
            losses = losses[-1]
        return total_loss(losses)

    sections = []
    for name, f in (
        ("encoder", enc_only),
        ("enc+neck", tri_only),
        ("full loss", loss_full),
    ):
        sections.append((name + " fwd", jax.jit(f)))
        sections.append((
            name + " grad",
            jax.jit(lambda p, b, r, f=f: jax.value_and_grad(f)(p, b, r)),
        ))

    rows = {}
    for name, f in sections:
        compiled = f.lower(state.params, batch, rng).compile()
        dt = timeit(compiled, (state.params, batch, rng), args.iters)
        rows[name] = dt
        print(f"{name:16s} {dt * 1e3:8.2f} ms", flush=True)

    # full train step (grad + optimizer), non-donated for re-timing
    import dataclasses
    step_nd = None
    try:
        from efficient_multimodal_perception_tpu.train.trainer import (
            make_optimizer, make_train_step,
        )
        optimizer = make_optimizer(cfg, 1000, state.params, freeze)
        step_nd = make_train_step(model, optimizer, rng_names,
                                  freeze_prefixes=freeze, donate=False)
        compiled = step_nd.lower(state, batch, rng).compile()

        def run_step(s, b, r):
            ns, logs = compiled(s, b, r)
            return logs

        out = compiled(state, batch, rng)
        _sync_scalar(out[1]["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = compiled(state, batch, rng)
        _sync_scalar(out[1]["loss"])
        rows["train step"] = (time.perf_counter() - t0) / args.iters
        print(f"{'train step':16s} {rows['train step'] * 1e3:8.2f} ms",
              flush=True)
    except Exception as e:
        print(f"train step failed: {e}")

    print("\n--- section diffs (ms) ---")
    enc_f, enc_g = rows["encoder fwd"], rows["encoder grad"]
    tri_f, tri_g = rows["enc+neck fwd"], rows["enc+neck grad"]
    los_f, los_g = rows["full loss fwd"], rows["full loss grad"]
    ms = 1e3
    print(f"encoder        fwd {enc_f*ms:7.2f}  fwd+bwd {enc_g*ms:7.2f}")
    print(f"neck           fwd {(tri_f-enc_f)*ms:7.2f}  "
          f"fwd+bwd {(tri_g-enc_g)*ms:7.2f}")
    print(f"decoders+loss  fwd {(los_f-tri_f)*ms:7.2f}  "
          f"fwd+bwd {(los_g-tri_g)*ms:7.2f}")
    if "train step" in rows:
        print(f"optimizer          {(rows['train step']-los_g)*ms:7.2f}")
        bs = args.batch_size
        print(f"\nstep {rows['train step']*ms:.1f} ms -> "
              f"{bs/rows['train step']:.2f} samples/s")


if __name__ == "__main__":
    main()
