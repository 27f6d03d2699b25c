#!/usr/bin/env python
"""Per-section timing of the point_triplane_occ inference path.

VERDICT r3 Weak #2: the point family's hot path (the projector,
``ops/scatter.point_axis_pools`` — the spconv replacement, reference
``point_triplane_projector.py:66-117``) had never been timed on chip.
Sections (each jitted separately, hard-synced via a scalar host pull):

    cam        camera ConvNeXt on (B*6, 256, 512, 3)
    voxelize   point -> voxel indices
    p2c        per-point camera-feature gather (point_to_cam)
    projector  point MLPs + the three axis-pool scatters -> tpv planes
    triplane   3x triplane ConvNeXt (all scales)
    fpn        3x GeneralizedLSSFPN
    readout    packed grid sample + block-diag occ head
    full       the whole forward (sum != parts => dispatch overhead)

    python tools/profile_point.py [batch_size] [iters]

``--train`` (VERDICT r4 #3) instead profiles the TRAIN step by nested
prefixes of the step graph (cam -> +tpv -> +planes -> full loss ->
train step), each fwd and fwd+bwd, streamed one compile at a time —
section = diff of consecutive prefixes, the only trustworthy chip
sectioning (see tools/profile_train.py docstring).

    python tools/profile_point.py 2 20 --train [--unfrozen]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor an explicit CPU request over the axon sitecustomize (tools/train.py)
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

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


def profile_train(B: int, iters: int, unfrozen: bool = False):
    import bench
    from efficient_multimodal_perception_tpu.configs import get_config
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model
    from efficient_multimodal_perception_tpu.models.point_family import (
        point_to_cam,
        voxelize_points,
    )
    from efficient_multimodal_perception_tpu.train.trainer import (
        freeze_mask,
        frozen_stage_tokens,
        total_loss,
    )

    cfg = get_config("point_triplane_occ")
    cfg["model"]["dtype"] = jnp.bfloat16
    model = build_model(cfg["model"])
    batch = synthetic_batch(
        B, with_occ=True, point_budget=cfg["data"]["point_budget"], seed=0
    )
    rng_names = ("sample", "droppath")
    state, step_fn = bench._make_train_state(
        cfg, model, batch, rng_names, frozen=not unfrozen
    )
    freeze = ()
    if not unfrozen:
        freeze = tuple(cfg["model_init"].get("freeze", ())) + (
            frozen_stage_tokens(cfg["model"])
        )

    def stopped(params):
        if not freeze:
            return params
        trainable = freeze_mask(params, freeze)
        return jax.tree.map(
            lambda p, t: p if t else jax.lax.stop_gradient(p),
            params, trainable,
        )

    def apply_m(params, rng, method, *margs, **mkw):
        """model.apply with the production train-time collections: the
        projector's BN needs batch_stats mutable (trainer.loss_fn)."""
        variables = {"params": stopped(params)}
        mutable = []
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        out = model.apply(
            variables, *margs, rngs=rngs_of(rng), mutable=mutable,
            method=method, **mkw,
        )
        return out[0] if mutable else out

    state = jax.device_put(state, jax.devices()[0])
    batch = bench._device_batch(batch)
    rng = jax.random.key(0)

    def rngs_of(rng):
        return {n: jax.random.fold_in(rng, i)
                for i, n in enumerate(rng_names)}

    mcfg = cfg["model"]
    tri_range = tuple(mcfg["triplane_range"])
    tri_vox = tuple(mcfg["triplane_voxel_size"])

    def leaf_sum(tree):
        return sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        )

    # --- nested prefixes of PointTriplaneOcc.__call__ -----------------
    def cam_only(params, batch, rng):
        Bv, N, H, W, _ = batch.img.shape
        out = apply_m(
            params, rng,
            lambda m, x: m.camera_net(x, deterministic=False),
            batch.img.reshape(Bv * N, H, W, 3),
        )
        return leaf_sum(out)

    def tpv_prefix(params, batch, rng):
        Bv, N, H, W, _ = batch.img.shape

        def fwd(m, b):
            grid_idx, valid = voxelize_points(
                b.points, b.points_valid, tri_range, tri_vox
            )
            feats = m.camera_net(
                b.img.reshape(Bv * N, H, W, 3), deterministic=False
            )
            feats = feats.reshape(Bv, N, *feats.shape[1:])
            cam_pt = point_to_cam(
                b.points, valid, feats, b.lidar2img, b.cam_aug, (H, W)
            )
            return m.projector(
                b.points, grid_idx, valid, cam_pt, train=True
            )

        return leaf_sum(apply_m(params, rng, fwd, batch))

    def planes_prefix(params, batch, rng):
        Bv, N, H, W, _ = batch.img.shape

        def fwd(m, b):
            grid_idx, valid = voxelize_points(
                b.points, b.points_valid, tri_range, tri_vox
            )
            feats = m.camera_net(
                b.img.reshape(Bv * N, H, W, 3), deterministic=False
            )
            feats = feats.reshape(Bv, N, *feats.shape[1:])
            cam_pt = point_to_cam(
                b.points, valid, feats, b.lidar2img, b.cam_aug, (H, W)
            )
            tpv = m.projector(
                b.points, grid_idx, valid, cam_pt, train=True
            )
            return [
                m.fpn_net(m.triplane_net(t, deterministic=False),
                          train=True)
                for t in tpv
            ]

        return leaf_sum(apply_m(params, rng, fwd, batch))

    def loss_full(params, batch, rng):
        _, _, losses = apply_m(
            params, rng, None, batch, deterministic=False
        )
        return total_loss(losses)

    rows = {}
    for name, f in (
        ("cam", cam_only),
        ("+tpv", tpv_prefix),
        ("+planes", planes_prefix),
        ("full loss", loss_full),
    ):
        for kind, jf in (
            ("fwd", jax.jit(f)),
            ("grad", jax.jit(
                lambda p, b, r, f=f: jax.value_and_grad(f)(p, b, r)
            )),
        ):
            key = f"{name} {kind}"
            try:
                compiled = jf.lower(state.params, batch, rng).compile()
                out = compiled(state.params, batch, rng)  # warmup
                np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = compiled(state.params, batch, rng)
                np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
                rows[key] = (time.perf_counter() - t0) / iters
                print(f"{key:16s} {rows[key]*1e3:8.2f} ms", flush=True)
            except Exception as e:
                print(f"{key:16s} ERROR {type(e).__name__}: {e}"[:300],
                      flush=True)

    # full train step (non-donated so it can be re-timed)
    try:
        from efficient_multimodal_perception_tpu.train.trainer import (
            make_optimizer, make_train_step,
        )
        optimizer = make_optimizer(cfg, 1000, state.params, freeze)
        step_nd = make_train_step(model, optimizer, rng_names,
                                  freeze_prefixes=freeze, donate=False)
        compiled = step_nd.lower(state, batch, rng).compile()
        out = compiled(state, batch, rng)
        np.asarray(out[1]["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(state, batch, rng)
        np.asarray(out[1]["loss"])
        rows["train step"] = (time.perf_counter() - t0) / iters
        print(f"{'train step':16s} {rows['train step']*1e3:8.2f} ms",
              flush=True)
    except Exception as e:
        print(f"train step failed: {type(e).__name__}: {e}"[:500])

    if all(k in rows for k in
           ("cam grad", "+tpv grad", "+planes grad", "full loss grad")):
        ms = 1e3
        print("\n--- section diffs (fwd / fwd+bwd, ms) ---")
        print(f"camera     {rows['cam fwd']*ms:7.2f} "
              f"{rows['cam grad']*ms:7.2f}")
        print(f"proj+p2c   {(rows['+tpv fwd']-rows['cam fwd'])*ms:7.2f} "
              f"{(rows['+tpv grad']-rows['cam grad'])*ms:7.2f}")
        print(f"tri+fpn    {(rows['+planes fwd']-rows['+tpv fwd'])*ms:7.2f} "
              f"{(rows['+planes grad']-rows['+tpv grad'])*ms:7.2f}")
        print(f"readout+CE {(rows['full loss fwd']-rows['+planes fwd'])*ms:7.2f} "
              f"{(rows['full loss grad']-rows['+planes grad'])*ms:7.2f}")
        if "train step" in rows:
            print(f"optimizer  "
                  f"{(rows['train step']-rows['full loss grad'])*ms:7.2f}")
            print(f"\nstep {rows['train step']*ms:.1f} ms -> "
                  f"{B/rows['train step']:.2f} samples/s")


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(argv[0]) if len(argv) > 0 else 8
    iters = int(argv[1]) if len(argv) > 1 else 20
    if "--train" in sys.argv:
        profile_train(B, iters, unfrozen="--unfrozen" in sys.argv)
        return

    from efficient_multimodal_perception_tpu.configs import get_config
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model
    from efficient_multimodal_perception_tpu.models.point_family import (
        point_to_cam,
        voxelize_points,
    )

    cfg = get_config("point_triplane_occ")
    cfg["model"]["dtype"] = jnp.bfloat16
    model = build_model(cfg["model"])
    batch = synthetic_batch(
        B, with_occ=False, point_budget=cfg["data"]["point_budget"], seed=0
    )
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b)
    )(batch)

    mcfg = cfg["model"]
    tri_range = tuple(mcfg["triplane_range"])
    tri_vox = tuple(mcfg["triplane_voxel_size"])

    # ---- section functions ----
    def full(v, b):
        logits, _, _ = model.apply(v, b, deterministic=True)
        return logits.sum()

    def cam_fn(v, imgs):
        return model.apply(
            v, imgs, method=lambda m, x: m.camera_net(x, deterministic=True)
        ).sum()

    def vox_fn(b):
        gi, val = voxelize_points(
            b.points, b.points_valid, tri_range, tri_vox
        )
        return gi.sum() + val.sum()

    def p2c_fn(v, b, img_feats, valid):
        return point_to_cam(
            b.points, valid, img_feats, b.lidar2img, b.cam_aug,
            b.img.shape[2:4],
        ).sum()

    def proj_fn(v, b, grid_idx, valid, cam_pt):
        tpv = model.apply(
            v, b.points, grid_idx, valid, cam_pt,
            method=lambda m, *a: m.projector(*a, train=False),
        )
        return sum(t.sum() for t in tpv)

    def tri_fn(v, tpv):
        outs = []
        for t in tpv:
            outs.append(model.apply(
                v, t,
                method=lambda m, x: m.triplane_net(x, deterministic=True),
            ))
        return sum(jax.tree_util.tree_leaves(o)[0].sum() for o in outs)

    def fpn_fn(v, scale_lists):
        outs = []
        for scales in scale_lists:
            outs.append(model.apply(
                v, scales, method=lambda m, s: m.fpn_net(s, train=False)
            ))
        return sum(o.sum() for o in outs)

    def readout_fn(v, planes):
        from efficient_multimodal_perception_tpu.ops.sampling import (
            sample_triplane_list_grid_packed,
        )

        m = model.bind(v)
        ref = m.ref_3d
        Z = ref.shape[2]
        packed = sample_triplane_list_grid_packed(
            planes, ref[:, 0, 0, 0], ref[0, :, 0, 1], ref[0, 0, :, 2],
            tri_range, tuple(mcfg["point_triplane_projector"]["grid_size"]),
            tri_vox,
        )
        return m.decoder_net(packed, packed_z=Z).sum()

    # ---- stream sections: each intermediate lives only while its
    # consumer section is timed.  Holding them ALL resident at once
    # (6B camera maps of (256,512,C) + tpv + pyramids + planes) OOMs
    # the 16 GB HBM at B=8.
    total = 0.0

    def run(name, fn, *args):
        nonlocal total
        try:
            dt = timeit(jax.jit(fn), *args, iters=iters)
        except Exception as e:
            print(f"{name:10s} ERROR {type(e).__name__}: {e}"[:300],
                  flush=True)
            return
        total += dt
        print(f"{name:10s} {dt*1e3:8.2f} ms", flush=True)

    imgs = jnp.reshape(batch.img, (-1, *batch.img.shape[2:]))
    run("cam", cam_fn, variables, imgs)
    img_feats = jax.jit(
        lambda v, x: model.apply(
            v, x, method=lambda m, xx: m.camera_net(xx, deterministic=True)
        )
    )(variables, imgs)
    img_feats_b = img_feats.reshape(B, 6, *img_feats.shape[1:])
    del img_feats

    run("voxelize", vox_fn, batch)
    grid_idx, valid = jax.jit(
        lambda b: voxelize_points(b.points, b.points_valid, tri_range,
                                  tri_vox)
    )(batch)

    run("p2c", p2c_fn, variables, batch, img_feats_b, valid)
    cam_pt = jax.jit(
        lambda v, b, f, val: point_to_cam(
            b.points, val, f, b.lidar2img, b.cam_aug, b.img.shape[2:4]
        )
    )(variables, batch, img_feats_b, valid)
    del img_feats_b

    run("projector", proj_fn, variables, batch, grid_idx, valid, cam_pt)
    tpv = jax.jit(
        lambda v, b, gi, val, cp: model.apply(
            v, b.points, gi, val, cp,
            method=lambda m, *a: m.projector(*a, train=False),
        )
    )(variables, batch, grid_idx, valid, cam_pt)
    del grid_idx, valid, cam_pt

    run("triplane", tri_fn, variables, tpv)
    scale_lists = jax.jit(
        lambda v, ts: [
            model.apply(
                v, t,
                method=lambda m, x: m.triplane_net(x, deterministic=True),
            )
            for t in ts
        ]
    )(variables, tpv)
    del tpv

    run("fpn", fpn_fn, variables, scale_lists)
    planes = jax.jit(
        lambda v, sl: [
            model.apply(v, s, method=lambda m, ss: m.fpn_net(ss,
                                                             train=False))
            for s in sl
        ]
    )(variables, scale_lists)
    del scale_lists

    run("readout", readout_fn, variables, planes)
    del planes

    print(f"{'sum':10s} {total*1e3:8.2f} ms (sections only)", flush=True)
    run("full", full, variables, batch)


if __name__ == "__main__":
    main()
