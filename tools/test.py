#!/usr/bin/env python
"""Evaluation entry point.

Mirrors ``/root/reference/tools/test.py:19-101`` +
``mmdet3d/apis/test.py:4-76``:

    python tools/test.py <config> --checkpoint CKPT --data-root DIR \
        [--show-dir DIR] [--synthetic] [--num-samples N] [--batch-size B]

For occupancy configs prints mean CE + per-class IoU / mIoU with the
reference's exact metric (``triplane_occ.py:468-500`` aggregated as in
``apis/test.py:44-74``); for elevation configs prints masked MSE.

Unlike the reference (strictly B=1 on one GPU, ``tools/test.py:182``),
eval batches default to ``n_devices`` samples sharded over the data
mesh; per-sample scores are computed in-jit so the aggregation is
bit-identical to B=1 (see ``train/evaluator.py``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor an explicit CPU request over the axon sitecustomize's forced
# jax_platforms="axon,cpu" (see tools/train.py / tests/conftest.py).
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a triplane model")
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--data-root", default=None)
    p.add_argument("--show-dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument(
        "--bf16", action="store_true",
        help="bf16 compute (fast path incl. fused kernels); default f32 "
        "for metric parity",
    )
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument(
        "--batch-size", type=int, default=None,
        help="eval batch size, sharded over the data mesh "
        "(default: n_devices)",
    )
    p.add_argument("--cfg-options", nargs="*", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficient_multimodal_perception_tpu.configs import (
        apply_overrides,
        get_config,
    )
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model
    from efficient_multimodal_perception_tpu.parallel.mesh import make_mesh
    from efficient_multimodal_perception_tpu.train import checkpoint as ckpt
    from efficient_multimodal_perception_tpu.train.evaluator import evaluate

    cfg = get_config(args.config)
    apply_overrides(cfg, args.cfg_options)
    if args.data_root:
        cfg["data"]["data_root"] = args.data_root
    if args.bf16:
        cfg["model"]["dtype"] = jnp.bfloat16

    model = build_model(cfg["model"])
    data_cfg = cfg["data"]
    model_type = cfg["model"]["type"]
    is_occ = model_type in ("TriplaneOcc", "PointTriplaneOcc")
    needs = dict(
        with_occ=data_cfg.get("load_occ", False),
        with_elev=data_cfg.get("load_elev", False),
    )

    mesh = make_mesh()
    bs = args.batch_size or mesh.devices.size

    if args.synthetic:
        n = args.num_samples or 8
        dataset = None

        def single(i):
            return synthetic_batch(
                1, point_budget=data_cfg["point_budget"], seed=i, **needs
            )

        def batches(size):
            for i in range(0, n - size + 1, size):
                singles = [single(i + j) for j in range(size)]
                yield jax.tree.map(
                    lambda *ls: jnp.concatenate(
                        [jnp.asarray(x) for x in ls], axis=0
                    ),
                    *singles,
                )

    else:
        from efficient_multimodal_perception_tpu.data.nuscenes import (
            NuScenesDataset,
        )

        dataset = NuScenesDataset(data_cfg, split="val")
        n = args.num_samples or len(dataset)

        def single(i):
            return jax.tree.map(jnp.asarray, dataset.batch([i]))

        def batches(size):
            for i in range(0, n - size + 1, size):
                yield jax.tree.map(
                    jnp.asarray, dataset.batch(list(range(i, i + size)))
                )

    example = next(iter(batches(bs)))
    rngs = {
        "params": jax.random.key(0),
        "sample": jax.random.key(1),
        "droppath": jax.random.key(2),
    }
    variables = jax.jit(
        lambda b: model.init(rngs, b, deterministic=True)
    )(example)
    if args.checkpoint:
        src = ckpt.restore_params_only(args.checkpoint)
        src_params = src.get("params", src)
        merged, n_ok, n_all = ckpt.partial_load(variables["params"], src_params)
        variables = dict(variables, params=merged)
        print(f"loaded checkpoint: {n_ok}/{n_all} tensors")

    num_classes = cfg["model"]["decoder"]["num_classes"] if is_occ else 0
    class_names = cfg["model"].get("class_names") or ()

    metrics = evaluate(
        model,
        variables,
        batches(bs),
        model_type,
        num_classes=num_classes,
        class_names=class_names,
        mesh=mesh,
    )
    if is_occ:
        print(f"CE: {metrics['ce']:.4f}")
        print(f"IoU (geometry): {metrics['iou']:.4f}")
        for name in class_names:
            if f"iou_{name}" in metrics:
                print(f"  {name}: {metrics[f'iou_{name}']:.4f}")
        print(f"mIoU: {metrics['miou']:.4f}")
    elif model_type == "TriplaneElev":
        print(f"elevation MSE: {metrics['mse']:.4f}")
    else:
        print(f"mean loss: {metrics['val_loss']:.4f}")

    if args.show_dir:
        _dump_visualizations(
            args, cfg, model, variables, single, n, model_type
        )


def _dump_visualizations(args, cfg, model, variables, single, n, model_type):
    """Per-sample artifact dumps (``apis/test.py:33-35`` show path):
    occ pred/gt npz + PCA triplanes, MAE reconstruction grids."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efficient_multimodal_perception_tpu.utils import visualization as viz

    is_occ = model_type in ("TriplaneOcc", "PointTriplaneOcc")
    fwd = jax.jit(
        lambda v, b: model.apply(
            v, b, deterministic=True, rngs={"sample": jax.random.key(1)}
        )
    )
    tri_fn = jax.jit(lambda v, b: model.apply(v, b, method="triplane"))
    rec_fn = jax.jit(
        lambda v, b: model.apply(
            v, b, method="reconstructions",
            rngs={"sample": jax.random.key(1)},
        )
    )

    limit = min(n, 100 if is_occ else 20)
    for i in range(limit):
        b = single(i)
        if is_occ:
            logits, occ, _ = fwd(variables, b)
            pred = jnp.argmax(logits, -1)
            viz.save_occupancy_npz(
                np.asarray(pred[0]), np.asarray(occ[0]),
                np.asarray(b.range_points[0])
                if b.range_points is not None
                else np.zeros((0, 3)),
                args.show_dir, i,
            )
            if model_type == "TriplaneOcc":
                tri = tri_fn(variables, b)
                viz.save_triplane_pca(np.asarray(tri[0]), args.show_dir, i)
        elif model_type == "TriplaneMAE":
            rec = rec_fn(variables, b)
            if "cam_recon" in rec:
                N = b.img.shape[1]
                viz.save_image_grid(
                    np.asarray(b.img[0]),
                    np.asarray(rec["cam_recon"][:N]),
                    np.ones((*b.img.shape[2:4], 1))[None].repeat(N, 0),
                    args.show_dir, i,
                )
            if "range_recon" in rec:
                viz.save_range_grid(
                    np.asarray(b.range_image[0]),
                    np.asarray(rec["range_recon"][0]),
                    np.ones_like(np.asarray(b.range_image[0])),
                    args.show_dir, i,
                )
                viz.save_reprojected_points(
                    np.asarray(b.range_points[0]),
                    np.asarray(rec["range_recon"][0]),
                    np.ones_like(np.asarray(b.range_image[0])),
                    args.show_dir, i,
                )
            viz.save_triplane_pca(
                np.asarray(rec["triplane"][0]), args.show_dir, i
            )


if __name__ == "__main__":
    main()
