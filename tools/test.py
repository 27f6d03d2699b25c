#!/usr/bin/env python
"""Evaluation entry point.

Mirrors ``/root/reference/tools/test.py:19-101`` +
``mmdet3d/apis/test.py:4-76``:

    python tools/test.py <config> --checkpoint CKPT --data-root DIR \
        [--show-dir DIR] [--synthetic] [--num-samples N]

For occupancy configs prints mean CE + per-class IoU / mIoU with the
reference's exact metric (``triplane_occ.py:468-500`` aggregated as in
``apis/test.py:44-74``); for elevation configs prints masked MSE.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from efficient_multimodal_perception_tpu.train import checkpoint as ckpt
    from efficient_multimodal_perception_tpu.train.metrics import (
        aggregate_iou,
        evaluation_semantic,
    )

    cfg = get_config(args.config)
    apply_overrides(cfg, args.cfg_options)
    if args.data_root:
        cfg["data"]["data_root"] = args.data_root
    if args.bf16:
        cfg["model"]["dtype"] = jnp.bfloat16

    model = build_model(cfg["model"])
    data_cfg = cfg["data"]
    is_occ = cfg["model"]["type"] in ("TriplaneOcc", "PointTriplaneOcc")
    is_elev = cfg["model"]["type"] == "TriplaneElev"
    needs = dict(
        with_occ=data_cfg.get("load_occ", False),
        with_elev=data_cfg.get("load_elev", False),
    )

    if args.synthetic:
        n = args.num_samples or 8

        def batches():
            for i in range(n):
                yield synthetic_batch(
                    1, point_budget=data_cfg["point_budget"], seed=i, **needs
                )

    else:
        from efficient_multimodal_perception_tpu.data.nuscenes import (
            NuScenesDataset,
        )

        dataset = NuScenesDataset(data_cfg, split="val")
        n = args.num_samples or len(dataset)

        def batches():
            for i in range(n):
                yield jax.tree.map(jnp.asarray, dataset.batch([i]))

    example = next(iter(batches()))
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

    fwd = jax.jit(
        lambda v, b: model.apply(
            v, b, deterministic=True, rngs={"sample": jax.random.key(1)}
        )
    )
    tri_fn = jax.jit(
        lambda v, b: model.apply(v, b, method="triplane")
    )
    rec_fn = jax.jit(
        lambda v, b: model.apply(
            v, b, method="reconstructions",
            rngs={"sample": jax.random.key(1)},
        )
    )

    num_classes = cfg["model"]["decoder"]["num_classes"] if is_occ else 0
    class_names = cfg["model"].get("class_names") or ()
    all_scores, all_ce, all_mse = [], [], []
    for i, b in enumerate(batches()):
        out = fwd(variables, b)
        if is_occ:
            logits, occ, losses = out
            pred = jnp.argmax(jax.nn.softmax(logits, -1), -1)
            all_scores.append(
                np.asarray(evaluation_semantic(pred, occ, num_classes))
            )
            all_ce.append(float(losses["loss"]))
            if args.show_dir and i < 100:
                from efficient_multimodal_perception_tpu.utils import (
                    visualization as viz,
                )

                viz.save_occupancy_npz(
                    np.asarray(pred[0]), np.asarray(occ[0]),
                    np.asarray(b.range_points[0])
                    if b.range_points is not None
                    else np.zeros((0, 3)),
                    args.show_dir, i,
                )
                if cfg["model"]["type"] == "TriplaneOcc":
                    tri = tri_fn(variables, b)
                    viz.save_triplane_pca(
                        np.asarray(tri[0]), args.show_dir, i
                    )
        elif is_elev:
            pred, losses = out
            all_mse.append(float(losses["loss"]))
        else:
            losses = out[-1] if isinstance(out, tuple) else out
            all_ce.append(
                float(sum(v for k, v in losses.items() if "loss" in k))
            )
            if (
                args.show_dir
                and i < 20
                and cfg["model"]["type"] == "TriplaneMAE"
            ):
                from efficient_multimodal_perception_tpu.utils import (
                    visualization as viz,
                )

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

    if is_occ:
        scores = np.concatenate(all_scores, axis=0)
        res = aggregate_iou(scores)
        print(f"CE: {np.mean(all_ce):.4f}")
        print(f"IoU (geometry): {res['iou']:.4f}")
        for name, v in zip(class_names, res["per_class"][1:]):
            print(f"  {name}: {v:.4f}")
        print(f"mIoU: {res['miou']:.4f}")
    elif is_elev:
        print(f"elevation MSE: {np.mean(all_mse):.4f}")
    else:
        print(f"mean loss: {np.mean(all_ce):.4f}")


if __name__ == "__main__":
    main()
