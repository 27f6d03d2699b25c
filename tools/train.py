#!/usr/bin/env python
"""Training entry point.

Mirrors the reference CLI (``/root/reference/tools/train.py:26-94``):

    python tools/train.py <config> --work-dir DIR --data-root DIR \
        [--resume-from CKPT] [--cfg-options k.sub=v ...] [--synthetic]

Differences by design: no ``--launcher`` (the data mesh spans all visible
TPU devices automatically; multi-host via ``jax.distributed.initialize``
when JAX_COORDINATOR is set), and ``--synthetic`` trains on generated
nuScenes-shaped data for smoke runs without the dataset.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-sets jax_platforms="axon,cpu", silently
# overriding a JAX_PLATFORMS=cpu env var (tests/conftest.py NOTE).  The
# CLIs honor an explicit CPU request so fixture/e2e subprocess runs are
# deterministic f32 CPU and never contend for the single-client TPU
# tunnel (a dead tunnel would hang them forever).
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser(description="Train a triplane model")
    p.add_argument("config", help="config name (e.g. triplane_occ)")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--data-root", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument(
        "--auto-resume", action="store_true",
        help="resume from the latest checkpoint in --work-dir, if any",
    )
    p.add_argument(
        "--remat", action="store_true",
        help="rematerialize activations in the backward pass "
        "(jax.checkpoint over the forward; trades ~1 forward of FLOPs "
        "for an activation-memory floor)",
    )
    p.add_argument(
        "--async-ckpt", action="store_true",
        help="commit checkpoints in a background thread (orbax "
        "AsyncCheckpointer); training continues while the host writes",
    )
    p.add_argument("--ckpt-path", default=None,
                   help="pretrained encoder checkpoint (partial load)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--profile", action="store_true",
        help="capture a jax.profiler trace of steps 5-10 into work_dir",
    )
    p.add_argument(
        "--debug-nans", action="store_true",
        help="enable jax nan-checking (SURVEY.md §5 sanitizer note)",
    )
    p.add_argument(
        "--eval-interval", type=int, default=0,
        help="run validation every N epochs (0 = never, the reference's "
        "pretraining default of interval=epochs+1)",
    )
    p.add_argument("--eval-samples", type=int, default=64)
    p.add_argument("--cfg-options", nargs="*", default=None)
    p.add_argument(
        "--fsdp", type=int, default=1,
        help="shard params + Adam moments over this many devices "
        "(ZeRO-3 over the data ranks; parallel/fsdp.py)",
    )
    p.add_argument(
        "--accum-steps", type=int, default=1,
        help="gradient accumulation micro-steps per optimizer update "
        "(DDP-averaging semantics; batch must divide)",
    )
    p.add_argument(
        "--tp", type=int, default=1,
        help="tensor-parallel size for the MiT neck (Megatron "
        "column/row rules over the 'model' mesh axis)",
    )
    p.add_argument(
        "--sp", action="store_true",
        help="sequence parallelism: shard the neck's token axis over "
        "the 'model' mesh axis in the LN/residual regions (requires "
        "--tp > 1)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    if os.environ.get("JAX_COORDINATOR"):
        import jax

        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from efficient_multimodal_perception_tpu.configs import (
        apply_overrides,
        get_config,
    )
    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model
    from efficient_multimodal_perception_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
    )
    from efficient_multimodal_perception_tpu.train import checkpoint as ckpt
    from efficient_multimodal_perception_tpu.train.trainer import (
        init_state,
        make_optimizer,
        make_train_step,
    )

    cfg = get_config(args.config)
    apply_overrides(cfg, args.cfg_options)
    if args.sp:
        neck = cfg["model"].get("neck") or {}
        if args.tp <= 1:
            raise SystemExit("--sp requires --tp > 1")
        if "MixVisionTransformer" not in neck.get("type", ""):
            raise SystemExit("--sp supports MixVisionTransformer necks only")
        neck["sp"] = True
    if args.data_root:
        cfg["data"]["data_root"] = args.data_root
    if args.ckpt_path:
        cfg["model_init"]["ckpt_path"] = args.ckpt_path

    os.makedirs(args.work_dir, exist_ok=True)
    with open(os.path.join(args.work_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2, default=str)

    if cfg.get("compute_dtype") == "bfloat16":
        cfg["model"]["dtype"] = jnp.bfloat16
    model = build_model(cfg["model"])
    rng_names = _rng_names(cfg)
    from efficient_multimodal_perception_tpu.utils.env import env_string

    print(env_string())
    if args.fsdp > 1 or args.tp > 1:
        from efficient_multimodal_perception_tpu.parallel.fsdp import (
            make_mesh_2d,
        )

        n_all = len(jax.devices())
        mesh = make_mesh_2d(
            data=n_all // (args.fsdp * args.tp),
            fsdp=args.fsdp,
            model=args.tp,
        )
    else:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    print(f"devices: {n_dev} ({jax.devices()[0].platform}) "
          f"mesh={dict(mesh.shape)}")

    data_cfg = cfg["data"]
    needs = dict(
        with_occ=data_cfg.get("load_occ", False),
        with_elev=data_cfg.get("load_elev", False),
    )
    # the model (TP) axis replicates the batch; only data×fsdp ranks
    # carry distinct samples
    batch_size = data_cfg["samples_per_device"] * (n_dev // args.tp)
    # per-host loading: each process materializes only its slice of the
    # global batch (DistributedSampler equivalent, reference
    # tools/train.py:141-148); shard_batch assembles the global array
    rank, world = jax.process_index(), jax.process_count()
    local_bs = batch_size // world

    if args.synthetic:
        def batches():
            i = 0
            while True:
                g = synthetic_batch(
                    batch_size,
                    point_budget=data_cfg["point_budget"],
                    seed=args.seed + i,
                    as_jax=False,
                    **needs,
                )
                yield jax.tree.map(
                    lambda x: x[rank * local_bs : (rank + 1) * local_bs], g
                )
                i += 1

        steps_per_epoch = 16
        batch_iter = batches()
    else:
        from efficient_multimodal_perception_tpu.data.nuscenes import (
            NuScenesDataset,
            epoch_batches,
        )

        dataset = NuScenesDataset(data_cfg, split="train", seed=args.seed)
        steps_per_epoch = len(dataset) // batch_size
        batch_iter = None  # per-epoch generators below

    total_steps = steps_per_epoch * cfg["epochs"]
    if args.max_steps:
        total_steps = min(total_steps, args.max_steps)

    example = (
        next(batch_iter)
        if args.synthetic
        else dataset.batch(
            list(range(rank * local_bs, (rank + 1) * local_bs))
        )
    )
    example = shard_batch(jax.tree.map(jnp.asarray, example), mesh)

    from efficient_multimodal_perception_tpu.train.trainer import (
        frozen_stage_tokens,
    )

    # model-level freeze (freeze_encoder) + per-stage frozen_stages
    # tokens (mask_convnext.py:339-350)
    freeze = tuple(cfg["model_init"].get("freeze", ())) + frozen_stage_tokens(
        cfg["model"]
    )
    with mesh:
        # two-phase: init params first, then optimizer (needs params for
        # the freeze mask)
        optimizer_probe = make_optimizer(cfg, total_steps, None, ())
        state = init_state(
            model, example, optimizer_probe, args.seed, rng_names
        )
        if cfg["model_init"].get("ckpt_path"):
            src = ckpt.restore_params_only(cfg["model_init"]["ckpt_path"])
            src_params = src.get("params", src)
            merged, n_ok, n_all = ckpt.partial_load(state.params, src_params)
            print(f"partial restore: adopted {n_ok}/{n_all} tensors")
            import dataclasses

            state = dataclasses.replace(state, params=merged)
            # imported torch checkpoints carry BN running stats
            # (point family); adopt them the same shape-tolerant way
            if src.get("batch_stats") and state.batch_stats:
                stats, s_ok, s_all = ckpt.partial_load(
                    state.batch_stats, src["batch_stats"]
                )
                print(f"batch_stats restore: adopted {s_ok}/{s_all}")
                state = dataclasses.replace(state, batch_stats=stats)
        import dataclasses as _dc

        optimizer = make_optimizer(cfg, total_steps, state.params, freeze)
        state = _dc.replace(state, opt_state=optimizer.init(state.params))
        resume_path = args.resume_from
        if not resume_path and args.auto_resume:
            resume_path = ckpt.latest_checkpoint(args.work_dir)
        if resume_path:
            state = ckpt.restore_checkpoint(resume_path, state)
            print(f"resumed from {resume_path} @ step {int(state.step)}")

        from efficient_multimodal_perception_tpu.utils.logging import (
            MetricLogger,
        )

        logger = MetricLogger(args.work_dir)
        shardings = None
        if args.fsdp > 1 or args.tp > 1:
            from efficient_multimodal_perception_tpu.parallel.fsdp import (
                shard_state,
            )

            state, shardings = shard_state(state, mesh)
        step_fn = make_train_step(
            model, optimizer, rng_names, state_shardings=shardings,
            accum_steps=args.accum_steps, remat=args.remat,
            freeze_prefixes=freeze,
        )
        rng = jax.random.key(args.seed)

        step = int(state.step)
        start_step = step
        log_every = cfg.get("log_interval", 50)
        t0 = time.time()
        epoch = step // max(steps_per_epoch, 1)
        while step < total_steps:
            it = (
                batch_iter
                if args.synthetic
                else epoch_batches(
                    dataset,
                    batch_size,
                    seed=args.seed + epoch,
                    process_index=rank,
                    process_count=world,
                )
            )
            for b in it:
                # shard_batch device_puts numpy leaves directly; a
                # jnp.asarray here would be a second host->device copy
                b = shard_batch(b, mesh)
                if args.profile and step == 5:
                    jax.profiler.start_trace(
                        os.path.join(args.work_dir, "profile")
                    )
                state, logs = step_fn(state, b, rng)
                step += 1
                if args.profile and step == 10:
                    jax.profiler.stop_trace()
                    print(
                        f"profile trace -> {args.work_dir}/profile",
                        flush=True,
                    )
                if step % log_every == 0 or step == 1:
                    logs = {k: float(v) for k, v in logs.items()}
                    logger.log(step, logs)
                    dt = time.time() - t0
                    print(
                        f"step {step}/{total_steps} "
                        f"({dt / max(step - start_step, 1):.2f}s/it) "
                        + " ".join(f"{k}={v:.4f}" for k, v in logs.items()),
                        flush=True,
                    )
                if step >= total_steps:
                    break
            epoch += 1
            if epoch % cfg["checkpoint"]["interval"] == 0 or step >= total_steps:
                # meta mirrors what mmcv embeds in the checkpoint
                # (reference tools/train.py:213-222): config text + CLASSES
                path = ckpt.save_checkpoint(
                    args.work_dir,
                    step,
                    state,
                    max_keep=cfg["checkpoint"].get("max_keep"),
                    meta=dict(
                        config=json.dumps(cfg, default=str),
                        CLASSES=list(cfg["model"].get("class_names") or ()),
                        epoch=epoch,
                        step=step,
                    ),
                    async_save=args.async_ckpt,
                )
                print(f"saved {path}", flush=True)
            if args.eval_interval and epoch % args.eval_interval == 0:
                from efficient_multimodal_perception_tpu.train.evaluator import (
                    evaluate,
                )

                variables = {"params": state.params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                if args.synthetic:
                    val_iter = [
                        jax.tree.map(
                            jnp.asarray,
                            synthetic_batch(
                                1,
                                point_budget=data_cfg["point_budget"],
                                seed=10_000 + i,
                                **needs,
                            ),
                        )
                        for i in range(min(args.eval_samples, 8))
                    ]
                    val_mesh = None
                else:
                    from efficient_multimodal_perception_tpu.train.evaluator import (
                        make_val_batches,
                    )

                    # sharded eval: B = n_devices over the data mesh
                    val_ds = NuScenesDataset(data_cfg, split="val")
                    val_iter = make_val_batches(
                        val_ds, n_dev, args.eval_samples
                    )()
                    val_mesh = mesh
                metrics = evaluate(
                    model,
                    variables,
                    val_iter,
                    cfg["model"]["type"],
                    num_classes=cfg["model"].get("decoder", {}).get(
                        "num_classes", 5
                    ),
                    class_names=cfg["model"].get("class_names") or (),
                    mesh=val_mesh,
                )
                logger.log(step, {f"val/{k}": v for k, v in metrics.items()})
                print(f"[eval @ epoch {epoch}] {metrics}", flush=True)

    ckpt.wait_for_saves()
    print("done")


def _rng_names(cfg):
    names = ["sample", "droppath"]
    enc = cfg["model"].get("encoder", {})
    if (
        enc.get("lidar_mask_ratio", 0) > 0
        or enc.get("camera_mask_ratio", 0) > 0
    ):
        names.append("mask")
    return tuple(names)


if __name__ == "__main__":
    main()
