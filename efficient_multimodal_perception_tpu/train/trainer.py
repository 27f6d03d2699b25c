"""Generic trainer: one train step for all five task models.

The reference duplicates an identical ``train_step``/``_parse_losses``
block in every detector (``triplane.py:516-581``, ``triplane_occ.py:
350-415``, ``point_triplane.py:469-534``, ...); here it is one jitted
function.  Loss summation mirrors ``_parse_losses``: total = sum of all
entries whose key contains "loss" (``triplane.py:571``); every entry is
logged, means are all-reduced by XLA across the data mesh (the manual
``dist.all_reduce`` at ``triplane.py:576-579`` disappears into SPMD).

Optimizer mirrors the configs: AdamW(betas=(0.95, 0.99), wd=1e-3), linear
warmup + cosine anneal to ``min_lr_ratio`` (``configs/cosine_2x.py`` +
per-config blocks), global-norm clip 35 (``optimizer_config`` in every
config).  Freezing (``freeze_encoder``) is an ``optax.multi_transform``
over param-path prefixes; frozen weights also get zero weight-decay,
matching torch's requires_grad=False semantics exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class TrainState:
    """Carried training state (a pytree)."""

    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any  # BatchNorm running stats ({} for most models)


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["step", "params", "opt_state", "batch_stats"],
    meta_fields=[],
)


def cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_iters: int = 20,
    warmup_ratio: float = 0.1,
    min_lr_ratio: float = 0.1,
):
    """Linear warmup from ``base_lr * warmup_ratio`` + cosine to
    ``base_lr * min_lr_ratio`` (mmcv CosineAnnealingLrUpdater semantics).
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (
            warmup_ratio + (1 - warmup_ratio) * step / max(warmup_iters, 1)
        )
        t = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        cos = base_lr * (
            min_lr_ratio + (1 - min_lr_ratio) * 0.5 * (1 + jnp.cos(jnp.pi * t))
        )
        return jnp.where(step < warmup_iters, warm, cos)

    return schedule


def freeze_mask(params, freeze_prefixes: Sequence[str]):
    """Label tree: True = trainable, False = frozen.

    Matches the reference's module-level freeze
    (``triplane_occ.py:83-91``) plus per-stage freezing
    (``mask_convnext.py:339-350``): a param is frozen when its path
    starts with a token (e.g. "encoder", "neck") or contains a token at
    a component boundary (e.g. "stage0_", "downsample_layers_0" from
    ``frozen_stages``).
    """

    def path_str(path):
        return "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )

    def is_frozen(ps):
        slashed = "/" + ps
        return any(
            ps.startswith(tok) or ("/" + tok) in slashed
            for tok in freeze_prefixes
        )

    return jax.tree_util.tree_map_with_path(
        lambda path, _: not is_frozen(path_str(path)), params
    )


def frozen_stage_tokens(model_cfg: dict) -> tuple:
    """Derive freeze tokens from every ``frozen_stages`` in the config.

    The reference freezes the first k downsample layers + stages of each
    ConvNeXt with ``frozen_stages=k`` (``mask_convnext.py:339-350``); all
    shipped configs use the same k for every encoder, so global
    stage-name tokens are exact.
    """
    tokens = set()

    def walk(node):
        if isinstance(node, dict):
            k = node.get("frozen_stages", 0)
            if isinstance(k, int):
                for i in range(k):
                    tokens.add(f"stage{i}_")
                    tokens.add(f"downsample_layers_{i}/")
            for v in node.values():
                walk(v)

    walk(model_cfg)
    return tuple(sorted(tokens))


def make_optimizer(
    cfg: dict,
    total_steps: int,
    params,
    freeze_prefixes: Sequence[str] = (),
):
    """optax chain mirroring the reference's optimizer+lr configs.

    ``optimizer.fused=True`` swaps in the flat single-vector AdamW
    (``train/flat_opt.py`` — same math, locked by
    ``tests/test_flat_opt.py``) whose update compiles to a handful of
    full-bandwidth kernels instead of one fusion per parameter tensor.
    """
    opt_cfg = cfg["optimizer"]
    sched = cosine_schedule(
        opt_cfg["lr"],
        total_steps,
        cfg["lr_config"].get("warmup_iters", 20),
        cfg["lr_config"].get("warmup_ratio", 0.1),
        cfg["lr_config"].get("min_lr_ratio", 0.1),
    )
    if opt_cfg.get("fused"):
        from .flat_opt import flat_adamw

        mask = (
            freeze_mask(params, freeze_prefixes) if freeze_prefixes else None
        )
        return flat_adamw(
            sched,
            b1=opt_cfg["betas"][0],
            b2=opt_cfg["betas"][1],
            weight_decay=opt_cfg.get("weight_decay", 1e-3),
            grad_clip=cfg.get("grad_clip", 35.0),
            mask=mask,
        )
    adamw = optax.chain(
        optax.clip_by_global_norm(cfg.get("grad_clip", 35.0)),
        optax.adamw(
            sched,
            b1=opt_cfg["betas"][0],
            b2=opt_cfg["betas"][1],
            weight_decay=opt_cfg.get("weight_decay", 1e-3),
        ),
    )
    if not freeze_prefixes:
        return adamw
    mask = freeze_mask(params, freeze_prefixes)
    return optax.multi_transform(
        {True: adamw, False: optax.set_to_zero()}, mask
    )


def total_loss(losses: dict) -> jax.Array:
    """Sum entries whose key contains "loss" (``triplane.py:571``)."""
    total = jnp.zeros((), jnp.float32)
    for k, v in losses.items():
        if "loss" in k:
            total = total + jnp.asarray(v, jnp.float32)
    return total


def normalize_output(out) -> dict:
    """Task models return either a loss dict or (pred..., losses)."""
    return out[-1] if isinstance(out, tuple) else out


def make_train_step(
    model,
    optimizer,
    rng_names: Sequence[str] = (),
    deterministic: bool = False,
    donate: bool = True,
    state_shardings=None,
    accum_steps: int = 1,
    remat: bool = False,
    freeze_prefixes: Sequence[str] = (),
) -> Callable:
    """Build the jitted train step.

    Returns ``step_fn(state, batch, rng) -> (state, log_vars)``.  Under a
    data mesh, jit's SPMD partitioner inserts the gradient psums; the
    log_vars are already the global means (loss is computed on the local
    shard and averaged implicitly through the mean reduction of each
    loss term over batch elements).

    ``state_shardings`` (a NamedSharding pytree from
    ``parallel.fsdp.state_shardings``) pins the TrainState's FSDP/TP
    layout on both sides of the step, so weights stay reduce-scattered
    across steps and XLA only materializes the gathered form transiently
    inside the step.

    ``accum_steps > 1`` splits the batch into that many micro-batches
    (leading axis must divide) and averages their gradients/losses via
    ``lax.scan`` before the single optimizer update — the few-chip
    equivalent of the reference's 6-GPU DDP global batch (its semantics
    exactly: DDP *averages* per-rank grads of per-rank mean losses, so a
    loss normalized within each micro-batch composes the same way).
    BatchNorm running stats thread through the scan sequentially.

    ``freeze_prefixes`` (same tokens as :func:`make_optimizer`) applies
    ``stop_gradient`` to the frozen params inside the loss, so their
    gradients are structural zeros.  This matches torch
    ``requires_grad=False`` exactly — frozen tensors contribute nothing
    to the logged/clipped grad norm (``clip_grad_norm_`` skips
    grad-less params) — and, when the frozen subtree is a prefix of the
    network (the fine-tune configs freeze the whole encoder,
    ``triplane_occ.py:83-91``), XLA dead-code-eliminates its entire
    backward: the step computes only the forward through frozen stages.
    Without it, ``value_and_grad`` over the full param tree materializes
    encoder gradients that ``optax.set_to_zero`` then discards.

    ``remat=True`` wraps the whole forward in ``jax.checkpoint``: the
    backward pass recomputes activations instead of keeping them in HBM
    (~1 extra forward of FLOPs for an activation footprint of roughly
    the model inputs/outputs) — the standard TPU lever for batch sizes
    the un-remat'd step would OOM on.  Identical numerics (locked by
    ``test_remat_step_matches``).
    """

    def loss_fn(params, batch_stats, batch, rng):
        if freeze_prefixes:
            trainable = freeze_mask(params, freeze_prefixes)
            params = jax.tree.map(
                lambda p, t: p if t else jax.lax.stop_gradient(p),
                params, trainable,
            )
        rngs = {name: jax.random.fold_in(rng, i) for i, name in
                enumerate(rng_names)}
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        def fwd(variables, batch):
            return model.apply(
                variables,
                batch,
                deterministic=deterministic,
                rngs=rngs,
                mutable=mutable,
            )

        if remat:
            fwd = jax.checkpoint(fwd)
        out, new_vars = fwd(variables, batch)
        losses = normalize_output(out)
        loss = total_loss(losses)
        new_stats = new_vars.get("batch_stats", batch_stats)
        return loss, (losses, new_stats)

    def grads_of(state, batch, rng):
        if accum_steps <= 1:
            return jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, rng
            )

        def split(x):
            n = x.shape[0]
            assert n % accum_steps == 0, (
                f"batch {n} not divisible by accum_steps {accum_steps}"
            )
            return x.reshape(accum_steps, n // accum_steps, *x.shape[1:])

        micro = jax.tree.map(split, batch)

        def body(carry, xs):
            g_acc, loss_acc, losses_acc, stats = carry
            mb, i = xs
            (loss, (losses, stats)), g = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, stats, mb, jax.random.fold_in(rng, i))
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            losses = {k: jnp.asarray(v, jnp.float32) for k, v in
                      losses.items()}
            losses_acc = jax.tree.map(jnp.add, losses_acc, losses)
            return (g_acc, loss_acc + loss, losses_acc, stats), None

        g0 = jax.tree.map(jnp.zeros_like, state.params)
        # probe one micro-batch's loss keys abstractly for the accumulator
        losses0_shape = jax.eval_shape(
            lambda: loss_fn(
                state.params, state.batch_stats,
                jax.tree.map(lambda x: x[0], micro),
                jax.random.fold_in(rng, 0),
            )
        )[1][0]
        losses0 = {k: jnp.zeros((), jnp.float32) for k in losses0_shape}
        (g_sum, loss_sum, losses_sum, new_stats), _ = jax.lax.scan(
            body,
            (g0, jnp.zeros((), jnp.float32), losses0, state.batch_stats),
            (micro, jnp.arange(accum_steps)),
        )
        inv = 1.0 / accum_steps
        return (
            loss_sum * inv,
            ({k: v * inv for k, v in losses_sum.items()}, new_stats),
        ), jax.tree.map(lambda g: g * inv, g_sum)

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (losses, new_stats)), grads = grads_of(state, batch, rng)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        log_vars = {k: jnp.asarray(v, jnp.float32) for k, v in losses.items()}
        log_vars["loss"] = loss
        log_vars["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=new_stats,
        )
        return new_state, log_vars

    kwargs = {}
    if state_shardings is not None:
        kwargs["in_shardings"] = (state_shardings, None, None)
        kwargs["out_shardings"] = (state_shardings, None)
    return jax.jit(
        step_fn, donate_argnums=(0,) if donate else (), **kwargs
    )


def init_state(
    model,
    batch,
    optimizer,
    seed: int = 0,
    rng_names: Sequence[str] = (),
    init_params: Optional[Any] = None,
) -> TrainState:
    """Initialize (or adopt) params + optimizer state."""
    rngs = {"params": jax.random.key(seed)}
    for i, name in enumerate(rng_names):
        rngs[name] = jax.random.fold_in(jax.random.key(seed + 1), i)
    variables = jax.jit(
        lambda b: model.init(rngs, b, deterministic=True)
    )(batch)
    params = init_params if init_params is not None else variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        batch_stats=batch_stats,
    )
