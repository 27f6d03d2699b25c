"""Dynamic int8 quantized matmul for the serving path.

TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS
vs 197 TFLOPS), and int8 operands halve the HBM bytes of every matmul
input.  This module provides a *dynamic* (calibration-free) symmetric
int8 GEMM:

* activations are quantized per-row (one scale per token/pixel), so the
  quantization error tracks each row's own magnitude;
* weights are quantized per-output-channel;
* the int32 accumulator is exact, so the only error is the two rounding
  steps — for LN-bounded transformer/ConvNeXt activations this is the
  standard PTQ recipe (~1e-2 relative error per matmul).

Everything happens inside jit on the live f32/bf16 parameters: no
checkpoint surgery, no calibration pass, opt-in via ``int8=True`` on the
modules that route through :func:`quant_dense`.  Weight-quantization
cost is O(K*N) per step — negligible against the O(M*K*N) matmul at the
shapes this is used for (M is the token/pixel axis, >= 32k).

The reference framework has no quantized path at all (fp16 loss-scale
training is its only reduced precision — ``configs/triplane_occ.py``);
this is a beyond-reference serving feature, OFF by default everywhere.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


_INT8_PARTS = ("encoder", "neck", "camera_encoder", "triplane_encoder",
               "decoder")


def enable_int8(
    model_cfg: dict,
    parts: tuple[str, ...] | None = None,
    mode: str = "dynamic",
) -> dict:
    """Flip the int8 flag on every submodule config that supports it.

    Encoder (JointEncoder / MaskConvNeXt) and MixVisionTransformer necks
    always do; of the decoders only the occ ``Mlp`` head has an int8
    path (conv-stack heads like the elevation U-Net stay bf16).
    ``parts`` restricts the flip to a subset of submodule keys (e.g.
    ``("neck", "decoder")``) — used to isolate which GEMMs actually win
    from int8 on a given chip.  Unknown part names raise (a silently
    ignored typo would run pure bf16 while labeled as an int8
    measurement).  ``mode="static"`` selects calibrated static
    activation scales (see :func:`static_quant_dense`) instead of the
    per-call dynamic amax pass.  Mutates and returns ``model_cfg``.
    """
    if mode not in ("dynamic", "static"):
        raise ValueError(f"int8 mode must be dynamic|static, got {mode!r}")
    flag = True if mode == "dynamic" else "static"
    if parts is not None:
        parts = tuple(p.strip() for p in parts)
        unknown = sorted(set(parts) - set(_INT8_PARTS))
        if unknown:
            raise ValueError(
                f"unknown int8 parts {unknown}; valid: {_INT8_PARTS}"
            )
    for part in ("encoder", "neck", "camera_encoder", "triplane_encoder"):
        if part in model_cfg and (parts is None or part in parts):
            model_cfg[part]["int8"] = flag
    if model_cfg.get("decoder", {}).get("type") == "Mlp" and (
        parts is None or "decoder" in parts
    ):
        model_cfg["decoder"]["int8"] = flag
    return model_cfg


def _sym_quant(x: jax.Array, axis: int) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization along ``axis``.

    Returns ``(q, scale)`` with ``q`` int8 and ``scale`` f32 shaped like
    ``x`` with ``axis`` reduced (kept as size 1), so ``q * scale ~= x``.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_matmul_impl(x: jax.Array, w: jax.Array) -> jax.Array:
    xq, xs = _sym_quant(x, axis=-1)          # row scales (..., M, 1)
    wq, ws = _sym_quant(w, axis=0)           # col scales (1, N)
    acc = lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xs * ws).astype(x.dtype)


@jax.custom_vjp
def int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """``x @ w`` through a dynamic int8 MXU GEMM.

    Differentiable via a straight-through estimator: the backward is the
    exact matmul's (``round``'s true a.e.-zero derivative would silently
    kill gradients), so the op is safe under ``jax.grad`` — enabling
    both int8 on frozen submodules inside a train step and
    quantization-aware fine-tuning.

    Args:
        x: ``(..., M, K)`` activations (any float dtype).
        w: ``(K, N)`` weights (any float dtype).

    Returns:
        ``(..., M, N)`` in ``x.dtype``.
    """
    return _int8_matmul_impl(x, w)


def _int8_matmul_fwd(x, w):
    return _int8_matmul_impl(x, w), (x, w)


def _int8_matmul_bwd(res, g):
    x, w = res
    dx = lax.dot_general(
        g, w, (((g.ndim - 1,), (1,)), ((), ()))
    ).astype(x.dtype)
    # contract every leading (batch/row) axis: dw[k, n] = sum x[..., k] g[..., n]
    lead = tuple(range(g.ndim - 1))
    dw = lax.dot_general(
        x, g, ((lead, lead), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dx, dw


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


def quant_dense(x: jax.Array, kernel: jax.Array, bias=None) -> jax.Array:
    """Drop-in for ``x @ kernel + bias`` on the int8 path.

    ``kernel`` is the module's live parameter (f32); quantization is
    re-derived inside jit each call (weight cost is O(K*N), irrelevant
    at serving M).  ``bias`` is added in f32 exactly as the bf16 path
    does.
    """
    y = int8_matmul(x, kernel)
    if bias is not None:
        y = (y.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
            x.dtype
        )
    return y


def static_quant_matmul(x: jax.Array, w: jax.Array, amax: jax.Array):
    """``x @ w`` with a CALIBRATED per-tensor activation scale.

    The dynamic path's per-row ``max(|x|)`` reduction — a full extra
    HBM read of the activation on the VPU, the measured reason dynamic
    int8 LOSES to bf16 at the occ serving shapes (round-3 ledger) — is
    replaced by one precomputed scalar; only the round/clip fuses into
    the producer.  Weights stay per-channel (their quantization is
    O(K*N), invisible at serving M).  Serving-only: no custom VJP.
    """
    scale = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    wq, ws = _sym_quant(w, axis=0)
    acc = lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * scale * ws).astype(x.dtype)


def quant_dense_site(mod: nn.Module, name: str, x, kernel, bias=None):
    """Calibratable quantized dense bound to a flax module.

    Owns an f32 scalar ``amax`` in the ``"quant"`` variable collection
    (BatchNorm-style running stats).  When the collection is mutable —
    a CALIBRATION pass, ``model.apply(vars, batch, mutable=["quant"])``
    (and ``init``, which makes every collection mutable) — the running
    max of ``|x|`` is recorded and the per-row dynamic path computes the
    output; when immutable (serving) the stored amax drives
    :func:`static_quant_matmul`.  Calibration recipe::

        vars = model.init(...)                       # quant amaxes = 0
        for b in calib_batches:
            _, mut = model.apply(vars, b, deterministic=True,
                                 mutable=["quant"])
            vars = {**vars, "quant": mut["quant"]}
        model.apply(vars, batch, deterministic=True)  # static serving
    """
    amax_var = mod.variable(
        "quant", name, lambda: jnp.zeros((), jnp.float32)
    )
    if mod.is_mutable_collection("quant"):
        observed = jnp.max(jnp.abs(x.astype(jnp.float32)))
        amax_var.value = jnp.maximum(amax_var.value, observed)
        return quant_dense(x, kernel, bias)
    y = static_quant_matmul(x, kernel, amax_var.value)
    if bias is not None:
        y = (y.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
            x.dtype
        )
    return y


class Int8Dense(nn.Module):
    """Drop-in ``nn.Dense`` with an int8 GEMM.

    Param names, shapes, and initializers are identical to ``nn.Dense``
    (``kernel``/``bias``), so checkpoints, the torch importer, and the
    freeze machinery are unaffected by toggling a module between the
    bf16 and int8 paths.  ``static=True`` swaps the per-row dynamic
    activation scale for the calibrated per-tensor one (see
    :func:`quant_dense_site`).
    """

    features: int
    use_bias: bool = True
    static: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (x.shape[-1], self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if self.static:
            return quant_dense_site(self, "amax_in", x, kernel, bias)
        return quant_dense(x, kernel, bias)
