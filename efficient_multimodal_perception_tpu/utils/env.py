"""Environment collection (reference ``mmdet3d/utils/collect_env.py`` +
the env dump at ``tools/train.py:171-175``)."""

from __future__ import annotations

import platform
import sys


def collect_env() -> dict:
    import jax
    import jaxlib

    info = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
    try:
        import flax, optax, orbax.checkpoint  # noqa: E401

        info["flax"] = flax.__version__
        info["optax"] = optax.__version__
    except Exception:
        pass
    from .. import __version__

    info["efficient_multimodal_perception_tpu"] = __version__
    return info


def env_string() -> str:
    return "\n".join(f"{k}: {v}" for k, v in collect_env().items())


def compute_backend() -> str:
    """Platform the CURRENT tracing context will compile for.

    ``jax.default_backend()`` reports the highest-priority registered
    backend ("tpu" here) even inside a ``jax.default_device(cpu)``
    scope — so kernel-dispatch predicates that consult it emit
    non-interpret Pallas calls into graphs that are actually being
    compiled for CPU (bench's ``_cpu_init`` initializes full models on
    the CPU backend; the int8-static occ bench crashed exactly this way:
    "Only interpret mode is supported on CPU backend").  Honor the
    scoped default device first.
    """
    import jax

    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()
