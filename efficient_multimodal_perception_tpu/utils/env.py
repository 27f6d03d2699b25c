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
