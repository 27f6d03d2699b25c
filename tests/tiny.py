"""Re-export of the package's tiny test configs (kept for test imports)."""

from efficient_multimodal_perception_tpu.configs.tiny import (  # noqa: F401
    TINY_ARCH,
    tiny_elev,
    tiny_encoder,
    tiny_mae,
    tiny_neck,
    tiny_occ,
    tiny_point,
)
