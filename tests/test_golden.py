"""Golden-value regression: fixed-seed tiny-model losses.

Locks the end-to-end numerics (data gen -> geometry -> encoders ->
losses) across refactors/rounds.  Values recorded on CPU f32 with
jax 0.9.0; tolerances allow platform-level float drift but catch any
semantic change.
"""

import jax
import jax.numpy as jnp
import numpy as np

from efficient_multimodal_perception_tpu.data.synthetic import synthetic_batch
from efficient_multimodal_perception_tpu.models.builder import build_model

from tiny import tiny_mae, tiny_occ

# regenerated in round 2 after removing the (reference-dead) encoder
# out-norm application — see convnext.py setup note
GOLDEN_MAE = {
    "camera_loss": 1.243219,
    "contrastive_loss": 7.924494,
    "range_loss": 7.788247,
    "surface_loss": 0.698382,
}
GOLDEN_OCC = {"loss": 1.714847}


def _forward(cfg, **kw):
    model = build_model(cfg)
    b = synthetic_batch(1, point_budget=2048, seed=42, **kw)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    v = jax.jit(lambda x: model.init(rngs, x, deterministic=True))(b)
    out = jax.jit(
        lambda vv, x: model.apply(
            vv, x, deterministic=True, rngs={"sample": jax.random.key(1)}
        )
    )(v, b)
    losses = out[-1] if isinstance(out, tuple) else out
    return {k: float(jnp.asarray(x)) for k, x in losses.items()}


def test_golden_mae_losses():
    got = _forward(tiny_mae())
    for k, v in GOLDEN_MAE.items():
        np.testing.assert_allclose(got[k], v, rtol=2e-3, err_msg=k)


def test_golden_occ_loss():
    got = _forward(tiny_occ(), with_occ=True)
    np.testing.assert_allclose(got["loss"], GOLDEN_OCC["loss"], rtol=2e-3)
