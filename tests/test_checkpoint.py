"""Partial checkpoint restore semantics (triplane.py:101-124)."""

import jax.numpy as jnp
import numpy as np

from efficient_multimodal_perception_tpu.train.checkpoint import partial_load


def test_partial_load_name_and_shape_filter():
    target = {
        "encoder": {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))},
        "head": {"w": jnp.zeros((4, 2))},
    }
    source = {
        "encoder": {"w": jnp.ones((4, 4)), "b": jnp.ones((8,))},  # b: shape x
        "other": {"w": jnp.ones((4, 2))},  # name mismatch
    }
    merged, n_ok, n_all = partial_load(target, source)
    assert (n_ok, n_all) == (1, 3)
    np.testing.assert_allclose(np.asarray(merged["encoder"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(merged["encoder"]["b"]), 0.0)
    np.testing.assert_allclose(np.asarray(merged["head"]["w"]), 0.0)


def test_freeze_mask_prefixes():
    from efficient_multimodal_perception_tpu.train.trainer import freeze_mask

    params = {
        "encoder": {"w": jnp.zeros(2)},
        "neck": {"w": jnp.zeros(2)},
        "decoder": {"w": jnp.zeros(2)},
    }
    mask = freeze_mask(params, ("encoder", "neck"))
    assert mask["encoder"]["w"] is False
    assert mask["neck"]["w"] is False
    assert mask["decoder"]["w"] is True
