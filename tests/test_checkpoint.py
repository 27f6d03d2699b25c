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


def test_max_keep_pruning_and_meta(tmp_path):
    """CheckpointHook parity: ``max_keep_ckpts`` prunes oldest saves and
    meta (config/CLASSES) rides alongside
    (configs/triplane_surf_sam.py:133-136, tools/train.py:213-222)."""
    import os

    from efficient_multimodal_perception_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    wd = str(tmp_path)
    state = {"w": jnp.arange(4.0)}
    meta = {"config": "cfg-text", "CLASSES": ["vehicle", "drivable"]}
    for step in (5, 10, 15, 20):
        save_checkpoint(wd, step, state, max_keep=2, meta=meta)

    d = os.path.join(wd, "checkpoints")
    kept = sorted(f for f in os.listdir(d) if not f.endswith(".json"))
    assert kept == ["step_15", "step_20"]
    metas = sorted(f for f in os.listdir(d) if f.endswith(".meta.json"))
    assert metas == ["step_15.meta.json", "step_20.meta.json"]
    import json

    with open(os.path.join(d, "step_20.meta.json")) as f:
        assert json.load(f)["CLASSES"] == ["vehicle", "drivable"]

    latest = latest_checkpoint(wd)
    assert latest.endswith("step_20")
    restored = restore_checkpoint(latest, {"w": jnp.zeros(4)})
    np.testing.assert_allclose(np.asarray(restored["w"]), np.arange(4.0))


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


def test_async_save_roundtrip_and_latest(tmp_path):
    """async_save commits in the background; wait_for_saves joins it.

    Also locks the --auto-resume helper: latest_checkpoint picks the
    highest step.
    """
    from efficient_multimodal_perception_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
        wait_for_saves,
    )

    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.int32(7)}
    save_checkpoint(str(tmp_path), 1, state, async_save=True)
    save_checkpoint(
        str(tmp_path), 3,
        {**state, "step": jnp.int32(9)},
        async_save=True,
    )
    wait_for_saves()
    path = latest_checkpoint(str(tmp_path))
    assert path.endswith("step_3")
    got = restore_checkpoint(path, state)
    np.testing.assert_array_equal(np.asarray(got["w"]),
                                  np.asarray(state["w"]))
    assert int(got["step"]) == 9
