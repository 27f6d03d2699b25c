"""Small coverage: config overrides, viz writers, config registry."""

import numpy as np

from efficient_multimodal_perception_tpu.configs import (
    CONFIG_NAMES,
    apply_overrides,
    get_config,
)


def test_all_config_names_load_and_build():
    from efficient_multimodal_perception_tpu.models.builder import (
        build_model,
    )

    for name in CONFIG_NAMES:
        cfg = get_config(name)
        assert cfg["name"] == name
        model = build_model(cfg["model"])  # constructs, no init
        assert model is not None
        assert "optimizer" in cfg and "data" in cfg and "model_init" in cfg


def test_apply_overrides_types_and_nesting():
    cfg = {"optimizer": {"lr": 1e-4}, "epochs": 10}
    apply_overrides(
        cfg,
        ["optimizer.lr=0.5", "epochs=3", "data.new=hello",
         "model.flag=True", "model.dims=(1,2)"],
    )
    assert cfg["optimizer"]["lr"] == 0.5
    assert cfg["epochs"] == 3
    assert cfg["data"]["new"] == "hello"
    assert cfg["model"]["flag"] is True
    assert cfg["model"]["dims"] == (1, 2)


def test_viz_writers(tmp_path):
    from efficient_multimodal_perception_tpu.utils import visualization as viz

    rng = np.random.default_rng(0)
    out = str(tmp_path)
    viz.save_image_grid(
        rng.standard_normal((2, 32, 64, 3)),
        rng.standard_normal((2, 32, 64, 3)),
        np.ones((2, 32, 64, 1)),
        out, 0,
    )
    viz.save_range_grid(
        rng.uniform(0, 50, (8, 64, 1)),
        rng.uniform(0, 50, (8, 64, 1)),
        np.ones((8, 64, 1)),
        out, 0,
    )
    viz.save_reprojected_points(
        rng.standard_normal((8, 64, 3)),
        rng.uniform(0, 50, (8, 64, 1)),
        np.ones((8, 64, 1)),
        out, 0,
    )
    viz.save_triplane_pca(rng.standard_normal((3, 16, 16, 8)), out, 0)
    import os

    assert os.path.exists(os.path.join(out, "cam", "0.png"))
    assert os.path.exists(os.path.join(out, "range", "0.png"))
    assert os.path.exists(os.path.join(out, "points", "pred_points_0.npy"))
    assert os.path.exists(os.path.join(out, "triplane", "0.png"))


def test_metric_logger(tmp_path):
    from efficient_multimodal_perception_tpu.utils.logging import (
        MetricLogger,
    )

    lg = MetricLogger(str(tmp_path), use_tensorboard=False)
    lg.log(1, {"loss": 1.0, "acc": 0.5})
    lg.log(2, {"loss": 0.9, "acc": 0.6})
    lg.close()
    import os

    assert os.path.getsize(os.path.join(tmp_path, "train.log")) > 0
    csv = open(os.path.join(tmp_path, "metrics.csv")).read().splitlines()
    assert csv[0] == "step,acc,loss"
    assert len(csv) == 3


def test_export_roundtrip(tmp_path):
    """tools/export.py: serialize a tiny occ model to StableHLO,
    deserialize WITHOUT the model code path, compare outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    import sys, os
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
    )
    from export import build_infer_fn

    from efficient_multimodal_perception_tpu.data.synthetic import (
        synthetic_batch,
    )
    from efficient_multimodal_perception_tpu.models.builder import build_model
    from tiny import tiny_occ

    model = build_model(tiny_occ())
    batch = synthetic_batch(1, point_budget=2048, with_occ=True, seed=0)
    v = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b)
    )(batch)
    infer = build_infer_fn(model, "TriplaneOcc")
    jitted = jax.jit(infer)
    exported = jexport.export(jitted)(v, batch)
    blob = exported.serialize()
    p = tmp_path / "occ.stablehlo"
    p.write_bytes(blob)

    back = jexport.deserialize(p.read_bytes())
    got = np.asarray(back.call(v, batch))
    want = np.asarray(jitted(v, batch))
    assert got.dtype == np.int8 and got.shape == want.shape
    np.testing.assert_array_equal(got, want)
