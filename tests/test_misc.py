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


def test_get_loading_pipeline_filters_and_flattens():
    from efficient_multimodal_perception_tpu.data.utils import (
        extract_result_dict,
        get_loading_pipeline,
        is_loading_function,
    )

    pipeline = [
        dict(type="LoadPointsFromFile", coord_type="LIDAR", load_dim=4),
        dict(type="LoadImageFromFile"),
        dict(type="GlobalRotScaleTrans", rot_range=[-0.4, 0.4]),
        dict(type="RandomFlip3D", flip_ratio_bev_horizontal=0.5),
        dict(type="PointShuffle"),
        dict(
            type="MultiScaleFlipAug3D",
            img_scale=(1333, 800),
            transforms=[
                dict(type="Normalize"),
                dict(type="LoadRangeImageFromFile"),
                dict(type="DefaultFormatBundle3D", class_names=[]),
                dict(type="Collect3D", keys=["points"]),
            ],
        ),
    ]
    kept = get_loading_pipeline(pipeline)
    assert [t["type"] for t in kept] == [
        "LoadPointsFromFile",
        "LoadImageFromFile",
        "LoadRangeImageFromFile",
        "DefaultFormatBundle3D",
        "Collect3D",
    ]
    # wrapper judgement is None (caller recurses), aug steps are False
    assert is_loading_function(pipeline[5]) is None
    assert is_loading_function(pipeline[2]) is False
    # a pipeline with no loading step is a config error
    import pytest

    with pytest.raises(AssertionError):
        get_loading_pipeline([dict(type="PointShuffle")])

    # extract_result_dict: unwraps list/tuple and jax arrays
    import jax.numpy as jnp

    res = {
        "points": [np.zeros((5, 3))],
        "img": (jnp.ones((2, 2)),),
        "empty": [],
    }
    assert extract_result_dict(res, "points").shape == (5, 3)
    img = extract_result_dict(res, "img")
    assert isinstance(img, np.ndarray) and img.shape == (2, 2)
    assert extract_result_dict(res, "missing") is None
    assert extract_result_dict(res, "empty") is None


def test_image_overlays(tmp_path):
    from efficient_multimodal_perception_tpu.utils import visualization as viz

    rng = np.random.default_rng(0)
    H, W = 64, 96
    img = np.zeros((H, W, 3), np.uint8)
    # simple pinhole looking down +x (lidar fwd): u = fx*(-y)/x + cx
    fx = fy = 40.0
    cx, cy = W / 2, H / 2
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    # lidar (x fwd, y left, z up) -> cam (x right, y down, z fwd)
    T = np.zeros((4, 4))
    T[0, 1], T[1, 2], T[2, 0], T[3, 3] = -1, -1, 1, 1
    lidar2img = np.eye(4)
    lidar2img[:3] = K @ T[:3]

    pts = np.stack(
        [
            rng.uniform(4, 30, 200),           # x fwd
            rng.uniform(-2, 2, 200),           # y left
            rng.uniform(-1, 1, 200),           # z up
        ],
        1,
    )
    out = viz.project_pts_on_img(
        pts, img, lidar2img, out_path=str(tmp_path / "pts.png")
    )
    assert out.shape == img.shape and out.dtype == np.uint8
    assert out.any(), "in-FOV points must color pixels"
    assert (tmp_path / "pts.png").exists()
    # points behind / far outside the FOV leave the canvas black
    behind = pts * np.array([-1.0, 1.0, 1.0])
    out2 = viz.project_pts_on_img(behind, img, lidar2img)
    assert not out2.any()

    # a box straight ahead draws a wireframe; empty boxes are a no-op
    boxes = np.array([[10.0, 0.0, -0.5, 4.0, 2.0, 1.5, 0.3]])
    out3 = viz.draw_lidar_bbox3d_on_img(
        boxes, img, lidar2img, out_path=str(tmp_path / "box.png")
    )
    assert out3.any() and (tmp_path / "box.png").exists()
    assert not viz.draw_lidar_bbox3d_on_img(
        np.zeros((0, 7)), img, lidar2img
    ).any()

    # camera/depth variants: same box converted to their frames must
    # light pixels too (projected through K / depth2img)
    from efficient_multimodal_perception_tpu.core import boxes as box_ops

    cam_boxes = box_ops.box_mode_convert(boxes, box_ops.LIDAR, box_ops.CAM)
    out4 = viz.draw_camera_bbox3d_on_img(cam_boxes, img, K)
    assert out4.any()
    depth_boxes = box_ops.box_mode_convert(
        boxes, box_ops.LIDAR, box_ops.DEPTH
    )
    depth2img = np.eye(4)
    # depth (x right, y fwd, z up) -> cam, then K
    TD = np.zeros((4, 4))
    TD[0, 0], TD[1, 2], TD[2, 1], TD[3, 3] = 1, -1, 1, 1
    depth2img[:3] = K @ TD[:3]
    out5 = viz.draw_depth_bbox3d_on_img(depth_boxes, img, depth2img)
    assert out5.any()
