"""Offline-prep schema round-trip (VERDICT round-1 item 6).

The nuScenes devkit is absent from this image, so ``create_nuscenes_infos``
(``data/nuscenes_converter.py``, port of
``data_converter/nuscenes_converter.py:183-326``) is normally gated.  Here
a fake devkit (minimal ``nuscenes``/``pyquaternion`` modules injected into
``sys.modules``) drives the REAL converter over handcrafted records, then
the emitted pkl + artifacts are loaded by the REAL ``NuScenesDataset`` —
proving the converter's schema is exactly what the loader consumes,
including sweeps, weather flags, gt boxes, and the occ-filename patch.
"""

import json
import os
import pickle
import sys
import types

import numpy as np
import pytest

from efficient_multimodal_perception_tpu.data.nuscenes import (
    NuScenesDataset,
    quaternion_matrix,
)


class FakeQuaternion:
    def __init__(self, q):
        self.q = [float(v) for v in q]

    @property
    def rotation_matrix(self):
        return quaternion_matrix(self.q).astype(np.float64)

    @property
    def yaw_pitch_roll(self):
        R = self.rotation_matrix
        return (float(np.arctan2(R[1, 0], R[0, 0])), 0.0, 0.0)


class FakeBox:
    def __init__(self, center, wlh, yaw, name):
        self.center = np.asarray(center, float)
        self.wlh = np.asarray(wlh, float)
        half = yaw / 2
        self.orientation = FakeQuaternion(
            [np.cos(half), 0, 0, np.sin(half)]
        )
        self.name = name


CAMS = (
    "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
    "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
)


def _build_world(root):
    """Handcraft two scenes (one train, one val), one sample each, with
    a 2-sweep prev chain, 6 cameras, and one annotated box."""
    from PIL import Image

    rng = np.random.default_rng(0)
    tables = {k: {} for k in (
        "sample_data", "calibrated_sensor", "ego_pose", "scene", "log",
        "sample", "sample_annotation", "attribute",
    )}
    tables["attribute"]["attr_parked"] = dict(name="vehicle.parked")
    samples, scenes = [], []

    tables["log"]["log0"] = dict(location="singapore-onenorth")
    # shared ego pose / calibrations (small rotations to be non-trivial)
    yaw = 0.1
    q_ego = [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]
    tables["ego_pose"]["ep0"] = dict(
        rotation=q_ego, translation=[100.0, 50.0, 0.0]
    )
    tables["calibrated_sensor"]["cs_lidar"] = dict(
        rotation=[1, 0, 0, 0], translation=[0.9, 0.0, 1.8]
    )
    for ci, cam in enumerate(CAMS):
        a = 2 * np.pi * ci / 6
        tables["calibrated_sensor"][f"cs_{cam}"] = dict(
            rotation=[np.cos(a / 2), 0, np.sin(a / 2), 0],
            translation=[1.5, 0.2 * ci, 1.5],
        )

    os.makedirs(os.path.join(root, "samples/LIDAR_TOP"), exist_ok=True)
    os.makedirs(os.path.join(root, "sweeps/LIDAR_TOP"), exist_ok=True)
    for cam in CAMS:
        os.makedirs(os.path.join(root, f"samples/{cam}"), exist_ok=True)

    for s, (scene_name, desc) in enumerate(
        [("scene-0001", "Rain at Night, city"), ("scene-0002", "clear day")]
    ):
        scene_tok = f"scene{s}"
        scenes.append(dict(
            token=scene_tok, name=scene_name, description=desc,
            log_token="log0", prev="", next="",
        ))
        tables["scene"][scene_tok] = scenes[-1]

        lidar_file = f"samples/LIDAR_TOP/s{s}.pcd.bin"
        pts = rng.uniform(-30, 30, (600, 11)).astype(np.float32)
        pts.tofile(os.path.join(root, lidar_file))

        # prev-chain of 2 sweeps
        prev_tok = ""
        for k in (1, 0):
            sw_file = f"sweeps/LIDAR_TOP/s{s}_sw{k}.pcd.bin"
            rng.uniform(-30, 30, (400, 5)).astype(np.float32).tofile(
                os.path.join(root, sw_file)
            )
            tables["sample_data"][f"sd_sw{s}_{k}"] = dict(
                token=f"sd_sw{s}_{k}", filename=sw_file,
                channel="LIDAR_TOP",
                calibrated_sensor_token="cs_lidar",
                ego_pose_token="ep0",
                timestamp=1_000_000 * (s + 1) - 100_000 * (k + 1),
                prev=prev_tok,
            )
            prev_tok = f"sd_sw{s}_{k}"
        tables["sample_data"][f"sd_lidar{s}"] = dict(
            token=f"sd_lidar{s}", filename=lidar_file, channel="LIDAR_TOP",
            calibrated_sensor_token="cs_lidar", ego_pose_token="ep0",
            timestamp=1_000_000 * (s + 1), prev=prev_tok,
        )

        data = {"LIDAR_TOP": f"sd_lidar{s}"}
        for cam in CAMS:
            img_file = f"samples/{cam}/s{s}.jpg"
            Image.fromarray(
                rng.integers(0, 255, (900, 1600, 3), dtype=np.uint8)
            ).save(os.path.join(root, img_file))
            tables["sample_data"][f"sd_{cam}{s}"] = dict(
                token=f"sd_{cam}{s}", filename=img_file, channel=cam,
                calibrated_sensor_token=f"cs_{cam}",
                ego_pose_token="ep0",
                timestamp=1_000_000 * (s + 1) + 5, prev="",
            )
            data[cam] = f"sd_{cam}{s}"

        ann_tok = f"ann{s}"
        tables["sample_annotation"][ann_tok] = dict(
            num_lidar_pts=12, num_radar_pts=0,
            attribute_tokens=["attr_parked"],
        )
        sample = dict(
            token=f"tok{s}", data=data, scene_token=scene_tok,
            timestamp=1_000_000 * (s + 1), anns=[ann_tok],
            prev="", next="",
        )
        samples.append(sample)
        tables["sample"][f"tok{s}"] = sample

    class FakeNusc:
        def __init__(self):
            self.sample = samples
            self.scene = scenes

        def get(self, table, token):
            return tables[table][token]

        def get_sample_data(self, token):
            sd = tables["sample_data"][token]
            path = os.path.join(root, sd["filename"])
            if sd["channel"] == "LIDAR_TOP":
                box = FakeBox([5.0, 2.0, 0.5], [1.9, 4.5, 1.7], 0.4,
                              "vehicle.car")
                return path, [box], None
            intr = np.array(
                [[1266.0, 0, 800.0], [0, 1266.0, 450.0], [0, 0, 1]]
            )
            return path, [], intr

        def box_velocity(self, ann_token):
            return np.array([1.0, 0.5, 0.0])

    return FakeNusc()


@pytest.fixture()
def fake_devkit(tmp_path):
    root = str(tmp_path)
    nusc = _build_world(root)

    pyq = types.ModuleType("pyquaternion")
    pyq.Quaternion = FakeQuaternion
    nusc_pkg = types.ModuleType("nuscenes")
    nusc_mod = types.ModuleType("nuscenes.nuscenes")
    nusc_mod.NuScenes = lambda version, dataroot, verbose=True: nusc
    utils_mod = types.ModuleType("nuscenes.utils")
    splits_mod = types.ModuleType("nuscenes.utils.splits")
    splits_mod.train = ["scene-0001"]
    splits_mod.val = ["scene-0002"]
    splits_mod.mini_train = ["scene-0001"]
    splits_mod.mini_val = ["scene-0002"]
    splits_mod.test = []
    utils_mod.splits = splits_mod
    nusc_pkg.nuscenes = nusc_mod
    nusc_pkg.utils = utils_mod

    injected = {
        "pyquaternion": pyq,
        "nuscenes": nusc_pkg,
        "nuscenes.nuscenes": nusc_mod,
        "nuscenes.utils": utils_mod,
        "nuscenes.utils.splits": splits_mod,
    }
    saved = {k: sys.modules.get(k) for k in injected}
    sys.modules.update(injected)
    try:
        yield root
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def prepare_fixture_dataset(root, max_sweeps: int = 2):
    """Run the REAL converter over the fake-devkit world and materialize
    every derived artifact the infos point at (range npz, occupancy npy,
    elevation npz) + the occ-filename pkl patch — a complete file-backed
    dataset the production loader AND the CLIs can consume.  Requires
    the ``fake_devkit`` fixture to be active (devkit modules injected).
    """
    from efficient_multimodal_perception_tpu.data.nuscenes_converter import (
        create_nuscenes_infos,
    )
    from efficient_multimodal_perception_tpu.data.prep import (
        add_occ_filenames,
    )

    train_infos, val_infos = create_nuscenes_infos(
        root, version="v1.0-trainval", max_sweeps=max_sweeps
    )
    rng = np.random.default_rng(1)
    os.makedirs(os.path.join(root, "samples/RANGE_FULL"), exist_ok=True)
    os.makedirs(os.path.join(root, "occupancy"), exist_ok=True)
    os.makedirs(os.path.join(root, "elevation"), exist_ok=True)
    for inf in train_infos + val_infos:
        np.savez(
            os.path.join(root, inf["range_filename"]),
            range_image=rng.uniform(0, 50, (32, 1024)),
            range_points=rng.uniform(-30, 30, (32, 1024, 3)),
        )
        np.savez(
            os.path.join(root, inf["elev_filename"]),
            elevation=rng.standard_normal((100, 100)),
            mask=(rng.random((100, 100)) > 0.5).astype(np.float64),
        )
        occ = np.stack(
            [rng.integers(0, 200, 300), rng.integers(0, 200, 300),
             rng.integers(0, 16, 300), rng.integers(0, 17, 300)], axis=1,
        ).astype(np.int64)
        base = os.path.split(inf["lidar_path"])[-1]
        np.save(os.path.join(root, f"occupancy/{base}.npy"), occ)
    # occupancy/modify_info.py equivalent patches the pkls in place
    add_occ_filenames(os.path.join(root, "nuscenes_infos_train.pkl"))
    add_occ_filenames(os.path.join(root, "nuscenes_infos_val.pkl"))
    return train_infos, val_infos


def test_converter_schema_and_loader_roundtrip(fake_devkit):
    root = fake_devkit
    from efficient_multimodal_perception_tpu.data.nuscenes_converter import (
        weather_flags,
    )

    train_infos, val_infos = prepare_fixture_dataset(root)
    assert len(train_infos) == 1 and len(val_infos) == 1
    info = train_infos[0]

    # --- schema assertions (nuscenes_converter.py:183-326) ---
    assert info["lidar_path"] == "samples/LIDAR_TOP/s0.pcd.bin"
    assert info["range_filename"] == "samples/RANGE_FULL/s0.npz"
    assert info["elev_filename"] == os.path.join("elevation", "s0") + ".npz"
    assert list(info["cams"]) == list(CAMS)
    for cam in info["cams"].values():
        assert cam["sensor2lidar_rotation"].shape == (3, 3)
        assert cam["sensor2lidar_translation"].shape == (3,)
        assert cam["camera_intrinsics"].shape == (3, 3)
    assert len(info["sweeps"]) == 2
    # sweeps ordered most-recent-first along the prev chain
    assert info["sweeps"][0]["timestamp"] > info["sweeps"][1]["timestamp"]
    assert info["gt_boxes"].shape == (1, 7)
    assert info["gt_names"][0] == "car"  # NameMapping applied
    assert info["gt_velocity"].shape == (1, 2)
    assert info["gt_attrs"][0] == "vehicle.parked"
    assert info["valid_flag"].all()
    # weather regex: "Rain at Night" -> night+rain bits
    np.testing.assert_array_equal(info["weather"], [0, 1, 0, 1])
    np.testing.assert_array_equal(
        weather_flags("Clear, after rain"), [0, 0, 0, 0]
    )

    # identity lidar calibration => sensor2lidar == sensor2ego for cams
    cam0 = info["cams"]["CAM_FRONT"]
    np.testing.assert_allclose(
        cam0["sensor2lidar_rotation"],
        quaternion_matrix(cam0["sensor2ego_rotation"]).astype(np.float64),
        atol=1e-6,
    )

    # --- the REAL loader consumes the converter's pkl ---
    cfg = dict(
        data_root=root,
        ann_train="nuscenes_infos_train.pkl",
        ann_val="nuscenes_infos_val.pkl",
        num_cams=6,
        image_size=(256, 512),
        resize_lim=(0.44, 0.61),
        rand_flip=True,
        img_mean=(0.485, 0.456, 0.406),
        img_std=(0.229, 0.224, 0.225),
        load_points=True,
        point_dim=11,
        sweeps_num=2,
        point_budget=2048,
        load_occ=True,
        load_elev=True,
        samples_per_device=1,
        workers=1,
    )
    ds = NuScenesDataset(cfg, split="train")
    assert len(ds) == 1
    s = ds.sample(0)
    assert s["img"].shape == (6, 256, 512, 3)
    assert s["range_image"].shape == (32, 1024, 1)
    assert s["lidar2img"].shape == (6, 4, 4)
    # keyframe 600 + two sweeps of 400 aggregated into the budget
    assert s["points_valid"].sum() == 600 + 2 * 400
    # sweep points carry a positive time lag, keyframe lag == 0
    lags = s["points"][s["points_valid"], 4]
    assert (lags[:600] == 0).all() and (lags[600:] > 0).all()
    assert s["occupancy"].shape == (200, 200, 16)
    assert set(np.unique(s["occupancy"])) <= {0, 1, 2, 3, 4, 255}
    assert s["elevation"].shape == (100, 100)


def test_occ_converter_temporal_links(fake_devkit):
    root = fake_devkit
    from efficient_multimodal_perception_tpu.data.nuscenes_converter import (
        create_nuscenes_occ_infos,
    )

    occ_dir = os.path.join(root, "occ3d")
    os.makedirs(occ_dir, exist_ok=True)
    anno = dict(scene_infos={
        "scene-0001": {"tok0": {"gt_path": "gts/scene-0001/tok0"}},
        "scene-0002": {"tok1": {}},
    })
    with open(os.path.join(occ_dir, "annotations.json"), "w") as f:
        json.dump(anno, f)

    create_nuscenes_occ_infos(root, occ_dir, version="v1.0-trainval",
                              max_sweeps=1)
    with open(
        os.path.join(root, "nuscenes_infos_temporal_train.pkl"), "rb"
    ) as f:
        infos = pickle.load(f)["infos"]
    assert infos[0]["occ_gt_path"] == "gts/scene-0001/tok0"
    assert infos[0]["prev"] == "" and infos[0]["next"] == ""
    assert infos[0]["scene_token"] == "scene0"
