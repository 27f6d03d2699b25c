#!/usr/bin/env python
"""Generate elevation/*.npz BEV max-height maps for every nuScenes sample.

Port of ``/root/reference/tools/create_elevation.py`` on top of
``data/prep.py``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficient_multimodal_perception_tpu.data.prep import make_elevation


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--save-path", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    args = p.parse_args()

    from nuscenes.nuscenes import NuScenes
    from nuscenes.utils.data_classes import LidarPointCloud

    os.makedirs(args.save_path, exist_ok=True)
    nusc = NuScenes(version=args.version, dataroot=args.dataroot, verbose=True)
    count = 0
    for scene in nusc.scene:
        token = scene["first_sample_token"]
        while token:
            sample = nusc.get("sample", token)
            lidar = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
            src = os.path.join(nusc.dataroot, lidar["filename"])
            if os.path.exists(src):
                pc = LidarPointCloud.from_file(src)
                out = make_elevation(pc.points.T)
                name = os.path.split(lidar["filename"])[-1].split(".")[0]
                np.savez(os.path.join(args.save_path, name), **out)
                count += 1
                if count % 100 == 0:
                    print(count, flush=True)
            token = sample["next"]
    print(f"wrote {count} elevation maps")


if __name__ == "__main__":
    main()
