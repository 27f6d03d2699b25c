#!/usr/bin/env python
"""Generate RANGE_FULL/*.npz range images for every nuScenes sample.

Port of ``/root/reference/tools/create_range_images.py`` on top of
``data/prep.py``.  Needs the ``nuscenes`` devkit + dataset on disk.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficient_multimodal_perception_tpu.data.prep import make_range_image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    args = p.parse_args()

    from nuscenes.nuscenes import NuScenes
    from nuscenes.utils.data_classes import LidarPointCloud

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
                out = make_range_image(pc.points.T)
                dst = lidar["filename"].replace("LIDAR_TOP", "RANGE_FULL")
                dst = dst.replace(".pcd.bin", "")
                dst = os.path.join(nusc.dataroot, dst)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                np.savez(dst, **out)
                count += 1
                if count % 100 == 0:
                    print(count, flush=True)
            token = sample["next"]
    print(f"wrote {count} range images")


if __name__ == "__main__":
    main()
