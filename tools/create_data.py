#!/usr/bin/env python
"""Create nuScenes infos pkls (port of /root/reference/tools/create_data.py).

    python tools/create_data.py nuscenes --root-path data/nuscenes \
        --version v1.0-trainval --max-sweeps 10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["nuscenes"])
    p.add_argument("--root-path", required=True)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--max-sweeps", type=int, default=10)
    args = p.parse_args()

    from efficient_multimodal_perception_tpu.data.nuscenes_converter import (
        create_nuscenes_infos,
    )

    create_nuscenes_infos(
        args.root_path, args.out_dir, args.version, args.max_sweeps
    )


if __name__ == "__main__":
    main()
