#!/usr/bin/env python
"""Create SAM-labeled 11-dim point bins (port of
/root/reference/sam/create_sam_masks.py).

    python tools/create_sam_masks.py --data-root data/nuscenes \
        --ann-file nuscenes_infos_train.pkl --save-path data/sam_points \
        --model facebook/sam-vit-huge --device cpu

Requires SAM weights reachable offline (local path or cached HF id).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--ann-file", required=True)
    p.add_argument("--save-path", required=True)
    p.add_argument("--model", default="facebook/sam-vit-huge")
    p.add_argument("--device", default="cpu")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    from efficient_multimodal_perception_tpu.data.sam_masks import (
        create_sam_labeled_points,
    )

    create_sam_labeled_points(
        args.data_root, args.ann_file, args.save_path,
        model_path=args.model, device=args.device, limit=args.limit,
    )


if __name__ == "__main__":
    main()
