#!/usr/bin/env python
"""SAM checkpoint setup + self-test (reference utils/SAM.py parity).

The reference downloads checkpoints and runs a random-box predict
(:152-204). This environment has no egress, so the tool validates a local
checkpoint (conversion + a box predict on random data) and patches configs.

Usage: python tools/sam_setup.py [--checkpoint sam_vit_b_01ec64.pth]
       [--config configs/mono/KITTI/base_config.yaml]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="sam_vit_b_01ec64.pth")
    ap.add_argument("--config", default=None)
    args = ap.parse_args()

    if not os.path.exists(args.checkpoint):
        print(f"checkpoint {args.checkpoint} not found.")
        print("This environment has no network egress; place the file locally:")
        print("  sam_vit_b_01ec64.pth (https://dl.fbaipublicfiles.com/segment_anything/)")
        return 1

    from lvdgs_tpu.models.sam.inference import SAMSegmenter

    print("converting checkpoint...")
    seg = SAMSegmenter.from_checkpoint(args.checkpoint)
    print("running self-test (random image, one box)...")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(256, 320, 3), dtype=np.uint8)
    masks = seg(img, np.asarray([[40, 40, 200, 180]], np.float32))
    print(f"self-test OK: mask shape {masks.shape}, positive px {int(masks.sum())}")

    if args.config:
        import yaml

        with open(args.config) as f:
            cfg = yaml.full_load(f)
        cfg.setdefault("dynamic_filtering", {})["sam_checkpoint"] = os.path.abspath(
            args.checkpoint
        )
        cfg["dynamic_filtering"]["use_sam"] = True
        with open(args.config, "w") as f:
            yaml.safe_dump(cfg, f)
        print(f"patched {args.config}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
