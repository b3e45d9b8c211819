#!/usr/bin/env python
"""Batch dynamic/static detection over an image folder.

Reference test_dino2.py parity (EnhancedDynamicStaticDetector :28): runs the
masking stack over every image in a folder, writes colored overlays,
per-image JSON and a batch overview report. Works model-free via the
fallback ladder (flow/heuristics) and uses GroundingDINO+SAM when
checkpoints are given.

Usage: python tools/batch_detect.py --input imgs/ --output out/
       [--scene outdoor_street] [--gdino ckpt.pth] [--sam ckpt.pth]
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default="./batch_detection")
    ap.add_argument("--scene", default="outdoor_street")
    ap.add_argument("--gdino", default=None)
    ap.add_argument("--sam", default=None)
    ap.add_argument("--box-threshold", type=float, default=0.35)
    args = ap.parse_args()

    from PIL import Image

    from lvdgs_tpu.perception.masking import DynamicObjectMasker
    from lvdgs_tpu.eval.viz import mask_overlay

    masker = DynamicObjectMasker(
        scene_type=args.scene,
        grounding_dino_checkpoint=args.gdino,
        sam_checkpoint=args.sam,
        box_threshold=args.box_threshold,
    )

    paths = sorted(
        sum((glob.glob(os.path.join(args.input, p)) for p in ("*.png", "*.jpg", "*.jpeg")), [])
    )
    os.makedirs(args.output, exist_ok=True)
    report = {"scene": args.scene, "images": [], "started": time.strftime("%F %T")}
    for i, path in enumerate(paths):
        img = np.asarray(Image.open(path).convert("RGB"))
        t0 = time.time()
        static = masker.get_static_mask(img, frame_idx=i)
        dt = time.time() - t0
        name = os.path.splitext(os.path.basename(path))[0]
        mask_overlay(img, ~static, path=os.path.join(args.output, f"{name}_overlay.png"))
        Image.fromarray((static * 255).astype(np.uint8)).save(
            os.path.join(args.output, f"{name}_static.png")
        )
        entry = {
            "image": path,
            "static_ratio": float(static.mean()),
            "seconds": round(dt, 3),
        }
        report["images"].append(entry)
        print(f"[{i+1}/{len(paths)}] {name}: static {entry['static_ratio']:.1%} ({dt:.2f}s)")

    report["mean_static_ratio"] = float(
        np.mean([e["static_ratio"] for e in report["images"]]) if report["images"] else 1.0
    )
    with open(os.path.join(args.output, "batch_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {os.path.join(args.output, 'batch_report.json')}")


if __name__ == "__main__":
    main()
