#!/usr/bin/env python
"""Semantic mask labeler: per-class id masks + colored masks + batch report.

Reference test_dino2_label.py parity (EnhancedSemanticSegmentationDetector):
open-vocabulary detection per class prompt, each class rendered with a
stable color and an integer id mask written alongside.

Usage: python tools/semantic_label.py --input imgs/ --output out/
       [--classes "car,person,building"] [--gdino ckpt] [--sam ckpt]
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

PALETTE = np.array(
    [[220, 20, 60], [0, 128, 255], [60, 180, 75], [255, 225, 25], [145, 30, 180],
     [245, 130, 48], [70, 240, 240], [240, 50, 230], [210, 245, 60], [0, 0, 128]],
    np.uint8,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default="./semantic_labels")
    ap.add_argument("--classes", default="car,truck,bus,person,bicycle")
    ap.add_argument("--gdino", default=None)
    ap.add_argument("--sam", default=None)
    ap.add_argument("--box-threshold", type=float, default=0.35)
    args = ap.parse_args()

    from PIL import Image

    detector = segmenter = None
    if args.gdino and os.path.exists(args.gdino):
        from lvdgs_tpu.models.groundingdino.inference import load_detector

        detector = load_detector(args.gdino)
    if args.sam and os.path.exists(args.sam):
        from lvdgs_tpu.models.sam.inference import load_segmenter

        segmenter = load_segmenter(args.sam)

    classes = [c.strip() for c in args.classes.split(",") if c.strip()]
    paths = sorted(
        sum((glob.glob(os.path.join(args.input, p)) for p in ("*.png", "*.jpg")), [])
    )
    os.makedirs(args.output, exist_ok=True)
    report = {"classes": classes, "images": []}
    for path in paths:
        img = np.asarray(Image.open(path).convert("RGB"))
        H, W = img.shape[:2]
        id_mask = np.zeros((H, W), np.uint8)
        colored = img.copy()
        counts = {}
        if detector is not None:
            for ci, cls in enumerate(classes, start=1):
                boxes, scores = detector(img, cls + " .", args.box_threshold)
                counts[cls] = int(len(boxes))
                for box in boxes.astype(int):
                    x0, y0, x1, y1 = np.clip(box, 0, [W, H, W, H])
                    if segmenter is not None:
                        m = segmenter(img, np.asarray([box], np.float32))[0]
                    else:
                        m = np.zeros((H, W), bool)
                        m[y0:y1, x0:x1] = True
                    id_mask[m] = ci
                    colored[m] = (
                        0.5 * colored[m] + 0.5 * PALETTE[(ci - 1) % len(PALETTE)]
                    ).astype(np.uint8)
        name = os.path.splitext(os.path.basename(path))[0]
        Image.fromarray(id_mask).save(os.path.join(args.output, f"{name}_ids.png"))
        Image.fromarray(colored).save(os.path.join(args.output, f"{name}_colored.png"))
        report["images"].append({"image": path, "counts": counts})
        print(f"{name}: {counts if counts else 'no detector — empty masks'}")

    with open(os.path.join(args.output, "label_report.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
