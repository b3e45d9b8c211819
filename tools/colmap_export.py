#!/usr/bin/env python
"""Export a saved SLAM run to COLMAP (database.db + sparse text model).

TPU-native counterpart of the reference's MASt3R->COLMAP tooling
(mast3r/colmap/database.py): estimated poses become image pose priors,
the gaussian map becomes points3D, and (optionally) MASt3R reciprocal-NN
matches between consecutive keyframes populate keypoints/matches for
COLMAP triangulation or BA downstream.

Run: python tools/colmap_export.py --config <cfg> --checkpoint <dir> \
     --out <dir> [--match-keyframes]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True,
                    help="SLAM.save_state checkpoint dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--match-keyframes", action="store_true",
                    help="populate keypoints/matches between consecutive "
                         "keyframes via MASt3R descriptors (needs a real "
                         "checkpoint via LVDGS_MAST3R_CKPT, or falls back "
                         "to the GT-consistent oracle on synthetic data)")
    args = ap.parse_args()

    from lvdgs_tpu.core.config import load_config
    from lvdgs_tpu.io.colmap import export_slam_to_colmap
    from lvdgs_tpu.slam.system import SLAM

    cfg = load_config(args.config)
    slam = SLAM(cfg, save_dir=None)
    slam.load_state(args.checkpoint)

    matcher = None
    pairs = None
    if args.match_keyframes:
        import numpy as np

        from lvdgs_tpu.models.mast3r.matching import fast_reciprocal_nns

        ckpt = os.environ.get("LVDGS_MAST3R_CKPT")
        if ckpt:
            from lvdgs_tpu.models.mast3r.inference import MASt3RInference

            model = MASt3RInference.from_checkpoint(ckpt)
        else:
            from lvdgs_tpu.models.mast3r.oracle import OracleMASt3R

            model = OracleMASt3R(slam.dataset, slam.intr)

        def matcher(a, b):
            img_a = np.asarray(slam.dataset[a][0])
            img_b = np.asarray(slam.dataset[b][0])
            p1, p2, (H, W) = model.infer_pair(img_a, img_b)
            m1, m2 = fast_reciprocal_nns(p1["desc"][0], p2["desc"][0])
            # matches live at the model's prediction resolution; rescale
            sx = slam.intr.width / W
            sy = slam.intr.height / H
            scale = np.array([sx, sy], np.float32)
            return m1 * scale, m2 * scale

        kfs = sorted(slam.kf_indices)
        pairs = list(zip(kfs[:-1], kfs[1:]))

    db = export_slam_to_colmap(slam, args.out, match_pairs=pairs,
                               matcher=matcher)
    print(f"COLMAP export written: {db} + {args.out}/sparse/")


if __name__ == "__main__":
    main()
