#!/usr/bin/env python
"""Extract a NuScenes CAM_FRONT frame range into a flat SLAM dataset dir
(reference utils/nuscense_tiqu.py parity).

Usage: python tools/nuscenes_extract.py --src /data/nuscenes/samples/CAM_FRONT \
           --dst /data/slam/scene0 --begin 0 --end 200
"""
import argparse
import glob
import os
import shutil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--begin", type=int, default=0)
    ap.add_argument("--end", type=int, default=None)
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(args.src, "*.jpg")))[args.begin : args.end]
    out_dir = os.path.join(args.dst, "rgb")
    os.makedirs(out_dir, exist_ok=True)
    for i, f in enumerate(files):
        shutil.copy(f, os.path.join(out_dir, f"{i:06d}.jpg"))
    print(f"copied {len(files)} frames to {out_dir}")


if __name__ == "__main__":
    main()
