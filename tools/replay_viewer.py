#!/usr/bin/env python
"""Replay viewer for HeadlessViewer packet directories.

Closes the L11 GUI loop (SURVEY.md, VERDICT r2 #4/#7): the SLAM system's
`Results.use_gui: True` feed writes `<save_dir>/gui/` with
  live_NNNNNN.png   — per-frame renders
  live_map.ply      — rolling splat point cloud (xyz + rgb)
  trajectory.jsonl  — append-only camera/keyframe pose feed
and this tool turns that into a composite view: splat cloud (top-down +
side), the camera trajectory with keyframe markers and the current window
highlighted, plus the latest render — the same information surface as the
reference's Open3D SLAM viewer (utils/slam_frontend.py:1524-1531) without
needing a display server on the TPU host.

Usage:
  python tools/replay_viewer.py results/<run>/gui                 # one PNG
  python tools/replay_viewer.py results/<run>/gui --animate       # PNG per record
  python tools/replay_viewer.py results/<run>/gui --follow        # poll live
  python tools/replay_viewer.py results/<run>/gui --show          # interactive

Matplotlib-only on purpose: runs everywhere the test env runs.
"""
import argparse
import glob
import json
import os
import sys
import time

import numpy as np


def read_ply(path):
    """Minimal reader for HeadlessViewer._write_ply output."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        n = int([l for l in header.decode().splitlines() if l.startswith("element vertex")][0].split()[-1])
        rec = np.frombuffer(
            f.read(n * 15), dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)]
        )
    return rec["xyz"].copy(), rec["rgb"].copy() / 255.0


def read_trajectory(path):
    recs = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        recs.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass  # torn tail write during --follow
    return recs


def cam_center(rec):
    """w2c (R, T) -> camera center -R^T T."""
    R = np.asarray(rec["R"])
    T = np.asarray(rec["T"])
    return -R.T @ T


def compose(gui_dir, out_path, upto=None, show=False):
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    recs = read_trajectory(os.path.join(gui_dir, "trajectory.jsonl"))
    if upto is not None:
        recs = recs[: upto + 1]
    ply = os.path.join(gui_dir, "live_map.ply")
    pts = cols = None
    if os.path.exists(ply):
        try:
            pts, cols = read_ply(ply)
        except Exception:
            pass
    renders = sorted(glob.glob(os.path.join(gui_dir, "live_*.png")))
    if upto is not None and recs:
        n = recs[-1]["n"]
        renders = [r for r in renders if int(os.path.basename(r)[5:11]) <= n]

    fig = plt.figure(figsize=(15, 8))
    ax_top = fig.add_subplot(2, 2, 1)
    ax_side = fig.add_subplot(2, 2, 3)
    ax_render = fig.add_subplot(1, 2, 2)

    if pts is not None and len(pts):
        sub = np.random.default_rng(0).choice(
            len(pts), size=min(len(pts), 60000), replace=False
        )
        # w2c convention: x right, y down, z forward -> top-down = (x, z)
        ax_top.scatter(pts[sub, 0], pts[sub, 2], s=0.3, c=cols[sub], linewidths=0)
        ax_side.scatter(pts[sub, 2], -pts[sub, 1], s=0.3, c=cols[sub], linewidths=0)
    if recs:
        centers = np.array([cam_center(r["frame"]) for r in recs])
        ax_top.plot(centers[:, 0], centers[:, 2], "-", color="tab:red", lw=1.5,
                    label="trajectory")
        ax_side.plot(centers[:, 2], -centers[:, 1], "-", color="tab:red", lw=1.0)
        last = recs[-1]
        kfs = np.array([cam_center(k) for k in last["keyframes"]]) if last[
            "keyframes"
        ] else np.zeros((0, 3))
        if len(kfs):
            ax_top.scatter(kfs[:, 0], kfs[:, 2], marker="^", s=60,
                           color="tab:blue", label="window KFs", zorder=3)
        ax_top.scatter(*centers[-1, [0, 2]], marker="o", s=80, color="black",
                       label=f"frame {last['frame']['uid']}", zorder=4)
        ax_top.legend(loc="upper right", fontsize=8)
    ax_top.set_title("top-down (x, z)")
    ax_top.set_aspect("equal", adjustable="datalim")
    ax_side.set_title("side (z, -y)")
    ax_side.set_aspect("equal", adjustable="datalim")

    if renders:
        from PIL import Image

        ax_render.imshow(np.asarray(Image.open(renders[-1])))
        ax_render.set_title(os.path.basename(renders[-1]))
    ax_render.axis("off")
    fig.suptitle(f"LVD-GS-TPU replay — {gui_dir}")
    fig.tight_layout()
    if show:
        plt.show()
    else:
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
        print(f"wrote {out_path}")
    return len(recs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("gui_dir", help="HeadlessViewer output dir (<save_dir>/gui)")
    ap.add_argument("--out", default=None, help="output PNG (default <gui_dir>/replay.png)")
    ap.add_argument("--animate", action="store_true",
                    help="write one composite PNG per trajectory record")
    ap.add_argument("--follow", action="store_true",
                    help="poll the dir and refresh the composite every 2s")
    ap.add_argument("--show", action="store_true", help="interactive window")
    args = ap.parse_args()

    if not os.path.isdir(args.gui_dir):
        sys.exit(f"not a directory: {args.gui_dir}")
    out = args.out or os.path.join(args.gui_dir, "replay.png")

    if args.animate:
        recs = read_trajectory(os.path.join(args.gui_dir, "trajectory.jsonl"))
        frames_dir = os.path.join(args.gui_dir, "replay_frames")
        os.makedirs(frames_dir, exist_ok=True)
        for i in range(len(recs)):
            compose(args.gui_dir, os.path.join(frames_dir, f"replay_{i:05d}.png"),
                    upto=i)
        return
    if args.follow:
        seen = -1
        while True:
            n = compose(args.gui_dir, out)
            if n != seen:
                seen = n
            time.sleep(2)
    compose(args.gui_dir, out, show=args.show)


if __name__ == "__main__":
    main()
