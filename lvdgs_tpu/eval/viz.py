"""Evaluation visualisations.

Parity with the reference's visual QA harnesses (SURVEY.md §4.3):
- save_depth_comparison: 4-panel rendered/mono depth + error + RGB
  (reference utils/init_pose.py:211-273)
- six_panel: per-frame GT/render/residual/depths/mask figure
  (reference utils/eval_utils_0806.py:317-379)
- mask_overlay: red/yellow dynamic-mask keyframe dumps
  (reference utils/slam_frontend.py:1538-1577)
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _norm(x):
    lo, hi = float(np.min(x)), float(np.max(x))
    return (x - lo) / (hi - lo + 1e-12)


def save_depth_comparison(render_depth, mono_depth, rgb, cur_frame_idx, save_dir):
    """4-panel depth comparison; returns the saved path."""
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)
    render_depth = np.asarray(render_depth)
    if render_depth.ndim == 3:
        render_depth = render_depth[0]
    mono_depth = np.asarray(mono_depth)
    rgb_img = np.asarray(rgb)
    if rgb_img.ndim == 3 and rgb_img.shape[0] == 3:
        rgb_img = rgb_img.transpose(1, 2, 0)

    err = np.abs(render_depth - mono_depth)
    fig, axes = plt.subplots(2, 2, figsize=(12, 10))
    fig.suptitle(f"Frame {cur_frame_idx}", fontsize=20, y=0.93)
    im0 = axes[0, 0].imshow(_norm(render_depth), cmap="viridis", vmin=0, vmax=1)
    axes[0, 0].set_title("Rendered Depth")
    axes[0, 1].imshow(_norm(mono_depth), cmap="viridis", vmin=0, vmax=1)
    axes[0, 1].set_title("Pointmap Mono Depth")
    fig.colorbar(im0, ax=axes[0, :], orientation="horizontal", fraction=0.05, pad=0.1)
    im1 = axes[1, 0].imshow(_norm(err), cmap="magma", vmin=0, vmax=1)
    axes[1, 0].set_title("Depth Error")
    fig.colorbar(im1, ax=axes[1, 0], orientation="horizontal", fraction=0.05, pad=0.1)
    axes[1, 1].imshow(np.clip(rgb_img, 0, 1))
    axes[1, 1].set_title("RGB")
    for ax in axes.ravel():
        ax.axis("off")
    path = os.path.join(save_dir, f"{cur_frame_idx}.png")
    fig.savefig(path)
    plt.close(fig)
    return path


def six_panel(gt, render, render_depth, mono_depth, static_mask, idx, save_dir):
    """GT / render / residual / depths / mask figure."""
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)
    gt = np.asarray(gt).transpose(1, 2, 0)
    render = np.asarray(render).transpose(1, 2, 0)
    resid = np.abs(gt - render).mean(-1)
    fig, axes = plt.subplots(2, 3, figsize=(16, 7))
    panels = [
        (np.clip(gt, 0, 1), "GT", None),
        (np.clip(render, 0, 1), "Render", None),
        (_norm(resid), "Residual", "magma"),
        (_norm(np.asarray(render_depth)), "Render depth", "viridis"),
        (_norm(np.asarray(mono_depth)), "Mono depth", "viridis"),
        (
            np.asarray(static_mask).astype(float)
            if static_mask is not None
            else np.ones(resid.shape),
            "Static mask",
            "gray",
        ),
    ]
    for ax, (img, title, cmap) in zip(axes.ravel(), panels):
        ax.imshow(img, cmap=cmap)
        ax.set_title(title)
        ax.axis("off")
    path = os.path.join(save_dir, f"panel_{idx:05d}.png")
    fig.savefig(path, dpi=90)
    plt.close(fig)
    return path


def mask_overlay(image_u8, dynamic_mask, expanded_mask=None, path: Optional[str] = None):
    """Red = dynamic, yellow = expansion margin (reference keyframe dumps)."""
    out = np.asarray(image_u8).copy()
    dm = np.asarray(dynamic_mask).astype(bool)
    out[dm] = [255, 0, 0]
    if expanded_mask is not None:
        em = np.asarray(expanded_mask).astype(bool) & ~dm
        out[em] = [255, 255, 0]
    if path is not None:
        from PIL import Image

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        Image.fromarray(out).save(path)
    return out
