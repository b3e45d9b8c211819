#!/usr/bin/env python
"""DINOv2 feature analyzer (reference dinov2.py parity).

Per-layer feature heatmaps, attention maps, semantic PCA heatmaps and a
feature-evolution summary for one image. The reference hooks every torch
block (dinov2.py:54-79); our JAX forward returns all blocks directly.

Usage: python tools/dinov2_analyze.py --image img.png --output out/
       [--checkpoint dinov2_vitb14.pth] [--layers 0 5 11]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--output", default="./dinov2_analysis")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--model", default="vitb14")
    ap.add_argument("--layers", type=int, nargs="*", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    from lvdgs_tpu.models.dinov2.model import (
        DINOv2Config, dinov2_forward, init_params, convert_state_dict,
    )

    cfg = DINOv2Config()
    if args.checkpoint and os.path.exists(args.checkpoint):
        import torch

        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        params = convert_state_dict(sd.get("model", sd), cfg)
        print(f"loaded checkpoint {args.checkpoint}")
    else:
        params = init_params(jax.random.PRNGKey(0), cfg)
        print("WARNING: no checkpoint — random weights (structure analysis only)")

    img = Image.open(args.image).convert("RGB")
    side = 518
    img = img.resize((side, side))
    x = np.asarray(img, np.float32) / 255.0
    x = (x - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    x = x.transpose(2, 0, 1)[None]

    out = dinov2_forward(params, jnp.asarray(x), cfg)
    h, w = out["grid"]
    os.makedirs(args.output, exist_ok=True)
    layers = args.layers or list(range(cfg.depth))

    stats = []
    for li in layers:
        tok = np.asarray(out["tokens"][li][0, 1:])  # (N, D)
        att = np.asarray(out["attn"][li][0])  # (heads, 1+N, 1+N)
        # feature-norm heatmap
        heat = np.linalg.norm(tok, axis=-1).reshape(h, w)
        plt.imsave(os.path.join(args.output, f"layer{li:02d}_featnorm.png"),
                   heat, cmap="viridis")
        # cls-attention map (mean over heads)
        cls_att = att[:, 0, 1:].mean(0).reshape(h, w)
        plt.imsave(os.path.join(args.output, f"layer{li:02d}_clsattn.png"),
                   cls_att, cmap="inferno")
        # semantic heatmap: PCA of tokens -> 3 channels
        tc = tok - tok.mean(0)
        u, s, vt = np.linalg.svd(tc, full_matrices=False)
        pca = (u[:, :3] * s[:3]).reshape(h, w, 3)
        pca = (pca - pca.min()) / (pca.ptp() + 1e-9)
        plt.imsave(os.path.join(args.output, f"layer{li:02d}_pca.png"), pca)
        stats.append({"layer": li, "feat_norm_mean": float(heat.mean()),
                      "feat_std": float(tok.std()),
                      "attn_entropy": float(-(att * np.log(att + 1e-9)).sum(-1).mean())})

    # feature evolution plot
    fig, ax = plt.subplots(1, 2, figsize=(10, 4))
    ax[0].plot([s["layer"] for s in stats], [s["feat_norm_mean"] for s in stats], "o-")
    ax[0].set_title("feature norm by layer")
    ax[1].plot([s["layer"] for s in stats], [s["attn_entropy"] for s in stats], "o-")
    ax[1].set_title("attention entropy by layer")
    fig.savefig(os.path.join(args.output, "feature_evolution.png"), dpi=90)

    import json

    with open(os.path.join(args.output, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(f"wrote analysis for {len(layers)} layers to {args.output}")


if __name__ == "__main__":
    main()
