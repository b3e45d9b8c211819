#!/usr/bin/env python
"""Measure per-tile blending saturation on a bench-scale trained map.

Runs the first frames of the bench scenario (init mapping + one mapped
keyframe), then renders every window camera and reports the distribution of
the LAST contributing slot index per tile (from per-slot touched counts).
If p99.9 of that index is well below max_per_tile, the tail slots are dead
weight (per-pixel transmittance early-stop has already fired) and
max_per_tile can shrink — cutting the gather/blend/scatter rows that
dominate the render cost (see PERFORMANCE.md).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_config
    from lvdgs_tpu.slam.system import SLAM
    from lvdgs_tpu.ops.rasterizer import prepare_bins, rasterize
    from lvdgs_tpu.ops.rasterizer_pallas import pallas_blend

    n_frames = int(os.environ.get("SAT_FRAMES", "7"))
    config = build_config()
    config["Dataset"]["n_frames"] = n_frames + 1
    config["Results"].update({"save_results": False})
    slam = SLAM(config, save_dir=None)
    slam.save_results = False
    slam.do_eval_rendering = False
    slam.do_color_refinement = False
    for idx in range(n_frames + 1):
        slam.process_frame(idx)
    print(
        f"map: {int(slam.gmap.num_active)} active / {slam.gmap.capacity} cap, "
        f"{len(slam.kf_indices)} keyframes",
        file=sys.stderr,
    )

    intr, rcfg = slam.intr, slam.rcfg
    ntx, nty = rcfg.grid(intr)
    p = slam.gmap.params()

    last_slots, counts_all, psnr_pairs = [], [], []
    for kf_idx in slam.current_window:
        slot = slam.kf_slots[kf_idx]
        R = slam.kfbuf.R[slot]
        T = slam.kfbuf.T[slot]
        bins = prepare_bins(p, slam.gmap.active, R, T, intr, rcfg)
        tile_idx, slot_valid = bins
        counts = np.asarray(slot_valid.sum(axis=1))
        counts_all.append(counts)

        # per-(tile, slot) touched counts straight from the Pallas kernel
        from lvdgs_tpu.ops.rasterizer import project_gaussians
        from lvdgs_tpu.gaussian.model import SH_C0

        proj = project_gaussians(
            p["means"], p["quats"], p["log_scales"], slam.gmap.active, R, T, intr
        )
        colors = jnp.clip(0.5 + SH_C0 * p["features_dc"], 0.0, 1.0)
        opac = jnp.where(
            slam.gmap.active, jax.nn.sigmoid(p["logit_opacities"]), 0.0
        )
        C = p["means"].shape[0]
        pad = lambda arr: jnp.concatenate(
            [arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)], 0
        )
        fields = jnp.concatenate(
            [
                pad(proj["mean2d"]),
                pad(proj["conic"]),
                pad(colors),
                pad(proj["depth"][:, None]),
                pad(opac[:, None]),
            ],
            axis=1,
        )
        tp = fields[jnp.minimum(tile_idx, C).T]
        cnts = slot_valid.sum(axis=1).astype(jnp.int32)
        acc, trans, nt = pallas_blend(
            tp, cnts, ntx, nty, rcfg.tile_size, rcfg.tile_group, False
        )
        nt = np.asarray(nt)  # (T, K) touched pixel counts per slot
        contributing = nt > 0
        K = nt.shape[1]
        last = np.where(
            contributing.any(axis=1),
            K - 1 - np.argmax(contributing[:, ::-1], axis=1),
            -1,
        )
        last_slots.append(last)

        # quality of this render vs K-truncated variants
        gt = np.asarray(slam._cams[kf_idx].image)
        for Ktrunc in (K, 192, 128, 96, 64):
            tpk = tp[:Ktrunc]
            ck = jnp.minimum(cnts, Ktrunc)
            acc_k, trans_k, _ = pallas_blend(
                tpk, ck, ntx, nty, rcfg.tile_size, rcfg.tile_group, False
            )
            img_t = acc_k[:, :3, :].transpose(0, 2, 1)
            from lvdgs_tpu.ops.rasterizer import _tiles_to_image

            img = np.asarray(
                _tiles_to_image(img_t, ntx, nty, rcfg.tile_size, intr.height, intr.width)
            ).transpose(2, 0, 1)
            mse = float(np.mean((img - gt) ** 2))
            psnr = -10.0 * np.log10(max(mse, 1e-12))
            psnr_pairs.append((kf_idx, Ktrunc, psnr))

    last = np.concatenate(last_slots)
    counts = np.concatenate(counts_all)
    print(f"bin counts: mean {counts.mean():.0f} p50 {np.percentile(counts,50):.0f} "
          f"p99 {np.percentile(counts,99):.0f} max {counts.max()}")
    lastc = last[last >= 0]
    print(f"last contributing slot: mean {lastc.mean():.0f} "
          f"p50 {np.percentile(lastc,50):.0f} p99 {np.percentile(lastc,99):.0f} "
          f"p99.9 {np.percentile(lastc,99.9):.0f} max {lastc.max()}")
    for kf_idx, Ktrunc, psnr in psnr_pairs:
        print(f"kf {kf_idx} K={Ktrunc}: psnr {psnr:.2f} dB")


if __name__ == "__main__":
    main()
