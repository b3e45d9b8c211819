"""Rendering-quality evaluation: PSNR / SSIM / LPIPS, full-image and
static-region variants.

Parity with reference eval_rendering (utils/eval_utils_0806.py:172-437):
every non-keyframe frame is rendered from its estimated pose and compared to
GT; when a static mask exists, additional metrics are computed with dynamic
pixels filled by the background color. LPIPS uses torchmetrics (CPU torch)
when available and is skipped gracefully otherwise (the reference's
unconditional wandb/torchmetrics imports are a fragility we drop).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.camera import Intrinsics
from ..core.losses import psnr as psnr_fn, ssim as ssim_fn
from ..core.log import Log
from ..ops.rasterizer import RenderConfig, rasterize

_lpips_metric = None


def _lpips(a: np.ndarray, b: np.ndarray) -> Optional[float]:
    """LPIPS(alex) via torchmetrics on CPU; None when unavailable.

    This offline environment has no alexnet weights, so LPIPS is usually
    unreported (the key is OMITTED from results — never a sentinel; see
    BASELINE.md). To enable it, point LVDGS_LPIPS_WEIGHTS at a directory
    containing a torchvision-style cache (hub/checkpoints/alexnet-*.pth):
    it becomes TORCH_HOME before the metric is constructed.
    """
    global _lpips_metric
    try:
        if _lpips_metric is None:
            w = os.environ.get("LVDGS_LPIPS_WEIGHTS")
            if w:
                os.environ.setdefault("TORCH_HOME", w)
            import torch
            from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity

            _lpips_metric = LearnedPerceptualImagePatchSimilarity(
                net_type="alex", normalize=True
            )
        import torch

        ta = torch.from_numpy(a[None]).float()
        tb = torch.from_numpy(b[None]).float()
        return float(_lpips_metric(ta.clamp(0, 1), tb.clamp(0, 1)))
    except Exception:
        return None


def eval_rendering(
    gmap,
    frames: Dict[int, dict],
    dataset,
    intr: Intrinsics,
    rcfg: RenderConfig,
    save_dir: Optional[str] = None,
    kf_indices: Optional[List[int]] = None,
    iteration: str = "final",
    max_frames: Optional[int] = None,
    viz_every: int = 1,
) -> Dict[str, float]:
    """Render every non-keyframe frame from its estimated pose.

    `frames` maps frame_idx -> {"R","T",...} plus optionally "static_mask"
    (H, W) bool. Returns mean psnr/ssim/lpips (+ *_static when masks exist).

    With `save_dir` set, every `viz_every`-th evaluated frame also writes
    the reference's per-frame artifacts (utils/eval_utils_0806.py:317-386):
    render/depth PNG dumps plus the 6-panel GT/render/residual/depths/mask
    figure (eval/viz.py). `viz_every=1` is reference parity; raise it to
    thin the dumps on long sequences.
    """
    kf_set = set(kf_indices or [])
    img_pred, img_gt = [], []
    psnrs, ssims, lpipss = [], [], []
    psnrs_s, ssims_s = [], []
    nonfinite_frames: List[int] = []

    params = gmap.params()
    active = gmap.active
    bg = np.ones(3, np.float32) if rcfg.white_background else np.zeros(3, np.float32)

    end = len(dataset) if max_frames is None else min(len(dataset), max_frames)
    interval = 1
    for idx in range(0, end, interval):
        if idx in kf_set or idx not in frames:
            continue
        f = frames[idx]
        if not (np.all(np.isfinite(f["R"])) and np.all(np.isfinite(f["T"]))):
            nonfinite_frames.append(idx)
            Log(f"eval frame {idx}: non-finite pose, skipped", tag="Eval")
            continue
        image, _, _, mono_depth = dataset[idx]
        gt = jnp.asarray(image)
        out = rasterize(
            params, active, jnp.asarray(f["R"]), jnp.asarray(f["T"]), intr, rcfg
        )
        render = jnp.clip(out.image, 0.0, 1.0)
        valid = (gt.sum(axis=0) > 0.01)[None]
        p = float(psnr_fn(render, gt, valid))
        s = float(ssim_fn(render, gt))
        if not (np.isfinite(p) and np.isfinite(s)):
            # a non-finite score means the RENDER contains NaN/Inf (map or
            # pose corruption) — surface it loudly instead of poisoning the
            # mean or silently dropping it
            nonfinite_frames.append(idx)
            Log(f"eval frame {idx}: non-finite render (psnr={p}, ssim={s}), "
                "excluded from means", tag="Eval")
            continue
        psnrs.append(p)
        ssims.append(s)
        lp = _lpips(np.asarray(render), np.asarray(gt))
        if lp is not None:
            lpipss.append(lp)

        static = f.get("static_mask")
        if hasattr(dataset, "get_gt_static_mask"):
            # dynamic synthetic scenes carry occlusion-exact GT masks — use
            # them for the static-region metrics so masked and unmasked runs
            # are scored on the IDENTICAL pixel set (the per-run detector
            # mask would bias the comparison toward its own run)
            gt_static = dataset.get_gt_static_mask(idx)
            if gt_static is not None:
                static = np.asarray(gt_static)
        if static is not None:
            sm = jnp.asarray(static)[None]
            render_s = jnp.where(sm, render, jnp.asarray(bg)[:, None, None])
            gt_s = jnp.where(sm, gt, jnp.asarray(bg)[:, None, None])
            ps = float(psnr_fn(render_s, gt_s, valid & sm))
            ss = float(ssim_fn(render_s, gt_s))
            if np.isfinite(ps) and np.isfinite(ss):  # empty static region -> NaN
                psnrs_s.append(ps)
                ssims_s.append(ss)

        if save_dir is not None and idx % viz_every == 0:
            _dump_frame(save_dir, iteration, idx, np.asarray(render), np.asarray(gt),
                        np.asarray(out.depth[0]))
            try:
                from .viz import six_panel

                six_panel(
                    gt,
                    render,
                    np.asarray(out.depth[0]),
                    np.asarray(mono_depth) if mono_depth is not None
                    else np.asarray(out.depth[0]),
                    static,
                    idx,
                    os.path.join(save_dir, f"panels_{iteration}"),
                )
            except Exception as e:  # viz is best-effort (matplotlib optional)
                Log(f"six_panel viz failed for frame {idx}: {e}", tag="Eval")

    result = {
        "mean_psnr": float(np.mean(psnrs)) if psnrs else 0.0,
        "mean_ssim": float(np.mean(ssims)) if ssims else 0.0,
        "n_eval_frames": len(psnrs),
    }
    if nonfinite_frames:
        result["n_nonfinite_frames"] = len(nonfinite_frames)
        result["nonfinite_frames"] = nonfinite_frames[:20]
    # LPIPS needs alexnet weights, absent in offline envs — omit the key
    # rather than emit a sentinel (VERDICT r3 #8; see _lpips docstring)
    if lpipss:
        result["mean_lpips"] = float(np.mean(lpipss))
    if psnrs_s:
        result["mean_psnr_static"] = float(np.mean(psnrs_s))
        result["mean_ssim_static"] = float(np.mean(ssims_s))
    lp_str = (f"LPIPS {result['mean_lpips']:.4f}" if lpipss
              else "LPIPS unavailable (no alexnet weights)")
    Log(
        f"Rendering eval [{iteration}]: PSNR {result['mean_psnr']:.2f} dB, "
        f"SSIM {result['mean_ssim']:.4f}, {lp_str} "
        f"({result['n_eval_frames']} frames)",
        tag="Eval",
    )
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, f"metrics_{iteration}.json"), "w") as f:
            json.dump(result, f, indent=2)
    from .ate import _wandb_log

    _wandb_log({f"render/{k}": v for k, v in result.items() if isinstance(v, float)})
    return result


def _dump_frame(save_dir, iteration, idx, render, gt, depth):
    try:
        from PIL import Image

        d = os.path.join(save_dir, f"renders_{iteration}")
        os.makedirs(d, exist_ok=True)
        Image.fromarray(
            (np.clip(render, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        ).save(os.path.join(d, f"{idx:05d}.png"))
        np.save(os.path.join(d, f"depth_{idx:05d}.npy"), depth)
    except Exception:
        pass
