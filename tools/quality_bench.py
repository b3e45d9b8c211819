#!/usr/bin/env python
"""Quality benchmark: full SLAM on the textured street scene, reporting the
reference-comparable metric pair — final trajectory ATE RMSE and rendering
PSNR/SSIM/LPIPS (full-image), exactly the numbers the reference's
eval_utils_0806.py computes for KITTI runs (VERDICT r2 #4).

The scene is the real-data-faithful synthetic street (lvdgs_tpu/data/
datasets.py:_street_scene): KITTI camera geometry and depth range, textured
surfaces, per-frame exposure jitter + sensor noise (the tracker's exposure
affine must absorb it), and a mono-depth prior with a 0.8x global scale
error + noise (the patch-based scale alignment must recover it).

Pose seeding: the street config defaults Training.pose_seed to `sim_prior`
— a GT-derived emulation of the reference's MASt3R-PnP per-frame prior
(GT relative pose + 2 cm / 0.2 deg noise, map scale calibrated from GT
depth at keyframes; slam/system.py:_pose_seed/_observe_map_scale). The
published numbers are therefore NOT prior-free; `pose_seed` is recorded in
the emitted JSON for exactly this reason. Pass --seed-mode
constant_velocity for the harder no-prior ablation.

Writes results/quality_bench.json and prints one JSON line:
  {"ate_rmse_m": ..., "psnr_db": ..., "ssim": ..., "lpips": ...,
   "fps": ..., "n_frames": ..., "n_keyframes": ...}

Run: python tools/quality_bench.py [--frames 90] [--refine 2000]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def build_config(n_frames: int, refine_iters: int, dynamic_objects: int = 0):
    from lvdgs_tpu.core.config import load_config

    cfg = load_config(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs", "mono", "synthetic", "street.yaml",
        )
    )
    cfg["Dataset"]["n_frames"] = n_frames
    cfg["Dataset"]["dynamic_objects"] = dynamic_objects
    cfg["Results"]["color_refinement_iters"] = refine_iters
    cfg["Results"]["color_refinement"] = refine_iters > 0
    return cfg


def _center(f):
    """w2c (R_gt, T_gt) -> camera center."""
    import numpy as np

    return -np.asarray(f["R_gt"]).T @ np.asarray(f["T_gt"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--refine", type=int, default=2000,
                    help="color refinement iterations before eval (0 = off)")
    ap.add_argument("--eval-frames", type=int, default=40,
                    help="cap on frames scored by eval_rendering")
    ap.add_argument("--seed-mode", default=None,
                    help="override Training.pose_seed (sim_prior = "
                         "MASt3R-PnP-prior emulation, the reference regime; "
                         "constant_velocity = harder no-prior ablation)")
    ap.add_argument("--prior", default=None, choices=[None, "oracle"],
                    help="oracle: drive the REAL per-frame prior machinery "
                         "(make_fused_priors -> fast_reciprocal_nns -> "
                         "PnP-RANSAC -> _compose_seed) with the GT-consistent "
                         "OracleMASt3R stand-in instead of the sim_prior "
                         "pose-seed emulation — the PnP translation is then "
                         "naturally in map scale (no scale-feedback hack)")
    ap.add_argument("--dynamic", type=int, default=0,
                    help="number of moving cars in the street scene "
                         "(0 = static bench; VERDICT r3 #3 dynamic mode)")
    ap.add_argument("--mask-mode", default="none",
                    choices=["none", "oracle", "ladder"],
                    help="dynamic-object masking: none = unmasked ablation, "
                         "oracle = GT static mask fed through SLAM's real "
                         "mask plumbing, ladder = full DynamicObjectMasker "
                         "pipeline (SAM fusion/flow/temporal median) driven "
                         "by oracle detector+segmenter hooks")
    ap.add_argument("--out", default=None,
                    help="output JSON name under results/ (defaults to "
                         "quality_bench.json, or quality_bench_dynamic_"
                         "<mask-mode>.json with --dynamic)")
    ap.add_argument("--no-servo", action="store_true",
                    help="disable the mono-scale gauge servo "
                         "(Training.mono_scale_servo=False): at r5 bench "
                         "scale the servo's world rescales destabilised the "
                         "90-frame street run (ATE 1.39 -> 5.9 m, "
                         "map_scale_history explodes after KF ~49) while "
                         "helping at CPU scale — the anchor-spring-only "
                         "regime is the stable bench configuration")
    ap.add_argument("--refine-features-only", action="store_true",
                    help="geometry-frozen refinement (Results."
                         "refine_features_only): monotone on held-out views")
    ap.add_argument("--save-state", default=None,
                    help="save the post-run SLAM state (pre-refinement "
                         "when --refine 0) to this checkpoint dir")
    ap.add_argument("--load-state", default=None,
                    help="resume from a saved checkpoint dir instead of "
                         "re-running the frames (debug/bisection workflows)")
    args = ap.parse_args()

    from lvdgs_tpu.eval.ate import eval_ate
    from lvdgs_tpu.eval.rendering import eval_rendering
    from lvdgs_tpu.slam.system import SLAM

    cfg = build_config(args.frames, args.refine, args.dynamic)
    if args.no_servo:
        cfg["Training"]["mono_scale_servo"] = False
    if args.seed_mode:
        cfg["Training"]["pose_seed"] = args.seed_mode
    if args.prior == "oracle":
        # the prior supplies every frame's seed; the configured pose_seed is
        # only the PnP-failure fallback (reference regime:
        # utils/slam_frontend.py:1460-1465)
        cfg["Training"]["pose_seed"] = args.seed_mode or "constant_velocity"
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "results"
    )
    os.makedirs(out_dir, exist_ok=True)
    out_name = args.out or (
        f"quality_bench_dynamic_{args.mask_mode}.json" if args.dynamic
        else "quality_bench.json"
    )

    slam = SLAM(cfg, save_dir=None)
    slam.save_results = False
    slam.do_eval_rendering = False  # we run eval ourselves below
    if args.prior == "oracle":
        from lvdgs_tpu.models.mast3r.inference import make_fused_priors
        from lvdgs_tpu.models.mast3r.oracle import OracleMASt3R

        oracle = OracleMASt3R(
            slam.dataset, slam.intr,
            # emulate MASt3R's non-metric mono scale at the bench's own
            # degradation level so the patch alignment must still work
            depth_scale=cfg["Dataset"].get("mono_scale_error", 1.0),
        )
        slam.depth_prior, slam.pose_prior = make_fused_priors(
            oracle, slam.intr
        )
    if args.mask_mode != "none":
        # oracle masking flows through SLAM's REAL mask plumbing: camera
        # static_mask -> seeding validity, tracking/mapping loss gating,
        # keyframe relax (reference consumes detector masks the same way,
        # utils/slam_frontend.py:1309-1329)
        from lvdgs_tpu.perception.oracle import OracleLadderMasker, OracleMasker

        slam.masker = (
            OracleMasker(slam.dataset) if args.mask_mode == "oracle"
            else OracleLadderMasker(slam.dataset)
        )

    import numpy as np

    if args.load_state:
        slam.load_state(args.load_state)
        fps = 0.0
    else:
        t0 = time.perf_counter()
        for i in range(args.frames):
            slam.process_frame(i)
        float(slam.gmap.means[0, 0])  # sync (block_until_ready is a relay no-op)
        wall = time.perf_counter() - t0
        fps = args.frames / wall

    if args.save_state:
        slam.save_state(args.save_state)

    pre_refine = None
    if args.refine > 0:
        from lvdgs_tpu.eval.rendering import eval_rendering as _er

        # pre-refinement render quality: refinement fits the keyframe set
        # (all params, reference slam_backend.py:393-468) and can trade
        # held-out-view PSNR for SSIM — record both states in the artifact
        pre = _er(slam.gmap, slam.frames, slam.dataset, slam.intr, slam.rcfg,
                  save_dir=None, kf_indices=slam.kf_indices,
                  iteration="pre_refine",
                  max_frames=min(args.frames, args.eval_frames))
        pre_refine = {"psnr_db": round(pre["mean_psnr"], 2),
                      "ssim": round(pre["mean_ssim"], 4)}
        slam.color_refinement(args.refine,
                              features_only=args.refine_features_only)

    # corruption scan: non-finite map params / frame poses (diagnoses NaN
    # render metrics at the source instead of poisoned means)
    import jax.numpy as jnp

    nan_params = sorted(
        k for k, v in slam.gmap.params().items() if bool(jnp.isnan(v).any())
    )
    bad_pose_frames = sorted(
        i for i, f in slam.frames.items()
        if not (np.all(np.isfinite(f["R"])) and np.all(np.isfinite(f["T"])))
    )
    if nan_params:
        print(f"WARNING: NaN in map params: {nan_params}")
    if bad_pose_frames:
        print(f"WARNING: non-finite poses at frames {bad_pose_frames[:20]}"
              f" ({len(bad_pose_frames)} total)")

    ate = eval_ate(slam.frames, slam.kf_indices, None, 0, final=True,
                   monocular=True)
    render_metrics = eval_rendering(
        slam.gmap,
        slam.frames,
        slam.dataset,
        slam.intr,
        slam.rcfg,
        save_dir=None,
        kf_indices=slam.kf_indices,
        iteration="quality_bench",
        max_frames=min(args.frames, args.eval_frames),
    )

    result = {
        "ate_rmse_m": round(float(ate), 4),
        "psnr_db": round(render_metrics["mean_psnr"], 2),
        "ssim": round(render_metrics["mean_ssim"], 4),
        "fps": round(fps, 3),
        "n_frames": args.frames,
        # prominent: sim_prior results are GT-prior-informed (see module doc)
        "pose_seed": cfg["Training"].get("pose_seed", "constant_velocity"),
        # oracle = REAL prior machinery over GT-consistent stand-in preds
        "prior": args.prior or "none",
        "n_keyframes": len(slam.kf_indices),
        "n_gaussians": int(slam.gmap.num_active),
        "trajectory_m": round(
            float(np.linalg.norm(_center(slam.frames[args.frames - 1])
                                 - _center(slam.frames[0]))),
            1,
        ),
    }
    if args.dynamic:
        result["dynamic_objects"] = args.dynamic
        result["mask_mode"] = args.mask_mode
    if "mean_psnr_static" in render_metrics:
        result["psnr_static_db"] = round(render_metrics["mean_psnr_static"], 2)
        result["ssim_static"] = round(render_metrics["mean_ssim_static"], 4)
    if "mean_lpips" in render_metrics:  # omitted when alexnet weights absent
        result["lpips"] = round(render_metrics["mean_lpips"], 4)
    if pre_refine is not None:
        result["pre_refine"] = pre_refine
    if getattr(slam, "_scale_history", None):
        # per-keyframe median(render/GT depth): map-scale drift profile
        result["map_scale_history"] = [
            [f, round(s, 4)] for f, s in slam._scale_history
        ]
    if getattr(slam, "_seed_err_history", None):
        # per-frame prior-vs-GT relative-pose error:
        # [frame, rot_deg, t_dir_deg, |t|/|t_gt|] (VERDICT r4 weak #4)
        h = slam._seed_err_history
        result["seed_err_history"] = [
            [f, round(r, 3), round(d, 2), t] for f, r, d, t in h
        ]
        result["seed_err_summary"] = {
            "rot_deg_med": round(float(np.median([r for _, r, _, _ in h])), 3),
            "t_dir_deg_med": round(float(np.median([d for _, _, d, _ in h])), 2),
            "t_ratio_med": round(float(np.median([t for _, _, _, t in h])), 4),
        }
    if nan_params:
        result["nan_map_params"] = nan_params
    if bad_pose_frames:
        result["n_nonfinite_pose_frames"] = len(bad_pose_frames)
    if render_metrics.get("n_nonfinite_frames"):
        result["n_nonfinite_render_frames"] = render_metrics["n_nonfinite_frames"]
        result["nonfinite_render_frames"] = render_metrics["nonfinite_frames"]
    # print FIRST: a 30+-minute TPU run's numbers must survive any write
    # failure (r5: '--out results/x.json' doubled the results/ prefix and
    # the artifact was lost after the full run)
    print(json.dumps(result))
    out_path = os.path.join(out_dir, os.path.basename(out_name))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
