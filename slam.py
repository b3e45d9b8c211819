#!/usr/bin/env python
"""Entry point: python slam.py --config configs/mono/KITTI/07.yaml

Parity with the reference run command (README.md:97-103). Reconstructs the
missing reference slam.py wiring (SURVEY.md §2.9): load layered YAML config,
build dataset + Gaussian map + SLAM system, run, then color refinement and
final evaluation — but as a single process driving jitted TPU programs
instead of two torch.multiprocessing processes.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compilation cache: rasterizer/mapping programs take minutes to
# compile through the remote-compile tunnel; cache hits make warm restarts fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

if os.environ.get("JAX_PLATFORMS"):
    # some site customizations (the axon TPU relay) force their platform and
    # override the env var; honor an explicit JAX_PLATFORMS request so
    # `JAX_PLATFORMS=cpu python slam.py ...` really runs on CPU
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    parser = argparse.ArgumentParser(description="LVD-GS-TPU SLAM")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--n-frames", type=int, default=None,
                        help="limit the number of processed frames")
    parser.add_argument("--save-dir", type=str, default=None)
    parser.add_argument("--no-color-refinement", action="store_true")
    parser.add_argument("--no-eval-rendering", action="store_true")
    parser.add_argument("--resume", type=str, default=None,
                        help="resume from a checkpoint directory")
    parser.add_argument("--checkpoint-every", type=int, default=None,
                        help="save a resumable checkpoint every N frames")
    args = parser.parse_args()

    from lvdgs_tpu.core.config import load_config
    from lvdgs_tpu.core.log import Log
    from lvdgs_tpu.slam.system import SLAM
    from lvdgs_tpu.perception import build_masker

    config = load_config(args.config)
    save_dir = args.save_dir
    if save_dir is None:
        stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
        save_dir = os.path.join(
            config.get("Results", {}).get("save_dir", "results"), stamp
        )
    os.makedirs(save_dir, exist_ok=True)

    masker = build_masker(config)

    # MASt3R pointmap priors (pose seed + mono depth) when a checkpoint is
    # configured (reference loads it at utils/slam_frontend.py:1214)
    pose_prior = depth_prior = scale_remedy = None
    m_cfg = config.get("mast3r", {}) or {}
    ckpt = m_cfg.get("checkpoint")
    if ckpt and os.path.exists(ckpt):
        from lvdgs_tpu.models.mast3r.inference import (
            MASt3RInference, make_fused_priors, make_scale_remedy,
        )
        from lvdgs_tpu.data.datasets import load_dataset

        model = MASt3RInference.from_checkpoint(ckpt)
        ds = load_dataset(None, "", config)
        # fused: one shared-encoder batch-2 forward per tracked frame serves
        # both priors (vs the reference's two sequential stereo forwards,
        # utils/slam_frontend.py:1448,1455)
        depth_prior, pose_prior = make_fused_priors(
            model, ds.intrinsics, ds.dist_coeffs
        )
        scale_remedy = make_scale_remedy(model)
        Log(f"MASt3R fused priors enabled from {ckpt}")

    slam = SLAM(config, save_dir=save_dir, masker=masker,
                pose_prior=pose_prior, depth_prior=depth_prior,
                scale_remedy=scale_remedy)
    if args.no_color_refinement:
        slam.do_color_refinement = False
    if args.no_eval_rendering:
        slam.do_eval_rendering = False

    if args.resume:
        slam.load_state(args.resume)
        Log(f"Resumed from {args.resume} at frame {slam.frames_processed}")

    results = slam.run(n_frames=args.n_frames, checkpoint_every=args.checkpoint_every)
    Log(f"Results: {results}", tag="Eval")
    return results


if __name__ == "__main__":
    main()
