#!/usr/bin/env python
"""Benchmark: full SLAM loop at KITTI resolution on real hardware.

Runs the synthetic dataset at the KITTI camera geometry (1226x370) through
the complete tracking + mapping pipeline with reference iteration budgets
(tracking<=100, mapping 150/KF, init mapping) and reports end-to-end
frames/sec, excluding compilation (one warmup frame re-run).

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares keyframes/sec against the reference's 3 keyframes/sec
frontend pacing cap (reference utils/slam_frontend.py:1881-1885; the only
citable reference throughput number — see BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compilation cache: rasterizer/mapping programs take minutes to
# compile through the remote-compile tunnel; cache hits make warm restarts fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_config(n_frames: int):
    """The bench scenario config: synthetic scene at KITTI-07 geometry with
    reference iteration budgets. Shared with tools/perf_mapping.py so
    profiling hits the same compile cache entries."""
    from lvdgs_tpu.core.config import load_config

    cfg_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "configs",
        "mono",
        "synthetic",
        "base_config.yaml",
    )
    config = load_config(cfg_path)
    # KITTI-07 camera geometry (reference configs/mono/KITTI/07.yaml)
    config["Dataset"].update(
        {
            "n_frames": n_frames + 1,
            "n_gaussians": 8000,
            "spread": 10.0,
            "Calibration": {
                "fx": 707.0912,
                "fy": 707.0912,
                "cx": 601.8873,
                "cy": 183.1104,
                "width": 1226,
                "height": 370,
                "distorted": False,
                "depth_scale": 1.0,
            },
        }
    )
    config["Training"].update(
        {
            "tracking_itr_num": 100,
            "mapping_itr_num": 150,
            "init_itr_num": 1050,
            "kf_interval": 5,
            "window_size": 8,
        }
    )
    config["Performance"] = {
        "tile_size": 16,
        "max_per_tile": 256,
        "gaussian_chunk": 32,
        "tile_chunk": 128,
        "map_capacity": 2**17,
        "kf_capacity": 128,
    }
    config["Results"].update(
        {"save_results": False, "eval_rendering": False, "color_refinement": False}
    )
    return config


def main():
    import jax

    from lvdgs_tpu.slam.system import SLAM

    n_frames = int(os.environ.get("BENCH_FRAMES", "16"))
    config = build_config(n_frames)

    dev = jax.devices()[0]
    log(f"bench device: {dev} ({dev.platform})")

    slam = SLAM(config, save_dir=None)
    slam.save_results = False
    slam.do_eval_rendering = False
    slam.do_color_refinement = False

    # warmup until the first post-init keyframe has been mapped, so every
    # program (init mapping, tracking, windowed mapping, prune) is compiled
    # before the timed region
    t0 = time.perf_counter()
    idx = 0
    while idx <= n_frames and len(slam.kf_indices) < 2:
        slam.process_frame(idx)
        idx += 1
    warm = time.perf_counter() - t0
    log(f"warmup ({idx} frames incl. all compiles): {warm:.1f}s")

    start_idx = idx
    t0 = time.perf_counter()
    for idx in range(start_idx, n_frames + 1):
        slam.process_frame(idx)
    # force completion: fetch a scalar (block_until_ready does not sync
    # through the TPU relay)
    float(slam.gmap.means[0, 0])
    wall = time.perf_counter() - t0
    frames = n_frames + 1 - start_idx
    fps = frames / wall
    kfps = max(len(slam.kf_indices) - 1, 0) / wall
    log(
        f"{frames} frames in {wall:.2f}s -> {fps:.3f} fps, "
        f"{len(slam.kf_indices)} keyframes ({kfps:.3f} kf/s), "
        f"{int(slam.gmap.num_active)} gaussians"
    )
    log(f"timers: {slam.timer.summary()}")

    print(
        json.dumps(
            {
                "metric": "kitti_res_synthetic_slam_fps",
                "value": round(fps, 4),
                "unit": "frames/sec",
                "vs_baseline": round(kfps / 3.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
