"""CPU mini street-quality gate (VERDICT r3 #1): a scaled-down version of
tools/quality_bench.py's regime — textured street scene, sim_prior seeding,
photometric jitter, degraded mono scale — asserting trajectory and render
quality floors so bench-regime quality can never silently regress again.

The full bench (90 frames, KITTI res, TPU) is the reported artifact; this
gate runs the same code paths at test scale on CPU.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from lvdgs_tpu.core.config import load_config
from lvdgs_tpu.slam.system import SLAM

CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "configs", "mono", "synthetic",
    "base_config.yaml",
)

N_FRAMES = 20


def _gate_config():
    config = load_config(CFG_PATH)
    config["Dataset"].update({
        "scene": "street",
        "n_frames": N_FRAMES,
        "step": 0.5,
        "accel_frames": 4,
        "street_half_width": 8.0,
        "street_spacing": 0.5,
        # the bench's adverse conditions, scaled to the mini scene
        "photo_gain_jitter": 0.05,
        "photo_bias_jitter": 0.01,
        "photo_noise": 0.005,
        "mono_scale_error": 0.8,
        "mono_noise": 0.02,
        "pcd_downsample": 16,
        "pcd_downsample_init": 8,
    })
    config["Dataset"]["Calibration"].update({
        "width": 160, "height": 48, "fx": 95.0, "fy": 95.0,
        "cx": 80.0, "cy": 24.0,
    })
    config["Training"].update({
        "pose_seed": "sim_prior",
        "sim_prior_trans_noise": 0.02,
        "sim_prior_rot_noise_deg": 0.2,
        "init_itr_num": 300,
        "mapping_itr_num": 30,
        "mapping_itr_nosingle": 10,
        "tracking_itr_num": 50,
        "kf_interval": 3,
        "window_size": 6,
        "single_thread": False,
    })
    config["Results"].update({
        "save_results": False, "eval_rendering": False,
        "color_refinement": False,
    })
    config["Performance"] = {
        "tile_size": 16, "max_per_tile": 128, "gaussian_chunk": 16,
        "tile_chunk": 32, "map_capacity": 16384, "kf_capacity": 32,
    }
    return config


def test_street_quality_gate():
    from lvdgs_tpu.eval.ate import eval_ate
    from lvdgs_tpu.eval.rendering import eval_rendering

    slam = SLAM(_gate_config(), save_dir=None)
    for i in range(N_FRAMES):
        slam.process_frame(i)
    pre = eval_rendering(slam.gmap, slam.frames, slam.dataset, slam.intr,
                         slam.rcfg, save_dir=None, kf_indices=slam.kf_indices,
                         iteration="pre_refine")
    slam.color_refinement(300)

    # the refinement NaN class (r3: color refinement poisoned the map after
    # ~1700 iters on TPU) must never reappear
    for k, v in slam.gmap.params().items():
        act = np.asarray(slam.gmap.active)
        bad = ~np.isfinite(np.asarray(v))
        if bad.ndim > 1:
            bad = bad.any(axis=1)
        assert not bad[act].any(), f"non-finite {k} in active map rows"

    ate = float(eval_ate(slam.frames, slam.kf_indices, None, 0, final=True,
                         monocular=True))
    m = eval_rendering(slam.gmap, slam.frames, slam.dataset, slam.intr,
                       slam.rcfg, save_dir=None, kf_indices=slam.kf_indices,
                       iteration="gate")

    traj = 0.5 * (N_FRAMES - 4) + 0.5 * 4 * 0.5  # ~9 m
    # floors with ~2x headroom over healthy-run values so noise cannot trip
    # the gate while meters-class regressions (the r3 artifact was 21% of
    # trajectory) always do
    assert np.isfinite(ate) and ate < 0.05 * traj, f"ATE {ate:.3f} m"
    assert m["mean_psnr"] > 16.0, m
    assert m["n_eval_frames"] > 0 and "n_nonfinite_frames" not in m, m
    # refinement must IMPROVE held-out render quality (VERDICT r4 weak #2:
    # the r4 artifact's 26k-iter refinement lowered PSNR 16.65 -> 15.84 by
    # fitting raw jittered keyframe images while mapping fit
    # exposure-compensated ones; color_refine_run now compensates)
    assert m["mean_psnr"] >= pre["mean_psnr"], (
        f"refinement lowered PSNR {pre['mean_psnr']:.2f} -> "
        f"{m['mean_psnr']:.2f}"
    )
