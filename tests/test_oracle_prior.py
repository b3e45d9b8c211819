"""The REAL MASt3R prior path driven multi-frame by the oracle model
(VERDICT r3 #7): make_fused_priors -> fast_reciprocal_nns -> PnP-RANSAC ->
_compose_seed inside SLAM.run, with only the network forwards replaced by
GT-consistent synthesis (models/mast3r/oracle.py). Reference regime:
utils/init_pose.py:123-186 runs every tracked frame."""
import os

import numpy as np
import pytest

from lvdgs_tpu.core.config import load_config
from lvdgs_tpu.data.datasets import load_dataset
from lvdgs_tpu.models.mast3r.oracle import OracleMASt3R

CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "configs", "mono", "synthetic",
    "base_config.yaml",
)

N_FRAMES = 20


def _street_config():
    config = load_config(CFG_PATH)
    config["Dataset"].update({
        "scene": "street",
        "n_frames": N_FRAMES,
        "step": 0.5,
        "accel_frames": 4,
        "street_half_width": 8.0,
        "street_spacing": 0.5,
        "photo_gain_jitter": 0.0,
        "photo_bias_jitter": 0.0,
        "photo_noise": 0.0,
        "mono_scale_error": 1.0,
        "mono_noise": 0.0,
        "pcd_downsample": 16,
        "pcd_downsample_init": 8,
    })
    config["Dataset"]["Calibration"].update({
        "width": 160, "height": 48, "fx": 95.0, "fy": 95.0,
        "cx": 80.0, "cy": 24.0,
    })
    config["Training"].update({
        "pose_seed": "constant_velocity",
        "init_itr_num": 300,
        "mapping_itr_num": 30,
        "mapping_itr_nosingle": 10,
        "tracking_itr_num": 40,
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


def test_oracle_descriptors_match_true_correspondences():
    """Reciprocal NN matching on oracle descriptors recovers true
    cross-view correspondences: matched pixels unproject to (nearly) the
    same world point."""
    from lvdgs_tpu.models.mast3r.matching import fast_reciprocal_nns

    config = _street_config()
    ds = load_dataset(None, "", config)
    oracle = OracleMASt3R(ds, ds.intrinsics)
    img0, _, _, _ = ds[0]
    img4, _, _, _ = ds[4]
    p1, p2, (H, W) = oracle.infer_pair(np.asarray(img0), np.asarray(img4))
    m1, m2 = fast_reciprocal_nns(p1["desc"][0], p2["desc"][0])
    assert len(m1) >= 20, len(m1)

    _, w0 = oracle._frame_geometry(0)
    _, w4 = oracle._frame_geometry(4)
    pts1 = w0[m1[:, 1], m1[:, 0]]
    pts2 = w4[m2[:, 1], m2[:, 0]]
    err = np.linalg.norm(pts1 - pts2, axis=1)
    # matching is grid-subsampled (8 px): correspondences land on the
    # nearest grid pixel, so allow surfel-scale error; the median must be
    # tight and the majority inliers (PnP-RANSAC absorbs the rest)
    assert np.median(err) < 0.35, np.median(err)
    assert (err < 0.5).mean() > 0.6, (err < 0.5).mean()


@pytest.mark.slow
def test_fused_prior_path_beats_constant_velocity():
    """20-frame street run with the production prior wiring
    (make_fused_priors over the oracle): must run the real matching/PnP
    machinery every tracked frame and beat the no-prior ablation's ATE."""
    from lvdgs_tpu.eval.ate import eval_ate
    from lvdgs_tpu.models.mast3r.inference import make_fused_priors
    from lvdgs_tpu.slam.system import SLAM

    def _run(with_prior: bool):
        config = _street_config()
        if with_prior:
            slam = SLAM(config, save_dir=None)
            oracle = OracleMASt3R(slam.dataset, slam.intr, depth_scale=0.9)
            depth_prior, pose_prior = make_fused_priors(oracle, slam.intr)
            slam.depth_prior = depth_prior
            slam.pose_prior = pose_prior
        else:
            slam = SLAM(config, save_dir=None)
        for i in range(N_FRAMES):
            slam.process_frame(i)
        return slam, float(
            eval_ate(slam.frames, slam.kf_indices, None, 0, final=True,
                     monocular=True)
        )

    slam_p, ate_prior = _run(True)
    _, ate_cv = _run(False)
    assert np.isfinite(ate_prior), ate_prior
    # the prior must engage (not fall back to identity-PnP every frame):
    # a healthy run tracks the 9.5 m trajectory to well under a meter
    assert ate_prior < 0.5, (ate_prior, ate_cv)
    assert ate_prior <= ate_cv * 1.05, (ate_prior, ate_cv)
