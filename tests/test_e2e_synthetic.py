"""End-to-end SLAM on the synthetic dataset: track a known trajectory,
map it, and verify ATE + reconstruction quality (SURVEY.md §4 strategy)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from lvdgs_tpu.core.config import load_config
from lvdgs_tpu.slam.system import SLAM

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "mono", "synthetic", "base_config.yaml")


@pytest.fixture(scope="module")
def slam_results(tmp_path_factory):
    config = load_config(CFG_PATH)
    config["Dataset"]["n_frames"] = 14
    config["Training"]["init_itr_num"] = 400
    config["Training"]["mapping_itr_num"] = 40
    config["Training"]["tracking_itr_num"] = 40
    config["Results"]["color_refinement_iters"] = 200
    save_dir = str(tmp_path_factory.mktemp("slam_out"))
    slam = SLAM(config, save_dir=save_dir)
    results = slam.run(progress=False)
    return slam, results, save_dir


def test_e2e_runs_and_tracks(slam_results):
    slam, results, _ = slam_results
    assert results["n_frames"] == 14
    assert results["n_keyframes"] >= 2
    # trajectory error must be small on this easy synthetic scene
    assert results["ate_rmse"] < 0.08, results


def test_e2e_rendering_quality(slam_results):
    slam, results, _ = slam_results
    assert results["mean_psnr"] > 17.0, results


def test_e2e_artifacts_written(slam_results):
    _, _, save_dir = slam_results
    assert os.path.exists(os.path.join(save_dir, "point_cloud", "final", "point_cloud.ply"))
    plots = os.listdir(os.path.join(save_dir, "plot"))
    assert any(p.startswith("stats_final") for p in plots)


def test_e2e_ply_roundtrip(slam_results):
    slam, _, save_dir = slam_results
    from lvdgs_tpu.io.ply import load_gaussians_ply

    means, fdc, scales, quats, opac = load_gaussians_ply(
        os.path.join(save_dir, "point_cloud", "final", "point_cloud.ply")
    )
    assert means.shape[0] == int(slam.gmap.num_active)
    np.testing.assert_allclose(
        means.sum(), float(np.asarray(slam.gmap.means)[np.asarray(slam.gmap.active)].sum()),
        rtol=1e-4,
    )


def test_checkpoint_resume(tmp_path):
    """Save mid-run, resume in a fresh SLAM instance, results stay sane."""
    config = load_config(CFG_PATH)
    config["Dataset"]["n_frames"] = 10
    config["Training"]["init_itr_num"] = 200
    config["Training"]["mapping_itr_num"] = 20
    config["Training"]["tracking_itr_num"] = 20
    config["Results"]["color_refinement"] = False
    config["Results"]["eval_rendering"] = False

    s1 = SLAM(config, save_dir=str(tmp_path / "a"))
    for i in range(6):
        s1.process_frame(i)
    ck = str(tmp_path / "ck")
    s1.save_state(ck)

    s2 = SLAM(config, save_dir=str(tmp_path / "b"))
    s2.load_state(ck)
    assert s2.frames_processed == s1.frames_processed
    assert s2.kf_indices == s1.kf_indices
    import numpy as np
    np.testing.assert_allclose(
        np.asarray(s2.gmap.means), np.asarray(s1.gmap.means), atol=0
    )
    # continue to the end without error
    res = s2.run(progress=False)
    assert res["n_frames"] == 10
    assert res["ate_rmse"] < 0.2


def test_global_ba_runs(tmp_path):
    config = load_config(CFG_PATH)
    config["Dataset"]["n_frames"] = 8
    config["Training"]["init_itr_num"] = 150
    config["Training"]["mapping_itr_num"] = 15
    config["Training"]["tracking_itr_num"] = 15
    config["Training"]["global_BA_itr_num"] = 30
    config["Results"]["global_BA"] = True
    config["Results"]["color_refinement"] = False
    config["Results"]["eval_rendering"] = False
    slam = SLAM(config, save_dir=str(tmp_path))
    res = slam.run(progress=False)
    import numpy as np
    assert np.isfinite(res["ate_rmse"])


def test_threaded_mode_idle_mapping(tmp_path):
    """Reference-default mode (single_thread False): keyframes map with
    mapping_itr_nosingle iterations and idle frames accrue mapping debt
    that is flushed in bursts (reference utils/slam_backend.py:495-501)."""
    config = load_config(CFG_PATH)
    config["Dataset"]["n_frames"] = 12
    config["Training"]["init_itr_num"] = 150
    config["Training"]["mapping_itr_num"] = 15
    config["Training"]["mapping_itr_nosingle"] = 5
    config["Training"]["tracking_itr_num"] = 15
    config["Training"]["single_thread"] = False
    config["Results"]["color_refinement"] = False
    config["Results"]["eval_rendering"] = False
    slam = SLAM(config, save_dir=str(tmp_path))
    res = slam.run(progress=False)
    import numpy as np

    assert res["n_frames"] == 12
    assert np.isfinite(res["ate_rmse"])
    # all accrued idle iterations were folded into mapping runs
    assert slam.idle_debt == 0 or slam.last_sent < 10


def test_packed_renderer_e2e(tmp_path):
    """Short SLAM run with the packed (group-CSR) renderer budgets forced on
    (the TPU production default; off by default on CPU where interpret-mode
    Pallas is slow). Must track and stay finite."""
    config = load_config(CFG_PATH)
    config["Dataset"]["n_frames"] = 8
    config["Dataset"]["Calibration"].update(
        {"width": 64, "height": 48, "cx": 32.0, "cy": 24.0}
    )
    config["Training"]["init_itr_num"] = 120
    config["Training"]["mapping_itr_num"] = 12
    config["Training"]["tracking_itr_num"] = 12
    config["Training"]["kf_interval"] = 3
    config["Results"]["color_refinement"] = False
    config["Results"]["eval_rendering"] = False
    config["Performance"] = {
        "tile_size": 16, "max_per_tile": 64, "gaussian_chunk": 8,
        "tile_chunk": 16, "map_capacity": 8192, "kf_capacity": 16,
        "packed_tracking_budget": 64, "packed_mapping_budget": 64,
    }
    slam = SLAM(config, save_dir=str(tmp_path))
    res = slam.run(progress=False)
    import numpy as np

    assert res["n_frames"] == 8
    assert np.isfinite(res["ate_rmse"])

def test_sim_prior_pose_seed(tmp_path):
    """sim_prior emulates the reference's MASt3R-PnP pose prior (get_pose,
    utils/slam_frontend.py:1448): GT relative pose from the last keyframe +
    PnP-class noise, composed onto the ESTIMATED keyframe pose. Tracking
    only needs to polish it, so per-frame camera-center error stays at the
    few-cm level even with a short budget."""
    config = load_config(CFG_PATH)
    config["Dataset"]["n_frames"] = 8
    config["Training"].update({
        "pose_seed": "sim_prior",
        "sim_prior_trans_noise": 0.01,
        "sim_prior_rot_noise_deg": 0.1,
        "init_itr_num": 200,
        "mapping_itr_num": 20,
        "tracking_itr_num": 30,
    })
    config["Results"].update({
        "save_results": False, "eval_rendering": False,
        "color_refinement": False,
    })
    slam = SLAM(config, save_dir=None)
    for i in range(8):
        slam.process_frame(i)
    errs = []
    for i in range(8):
        f = slam.frames[i]
        c_est = -np.asarray(f["R"]).T @ np.asarray(f["T"])
        c_gt = -np.asarray(f["R_gt"]).T @ np.asarray(f["T_gt"])
        errs.append(float(np.linalg.norm(c_est - c_gt)))
    assert all(np.isfinite(errs)), errs
    assert max(errs) < 0.25, errs
