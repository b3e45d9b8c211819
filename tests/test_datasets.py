"""Dataset-parser tests on tiny on-disk fixtures (VERDICT r1 item 6).

Pin the reference's conventions (reference utils/dataset.py:68-134,166-229):
- KITTI: 12-number row-major 3x4 c2w poses, origin-normalised to the first
  frame's translation, then inverted to w2c.
- Waymo: 4x4 c2w poses inverted to w2c; depth/ + mono_depth/ pngs scaled by
  1/depth_scale and 1/(depth_scale*5) respectively.
- TUM: rgb/depth/groundtruth timestamp association, quaternion xyzw c2w,
  inverted to w2c.
- dl3dv: cameras.json quaternions, origin-normalised translations.
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

from lvdgs_tpu.data.datasets import (
    DL3DVParser, KITTIParser, MonocularDataset, TUMParser, WaymoParser,
    load_dataset,
)


def _calib(w=32, h=24, depth_scale=None):
    c = {
        "fx": 40.0, "fy": 40.0, "cx": w / 2, "cy": h / 2,
        "width": w, "height": h, "distorted": False,
    }
    if depth_scale is not None:
        c["depth_scale"] = depth_scale
    return c


def _config(dtype, path, calib, begin=0, end=None):
    return {
        "Dataset": {
            "type": dtype, "dataset_path": str(path), "begin": begin,
            "end": end, "Calibration": calib,
        }
    }


def _write_rgb(path, w=32, h=24, value=128):
    img = np.full((h, w, 3), value, np.uint8)
    Image.fromarray(img).save(path)


def _c2w(i):
    """A non-trivial camera-to-world pose for frame i."""
    ang = 0.1 * i
    R = np.array(
        [
            [np.cos(ang), 0, np.sin(ang)],
            [0, 1, 0],
            [-np.sin(ang), 0, np.cos(ang)],
        ]
    )
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = [0.5 * i + 1.0, 0.1 * i - 2.0, 0.3 * i]
    return T


def test_kitti_parser_pose_conventions(tmp_path):
    os.makedirs(tmp_path / "image_2")
    os.makedirs(tmp_path / "gt")
    for i in range(3):
        _write_rgb(tmp_path / "image_2" / f"{i:06d}.png")
        np.savetxt(tmp_path / "gt" / f"{i:06d}.txt", _c2w(i)[:3].reshape(1, 12))
    cfg = _config("KITTI", tmp_path, _calib())
    p = KITTIParser(str(tmp_path), cfg)
    assert p.n_img == 3
    t0 = _c2w(0)[:3, 3]
    for i in range(3):
        expected = _c2w(i)
        expected[:3, 3] -= t0  # first-frame origin normalisation
        np.testing.assert_allclose(p.poses[i], np.linalg.inv(expected), atol=1e-9)
    # first frame: rotation inverted, translation zero
    np.testing.assert_allclose(p.poses[0][:3, 3], 0.0, atol=1e-9)


def test_kitti_parser_begin_end_window(tmp_path):
    os.makedirs(tmp_path / "image_2")
    os.makedirs(tmp_path / "gt")
    for i in range(5):
        _write_rgb(tmp_path / "image_2" / f"{i:06d}.png")
        np.savetxt(tmp_path / "gt" / f"{i:06d}.txt", _c2w(i)[:3].reshape(1, 12))
    cfg = _config("KITTI", tmp_path, _calib(), begin=1, end=4)
    p = KITTIParser(str(tmp_path), cfg)
    assert p.n_img == 3
    # origin is the first SELECTED frame (reference slices before normalising)
    t0 = _c2w(1)[:3, 3]
    expected = _c2w(1)
    expected[:3, 3] -= t0
    np.testing.assert_allclose(p.poses[0], np.linalg.inv(expected), atol=1e-9)


def test_waymo_parser_and_depth_scaling(tmp_path):
    for d in ("rgb", "depth", "mono_depth", "gt"):
        os.makedirs(tmp_path / d)
    scale = 100.0
    depth_m = np.linspace(2.0, 6.0, 24 * 32).reshape(24, 32)
    for i in range(2):
        _write_rgb(tmp_path / "rgb" / f"{i:06d}.png", value=60 + i)
        Image.fromarray((depth_m * scale).astype(np.int32), mode="I").save(
            tmp_path / "depth" / f"{i:06d}.png"
        )
        Image.fromarray((depth_m * scale * 5).astype(np.int32), mode="I").save(
            tmp_path / "mono_depth" / f"{i:06d}.png"
        )
        np.savetxt(tmp_path / "gt" / f"{i:06d}.txt", _c2w(i))
    p = WaymoParser(str(tmp_path))
    assert p.n_img == 2
    np.testing.assert_allclose(p.poses[1], np.linalg.inv(_c2w(1)), atol=1e-9)

    ds = MonocularDataset(None, str(tmp_path), _config("waymo", tmp_path, _calib(depth_scale=scale)))
    image, depth, pose, mono = ds[1]
    assert image.shape == (3, 24, 32) and image.dtype == np.float32
    assert abs(float(image[0, 0, 0]) - 61 / 255.0) < 1e-6
    np.testing.assert_allclose(
        depth, (depth_m * scale).astype(np.int32) / scale, atol=1e-6
    )
    np.testing.assert_allclose(
        mono, (depth_m * scale * 5).astype(np.int32) / (scale * 5), atol=1e-6
    )
    np.testing.assert_allclose(pose, np.linalg.inv(_c2w(1)).astype(np.float32),
                               atol=1e-6)


def test_tum_parser_association_and_quat(tmp_path):
    os.makedirs(tmp_path / "rgb")
    os.makedirs(tmp_path / "depth")
    # two frames 1 s apart (frame_rate filter keeps both), pose quat xyzw
    lines_rgb, lines_depth, lines_gt = [], ["# ts path"], ["# ts tx ty tz qx qy qz qw"]
    for i, ts in enumerate((100.0, 101.0)):
        _write_rgb(tmp_path / "rgb" / f"{ts:.1f}.png")
        Image.fromarray(np.full((24, 32), 1000 + i, np.int32), mode="I").save(
            tmp_path / "depth" / f"{ts:.1f}.png"
        )
        lines_rgb.append(f"{ts} rgb/{ts:.1f}.png")
        lines_depth.append(f"{ts} depth/{ts:.1f}.png")
        T = _c2w(i)
        # rotation about y: quat (x y z w) = (0, sin(a/2), 0, cos(a/2))
        a = 0.1 * i
        q = [0.0, np.sin(a / 2), 0.0, np.cos(a / 2)]
        t = T[:3, 3]
        lines_gt.append(
            f"{ts} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}"
        )
    (tmp_path / "rgb.txt").write_text("\n".join(lines_rgb) + "\n")
    (tmp_path / "depth.txt").write_text("\n".join(lines_depth[1:]) + "\n")
    (tmp_path / "groundtruth.txt").write_text("\n".join(lines_gt) + "\n")
    p = TUMParser(str(tmp_path))
    assert p.n_img == 2
    for i in range(2):
        np.testing.assert_allclose(p.poses[i], np.linalg.inv(_c2w(i)), atol=1e-7)
    assert p.color_paths[0].endswith("rgb/100.0.png")
    assert p.depth_paths[1].endswith("depth/101.0.png")


def test_dl3dv_parser_origin_normalisation(tmp_path):
    os.makedirs(tmp_path / "rgb")
    cams = []
    for i in range(3):
        _write_rgb(tmp_path / "rgb" / f"{i:04d}.png")
        a = 0.1 * i
        cams.append(
            {
                "cam_quat": [0.0, float(np.sin(a / 2)), 0.0, float(np.cos(a / 2))],
                "cam_trans": [1.0 + i, 2.0, 3.0 - 0.5 * i],
            }
        )
    (tmp_path / "cameras.json").write_text(json.dumps(cams))
    p = DL3DVParser(str(tmp_path), _config("dl3dv", tmp_path, _calib()))
    assert p.n_img == 3
    for i in range(3):
        T = _c2w(i)
        T[:3, 3] = np.array(cams[i]["cam_trans"]) - np.array(cams[0]["cam_trans"])
        np.testing.assert_allclose(p.poses[i], np.linalg.inv(T), atol=1e-7)


@pytest.mark.slow
def test_waymo_format_e2e_smoke(tmp_path):
    """Real-format end-to-end smoke: render the synthetic scene, dump it to
    a Waymo-layout directory (8-bit rgb + 16-bit depth pngs + gt txt poses),
    and run the full SLAM loop through MonocularDataset on those files
    (VERDICT r1 item 6 — every prior e2e used the in-memory synthetic
    path)."""
    from lvdgs_tpu.core.config import load_config
    from lvdgs_tpu.slam.system import SLAM

    base = load_config("configs/mono/synthetic/base_config.yaml")
    base["Dataset"]["n_frames"] = 8
    base["Dataset"]["Calibration"].update(
        # fx/fy must match the SLAM config below: the synthetic base ships
        # fx=120, and generating images at one focal while running SLAM at
        # another silently biases the trajectory gate (review r2)
        {"width": 64, "height": 48, "cx": 32.0, "cy": 24.0,
         "fx": 80.0, "fy": 80.0}
    )
    syn = load_dataset(None, "", base)
    for d in ("rgb", "depth", "mono_depth", "gt"):
        os.makedirs(tmp_path / d)
    scale = 1000.0
    for i in range(8):
        img, depth, pose, _ = syn[i]
        rgb8 = (np.asarray(img).transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(rgb8).save(tmp_path / "rgb" / f"{i:06d}.png")
        d32 = (np.asarray(depth) * scale).astype(np.int32)
        Image.fromarray(d32, mode="I").save(tmp_path / "depth" / f"{i:06d}.png")
        Image.fromarray((d32 * 5), mode="I").save(
            tmp_path / "mono_depth" / f"{i:06d}.png"
        )
        # parser expects c2w on disk (it inverts); synthetic poses are w2c
        np.savetxt(tmp_path / "gt" / f"{i:06d}.txt",
                   np.linalg.inv(np.asarray(pose, np.float64)))

    config = load_config("configs/mono/synthetic/base_config.yaml")
    config["Dataset"] = {
        "type": "waymo", "dataset_path": str(tmp_path), "begin": 0, "end": None,
        "pcd_downsample": 32, "pcd_downsample_init": 16, "point_size": 0.01,
        "adaptive_pointsize": True,
        "Calibration": _calib(w=64, h=48, depth_scale=scale),
    }
    config["Dataset"]["Calibration"].update({"fx": 80.0, "fy": 80.0})
    config["Training"].update(
        {"init_itr_num": 150, "mapping_itr_num": 20, "tracking_itr_num": 20,
         "kf_interval": 2, "single_thread": True}
    )
    config["Results"].update(
        {"save_results": False, "eval_rendering": False, "color_refinement": False}
    )
    config["Performance"] = {
        "tile_size": 16, "max_per_tile": 64, "gaussian_chunk": 32,
        "tile_chunk": 64, "map_capacity": 8192, "kf_capacity": 16,
    }
    slam = SLAM(config, save_dir=None)
    assert isinstance(slam.dataset, MonocularDataset)
    for i in range(8):
        slam.process_frame(i)
    assert len(slam.kf_indices) >= 2
    est = np.array([slam.frames[k]["T"] for k in slam.kf_indices])
    gt = np.array([slam.frames[k]["T_gt"] for k in slam.kf_indices])
    assert np.isfinite(est).all()
    # tracked trajectory should land near ground truth (file-format
    # quantisation of rgb/depth adds noise; loose gate)
    assert float(np.abs(est - gt).max()) < 0.5, (est, gt)


@pytest.mark.slow
def test_kitti_format_e2e_smoke(tmp_path):
    """KITTI-format end-to-end smoke (VERDICT r1 item 6): dump the synthetic
    scene to the KITTI layout (image_2/*.png + gt/*.txt 3x4 c2w rows) and
    run the full SLAM loop through MonocularDataset. Like the reference, the
    KITTI parser aliases depth paths to the color images (reference
    utils/dataset.py:74-76 — dataset depth is a placeholder; the real mono
    depth comes from MASt3R at runtime), so the test supplies a depth_prior
    standing in for MASt3R's get_depth, exactly the reference's runtime
    shape."""
    import jax.numpy as jnp

    from lvdgs_tpu.core.config import load_config
    from lvdgs_tpu.slam.system import SLAM

    base = load_config("configs/mono/synthetic/base_config.yaml")
    base["Dataset"]["n_frames"] = 8
    base["Dataset"]["Calibration"].update(
        # fx/fy must match the SLAM config below: the synthetic base ships
        # fx=120, and generating images at one focal while running SLAM at
        # another silently biases the trajectory gate (review r2)
        {"width": 64, "height": 48, "cx": 32.0, "cy": 24.0,
         "fx": 80.0, "fy": 80.0}
    )
    syn = load_dataset(None, "", base)
    os.makedirs(tmp_path / "image_2")
    os.makedirs(tmp_path / "gt")
    depths = []
    for i in range(8):
        img, depth, pose, _ = syn[i]
        rgb8 = (np.asarray(img).transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(rgb8).save(tmp_path / "image_2" / f"{i:06d}.png")
        depths.append(np.asarray(depth, np.float32))
        # KITTI gt rows are 3x4 row-major c2w; the parser origin-normalises
        # to the first frame and inverts to w2c
        c2w = np.linalg.inv(np.asarray(pose, np.float64))
        np.savetxt(tmp_path / "gt" / f"{i:06d}.txt", c2w[:3, :].reshape(-1)[None])

    config = load_config("configs/mono/synthetic/base_config.yaml")
    config["Dataset"] = {
        "type": "KITTI", "dataset_path": str(tmp_path), "begin": 0, "end": None,
        "pcd_downsample": 32, "pcd_downsample_init": 16, "point_size": 0.01,
        "adaptive_pointsize": True,
        "Calibration": _calib(w=64, h=48, depth_scale=1.0),
    }
    config["Dataset"]["Calibration"].update({"fx": 80.0, "fy": 80.0})
    config["Training"].update(
        {"init_itr_num": 150, "mapping_itr_num": 20, "tracking_itr_num": 20,
         "kf_interval": 2, "single_thread": True}
    )
    config["Results"].update(
        {"save_results": False, "eval_rendering": False, "color_refinement": False}
    )
    config["Performance"] = {
        "tile_size": 16, "max_per_tile": 64, "gaussian_chunk": 32,
        "tile_chunk": 64, "map_capacity": 8192, "kf_capacity": 16,
    }

    calls = {"n": 0}

    def depth_prior(image):
        d = depths[min(calls["n"], len(depths) - 1)]
        calls["n"] += 1
        return jnp.asarray(d)

    slam = SLAM(config, save_dir=None, depth_prior=depth_prior)
    assert isinstance(slam.dataset, MonocularDataset)
    # synthetic poses are already first-frame-origin, so the parser's
    # normalisation is the identity here; check w2c inversion took effect
    p0 = slam.dataset[0][2]
    np.testing.assert_allclose(np.asarray(p0), np.eye(4), atol=1e-5)
    for i in range(8):
        slam.process_frame(i)
    assert calls["n"] >= 8
    assert len(slam.kf_indices) >= 2
    est = np.array([slam.frames[k]["T"] for k in slam.kf_indices])
    gt = np.array([slam.frames[k]["T_gt"] for k in slam.kf_indices])
    assert np.isfinite(est).all()
    assert float(np.abs(est - gt).max()) < 0.5, (est, gt)


@pytest.mark.slow
def test_tum_format_e2e_smoke(tmp_path):
    """TUM-format end-to-end smoke: rgb/depth pngs + rgb.txt/depth.txt/
    groundtruth.txt timestamp association, quaternion c2w poses -> full SLAM
    loop through MonocularDataset (completes the KITTI/Waymo/TUM trio)."""
    from scipy.spatial.transform import Rotation

    from lvdgs_tpu.core.config import load_config
    from lvdgs_tpu.slam.system import SLAM

    base = load_config("configs/mono/synthetic/base_config.yaml")
    base["Dataset"]["n_frames"] = 8
    base["Dataset"]["Calibration"].update(
        {"width": 64, "height": 48, "cx": 32.0, "cy": 24.0,
         "fx": 80.0, "fy": 80.0}
    )
    syn = load_dataset(None, "", base)
    os.makedirs(tmp_path / "rgb")
    os.makedirs(tmp_path / "depth")
    scale = 5000.0  # TUM convention
    lines_rgb, lines_depth, lines_gt = ["# ts path"], ["# ts path"], ["# gt"]
    for i in range(8):
        img, depth, pose, _ = syn[i]
        ts = 100.0 + i
        rgb8 = (np.asarray(img).transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(rgb8).save(tmp_path / "rgb" / f"{ts:.1f}.png")
        d32 = (np.asarray(depth) * scale).astype(np.int32)
        Image.fromarray(d32, mode="I").save(tmp_path / "depth" / f"{ts:.1f}.png")
        lines_rgb.append(f"{ts} rgb/{ts:.1f}.png")
        lines_depth.append(f"{ts} depth/{ts:.1f}.png")
        c2w = np.linalg.inv(np.asarray(pose, np.float64))
        q = Rotation.from_matrix(c2w[:3, :3]).as_quat()  # xyzw
        t = c2w[:3, 3]
        lines_gt.append(
            f"{ts} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}"
        )
    (tmp_path / "rgb.txt").write_text("\n".join(lines_rgb) + "\n")
    (tmp_path / "depth.txt").write_text("\n".join(lines_depth) + "\n")
    (tmp_path / "groundtruth.txt").write_text("\n".join(lines_gt) + "\n")

    config = load_config("configs/mono/synthetic/base_config.yaml")
    config["Dataset"] = {
        "type": "tum", "dataset_path": str(tmp_path), "begin": 0, "end": None,
        "pcd_downsample": 32, "pcd_downsample_init": 16, "point_size": 0.01,
        "adaptive_pointsize": True,
        "Calibration": _calib(w=64, h=48, depth_scale=scale),
    }
    config["Dataset"]["Calibration"].update({"fx": 80.0, "fy": 80.0})
    config["Training"].update(
        {"init_itr_num": 150, "mapping_itr_num": 20, "tracking_itr_num": 20,
         "kf_interval": 2, "single_thread": True}
    )
    config["Results"].update(
        {"save_results": False, "eval_rendering": False, "color_refinement": False}
    )
    config["Performance"] = {
        "tile_size": 16, "max_per_tile": 64, "gaussian_chunk": 32,
        "tile_chunk": 64, "map_capacity": 8192, "kf_capacity": 16,
    }
    slam = SLAM(config, save_dir=None)
    assert isinstance(slam.dataset, MonocularDataset)
    for i in range(8):
        slam.process_frame(i)
    assert len(slam.kf_indices) >= 2
    est = np.array([slam.frames[k]["T"] for k in slam.kf_indices])
    gt = np.array([slam.frames[k]["T_gt"] for k in slam.kf_indices])
    assert np.isfinite(est).all()
    assert float(np.abs(est - gt).max()) < 0.5, (est, gt)


def test_street_scene_dataset():
    """Textured street synthetic (VERDICT r2 #4): structured geometry,
    multi-octave texture, photometric jitter, degraded mono prior."""
    import jax.numpy as jnp
    from lvdgs_tpu.data.datasets import SyntheticDataset

    config = {"Dataset": {
        "type": "synthetic", "scene": "street", "n_frames": 12, "step": 0.5,
        "seed": 0,
        "photo_gain_jitter": 0.08, "photo_bias_jitter": 0.02,
        "photo_noise": 0.01, "mono_scale_error": 0.8, "mono_noise": 0.03,
        "Calibration": {"fx": 88.4, "fy": 88.4, "cx": 75.2, "cy": 22.9,
                        "width": 153, "height": 46, "distorted": False,
                        "depth_scale": 1.0},
    }}
    ds = SyntheticDataset(None, None, config)
    img, depth, pose, mono = ds[0]
    img, depth, mono = map(np.asarray, (img, depth, mono))
    # textured: real high-frequency content, substantial dynamic range
    assert img.std() > 0.08
    assert np.abs(np.diff(img, axis=2)).mean() > 0.005
    # KITTI-like depth range and dense coverage
    assert (depth > 0).mean() > 0.45
    assert depth.max() > 20.0 and depth[depth > 0].min() > 2.0
    # mono prior carries the configured global scale error
    ratio = np.median(mono[depth > 1] / depth[depth > 1])
    assert abs(ratio - 0.8) < 0.05, ratio
    # photometric jitter is real: same frame with jitter off differs by a
    # global gain/bias, not by scene content
    clean_cfg = {"Dataset": dict(config["Dataset"],
                                 photo_gain_jitter=0.0, photo_bias_jitter=0.0,
                                 photo_noise=0.0)}
    ds_clean = SyntheticDataset(None, None, clean_cfg)
    img5 = np.asarray(ds[5][0])
    img5_clean = np.asarray(ds_clean[5][0])
    assert np.abs(img5 - img5_clean).mean() > 1e-3
    # determinism: same index twice -> identical
    a = np.asarray(ds[3][0]); b = np.asarray(ds[3][0])
    assert (a == b).all()
    # forward motion: later frames see the far wall closer
    d0 = np.asarray(ds[0][1]); d11 = np.asarray(ds[11][1])
    assert np.median(d11[d11 > 0]) < np.median(d0[d0 > 0]) + 1.0
