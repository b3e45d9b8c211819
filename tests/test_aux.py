"""Auxiliary subsystems: configs load, GUI packets, viz, checkpoint resume,
DINOv2, dynamic filter, debug helper."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_all_configs_load():
    from lvdgs_tpu.core.config import load_config

    paths = glob.glob(os.path.join(REPO, "configs", "mono", "**", "*.yaml"), recursive=True)
    assert len(paths) >= 30
    for p in paths:
        cfg = load_config(p)
        assert "Training" in cfg and "Dataset" in cfg, p
        assert "tracking_itr_num" in cfg["Training"], p


def test_gui_packet_and_headless_viewer(tmp_path):
    from lvdgs_tpu.gui.gui_utils import GaussianPacket, HeadlessViewer, snapshot_gaussians, FakeQueue
    from lvdgs_tpu.gaussian import model as gm

    gmap = gm.create_map(128)
    gmap = gmap.replace(active=gmap.active.at[:10].set(True))
    snap = snapshot_gaussians(gmap)
    assert snap["means"].shape == (10, 3)

    v = HeadlessViewer(str(tmp_path), every=1)
    rng = np.random.default_rng(0)
    v.put(GaussianPacket(gaussians=snap, render=rng.uniform(0, 1, (3, 32, 32))))
    v.close()
    assert os.path.exists(os.path.join(str(tmp_path), "live_map.ply"))

    fq = FakeQueue()
    fq.put("x")
    assert fq.empty()


def test_replay_viewer_composite(tmp_path):
    """HeadlessViewer persists the trajectory feed and tools/replay_viewer.py
    renders a composite from the packet dir (VERDICT r2 #7: the L11 loop —
    live feed -> on-disk packets -> viewer)."""
    import sys
    from lvdgs_tpu.gui.gui_utils import GaussianPacket, HeadlessViewer, snapshot_gaussians
    from lvdgs_tpu.gaussian import model as gm

    gmap = gm.create_map(128)
    gmap = gmap.replace(active=gmap.active.at[:10].set(True))
    v = HeadlessViewer(str(tmp_path), every=1)
    rng = np.random.default_rng(0)
    for i in range(3):
        v.put(
            GaussianPacket(
                gaussians=snapshot_gaussians(gmap) if i == 2 else None,
                render=rng.uniform(0, 1, (3, 32, 32)),
                current_frame={"R": np.eye(3), "T": np.array([0.1 * i, 0, 0]),
                               "uid": i},
                keyframes=[{"R": np.eye(3), "T": np.zeros(3), "uid": 0}],
                kf_window={0: []},
            )
        )
    v.close()
    traj = os.path.join(str(tmp_path), "trajectory.jsonl")
    assert os.path.exists(traj)
    assert len(open(traj).read().strip().splitlines()) == 3

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import replay_viewer

    out = os.path.join(str(tmp_path), "replay.png")
    n = replay_viewer.compose(str(tmp_path), out)
    assert n == 3 and os.path.exists(out)


def test_viz_outputs(tmp_path):
    from lvdgs_tpu.eval.viz import save_depth_comparison, six_panel, mask_overlay

    rng = np.random.default_rng(1)
    d = rng.uniform(1, 5, (24, 32)).astype(np.float32)
    rgb = rng.uniform(0, 1, (3, 24, 32)).astype(np.float32)
    p1 = save_depth_comparison(d, d * 1.1, rgb, 3, str(tmp_path))
    assert os.path.exists(p1)
    p2 = six_panel(rgb, rgb, d, d, d > 2, 4, str(tmp_path))
    assert os.path.exists(p2)
    out = mask_overlay((rgb.transpose(1, 2, 0) * 255).astype(np.uint8), d > 3)
    assert out.shape == (24, 32, 3)


def test_eval_rendering_writes_viz(tmp_path):
    """eval_rendering with save_dir emits the reference's per-frame
    artifacts: render/depth dumps AND the 6-panel figure (VERDICT r2 #6 —
    previously the panels existed but nothing called them)."""
    import jax.numpy as jnp
    from lvdgs_tpu.core.camera import Intrinsics
    from lvdgs_tpu.eval.rendering import eval_rendering
    from lvdgs_tpu.gaussian import model as gm
    from lvdgs_tpu.ops.rasterizer import RenderConfig

    intr = Intrinsics(fx=30.0, fy=30.0, cx=16.0, cy=12.0, width=32, height=24)
    rng = np.random.default_rng(0)
    gmap = gm.create_map(256)
    n = 64
    gmap = gmap.replace(
        means=gmap.means.at[:n].set(
            jnp.asarray(rng.normal(0, 1, (n, 3)) + np.array([0, 0, 4.0]),
                        jnp.float32)
        ),
        active=gmap.active.at[:n].set(True),
    )

    class FakeDS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            img = jnp.asarray(rng.uniform(0, 1, (3, 24, 32)), jnp.float32)
            mono = jnp.asarray(rng.uniform(1, 5, (24, 32)), jnp.float32)
            return img, None, None, mono

    frames = {
        i: {"R": np.eye(3, dtype=np.float32),
            "T": np.zeros(3, np.float32),
            "static_mask": np.ones((24, 32), bool)}
        for i in range(3)
    }
    rcfg = RenderConfig(tile_size=16, max_per_tile=64, use_pallas=True,
                        use_packed=False)
    res = eval_rendering(
        gmap, frames, FakeDS(), intr, rcfg, save_dir=str(tmp_path),
        kf_indices=[0], iteration="test",
    )
    assert res["n_eval_frames"] == 2
    panels = os.listdir(tmp_path / "panels_test")
    assert len(panels) == 2  # one 6-panel per evaluated frame


def test_dinov2_forward_tiny():
    from lvdgs_tpu.models.dinov2.model import TINY_DINO, init_params, dinov2_forward

    cfg = TINY_DINO
    params = init_params(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 3, 32, 40))
    out = dinov2_forward(params, img, cfg)
    assert len(out["tokens"]) == cfg.depth
    assert out["final"].shape == (1, 1 + 4 * 5, cfg.dim)
    assert out["attn"][0].shape == (1, cfg.heads, 21, 21)


def test_dynamic_filter_no_detector():
    from lvdgs_tpu.perception.dynamic_filter import DynamicObjectFilter

    f = DynamicObjectFilter()
    img = np.zeros((16, 24, 3), np.uint8)
    assert f.get_dynamic_mask(img).sum() == 0
    assert f.get_static_mask(img).all()


def test_debug_loss_mask_coverage():
    from lvdgs_tpu.core.camera import Camera, Intrinsics
    from lvdgs_tpu.core.losses import debug_loss_mask_coverage

    intr = Intrinsics(fx=10, fy=10, cx=8, cy=6, width=16, height=12)
    cam = Camera.create(0, jnp.ones((3, 12, 16)) * 0.5, intr)
    stats = debug_loss_mask_coverage(cam)
    assert stats["rgb_valid"] == 1.0
    assert 0 <= stats["combined"] <= 1.0


def test_checkpoint_roundtrip(tmp_path):
    from lvdgs_tpu.io.checkpoint import save_checkpoint, load_checkpoint

    state = {"a": jnp.arange(5), "b": {"c": np.ones((2, 2)), "d": 3}}
    path = str(tmp_path / "ck")
    save_checkpoint(path, state)
    out = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(5))
    assert int(out["b"]["d"]) == 3


def test_ground_segmentation_and_shadow_repair():
    """0817-era stretch surface (reference slam_frontend_0817.py:1388-1514):
    traditional ground segmentation, shadow inpainting, colored overlays."""
    import numpy as np
    from lvdgs_tpu.perception.masking import (
        ColorfulSegmentationVisualizer,
        repair_ground_shadows,
        segment_ground,
    )

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (60, 80, 3)).astype(np.uint8)
    img[40:, :] = [100, 95, 90]  # flat road
    g = segment_ground(img)
    assert g.shape == (60, 80)
    assert g[50:].mean() > 0.5 and g[:30].mean() < 0.2

    veh = np.zeros((60, 80), bool)
    veh[42:54, 20:40] = True
    repaired, shadow = repair_ground_shadows(img, veh, g)
    assert repaired.shape == img.shape and shadow.any()
    assert not np.logical_and(shadow, ~g).any()  # shadow stays on ground

    viz = ColorfulSegmentationVisualizer()
    out = viz.render(img, [veh], ["car"], [True])
    assert out.shape == img.shape and (out[veh] != img[veh]).any()
    # deterministic class colors: warm for dynamic person, defined static
    assert viz.color_for("a person walking", True) == (255, 0, 0)
    assert viz.color_for("building", False) == (64, 128, 128)


def test_masker_ground_option_forces_ground_static():
    import numpy as np
    from lvdgs_tpu.perception.masking import DynamicObjectMasker

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (60, 80, 3)).astype(np.uint8)
    img[40:, :] = [100, 95, 90]

    def fake_detector(img_u8, prompt):
        # one box covering the lower half (overlapping ground)
        return np.array([[10.0, 30.0, 70.0, 59.0]]), np.array([0.9])

    m = DynamicObjectMasker(
        detector=fake_detector, use_flow=False, use_ground_segmentation=True
    )
    static = m.get_static_mask_for_gaussian_init(img, frame_idx=0)
    m2 = DynamicObjectMasker(detector=fake_detector, use_flow=False)
    static2 = m2.get_static_mask_for_gaussian_init(img, frame_idx=0)
    # ground option must reclaim road pixels inside the detection box
    assert static[55:].mean() > static2[55:].mean()


def test_scale_remedy_wired_through_system():
    """SLAM._fused_keyframe_depth must invoke the scale_remedy plug-in when
    patch alignment degenerates (zero render depth) and rescale the
    keyframe's mono depth with its result (reference process_depth fallback,
    utils/depth_utils.py:108-118 — round-1 left remedy_fn unwired)."""
    from lvdgs_tpu.core.config import load_config
    from lvdgs_tpu.core.camera import Camera
    from lvdgs_tpu.slam.system import SLAM

    config = load_config("configs/mono/synthetic/base_config.yaml")
    config["Dataset"]["n_frames"] = 4
    config["Dataset"]["Calibration"].update(
        {"width": 64, "height": 48, "cx": 32.0, "cy": 24.0}
    )
    config["Results"].update(
        {"save_results": False, "eval_rendering": False, "color_refinement": False}
    )
    config["Performance"] = {
        "tile_size": 16, "max_per_tile": 64, "gaussian_chunk": 32,
        "tile_chunk": 64, "map_capacity": 4096, "kf_capacity": 8,
    }

    calls = []

    def remedy(cam, last_kf_cam):
        calls.append((int(cam.uid), int(last_kf_cam.uid)))
        return 2.0

    slam = SLAM(config, save_dir=None, scale_remedy=remedy)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0.2, 1.0, (3, 48, 64)), jnp.float32)
    mono = jnp.asarray(rng.uniform(2.0, 5.0, (48, 64)), jnp.float32)
    cam0 = Camera.create(0, img, slam.intr, mono_depth=mono)
    cam1 = Camera.create(1, img, slam.intr, mono_depth=mono)
    slam._cams[0] = cam0
    slam.current_window = [0]

    degenerate_render = jnp.zeros((48, 64), jnp.float32)
    _depth, cam1b = slam._fused_keyframe_depth(
        1, cam1, degenerate_render, None, init=False
    )
    assert calls == [(1, 0)]
    np.testing.assert_allclose(
        np.asarray(cam1b.mono_depth), np.asarray(mono) * 2.0, rtol=1e-6
    )


def test_mask_dump_categories(tmp_path):
    """save_images must produce the reference's per-stage dump layout
    (utils/slam_frontend.py:698-717): original, detection boxes, per-stage
    masks, overlay, static-only, keyframes, and the per-frame detection
    analysis record (:806-823)."""
    from lvdgs_tpu.perception.masking import DynamicObjectMasker

    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0, 255, (48, 64, 3)).astype(np.uint8) for _ in range(3)]

    def fake_detector(img_u8, prompt):
        return np.array([[5.0, 5.0, 30.0, 40.0]]), np.array([0.9])

    def fake_segmenter(img_u8, boxes):
        m = np.zeros((1, 48, 64), bool)
        m[0, 10:35, 8:28] = True
        return m

    m = DynamicObjectMasker(
        detector=fake_detector, segmenter=fake_segmenter, use_flow=True,
        save_dir=str(tmp_path), save_images=True,
    )
    for i, img in enumerate(imgs):
        static = m.get_static_mask_for_gaussian_init(img, frame_idx=i)
    m.save_keyframe_overlay(imgs[-1], static, kf_idx=2)

    for d in (
        "original", "grounding_dino_detections", "grounding_dino_masks",
        "sam_masks", "motion_masks", "final_masks", "masked_overlay",
        "static_only", "keyframes", "detection_analysis",
    ):
        files = os.listdir(tmp_path / d)
        assert files, f"no dumps in {d}"
    txt = (tmp_path / "detection_analysis" / "frame_000001.txt").read_text()
    assert "Total Detections: 1" in txt and "Confidence: 0.900" in txt
