"""Unit tests: config inheritance, losses, depth alignment, keyframe policy,
ATE, PLY round-trip, masking fallbacks."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvdgs_tpu.core import losses
from lvdgs_tpu.core.config import load_config, update_recursive, dotify
from lvdgs_tpu.slam.depth_alignment import align_scale, process_depth
from lvdgs_tpu.slam import keyframe as kf
from lvdgs_tpu.eval.ate import ate_rmse, umeyama_alignment


def test_config_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("A:\n  x: 1\n  y: 2\nB:\n  z: 3\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"inherit_from: {base}\nA:\n  y: 20\nC: 7\n")
    cfg = load_config(str(child))
    assert cfg["A"]["x"] == 1
    assert cfg["A"]["y"] == 20
    assert cfg["B"]["z"] == 3
    assert cfg["C"] == 7
    d = dotify(cfg)
    assert d.A.y == 20


def test_update_recursive_deep():
    dst = {"a": {"b": 1, "c": 2}}
    update_recursive(dst, {"a": {"c": 3, "d": 4}, "e": 5})
    assert dst == {"a": {"b": 1, "c": 3, "d": 4}, "e": 5}


def test_image_gradient_shapes_and_edges():
    img = jnp.zeros((1, 32, 32)).at[:, :, 16:].set(1.0)
    gv, gh = losses.image_gradient(img)
    assert gv.shape == (1, 32, 32)
    # a vertical edge responds in grad_h (the reference's naming swaps the
    # kernels: grad_h convolves the y-kernel which detects d/dx)
    assert float(jnp.abs(gh[0, 16, 15:17]).max()) > 0.3
    assert float(jnp.abs(gh[0, 16, 5])) < 1e-6
    assert float(jnp.abs(gv).max()) < 1e-6  # no horizontal edge anywhere


def test_grad_mask_median_threshold():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, size=(3, 64, 64)), jnp.float32)
    mask = losses.compute_grad_mask(img, 1.1, "KITTI")
    frac = float(mask.mean())
    assert 0.1 < frac < 0.9  # median thresholding keeps a sensible fraction


def test_ssim_identity_and_noise():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, size=(3, 48, 48)), jnp.float32)
    assert float(losses.ssim(img, img)) > 0.999
    noisy = img + jnp.asarray(rng.normal(0, 0.2, size=img.shape), jnp.float32)
    assert float(losses.ssim(img, noisy)) < 0.9


def test_masked_median():
    x = jnp.asarray([5.0, 1.0, 3.0, 9.0, 7.0])
    m = jnp.asarray([True, True, True, False, True])
    assert float(losses.masked_median(x, m)) == 4.0  # median of 1,3,5,7


def test_align_scale_recovers_known_scale():
    rng = np.random.default_rng(2)
    depth = 5.0 + rng.uniform(-1, 1, size=(60, 80)).astype(np.float32)
    # the patch mean-filter only accepts scale errors within ~25% (reference
    # semantics — larger offsets go through the find_scale remedy), so probe
    # a 15% scale error
    mono = depth / 1.15
    res = align_scale(jnp.asarray(depth), jnp.asarray(mono))
    assert abs(float(res.scale_factor) - 1.15) < 0.02
    np.testing.assert_allclose(np.asarray(res.final_depth), depth, rtol=0.2)


def test_align_scale_fills_zero_render():
    depth = np.full((40, 40), 4.0, np.float32)
    depth[:10] = 0.0  # missing render
    mono = np.full((40, 40), 2.0, np.float32)
    res = align_scale(jnp.asarray(depth), jnp.asarray(mono))
    # zero-render rows filled from scaled mono
    assert np.all(np.asarray(res.final_depth[:10]) > 0)
    assert np.all(np.asarray(res.error_mask[:10]))


def test_process_depth_remedy_fallback():
    # render and mono totally inconsistent -> too few accurate pixels -> remedy
    rng = np.random.default_rng(3)
    render = rng.uniform(1, 2, size=(40, 40)).astype(np.float32)
    mono = rng.uniform(5, 50, size=(40, 40)).astype(np.float32)
    called = []

    def remedy():
        called.append(1)
        return 7.0

    _, scale, _, _ = process_depth(jnp.asarray(render), jnp.asarray(mono), remedy_fn=remedy)
    assert called and abs(float(scale) - 7.0) < 1e-6


def test_is_keyframe_translation_trigger():
    R = np.eye(3)
    vis = jnp.ones((100,), bool)
    common = dict(
        curr_visibility=vis, last_kf_visibility=vis,
        kf_translation=0.08, kf_min_translation=0.05, kf_overlap=0.9,
        median_depth=10.0,
    )
    # big move -> keyframe regardless of overlap
    assert kf.is_keyframe(
        curr_R=R, curr_T=np.array([1.0, 0, 0]), last_kf_R=R, last_kf_T=np.zeros(3),
        **common,
    )
    # tiny move + full overlap -> no keyframe
    assert not kf.is_keyframe(
        curr_R=R, curr_T=np.array([0.01, 0, 0]), last_kf_R=R, last_kf_T=np.zeros(3),
        **common,
    )


def test_is_keyframe_dynamic_relaxation():
    R = np.eye(3)
    vis_a = jnp.arange(100) < 60
    vis_b = jnp.arange(100) >= 30  # overlap 30/100
    common = dict(
        curr_R=R, curr_T=np.array([0.6, 0, 0]), last_kf_R=R, last_kf_T=np.zeros(3),
        curr_visibility=vis_a, last_kf_visibility=vis_b,
        kf_translation=0.08, kf_min_translation=0.05, median_depth=10.0,
    )
    # overlap ratio ~0.33; threshold 0.4 -> kf created via overlap+min-trans
    assert kf.is_keyframe(kf_overlap=0.4, **common)
    # with small static ratio the threshold shrinks to 0.28 -> no overlap kf
    assert not kf.is_keyframe(kf_overlap=0.4, static_ratio=0.1, **common)


def test_add_to_window_eviction():
    C = 50
    # current frame sees gaussians 0..29; old kf sees 40..49 (no overlap)
    curr_vis = jnp.arange(C) < 30
    occ = {
        10: jnp.arange(C) >= 40,  # disjoint -> evictable
        20: jnp.arange(C) < 25,  # overlapping
        30: jnp.arange(C) < 28,
    }
    poses = {i: (np.eye(3), np.array([0.1 * i, 0, 0])) for i in [40, 30, 20, 10]}
    window, removed = kf.add_to_window(
        cur_frame_idx=40,
        curr_visibility=curr_vis,
        occ_visibility=occ,
        window=[30, 20, 10],
        poses=poses,
        window_size=3,
        kf_cutoff=0.3,
        initialized=True,
    )
    assert removed == 10
    assert window == [40, 30, 20]


def test_umeyama_exact_similarity():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(3, 20))
    from scipy.spatial.transform import Rotation

    R_true = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    y = 1.7 * R_true @ x + np.array([[1.0], [2.0], [3.0]])
    R, t, c = umeyama_alignment(x, y, with_scale=True)
    np.testing.assert_allclose(R, R_true, atol=1e-8)
    assert abs(c - 1.7) < 1e-8


def test_ate_rmse_scale_invariance_monocular():
    rng = np.random.default_rng(5)
    gt = []
    est = []
    for i in range(10):
        T = np.eye(4)
        T[:3, 3] = [0.5 * i, 0.1 * i**1.5, 0.05 * i]
        gt.append(np.linalg.inv(T))
        T2 = T.copy()
        T2[:3, 3] *= 3.0  # scaled trajectory
        est.append(np.linalg.inv(T2))
    stats = ate_rmse(est, gt, monocular=True)
    assert stats["rmse"] < 1e-6  # scale-corrected alignment kills the error
    stats_stereo = ate_rmse(est, gt, monocular=False)
    assert stats_stereo["rmse"] > 0.5


def test_masker_fallback_no_models():
    from lvdgs_tpu.perception.masking import DynamicObjectMasker, ScenePromptManager

    pm = ScenePromptManager("outdoor_street")
    assert "car" in pm.get_dynamic_prompt()
    masker = DynamicObjectMasker(use_flow=True)
    rng = np.random.default_rng(6)
    img = rng.uniform(0, 1, size=(3, 48, 64)).astype(np.float32)
    m0 = masker.get_static_mask(img, frame_idx=0)
    assert m0.shape == (48, 64) and m0.dtype == bool
    # second frame exercises the flow path
    m1 = masker.get_static_mask(img, frame_idx=1)
    assert m1.shape == (48, 64)
    # identical frames -> no motion -> everything static
    assert m1.mean() > 0.95


def test_interval_masker_cadence_and_provider():
    """IntervalMasker runs the ladder only every interval-th frame, reuses
    the latest mask between, and sources images from its provider
    (provides_images lets SLAM skip the device->host image fetch)."""
    from lvdgs_tpu.perception.masking import DynamicObjectMasker, IntervalMasker

    calls = []

    class Det:
        def __call__(self, img, prompt):
            calls.append(img.shape)
            return (np.array([[10.0, 10.0, 40.0, 30.0]], np.float32),
                    np.array([0.9], np.float32))

    ladder = DynamicObjectMasker(detector=Det(), use_sam=False, use_flow=False)
    n_warmup = len(calls)
    im = IntervalMasker(
        ladder, interval=5,
        image_provider=lambda i: np.full((48, 64, 3), 100, np.uint8),
    )
    assert im.provides_images
    for i in range(10):
        mask = im.get_static_mask(None, frame_idx=i)
        assert mask.shape == (48, 64)
    assert len(calls) - n_warmup == 2  # frames 0 and 5 only
    assert all(s == (48, 64, 3) for s in calls[n_warmup:])  # provider images
