"""MASt3R inference glue: preprocessing, pose prior, depth prior.

Parity targets:
- torch_images_to_dust3r_format (reference utils/init_pose.py:35-75):
  resize the long edge to 512, crop centred to 16-px-aligned dims,
  normalise with mean/std 0.5.
- get_pose (reference utils/init_pose.py:123-186): MASt3R descriptor
  matching between last keyframe and current frame, unproject the rendered
  map depth at matched pixels, PnP-RANSAC (SQPNP, 100 iters, 5 px) ->
  relative w2c pose; identity on failure.
- get_depth (reference utils/init_pose.py:189-208): pointmap z-channel
  resized (nearest) to frame resolution.
- find_scale (reference utils/depth_utils.py:16-57): cross-keyframe matched
  depth ratio — the scale-remedy callback for process_depth.

The factories return callables plugging into SLAM(pose_prior=..,
depth_prior=..) so the system runs with or without the network.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ...core.camera import Intrinsics
from ...ops.rasterizer import RenderConfig, rasterize, rasterize_median_depth
from .model import MASt3RConfig, mast3r_forward, mast3r_forward_fused
from .matching import fast_reciprocal_nns


def preprocess_image(img: np.ndarray, size: int = 512) -> Tuple[np.ndarray, Tuple[int, int]]:
    """(3, H, W) float [0,1] -> (3, H', W') normalised to [-1, 1], long edge
    `size`, dims cropped to multiples of 16 (reference :35-75)."""
    _, H, W = img.shape
    scale = size / max(H, W)
    newW, newH = int(round(W * scale)), int(round(H * scale))
    # the reference round-trips through uint8 PIL (utils/init_pose.py:50-53),
    # which also clamps resampling overshoot — match that
    hwc = (np.clip(np.transpose(img, (1, 2, 0)), 0, 1) * 255).astype(np.uint8)
    if cv2 is not None:
        interp = cv2.INTER_LANCZOS4 if scale < 1 else cv2.INTER_CUBIC
        hwc = cv2.resize(hwc, (newW, newH), interpolation=interp)
    else:  # numpy bilinear fallback
        hwc = np.asarray(
            jax.image.resize(jnp.asarray(hwc), (newH, newW, 3), "bilinear")
        ).astype(np.uint8)
    hwc = hwc.astype(np.float32) / 255.0
    cx, cy = newW // 2, newH // 2
    halfw, halfh = (2 * cx) // 16 * 8, (2 * cy) // 16 * 8
    crop = hwc[cy - halfh : cy + halfh, cx - halfw : cx + halfw]
    out = (np.transpose(crop, (2, 0, 1)).astype(np.float32) - 0.5) / 0.5
    return out, crop.shape[:2]


class MASt3RInference:
    """Host-side wrapper around the jitted two-view forward."""

    def __init__(self, params, cfg: MASt3RConfig, size: int = 512):
        self.params = params
        self.cfg = cfg
        self.size = size

    @classmethod
    def from_checkpoint(cls, path: str, cfg: Optional[MASt3RConfig] = None):
        from .convert import load_converted

        cfg = cfg or MASt3RConfig()
        return cls(load_converted(path, cfg), cfg)

    def infer_pair(self, img1: np.ndarray, img2: np.ndarray):
        """imgs: (3, H, W) float [0,1]. Returns (pred1, pred2, (H', W'))."""
        p1, shape = preprocess_image(img1, self.size)
        p2, _ = preprocess_image(img2, self.size)
        pred1, pred2 = mast3r_forward(
            self.params, jnp.asarray(p1)[None], jnp.asarray(p2)[None], self.cfg
        )
        return pred1, pred2, shape

    def infer_fused(self, img_kf: np.ndarray, img_cur: np.ndarray):
        """One fused forward for the per-frame (pose, depth) prior pair —
        replaces the reference's two sequential stereo forwards per tracked
        frame (utils/slam_frontend.py:1448,1455) with one shared-encoder
        batch-2 program (model.mast3r_forward_fused). Returns
        (pose_pred1, pose_pred2, depth_pred1, (H', W'))."""
        p1, shape = preprocess_image(img_kf, self.size)
        p2, _ = preprocess_image(img_cur, self.size)
        pose1, pose2, depth1 = mast3r_forward_fused(
            self.params, jnp.asarray(p1)[None], jnp.asarray(p2)[None], self.cfg
        )
        return pose1, pose2, depth1, shape


def depth_to_3d(depth_map: np.ndarray, K: np.ndarray, dist_coeffs: np.ndarray):
    """Distortion-aware unprojection (reference utils/init_pose.py:77-111)."""
    if depth_map.ndim == 3:
        depth_map = depth_map[0]
    h, w = depth_map.shape
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    if cv2 is not None and np.any(dist_coeffs):
        pix = np.stack((u, v), axis=-1).reshape(-1, 2).astype(np.float32)
        und = cv2.undistortPoints(pix, K, dist_coeffs, P=K).reshape(h, w, 2)
        u, v = und[..., 0], und[..., 1]
    Z = depth_map
    X = (u - K[0, 2]) * Z / K[0, 0]
    Y = (v - K[1, 2]) * Z / K[1, 1]
    return np.stack((X, Y, Z), axis=-1)


def get_pose(
    model: MASt3RInference,
    img1: np.ndarray,
    img2: np.ndarray,
    intr: Intrinsics,
    dist_coeffs: np.ndarray,
    gmap,
    last_kf_R,
    last_kf_T,
    rcfg: RenderConfig,
):
    """Relative w2c pose of img2 w.r.t. img1's keyframe via matching + PnP
    (reference get_pose :123-186). Returns (pose_w2c (4,4), render_depth)."""
    pred1, pred2, (H1, W1) = model.infer_pair(img1, img2)
    return _pose_from_preds(
        pred1, pred2, (H1, W1), intr, dist_coeffs, gmap,
        last_kf_R, last_kf_T, rcfg,
    )


def _pose_from_preds(
    pred1, pred2, shape, intr, dist_coeffs, gmap, last_kf_R, last_kf_T, rcfg
):
    """Matching + rendered-depth unprojection + PnP-RANSAC on precomputed
    MASt3R pair predictions (the tail of reference get_pose :133-186)."""
    H1, W1 = shape
    m1, m2 = fast_reciprocal_nns(pred1["desc"][0], pred2["desc"][0])

    sub_intr = intr.scaled(W1, H1)
    # transmittance-median (front-surface) depth: the PnP object points are
    # unprojected from this map render, and the alpha-mean depth's
    # (1-opacity) shallow bias would scale every PnP translation and
    # compound through the trajectory (ops/rasterizer.rasterize_median_depth)
    md, _mo = rasterize_median_depth(
        gmap.params(), gmap.active, jnp.asarray(last_kf_R),
        jnp.asarray(last_kf_T), sub_intr, rcfg,
    )
    render_depth = np.asarray(md[0])
    K_new = sub_intr.K.astype(np.float64)
    pts3d = depth_to_3d(render_depth, K_new, dist_coeffs)

    identity = np.eye(4)
    if len(m1) < 6:
        return identity, render_depth
    obj = pts3d[m1[:, 1], m1[:, 0]].astype(np.float32)
    imgp = m2.astype(np.float32)
    valid = obj[:, 2] > 0
    if valid.sum() < 6 or cv2 is None:
        return identity, render_depth
    try:
        success, rvec, tvec, _ = cv2.solvePnPRansac(
            obj[valid], imgp[valid], K_new, dist_coeffs,
            iterationsCount=100, reprojectionError=5, flags=cv2.SOLVEPNP_SQPNP,
        )
    except cv2.error:
        return identity, render_depth
    if not success:
        return identity, render_depth
    Rm, _ = cv2.Rodrigues(rvec)
    pose = np.eye(4)
    pose[:3, :3] = Rm
    pose[:3, 3] = tvec[:, 0]
    return pose, render_depth


def get_depth(model: MASt3RInference, img: np.ndarray, out_hw: Tuple[int, int]):
    """Mono depth = pointmap z (reference get_depth :189-208)."""
    pred1, _pred2, _ = model.infer_pair(img, img)
    z = np.asarray(pred1["pts3d"][0, ..., 2])
    H, W = out_hw
    if cv2 is not None:
        return cv2.resize(z, (W, H), interpolation=cv2.INTER_NEAREST)
    return np.asarray(jax.image.resize(jnp.asarray(z), (H, W), "nearest"))


def find_scale(model: MASt3RInference, img1, img2, depth1, depth2):
    """Cross-keyframe matched-depth ratio (reference find_scale :16-57)."""
    pred1, pred2, (H1, W1) = model.infer_pair(img1, img2)
    m1, m2 = fast_reciprocal_nns(pred1["desc"][0], pred2["desc"][0])
    if cv2 is not None:
        d1 = cv2.resize(np.asarray(depth1), (W1, H1), interpolation=cv2.INTER_LINEAR)
        d2 = cv2.resize(np.asarray(depth2), (W1, H1), interpolation=cv2.INTER_LINEAR)
    else:
        d1 = np.asarray(jax.image.resize(jnp.asarray(depth1), (H1, W1), "bilinear"))
        d2 = np.asarray(jax.image.resize(jnp.asarray(depth2), (H1, W1), "bilinear"))
    dv_cur = d2[m2[:, 1], m2[:, 0]]
    dv_prev = d1[m1[:, 1], m1[:, 0]]
    ok = (dv_cur > 0) & np.isfinite(dv_cur) & (dv_prev > 0) & np.isfinite(dv_prev)
    if ok.sum() == 0:
        return 1.0
    return float(dv_prev[ok].mean() / dv_cur[ok].mean())


# ---------------------------------------------------------------------------
# SLAM plug-ins


def make_scale_remedy(model: MASt3RInference):
    """Scale-remedy plug-in for SLAM._fused_keyframe_depth: when patch
    alignment finds too few accurate pixels, recompute the scale as the
    cross-keyframe matched-depth ratio (reference process_depth fallback,
    utils/depth_utils.py:108-118 calling find_scale :16-57)."""

    def scale_remedy(cam, last_kf_cam) -> float:
        return find_scale(
            model,
            np.asarray(last_kf_cam.image),
            np.asarray(cam.image),
            np.asarray(last_kf_cam.mono_depth),
            np.asarray(cam.mono_depth),
        )

    return scale_remedy


def make_depth_prior(model: MASt3RInference, intr: Intrinsics):
    def depth_prior(image) -> np.ndarray:
        return get_depth(model, np.asarray(image), (intr.height, intr.width))

    return depth_prior


def make_fused_priors(model: MASt3RInference, intr: Intrinsics,
                      dist_coeffs=None):
    """(depth_prior, pose_prior) sharing ONE fused MASt3R forward per frame.

    The reference pays two sequential ViT-L stereo forwards per tracked
    frame — get_pose on (last_kf, cur) then get_depth on (cur, cur)
    (utils/slam_frontend.py:1448,1455). The SLAM loop calls depth_prior
    first (camera build) and pose_prior second (seed) within the same
    frame, so depth_prior runs the fused batch-2 program
    (MASt3RInference.infer_fused: both calls' compute, encoder shared) and
    caches the pose-pair predictions; pose_prior consumes the cache and
    only falls back to a fresh get_pose when the cache doesn't match its
    keyframe (e.g. window change between the two calls).

    The depth_prior closure is marked `wants_kf = True`: SLAM passes
    `last_kf_cam=` so the fused pair is available (see
    SLAM._mono_depth_for); plain make_depth_prior closures keep the bare
    (image) signature."""
    dist = np.zeros(5) if dist_coeffs is None else np.asarray(dist_coeffs)
    cache: dict = {}

    def depth_prior(image, last_kf_cam=None) -> np.ndarray:
        img = np.asarray(image)
        if last_kf_cam is None:
            cache.clear()
            return get_depth(model, img, (intr.height, intr.width))
        pose1, pose2, depth1, shape = model.infer_fused(
            np.asarray(last_kf_cam.image), img
        )
        cache["kf_uid"] = int(last_kf_cam.uid)
        cache["preds"] = (pose1, pose2, shape)
        z = np.asarray(depth1["pts3d"][0, ..., 2])
        H, W = intr.height, intr.width
        if cv2 is not None:
            return cv2.resize(z, (W, H), interpolation=cv2.INTER_NEAREST)
        return np.asarray(jax.image.resize(jnp.asarray(z), (H, W), "nearest"))

    depth_prior.wants_kf = True

    def pose_prior(cam, last_kf_cam, slam):
        if last_kf_cam is None:
            return None
        if cache.get("kf_uid") == int(last_kf_cam.uid):
            pred1, pred2, shape = cache.pop("preds")
            cache.clear()
            rel, _ = _pose_from_preds(
                pred1, pred2, shape, intr, dist, slam.gmap,
                np.asarray(last_kf_cam.R), np.asarray(last_kf_cam.T),
                slam.rcfg,
            )
        else:
            rel, _ = get_pose(
                model, np.asarray(last_kf_cam.image), np.asarray(cam.image),
                intr, dist, slam.gmap,
                np.asarray(last_kf_cam.R), np.asarray(last_kf_cam.T),
                slam.rcfg,
            )
        return _compose_seed(rel, cam, last_kf_cam, slam)

    return depth_prior, pose_prior


def _compose_seed(rel, cam, last_kf_cam, slam):
    """Compose a PnP relative pose onto the estimated keyframe pose, with
    the reference's previous-frame fallback on PnP failure
    (utils/slam_frontend.py:1460-1465)."""
    pose_last = np.eye(4)
    pose_last[:3, :3] = np.asarray(last_kf_cam.R)
    pose_last[:3, 3] = np.asarray(last_kf_cam.T)
    if np.allclose(rel, np.eye(4), atol=1e-6):
        prev = slam.frames.get(int(cam.uid) - 1)
        if prev is not None:
            return prev["R"], prev["T"]
    seed = rel @ pose_last
    return seed[:3, :3], seed[:3, 3]


def make_pose_prior(model: MASt3RInference, intr: Intrinsics, dist_coeffs=None):
    dist = np.zeros(5) if dist_coeffs is None else np.asarray(dist_coeffs)

    def pose_prior(cam, last_kf_cam, slam):
        if last_kf_cam is None:
            return None
        rel, _ = get_pose(
            model,
            np.asarray(last_kf_cam.image),
            np.asarray(cam.image),
            intr,
            dist,
            slam.gmap,
            np.asarray(last_kf_cam.R),
            np.asarray(last_kf_cam.T),
            slam.rcfg,
        )
        return _compose_seed(rel, cam, last_kf_cam, slam)

    return pose_prior
