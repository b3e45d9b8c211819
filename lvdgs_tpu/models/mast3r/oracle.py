"""Oracle MASt3R: a GT-consistent stand-in for MASt3RInference (VERDICT r3
#7). No MASt3R checkpoint exists in this environment, so the REAL per-frame
prior path — make_fused_priors -> fast_reciprocal_nns -> PnP-RANSAC ->
_compose_seed (reference utils/init_pose.py:123-186, run every tracked
frame at utils/slam_frontend.py:1448,1455) — is driven end-to-end with
predictions synthesized from dataset ground truth:

- descriptors: random-Fourier features of each pixel's WORLD point
  (unprojected GT depth -> GT camera pose). Two views of the same surface
  point produce identical descriptors, so reciprocal NN matching recovers
  true correspondences; occluded/moving pixels mismatch and fall to
  PnP-RANSAC's outlier handling, exactly like real descriptors.
- pointmaps/depth: GT depth (optionally scaled, emulating MASt3R's
  non-metric mono scale that the patch alignment must recover).

Only the two network forwards are GT stand-ins; matching, PnP, seed
composition, fused-forward caching and the depth resize all run the
production code paths.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


class OracleMASt3R:
    """Interface-compatible with MASt3RInference as the prior factories
    consume it (infer_pair / infer_fused returning pred dicts with "desc"
    and "pts3d" at `shape` resolution)."""

    def __init__(self, dataset, intr, desc_dim: int = 24,
                 depth_scale: float = 1.0, seed: int = 0):
        self.dataset = dataset
        self.intr = intr
        self.depth_scale = float(depth_scale)
        rng = np.random.default_rng(seed)
        half = desc_dim // 2
        dirs = rng.normal(size=(half, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        # log-spaced spatial frequencies: coarse components disambiguate
        # far-apart points, fine ones give sub-decimeter localisation
        freqs = np.logspace(-0.6, 0.9, half)
        self._F = (dirs * freqs[:, None]).astype(np.float32)  # (half, 3)
        self._fp: dict = {}
        self._scan_upto = 0

    # ------------------------------------------------------------- internals
    def _index_of(self, img: np.ndarray) -> int:
        """Identify the dataset frame behind an image array (the prior
        closures pass images, not indices) via a subsampled fingerprint."""
        key = np.ascontiguousarray(np.asarray(img)[..., ::7, ::11]).tobytes()
        while key not in self._fp:
            if self._scan_upto >= len(self.dataset):
                raise KeyError("OracleMASt3R: image not found in dataset")
            i = self._scan_upto
            self._scan_upto += 1
            image, _, _, _ = self.dataset[i]
            k2 = np.ascontiguousarray(
                np.asarray(image)[..., ::7, ::11]
            ).tobytes()
            self._fp.setdefault(k2, i)
        return self._fp[key]

    def _frame_geometry(self, idx: int):
        """(pts_cam (H,W,3), pts_world (H,W,3)) from GT depth + GT pose."""
        _, depth, pose, _ = self.dataset[idx]
        d = np.asarray(depth, np.float32)
        H, W = d.shape
        K = self.intr
        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32))
        X = (u - K.cx) * d / K.fx
        Y = (v - K.cy) * d / K.fy
        pts_cam = np.stack([X, Y, d], axis=-1)
        R, T = np.asarray(pose[:3, :3]), np.asarray(pose[:3, 3])
        pts_world = (pts_cam.reshape(-1, 3) - T) @ R  # R^T (x - T), row form
        return pts_cam, pts_world.reshape(H, W, 3).astype(np.float32)

    def _desc(self, pts_world: np.ndarray) -> np.ndarray:
        ang = pts_world @ self._F.T  # (H, W, half)
        desc = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
        n = np.linalg.norm(desc, axis=-1, keepdims=True)
        return (desc / np.maximum(n, 1e-8)).astype(np.float32)

    def _pred(self, idx: int, scale: float = 1.0):
        pts_cam, pts_world = self._frame_geometry(idx)
        return {
            "desc": self._desc(pts_world)[None],
            "pts3d": (pts_cam * scale)[None],
        }

    # ------------------------------------------------------------- interface
    def infer_pair(self, img1: np.ndarray, img2: np.ndarray):
        i1 = self._index_of(img1)
        i2 = self._index_of(img2)
        p1 = self._pred(i1, self.depth_scale)
        p2 = self._pred(i2, self.depth_scale)
        H, W = p1["pts3d"].shape[1:3]
        return p1, p2, (H, W)

    def infer_fused(self, img_kf: np.ndarray, img_cur: np.ndarray):
        """(pose_pred_kf, pose_pred_cur, depth_pred_cur, shape) — mirrors
        MASt3RInference.infer_fused's batch-2 fused forward contract."""
        ik = self._index_of(img_kf)
        ic = self._index_of(img_cur)
        pose1 = self._pred(ik)
        pose2 = self._pred(ic)
        depth1 = self._pred(ic, self.depth_scale)
        H, W = pose1["pts3d"].shape[1:3]
        return pose1, pose2, depth1, (H, W)
