"""SAM inference wrapper: box-prompted segmentation for the masking stack.

`load_segmenter(ckpt)` returns the callable the DynamicObjectMasker expects
(perception/masking.py): (image_rgb_u8 (H, W, 3), boxes_xyxy (N, 4) pixels)
-> (N, H, W) bool masks. Mirrors the reference's SamPredictor usage
(utils/slam_frontend.py:956-1013): longest-side-1024 resize, pixel
normalisation, per-box prediction, best-IoU mask selection.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .model import SAMConfig, sam_encode_image, sam_predict_masks

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


class SAMSegmenter:
    def __init__(self, params, cfg: Optional[SAMConfig] = None):
        self.cfg = cfg or SAMConfig()
        self.params = params

    @classmethod
    def from_checkpoint(cls, path: str, cfg: Optional[SAMConfig] = None):
        from .convert import load_converted

        cfg = cfg or SAMConfig()
        return cls(load_converted(path, cfg), cfg)

    def _preprocess(self, img_u8: np.ndarray):
        H, W = img_u8.shape[:2]
        S = self.cfg.img_size
        scale = S / max(H, W)
        newH, newW = int(round(H * scale)), int(round(W * scale))
        try:
            import cv2

            resized = cv2.resize(img_u8, (newW, newH), interpolation=cv2.INTER_LINEAR)
        except Exception:
            resized = np.asarray(
                jax.image.resize(jnp.asarray(img_u8, jnp.float32), (newH, newW, 3), "bilinear")
            )
        x = (resized.astype(np.float32) - PIXEL_MEAN) / PIXEL_STD
        padded = np.zeros((S, S, 3), np.float32)
        padded[:newH, :newW] = x
        return padded.transpose(2, 0, 1)[None], (newH, newW), scale

    MAX_BOXES = 32  # compile-bucket ceiling (power-of-two buckets below)

    def __call__(self, img_u8: np.ndarray, boxes_xyxy: np.ndarray) -> np.ndarray:
        H, W = img_u8.shape[:2]
        n_real = int(len(boxes_xyxy))
        if n_real == 0:
            return np.zeros((0, H, W), bool)
        x, (newH, newW), scale = self._preprocess(img_u8)
        emb = sam_encode_image(self.params, jnp.asarray(x), self.cfg)
        S = self.cfg.img_size
        # scale to model resolution, shift to pixel centers (+0.5, the
        # official prompt encoder's _embed_boxes — pinned by the HF parity
        # test), normalise to the padded square
        boxes = (np.asarray(boxes_xyxy, np.float32) * scale + 0.5) / S
        # STATIC box-count buckets: jitted programs key on N, and a
        # per-frame-varying detector count otherwise compiles a fresh SAM
        # decoder per distinct N (~60 s each through the remote-compile
        # tunnel — the r4 perception bench spent 44 s/frame on this). Pad to
        # the next power of two (≤ MAX_BOXES; extra rows are zero boxes
        # whose masks are discarded), trim anything beyond the ceiling.
        if n_real > self.MAX_BOXES:
            boxes = boxes[: self.MAX_BOXES]
            n_real = self.MAX_BOXES
        bucket = 1
        while bucket < n_real:
            bucket *= 2
        if bucket != n_real:
            boxes = np.concatenate(
                [boxes, np.zeros((bucket - n_real, 4), np.float32)]
            )
        masks, iou = sam_predict_masks(
            self.params, emb, jnp.asarray(boxes), self.cfg
        )
        # pick the non-ambiguous mask per box (reference uses
        # multimask_output=False -> token 0), then upsample ALL boxes in two
        # batched resizes: a per-box host loop costs 2 dispatches per mask
        # (~27 ms relay round-trip each through the axon tunnel)
        sel = masks[:, 0]  # (bucket, S/4, S/4) logits, still on device
        mj = jax.image.resize(sel, (bucket, S, S), "bilinear")
        mj = mj[:, : int(round(newH)), : int(round(newW))]
        mj = jax.image.resize(mj, (bucket, H, W), "bilinear")
        return np.asarray(mj > 0.0)[:n_real]


def load_segmenter(ckpt_path: str):
    return SAMSegmenter.from_checkpoint(ckpt_path)
