"""Dynamic-object masking with a graceful fallback ladder.

Capability parity with the reference masking stack
(utils/slam_frontend.py:41-1183):
- `ScenePromptManager`: scene-conditioned text prompts for open-vocabulary
  detection (reference :41-129, seven scene types).
- `DynamicObjectMasker.get_static_mask_for_gaussian_init`: per-frame
  static/dynamic segmentation used to gate Gaussian seeding, tracking and
  mapping losses (reference :1151-1166).

Pipeline per frame (each stage optional, with fallbacks as in the
reference):
1. open-vocabulary box detection (GroundingDINO — JAX port plugs in via
   `detector`; absent -> skip)
2. box-prompted segmentation (SAM — plugs in via `segmenter`; absent ->
   boxes become rectangle masks)
3. optical-flow motion refinement (Farneback via cv2, reference :1106-1149)
4. temporal median consistency over the last 5 frames (reference :1168-1183)
5. first-frame conservative color/position heuristic when no detector is
   available (reference :570-633)
"""
from __future__ import annotations

import os
from collections import deque
from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class ScenePromptManager:
    """Scene-conditioned detection prompts (reference :41-129).

    Prompts are ". "-joined phrase lists per scene; dynamic classes are
    masked out, static-context classes kept."""

    SCENES = {
        "outdoor_street": {
            "dynamic": ["car", "truck", "bus", "motorcycle", "bicycle", "person",
                        "pedestrian", "van", "scooter"],
            "static_context": ["building", "road", "tree", "traffic light", "pole"],
        },
        "highway": {
            "dynamic": ["car", "truck", "bus", "trailer", "motorcycle"],
            "static_context": ["road", "barrier", "sign", "bridge"],
        },
        "parking": {
            "dynamic": ["person", "car door", "moving car", "bicycle"],
            "static_context": ["parked car", "building", "pillar"],
        },
        "residential": {
            "dynamic": ["person", "car", "bicycle", "dog", "cat", "stroller"],
            "static_context": ["house", "fence", "tree", "lawn"],
        },
        "indoor": {
            "dynamic": ["person", "chair being moved", "door", "pet"],
            "static_context": ["wall", "table", "shelf", "floor"],
        },
        "campus": {
            "dynamic": ["person", "bicycle", "skateboard", "scooter", "car"],
            "static_context": ["building", "path", "tree", "bench"],
        },
        "mixed": {
            "dynamic": ["car", "truck", "bus", "person", "bicycle", "motorcycle",
                        "animal"],
            "static_context": ["building", "road", "vegetation"],
        },
    }

    def __init__(self, scene_type: str = "outdoor_street"):
        self.current_scene = scene_type if scene_type in self.SCENES else "mixed"

    def set_scene(self, scene_type: str) -> None:
        if scene_type in self.SCENES:
            self.current_scene = scene_type

    def get_dynamic_prompt(self) -> str:
        return " . ".join(self.SCENES[self.current_scene]["dynamic"])

    def get_classes(self) -> List[str]:
        return list(self.SCENES[self.current_scene]["dynamic"])


class DynamicObjectMasker:
    """Produces per-frame static masks (True = static scene).

    `detector(image_rgb_u8, prompt) -> (boxes_xyxy (N,4), scores (N,))` and
    `segmenter(image_rgb_u8, boxes) -> (N, H, W) bool` are pluggable model
    hooks (the JAX GroundingDINO / SAM ports register here)."""

    def __init__(
        self,
        scene_type: str = "outdoor_street",
        use_sam: bool = True,
        use_flow: bool = True,
        box_threshold: float = 0.35,
        save_dir: Optional[str] = None,
        save_images: bool = False,
        detector=None,
        segmenter=None,
        grounding_dino_checkpoint: Optional[str] = None,
        sam_checkpoint: Optional[str] = None,
        temporal_window: int = 5,
    ):
        self.prompt_manager = ScenePromptManager(scene_type)
        self.use_sam = use_sam
        self.use_flow = use_flow and cv2 is not None
        self.box_threshold = box_threshold
        self.save_dir = save_dir
        self.save_images = save_images and save_dir is not None
        self.detector = detector
        self.segmenter = segmenter
        self._mask_history: deque = deque(maxlen=temporal_window)
        self._prev_gray: Optional[np.ndarray] = None
        self._warned = False

        if detector is None and grounding_dino_checkpoint:
            self.detector = self._try_load_grounding_dino(grounding_dino_checkpoint)
        if segmenter is None and use_sam and sam_checkpoint:
            self.segmenter = self._try_load_sam(sam_checkpoint)
        if self.save_images:
            os.makedirs(self.save_dir, exist_ok=True)

    # ------------------------------------------------------------ model hooks

    def _try_load_grounding_dino(self, ckpt: str):
        try:
            from ..models.groundingdino.inference import load_detector

            return load_detector(ckpt)
        except Exception:
            return None

    def _try_load_sam(self, ckpt: str):
        try:
            from ..models.sam.inference import load_segmenter

            return load_segmenter(ckpt)
        except Exception:
            return None

    def set_scene_from_config(self, config: dict) -> None:
        st = config.get("dynamic_filtering", {}).get("scene_type")
        if st:
            self.prompt_manager.set_scene(st)

    # -------------------------------------------------------------- pipeline

    def get_static_mask_for_gaussian_init(
        self, image, frame_idx: int = 0
    ) -> np.ndarray:
        """(3, H, W) float or (H, W, 3) uint8 image -> (H, W) bool static mask.

        Reference utils/slam_frontend.py:1151-1166 / detect_and_segment :832."""
        img_u8 = self._to_u8_hwc(image)
        H, W = img_u8.shape[:2]

        dynamic = np.zeros((H, W), bool)
        detected = False
        if self.detector is not None:
            try:
                boxes, scores = self.detector(
                    img_u8, self.prompt_manager.get_dynamic_prompt()
                )
                keep = scores >= self.box_threshold
                boxes = boxes[keep]
                if len(boxes):
                    dynamic = self._boxes_to_mask(img_u8, boxes)
                detected = True
            except Exception:
                detected = False

        if not detected:
            # fallback ladder: flow-only motion mask, and a conservative
            # color heuristic on the first frame (reference :570-671)
            if self.use_flow:
                dynamic = dynamic | self._flow_motion_mask(img_u8)
            if frame_idx == 0 and self.detector is None:
                dynamic = dynamic | self._first_frame_heuristic(img_u8)
            if not self._warned:
                self._warned = True
        else:
            if self.use_flow:
                dynamic = self._refine_with_motion(img_u8, dynamic)

        dynamic = self._temporal_consistency(dynamic)
        self._update_flow_state(img_u8)

        static = ~dynamic
        if self.save_images:
            self._save_dump(img_u8, static, frame_idx)
        return static

    # alias used by SLAM system
    def get_static_mask(self, image, frame_idx: int = 0) -> np.ndarray:
        return self.get_static_mask_for_gaussian_init(image, frame_idx)

    # ------------------------------------------------------------- internals

    @staticmethod
    def _to_u8_hwc(image) -> np.ndarray:
        img = np.asarray(image)
        if img.ndim == 3 and img.shape[0] in (1, 3):
            img = img.transpose(1, 2, 0)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        return img

    def _boxes_to_mask(self, img_u8: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        H, W = img_u8.shape[:2]
        if self.segmenter is not None and self.use_sam:
            try:
                masks = self.segmenter(img_u8, boxes)  # (N, H, W) bool
                return np.any(masks, axis=0)
            except Exception:
                pass
        mask = np.zeros((H, W), bool)
        for x0, y0, x1, y1 in boxes.astype(int):
            mask[max(y0, 0) : min(y1, H), max(x0, 0) : min(x1, W)] = True
        return mask

    def _flow_motion_mask(self, img_u8: np.ndarray, thresh: float = 2.0) -> np.ndarray:
        """Farneback flow magnitude thresholding (reference :1116,:651-671)."""
        gray = cv2.cvtColor(img_u8, cv2.COLOR_RGB2GRAY)
        if self._prev_gray is None or self._prev_gray.shape != gray.shape:
            return np.zeros(gray.shape, bool)
        flow = cv2.calcOpticalFlowFarneback(
            self._prev_gray, gray, None, 0.5, 3, 15, 3, 5, 1.2, 0
        )
        mag = np.linalg.norm(flow, axis=-1)
        med = np.median(mag)
        moving = mag > max(thresh, med * 2.5)  # motion above ego-motion median
        moving = cv2.morphologyEx(
            moving.astype(np.uint8), cv2.MORPH_OPEN, np.ones((5, 5), np.uint8)
        ).astype(bool)
        return moving

    def _refine_with_motion(self, img_u8: np.ndarray, dynamic: np.ndarray) -> np.ndarray:
        """Keep detected regions only when coherent with motion, but stay
        conservative: union with strongly-moving regions (reference
        _refine_with_motion :1106-1149)."""
        motion = self._flow_motion_mask(img_u8)
        return dynamic | (motion & ~dynamic)

    def _first_frame_heuristic(self, img_u8: np.ndarray) -> np.ndarray:
        """Conservative first-frame mask: strong dark/saturated blobs low in
        the image (vehicle-like) — reference
        _create_conservative_first_frame_mask :570-633."""
        if cv2 is None:
            return np.zeros(img_u8.shape[:2], bool)
        hsv = cv2.cvtColor(img_u8, cv2.COLOR_RGB2HSV)
        H, W = img_u8.shape[:2]
        sat = hsv[..., 1].astype(np.float32) / 255.0
        val = hsv[..., 2].astype(np.float32) / 255.0
        candidate = ((sat > 0.55) | (val < 0.18)) & (
            np.arange(H)[:, None] > 0.4 * H
        )
        candidate = cv2.morphologyEx(
            candidate.astype(np.uint8), cv2.MORPH_OPEN, np.ones((7, 7), np.uint8)
        )
        # keep only medium-sized connected components (vehicle-ish)
        n, labels, stats, _ = cv2.connectedComponentsWithStats(candidate, 8)
        mask = np.zeros((H, W), bool)
        for i in range(1, n):
            area = stats[i, cv2.CC_STAT_AREA]
            if 0.002 * H * W < area < 0.2 * H * W:
                mask |= labels == i
        return mask

    def _temporal_consistency(self, dynamic: np.ndarray) -> np.ndarray:
        """Median vote over the recent mask history (reference :1168-1183)."""
        self._mask_history.append(dynamic)
        if len(self._mask_history) < 3:
            return dynamic
        stack = np.stack(list(self._mask_history), axis=0)
        return np.median(stack.astype(np.float32), axis=0) > 0.5

    def _update_flow_state(self, img_u8: np.ndarray) -> None:
        if cv2 is not None:
            self._prev_gray = cv2.cvtColor(img_u8, cv2.COLOR_RGB2GRAY)

    def _save_dump(self, img_u8: np.ndarray, static: np.ndarray, frame_idx: int) -> None:
        try:
            out = img_u8.copy()
            out[~static] = (0.5 * out[~static] + np.array([255, 0, 0]) * 0.5).astype(
                np.uint8
            )
            cv2.imwrite(
                os.path.join(self.save_dir, f"mask_{frame_idx:06d}.jpg"),
                cv2.cvtColor(out, cv2.COLOR_RGB2BGR),
            )
        except Exception:
            pass
