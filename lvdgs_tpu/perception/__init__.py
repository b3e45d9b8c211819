"""Perception stack: dynamic-object masking (GroundingDINO + SAM + flow),
with the reference's graceful fallback ladder.

`build_masker(config)` returns None when dynamic filtering is disabled, a
full model-based masker when checkpoints are available, or a heuristic
fallback masker otherwise — mirroring the import-guard ladder of reference
utils/slam_frontend.py:10-26, 303-306, 570-671.
"""
from __future__ import annotations


def build_masker(config: dict):
    df = config.get("dynamic_filtering", {}) or {}
    if not df.get("enabled", False):
        return None
    from .masking import DynamicObjectMasker

    return DynamicObjectMasker(
        scene_type=df.get("scene_type", "outdoor_street"),
        use_sam=df.get("use_sam", True),
        use_flow=df.get("use_flow", True),
        save_dir=df.get("save_dir"),
        save_images=df.get("save_masked_images", False),
        grounding_dino_checkpoint=df.get("grounding_dino_checkpoint"),
        sam_checkpoint=df.get("sam_checkpoint"),
        use_ground_segmentation=df.get("use_ground_segmentation", False),
    )
