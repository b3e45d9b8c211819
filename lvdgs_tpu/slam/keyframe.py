"""Keyframe selection and window management.

Host-side policy logic with device-side math, parity with the reference
FrontEnd (utils/slam_frontend.py:1579-1674):
- is_keyframe: translation vs median-depth checks + covisibility overlap,
  with the dynamic-scene relaxation (overlap * 0.7 when the static region
  is small).
- add_to_window: covisibility cut-off eviction, then inverse-distance
  eviction when the window overflows.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _overlap_ratio_union(vis_a: jax.Array, vis_b: jax.Array) -> float:
    union = int(jnp.count_nonzero(vis_a | vis_b))
    inter = int(jnp.count_nonzero(vis_a & vis_b))
    return inter / max(union, 1)


@jax.jit
def visibility_pair_stats(curr_vis: jax.Array, last_vis: jax.Array) -> jax.Array:
    """[count(curr), count(last), count(inter), count(union)] in ONE device
    fetch — every separate int(count_nonzero) costs a full host round trip
    through the TPU relay (~27 ms)."""
    cv = curr_vis.astype(jnp.int32)
    lv = last_vis.astype(jnp.int32)
    return jnp.stack(
        [cv.sum(), lv.sum(), (cv * lv).sum(), jnp.maximum(cv, lv).sum()]
    )


@jax.jit
def visibility_window_stats(curr_vis: jax.Array, occ_stack: jax.Array) -> jax.Array:
    """(n, 3) [inter, count(occ), count(curr)] vs each window keyframe."""
    cv = curr_vis.astype(jnp.int32)
    o = occ_stack.astype(jnp.int32)
    inter = (o * cv[None, :]).sum(axis=1)
    return jnp.stack(
        [inter, o.sum(axis=1), jnp.full_like(inter, cv.sum())], axis=1
    )


def _overlap_ratio_min(vis_a: jax.Array, vis_b: jax.Array) -> float:
    denom = min(int(jnp.count_nonzero(vis_a)), int(jnp.count_nonzero(vis_b)))
    inter = int(jnp.count_nonzero(vis_a & vis_b))
    return inter / max(denom, 1)


def rel_translation(R_a: np.ndarray, T_a: np.ndarray, R_b: np.ndarray, T_b: np.ndarray) -> float:
    """||(T_cw_a @ T_wc_b)[:3, 3]|| for w2c poses a, b."""
    Ta = np.eye(4)
    Ta[:3, :3], Ta[:3, 3] = R_a, T_a
    Tb = np.eye(4)
    Tb[:3, :3], Tb[:3, 3] = R_b, T_b
    rel = Ta @ np.linalg.inv(Tb)
    return float(np.linalg.norm(rel[:3, 3]))


def is_keyframe(
    *,
    curr_R: np.ndarray,
    curr_T: np.ndarray,
    last_kf_R: np.ndarray,
    last_kf_T: np.ndarray,
    median_depth: float,
    curr_visibility: jax.Array,
    last_kf_visibility: jax.Array,
    kf_translation: float,
    kf_min_translation: float,
    kf_overlap: float,
    static_ratio: Optional[float] = None,
    overlap_stats: Optional[np.ndarray] = None,  # visibility_pair_stats
) -> bool:
    """Reference utils/slam_frontend.py:1579-1619."""
    dist = rel_translation(curr_R, curr_T, last_kf_R, last_kf_T)
    dist_check = dist > kf_translation * median_depth
    dist_check2 = dist > kf_min_translation * median_depth

    adjusted_overlap = kf_overlap
    if static_ratio is not None and static_ratio < 0.3:
        adjusted_overlap = kf_overlap * 0.7  # dynamic-scene relaxation

    if overlap_stats is not None:
        point_ratio = int(overlap_stats[2]) / max(int(overlap_stats[3]), 1)
    else:
        point_ratio = _overlap_ratio_union(curr_visibility, last_kf_visibility)
    return (point_ratio < adjusted_overlap and dist_check2) or dist_check


def add_to_window(
    *,
    cur_frame_idx: int,
    curr_visibility: jax.Array,
    occ_visibility: Dict[int, jax.Array],
    window: List[int],
    poses: Dict[int, Tuple[np.ndarray, np.ndarray]],  # frame_idx -> (R, T)
    window_size: int,
    kf_cutoff: float,
    initialized: bool,
    overlap_min_ratios: Optional[Dict[int, float]] = None,
) -> Tuple[List[int], Optional[int]]:
    """Reference utils/slam_frontend.py:1621-1674. Returns (window, removed)."""
    N_dont_touch = 2
    window = [cur_frame_idx] + window
    removed_frame = None

    to_remove = []
    for i in range(N_dont_touch, len(window)):
        kf_idx = window[i]
        if overlap_min_ratios is not None:
            ratio = overlap_min_ratios[kf_idx]
        else:
            ratio = _overlap_ratio_min(curr_visibility, occ_visibility[kf_idx])
        cut_off = kf_cutoff if initialized else 0.4
        if ratio <= cut_off and len(window) > window_size:
            to_remove.append(kf_idx)
    if to_remove:
        window.remove(to_remove[-1])
        removed_frame = to_remove[-1]

    if len(window) > window_size:
        curr_R, curr_T = poses[cur_frame_idx]
        inv_dist = []
        for i in range(N_dont_touch, len(window)):
            inv_dists = []
            R_i, T_i = poses[window[i]]
            for j in range(N_dont_touch, len(window)):
                if i == j:
                    continue
                R_j, T_j = poses[window[j]]
                inv_dists.append(1.0 / (rel_translation(R_i, T_i, R_j, T_j) + 1e-6))
            k = np.sqrt(rel_translation(R_i, T_i, curr_R, curr_T))
            inv_dist.append(k * sum(inv_dists))
        idx = int(np.argmax(inv_dist))
        removed_frame = window[N_dont_touch + idx]
        window.remove(removed_frame)

    return window, removed_frame


def keyframe_rotation_delta_deg(R_last: np.ndarray, R_now: np.ndarray) -> float:
    """Rotation angle between consecutive keyframes in degrees
    (reference utils/slam_frontend.py:1279-1288)."""
    R_diff = R_last.T @ R_now
    tr = np.clip((np.trace(R_diff) - 1.0) * 0.5, -1.0, 1.0)
    return float(np.degrees(np.arccos(tr)))
