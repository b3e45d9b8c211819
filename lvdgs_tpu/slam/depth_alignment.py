"""Patch-based pointmap scale alignment ("Algorithm 1" of the paper).

Re-implementation of reference utils/depth_utils.py:60-139 (`process_depth`)
as vectorised JAX patch reductions instead of nested Python loops over 10x10
patches: each iteration
1. filters patches whose render/mono mean+std agree,
2. normalises both patches and marks pixels with small normalised error,
3. re-estimates the global scale from those accurate pixels,
with convergence exit on |scale - prev| < eps, and a final fill of
erroneous/zero render pixels with scaled mono depth.

The reference's "scale remedy" fallback (find_scale via MASt3R matching
across keyframes, utils/depth_utils.py:16-57) is delegated to an optional
callback so the alignment works with or without the matcher.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class AlignResult(NamedTuple):
    final_depth: jax.Array  # (H, W) fused depth
    scale_factor: jax.Array  # ()
    error_mask: jax.Array  # (H, W) bool: filled-from-mono pixels
    num_accurate: jax.Array  # () int32


def _patch_stats(x: jax.Array, ps: int):
    """(H, W) -> per-patch mean/std with zero-padding + weights for ragged
    edges. Returns (mean, std, patches, weights) on the padded grid."""
    H, W = x.shape
    nh = -(-H // ps)
    nw = -(-W // ps)
    xp = jnp.zeros((nh * ps, nw * ps), x.dtype).at[:H, :W].set(x)
    wp = jnp.zeros((nh * ps, nw * ps), x.dtype).at[:H, :W].set(1.0)
    patches = xp.reshape(nh, ps, nw, ps).transpose(0, 2, 1, 3)  # (nh, nw, ps, ps)
    weights = wp.reshape(nh, ps, nw, ps).transpose(0, 2, 1, 3)
    cnt = weights.sum(axis=(2, 3))
    mean = (patches * weights).sum(axis=(2, 3)) / jnp.maximum(cnt, 1.0)
    var = ((patches - mean[..., None, None]) ** 2 * weights).sum(axis=(2, 3)) / jnp.maximum(
        cnt, 1.0
    )
    return mean, jnp.sqrt(var), patches, weights


@functools.partial(
    jax.jit,
    static_argnames=(
        "patch_size",
        "max_iter",
    ),
)
def align_scale(
    render_depth: jax.Array,  # (H, W)
    mono_depth: jax.Array,  # (H, W)
    *,
    patch_size: int = 10,
    mean_threshold: float = 0.25,
    std_threshold: float = 0.3,
    error_threshold: float = 0.1,
    final_error_threshold: float = 0.15,
    max_iter: int = 4,
    epsilon: float = 0.01,
    min_accurate_pixels_ratio: float = 0.01,
) -> AlignResult:
    """Pure-device part of process_depth (no remedy fallback — the caller
    layers that on when a matcher is available)."""
    H, W = render_depth.shape
    ps = patch_size
    total = H * W
    min_acc = jnp.int32(min_accurate_pixels_ratio * total)

    r_mean, r_std, r_patches, weights = _patch_stats(render_depth, ps)

    def one_iter(scale):
        m_scaled = mono_depth * scale
        m_mean, m_std, m_patches, _ = _patch_stats(m_scaled, ps)

        mean_ok = jnp.abs(r_mean - m_mean) < mean_threshold * m_mean
        std_ok = jnp.abs(r_std - m_std) < std_threshold * m_std
        patch_ok = mean_ok & std_ok  # (nh, nw)

        r_norm = (r_patches - r_mean[..., None, None]) / (r_std[..., None, None] + 1e-6)
        m_norm = (m_patches - m_mean[..., None, None]) / (m_std[..., None, None] + 1e-6)
        pix_ok = (jnp.abs(r_norm - m_norm) < error_threshold) & patch_ok[..., None, None]
        pix_ok = pix_ok & (weights > 0)

        acc = pix_ok.astype(jnp.float32)
        n_acc = acc.sum().astype(jnp.int32)
        r_acc_mean = (r_patches * acc).sum() / jnp.maximum(acc.sum(), 1.0)
        # accurate-pixel means use UNSCALED mono (reference divides by
        # mono_depth[accurate], utils/depth_utils.py:122)
        m_unscaled = m_patches / jnp.maximum(scale, 1e-12)
        m_acc_mean = (m_unscaled * acc).sum() / jnp.maximum(acc.sum(), 1.0)
        new_scale = jnp.where(n_acc > 0, r_acc_mean / jnp.maximum(m_acc_mean, 1e-12), scale)
        # reassemble the accurate-pixel mask in image layout
        nh, nw = pix_ok.shape[:2]
        mask_img = pix_ok.transpose(0, 2, 1, 3).reshape(nh * ps, nw * ps)[:H, :W]
        return new_scale, n_acc, mask_img

    scale = jnp.float32(1.0)
    prev = jnp.float32(0.0)
    n_acc = jnp.int32(0)
    mask = jnp.zeros((H, W), bool)
    for k in range(max_iter):
        converged = (jnp.abs(scale - prev) < epsilon) & (scale != 1.0)
        new_scale, new_nacc, new_mask = one_iter(scale)
        # only update when not yet converged (static unroll of the loop)
        use = ~converged
        prev = jnp.where(use, scale, prev)
        # reference: update scale only when enough accurate pixels (or k<2)
        enough = (new_nacc >= min_acc) | (k < 2)
        has_any = new_nacc > 0
        scale = jnp.where(use & enough & has_any, new_scale, scale)
        n_acc = jnp.where(use, jnp.where(enough & has_any, new_nacc, 0), n_acc)
        mask = jnp.where(use & enough & has_any, new_mask, mask)

    mono_scaled = mono_depth * scale
    rel_err = jnp.abs(render_depth - mono_scaled) / (mono_scaled + 1e-8)
    error_mask = (rel_err > final_error_threshold) | (render_depth == 0.0)
    final_depth = jnp.where(error_mask, mono_scaled, render_depth)
    return AlignResult(
        final_depth=final_depth,
        scale_factor=scale,
        error_mask=error_mask,
        num_accurate=n_acc,
    )


def process_depth(
    render_depth: jax.Array,
    mono_depth: jax.Array,
    *,
    remedy_fn: Optional[Callable[[], float]] = None,
    patch_size: int = 10,
    mean_threshold: float = 0.25,
    std_threshold: float = 0.3,
    error_threshold: float = 0.1,
    final_error_threshold: float = 0.15,
    max_iter: int = 4,
    epsilon: float = 0.01,
    min_accurate_pixels_ratio: float = 0.01,
):
    """Full process_depth parity: device alignment + host-side scale remedy.

    `remedy_fn` recomputes a scale from cross-keyframe matched depths (the
    reference's find_scale); when alignment finds too few accurate pixels it
    is invoked (reference utils/depth_utils.py:108-118). Returns
    (final_depth, scale_factor, error_mask, num_accurate).
    """
    if render_depth.ndim == 3:
        render_depth = render_depth[0]
    res = align_scale(
        render_depth,
        mono_depth,
        patch_size=patch_size,
        mean_threshold=mean_threshold,
        std_threshold=std_threshold,
        error_threshold=error_threshold,
        final_error_threshold=final_error_threshold,
        max_iter=max_iter,
        epsilon=epsilon,
        min_accurate_pixels_ratio=min_accurate_pixels_ratio,
    )
    H, W = render_depth.shape
    min_acc = int(min_accurate_pixels_ratio * H * W)
    if int(res.num_accurate) < min_acc and remedy_fn is not None:
        scale = jnp.float32(remedy_fn())
        mono_scaled = mono_depth * scale
        rel_err = jnp.abs(render_depth - mono_scaled) / (mono_scaled + 1e-8)
        error_mask = (rel_err > final_error_threshold) | (render_depth == 0.0)
        final_depth = jnp.where(error_mask, mono_scaled, render_depth)
        return final_depth, scale, error_mask, res.num_accurate
    return res.final_depth, res.scale_factor, res.error_mask, res.num_accurate
