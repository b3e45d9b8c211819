"""Multi-scale deformable attention (TPU-native).

Replaces the `groundingdino._C` CUDA extension (reference
GroundingDINO-main/groundingdino/models/GroundingDINO/ms_deform_attn.py:28-90,
SURVEY.md §2.8 item 4). The math follows the reference's own pure fallback
`multi_scale_deformable_attn_pytorch` (:93-131): for each query, head and
level, bilinearly sample `num_points` value vectors at predicted sampling
locations and combine with softmaxed attention weights.

grid_sample(align_corners=False) is expressed as a gather + bilinear blend —
XLA turns the gathers into efficient dynamic-slices; the op is memory-bound
and fuses well, so no Pallas kernel is needed at GroundingDINO's sizes.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(value: jax.Array, locs: jax.Array) -> jax.Array:
    """value: (B, H, W, C); locs: (B, Q, P, 2) in [0, 1] normalised coords
    (x, y). Returns (B, Q, P, C). Zero padding outside (grid_sample
    padding_mode='zeros', align_corners=False)."""
    B, H, W, C = value.shape
    x = locs[..., 0] * W - 0.5
    y = locs[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = value.reshape(B, H * W, C)
        idx = yi * W + xi  # (B, Q, P)
        out = jnp.take_along_axis(
            flat[:, :, None, :], idx.reshape(B, -1)[:, :, None, None], axis=1
        ).reshape(B, *idx.shape[1:], C)
        return out * inb[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def multi_scale_deformable_attention(
    value: jax.Array,  # (B, N_total, n_heads, c)
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H_l, W_l)]
    sampling_locations: jax.Array,  # (B, Q, n_heads, n_levels, n_points, 2)
    attention_weights: jax.Array,  # (B, Q, n_heads, n_levels, n_points)
) -> jax.Array:
    """Returns (B, Q, n_heads * c). Levels are static shapes (jit-safe)."""
    B, N, nH, c = value.shape
    _, Q = sampling_locations.shape[:2]
    out = jnp.zeros((B, Q, nH, c), jnp.float32)
    offset = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = value[:, offset : offset + H * W]  # (B, HW, nH, c)
        offset += H * W
        v = v.transpose(0, 2, 1, 3).reshape(B * nH, H, W, c)
        locs = sampling_locations[:, :, :, lvl]  # (B, Q, nH, P, 2)
        locs = locs.transpose(0, 2, 1, 3, 4).reshape(B * nH, Q, -1, 2)
        sampled = _bilinear_sample(v, locs)  # (B*nH, Q, P, c)
        w = attention_weights[:, :, :, lvl]  # (B, Q, nH, P)
        w = w.transpose(0, 2, 1, 3).reshape(B * nH, Q, -1, 1)
        out = out + (sampled * w).sum(axis=2).reshape(B, nH, Q, c).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, nH * c)
