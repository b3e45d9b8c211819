"""DPT dense-prediction head (CroCo/DUSt3R variant), JAX-native.

Reconstruction of the missing `dust3r.heads.dpt_head.PixelwiseTaskWithDPT`
(imported at reference mast3r/catmlp_dpt_head.py:12): four transformer
hook maps are projected to pyramid features (96/192/384/768), resampled to
{1/4, 1/8, 1/16, 1/32} of the image, fused by RefineNet-style residual
blocks at feature_dim=256, and decoded by a small conv head to
`num_channels` at full resolution.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

LAYER_DIMS = (96, 192, 384, 768)


def _conv(x, p, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x.astype(p["weight"].dtype),
        p["weight"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in p:
        out = out + p["bias"][None, :, None, None]
    return out


def _conv_transpose(x, p, stride):
    out = jax.lax.conv_transpose(
        x,
        p["weight"],  # stored OIHW (out, in, kh, kw)
        strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        transpose_kernel=True,
    )
    if "bias" in p:
        out = out + p["bias"][None, :, None, None]
    return out


def _resize2x(x):
    B, C, H, W = x.shape
    return jax.image.resize(x, (B, C, H * 2, W * 2), method="bilinear")


def _residual_conv_unit(x, p):
    out = jax.nn.relu(x)
    out = _conv(out, p["conv1"])
    out = jax.nn.relu(out)
    out = _conv(out, p["conv2"])
    return out + x


def _fusion(prev, skip, p):
    """FeatureFusionBlock_custom: optional skip through rcu1, rcu2, 2x up,
    1x1 out conv. `prev` is bilinearly aligned to the skip's spatial shape
    when they differ (odd patch grids)."""
    x = prev
    if skip is not None:
        if x.shape[-2:] != skip.shape[-2:]:
            B, C = x.shape[:2]
            x = jax.image.resize(x, (B, C) + skip.shape[-2:], method="bilinear")
        x = x + _residual_conv_unit(skip, p["rcu1"])
    x = _residual_conv_unit(x, p["rcu2"])
    x = _resize2x(x)
    return _conv(x, p["out_conv"])


def dpt_forward(hook_tokens: Sequence[jax.Array], grid_hw, p) -> jax.Array:
    """hook_tokens: 4 token maps (B, N, D_i) at the patch grid; returns
    (B, num_channels, H, W) with H = 16 * grid_h."""
    h, w = grid_hw
    feats = []
    for i, tok in enumerate(hook_tokens):
        B, N, D = tok.shape
        fmap = tok.transpose(0, 2, 1).reshape(B, D, h, w)
        fmap = _conv(fmap, p["proj"][i])  # 1x1 to LAYER_DIMS[i]
        if i == 0:
            fmap = _conv_transpose(fmap, p["resample"][0], 4)
        elif i == 1:
            fmap = _conv_transpose(fmap, p["resample"][1], 2)
        elif i == 3:
            fmap = _conv(fmap, p["resample"][3], stride=2)
        feats.append(fmap)

    rn = [_conv(feats[i], p["scratch"][i]) for i in range(4)]  # 3x3 -> 256

    path = _fusion(rn[3], None, p["refine"][3])
    path = _fusion(path, rn[2], p["refine"][2])
    path = _fusion(path, rn[1], p["refine"][1])
    path = _fusion(path, rn[0], p["refine"][0])  # (B, 256, H/2, W/2)

    x = _conv(path, p["head"]["conv1"])  # 256 -> 128
    x = _resize2x(x)
    x = _conv(x, p["head"]["conv2"])  # 128 -> 32
    x = jax.nn.relu(x)
    x = _conv(x, p["head"]["conv3"], padding="VALID")  # 1x1 -> num_channels
    return x


# ---------------------------------------------------------------------------
# init


def _init_conv(key, cin, cout, k, bias=True):
    p = {
        "weight": jax.random.normal(key, (cout, cin, k, k))
        * 0.25 * (2.0 / (cin * k * k)) ** 0.5
    }
    if bias:
        p["bias"] = jnp.zeros((cout,))
    return p


def init_dpt(key, dim_tokens=(1024, 768, 768, 768), feature_dim=256, last_dim=128,
             num_channels=4):
    ks = iter(jax.random.split(key, 64))
    p = {
        "proj": [
            _init_conv(next(ks), dim_tokens[i], LAYER_DIMS[i], 1) for i in range(4)
        ],
        "resample": {
            0: _init_conv(next(ks), LAYER_DIMS[0], LAYER_DIMS[0], 4),
            1: _init_conv(next(ks), LAYER_DIMS[1], LAYER_DIMS[1], 2),
            3: _init_conv(next(ks), LAYER_DIMS[3], LAYER_DIMS[3], 3),
        },
        "scratch": [
            _init_conv(next(ks), LAYER_DIMS[i], feature_dim, 3, bias=False)
            for i in range(4)
        ],
        "refine": [
            {
                "rcu1": {
                    "conv1": _init_conv(next(ks), feature_dim, feature_dim, 3),
                    "conv2": _init_conv(next(ks), feature_dim, feature_dim, 3),
                },
                "rcu2": {
                    "conv1": _init_conv(next(ks), feature_dim, feature_dim, 3),
                    "conv2": _init_conv(next(ks), feature_dim, feature_dim, 3),
                },
                "out_conv": _init_conv(next(ks), feature_dim, feature_dim, 1),
            }
            for _ in range(4)
        ],
        "head": {
            "conv1": _init_conv(next(ks), feature_dim, last_dim, 3),
            "conv2": _init_conv(next(ks), last_dim, 32, 3),
            "conv3": _init_conv(next(ks), 32, num_channels, 1),
        },
    }
    return p
