"""Swin Transformer backbone (Swin-T) in JAX.

The reference's image backbone (groundingdino_swint_ogc; module referenced
at reference GroundingDINO-main/.../groundingdino.py — backbone/ dir absent
from the vendored subset, SURVEY.md §2.3): 4x4 patch embed, 4 stages of
shifted-window attention with relative position bias, patch merging between
stages; feature maps from stages 2/3/4 feed the detector neck.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mast3r.vit import linear, _init_linear, _init_ln
from ..mast3r.vit import layer_norm as _layer_norm_e6


def layer_norm(x, p):
    """torch nn.LayerNorm default eps=1e-5 (Swin-T uses defaults; the
    MASt3R helper defaults to CroCo's 1e-6)."""
    return _layer_norm_e6(x, p, eps=1e-5)


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (1, 2, 3)


TINY_SWIN = SwinConfig(embed_dim=24, depths=(1, 1, 2, 1), heads=(1, 2, 3, 4), window=4)


def _rel_pos_index(win):
    coords = np.stack(np.meshgrid(np.arange(win), np.arange(win), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (win - 1)
    return rel[..., 0] * (2 * win - 1) + rel[..., 1]  # (win^2, win^2)


def _window_attention(x, p, heads, win, mask=None):
    """x: (nW, win*win, C); mask: (nW_types, win*win, win*win) or None."""
    B_, N, C = x.shape
    d = C // heads
    qkv = linear(x, p["qkv"]).reshape(B_, N, 3, heads, d)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * d**-0.5
    rpi = jnp.asarray(_rel_pos_index(win))
    bias = p["rel_pos_bias"][rpi]  # (N, N, heads)
    att = att + bias.transpose(2, 0, 1)[None]
    if mask is not None:
        nW = mask.shape[0]
        att = att.reshape(B_ // nW, nW, heads, N, N) + mask[None, :, None]
        att = att.reshape(B_, heads, N, N)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v, preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
    return linear(out, p["proj"])


def _to_windows(x, win):
    B, H, W, C = x.shape
    x = x.reshape(B, H // win, win, W // win, win, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, C)


def _from_windows(x, win, B, H, W):
    C = x.shape[-1]
    x = x.reshape(B, H // win, W // win, win, win, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _shift_mask(H, W, win, shift):
    img_mask = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for h in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for w in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mask_windows = _to_windows(jnp.asarray(img_mask), win).reshape(-1, win * win)
    diff = mask_windows[:, None, :] - mask_windows[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0)


def _swin_block(x, p, heads, win, shift, H, W):
    B = x.shape[0]
    shortcut = x
    xn = layer_norm(x, p["norm1"]).reshape(B, H, W, -1)
    pad_r = (win - W % win) % win
    pad_b = (win - H % win) % win
    xn = jnp.pad(xn, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = H + pad_b, W + pad_r
    if shift > 0:
        xn = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
        mask = _shift_mask(Hp, Wp, win, shift)
    else:
        mask = None
    windows = _to_windows(xn, win)
    attn = _window_attention(windows, p["attn"], heads, win, mask)
    xn = _from_windows(attn, win, B, Hp, Wp)
    if shift > 0:
        xn = jnp.roll(xn, (shift, shift), axis=(1, 2))
    xn = xn[:, :H, :W].reshape(B, H * W, -1)
    x = shortcut + xn
    h = layer_norm(x, p["norm2"])
    h = linear(h, p["mlp"]["fc1"])
    h = jax.nn.gelu(h, approximate=False)
    h = linear(h, p["mlp"]["fc2"])
    return x + h


def _patch_merge(x, p, H, W):
    B, N, C = x.shape
    x = x.reshape(B, H, W, C)
    # pad odd dims
    x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    Ho, Wo = x.shape[1], x.shape[2]
    x = x.reshape(B, Ho * Wo, 4 * C)
    x = layer_norm(x, p["norm"])
    return linear(x, p["reduction"]), Ho, Wo


def swin_forward(img, params, cfg: SwinConfig) -> List[jax.Array]:
    """img: (B, 3, H, W) -> feature maps [(B, C_i, H_i, W_i)] for
    out_indices stages."""
    B, _, H, W = img.shape
    x = jax.lax.conv_general_dilated(
        img.astype(params["patch_embed"]["weight"].dtype),
        params["patch_embed"]["weight"], (cfg.patch_size, cfg.patch_size),
        "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + params["patch_embed"]["bias"][None, :, None, None]
    h, w = x.shape[2], x.shape[3]
    x = x.reshape(B, -1, h * w).transpose(0, 2, 1)
    x = layer_norm(x, params["patch_norm"])

    outs = []
    for si, depth in enumerate(cfg.depths):
        heads = cfg.heads[si]
        for bi in range(depth):
            shift = 0 if bi % 2 == 0 else cfg.window // 2
            x = _swin_block(x, params["stages"][si]["blocks"][bi], heads,
                            cfg.window, shift, h, w)
        if si in cfg.out_indices:
            xo = layer_norm(x, params["out_norms"][str(si)])
            outs.append(xo.transpose(0, 2, 1).reshape(B, -1, h, w))
        if si < len(cfg.depths) - 1:
            x, h, w = _patch_merge(x, params["stages"][si]["downsample"], h, w)
    return outs


def init_swin(key, cfg: SwinConfig):
    ks = iter(jax.random.split(key, 256))
    dim = cfg.embed_dim
    params = {
        "patch_embed": {
            "weight": jax.random.normal(next(ks), (dim, 3, cfg.patch_size, cfg.patch_size)) * 0.05,
            "bias": jnp.zeros((dim,)),
        },
        "patch_norm": _init_ln(dim),
        "stages": [],
        "out_norms": {},
    }
    for si, depth in enumerate(cfg.depths):
        d = dim * 2**si
        blocks = []
        for _ in range(depth):
            blocks.append(
                {
                    "norm1": _init_ln(d),
                    "attn": {
                        "qkv": _init_linear(next(ks), d, 3 * d),
                        "proj": _init_linear(next(ks), d, d),
                        "rel_pos_bias": jax.random.normal(
                            next(ks), ((2 * cfg.window - 1) ** 2, cfg.heads[si])
                        )
                        * 0.02,
                    },
                    "norm2": _init_ln(d),
                    "mlp": {
                        "fc1": _init_linear(next(ks), d, int(d * cfg.mlp_ratio)),
                        "fc2": _init_linear(next(ks), int(d * cfg.mlp_ratio), d),
                    },
                }
            )
        stage = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm": _init_ln(4 * d),
                "reduction": _init_linear(next(ks), 4 * d, 2 * d, bias=False),
            }
        params["stages"].append(stage)
        if si in cfg.out_indices:
            params["out_norms"][str(si)] = _init_ln(d)
    return params
