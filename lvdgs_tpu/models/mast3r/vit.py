"""ViT building blocks for the MASt3R/DUSt3R/CroCo stack, JAX-native.

Re-implementation of the missing dust3r/croco model code (reference imports
at mast3r/model.py:13-15, mast3r/catmlp_dpt_head.py:10-14; the repos are
absent from the snapshot, SURVEY.md §0.1):

- 16x16 conv patch embedding (PatchEmbedDust3R semantics)
- 2D rotary position embedding (plain-JAX replacement for the `curope`
  CUDA extension, SURVEY.md §2.8 item 3): per head, the first half of the
  channel pairs rotates with the patch row index, the second half with the
  column index, base frequency 100 (CroCo v2 "RoPE100")
- pre-norm transformer encoder blocks and CroCo decoder blocks
  (self-attention + cross-attention to the other view + MLP)

Parameters are plain nested dicts so the torch checkpoint converts 1:1
(convert.py). All matmuls carry preferred_element_type for MXU precision,
and everything is batch-friendly for pjit sharding over an ICI mesh.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def layer_norm(x, p, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def linear(x, p):
    y = jnp.einsum("...d,de->...e", x, p["weight"], preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    return y


def mlp(x, p):
    x = linear(x, p["fc1"])
    x = jax.nn.gelu(x, approximate=False)
    return linear(x, p["fc2"])


# ---------------------------------------------------------------------------
# RoPE2D (curope replacement)


def rope2d_angles(positions: jax.Array, dim: int, base: float = 100.0):
    """positions: (..., 2) int (y, x); dim = per-head channel count.

    Returns (cos, sin) of shape (..., dim) laid out as [y-half | x-half],
    each half with repeated pair angles — matching curope's RoPE2D."""
    half = dim // 2
    # D = half/2 distinct frequencies per axis
    D = half // 2
    freqs = 1.0 / (base ** (jnp.arange(D, dtype=jnp.float32) / D))
    y = positions[..., 0:1].astype(jnp.float32) * freqs  # (..., D)
    x = positions[..., 1:2].astype(jnp.float32) * freqs
    ang = jnp.concatenate([y, y, x, x], axis=-1)  # (..., 2*half) -> dim
    return jnp.cos(ang), jnp.sin(ang)


def _rotate_half_block(t):
    """curope rotates (x1, x2) pairs arranged as two contiguous blocks per
    axis-half: rotate_half(u)[i] = -u[i+D] for i<D, u[i-D] otherwise."""
    d = t.shape[-1] // 4
    y1, y2, x1, x2 = jnp.split(t, 4, axis=-1)
    return jnp.concatenate([-y2, y1, -x2, x1], axis=-1)


def apply_rope2d(q: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """q: (B, H, N, d); cos/sin: (B, N, d) or (N, d)."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, None]  # (B, 1, N, d)
    sin = sin[:, None]
    return q * cos + _rotate_half_block(q) * sin


# ---------------------------------------------------------------------------
# attention


def attention(x, p, n_heads, rope: Optional[Tuple[jax.Array, jax.Array]] = None):
    """Self-attention with optional RoPE. x: (B, N, D)."""
    B, N, D = x.shape
    qkv = linear(x, p["qkv"]).reshape(B, N, 3, n_heads, D // n_heads)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]  # (B,H,N,d)
    if rope is not None:
        cos, sin = rope
        q = apply_rope2d(q, cos, sin)
        k = apply_rope2d(k, cos, sin)
    scale = (D // n_heads) ** -0.5
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v, preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
    return linear(out, p["proj"])


def cross_attention(x, y, p, n_heads, rope_q=None, rope_k=None):
    """Cross-attention: queries from x, keys/values from y."""
    B, N, D = x.shape
    M = y.shape[1]
    q = linear(x, p["projq"]).reshape(B, N, n_heads, D // n_heads).transpose(0, 2, 1, 3)
    k = linear(y, p["projk"]).reshape(B, M, n_heads, D // n_heads).transpose(0, 2, 1, 3)
    v = linear(y, p["projv"]).reshape(B, M, n_heads, D // n_heads).transpose(0, 2, 1, 3)
    if rope_q is not None:
        q = apply_rope2d(q, *rope_q)
    if rope_k is not None:
        k = apply_rope2d(k, *rope_k)
    scale = (D // n_heads) ** -0.5
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v, preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
    return linear(out, p["proj"])


def encoder_block(x, p, n_heads, rope):
    x = x + attention(layer_norm(x, p["norm1"]), p["attn"], n_heads, rope)
    x = x + mlp(layer_norm(x, p["norm2"]), p["mlp"])
    return x


def decoder_block(x, y, p, n_heads, rope_x, rope_y):
    """CroCo DecoderBlock: self-attn, cross-attn to the (normed) other view,
    MLP — pre-norm residual layout."""
    x = x + attention(layer_norm(x, p["norm1"]), p["attn"], n_heads, rope_x)
    y_ = layer_norm(y, p["norm_y"])
    x = x + cross_attention(
        layer_norm(x, p["norm2"]), y_, p["cross_attn"], n_heads,
        rope_q=rope_x, rope_k=rope_y,
    )
    x = x + mlp(layer_norm(x, p["norm3"]), p["mlp"])
    return x


def patch_embed(img, p, patch_size=16):
    """img: (B, 3, H, W) -> tokens (B, N, D), positions (N, 2) as (y, x)."""
    B, C, H, W = img.shape
    out = jax.lax.conv_general_dilated(
        img.astype(p["proj"]["weight"].dtype),
        p["proj"]["weight"],  # (D, 3, ps, ps)
        window_strides=(patch_size, patch_size),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = out + p["proj"]["bias"][None, :, None, None]
    D = out.shape[1]
    h, w = H // patch_size, W // patch_size
    tokens = out.reshape(B, D, h * w).transpose(0, 2, 1)
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pos = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # (N, 2)
    return tokens, pos


# ---------------------------------------------------------------------------
# random init (testing without the torch checkpoint)


def _init_linear(key, din, dout, bias=True):
    k1, _ = jax.random.split(key)
    p = {"weight": jax.random.normal(k1, (din, dout)) * 0.25 * (2.0 / (din + dout)) ** 0.5}
    if bias:
        p["bias"] = jnp.zeros((dout,))
    return p


def _init_ln(d):
    return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def init_attention(key, d, bias=True):
    k1, k2 = jax.random.split(key)
    return {"qkv": _init_linear(k1, d, 3 * d, bias), "proj": _init_linear(k2, d, d)}


def init_cross_attention(key, d, bias=True):
    ks = jax.random.split(key, 4)
    return {
        "projq": _init_linear(ks[0], d, d, bias),
        "projk": _init_linear(ks[1], d, d, bias),
        "projv": _init_linear(ks[2], d, d, bias),
        "proj": _init_linear(ks[3], d, d),
    }


def init_mlp(key, d, hidden):
    k1, k2 = jax.random.split(key)
    return {"fc1": _init_linear(k1, d, hidden), "fc2": _init_linear(k2, hidden, d)}


def init_encoder_block(key, d, mlp_ratio=4):
    k1, k2 = jax.random.split(key)
    return {
        "norm1": _init_ln(d),
        "attn": init_attention(k1, d),
        "norm2": _init_ln(d),
        "mlp": init_mlp(k2, d, int(d * mlp_ratio)),
    }


def init_decoder_block(key, d, mlp_ratio=4):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm1": _init_ln(d),
        "attn": init_attention(k1, d),
        "norm2": _init_ln(d),
        "norm_y": _init_ln(d),
        "cross_attn": init_cross_attention(k2, d),
        "norm3": _init_ln(d),
        "mlp": init_mlp(k3, d, int(d * mlp_ratio)),
    }
