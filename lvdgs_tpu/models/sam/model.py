"""Segment Anything (ViT-B) in JAX.

Replaces the pip `segment_anything` dependency of the reference masking
stack (box-prompted segmentation at utils/slam_frontend.py:502,956-1013;
checkpoint sam_vit_b_01ec64.pth). Three parts:

- image encoder: ViT-B/16 at 1024x1024 with windowed attention (window 14,
  global at blocks 2/5/8/11) and decomposed relative position embeddings,
  plus the 256-channel neck -> (256, 64, 64) image embedding
- prompt encoder: random-fourier positional encoding of box corners
- mask decoder: two-way transformer (2 layers), mask/IoU tokens,
  hypernetwork MLPs, 4x upscaling -> (N_masks, 256, 256) logits

Like the MASt3R port, parameters are nested dicts converting 1:1 from the
torch checkpoint (convert.py).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mast3r.vit import layer_norm, linear, mlp as _mlp, _init_linear, _init_ln


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    window: int = 14
    global_blocks: Tuple[int, ...] = (2, 5, 8, 11)
    embed_dim: int = 256  # neck / decoder dim
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp: int = 2048
    num_mask_tokens: int = 4


TINY = SAMConfig(img_size=128, dim=64, depth=2, heads=2, window=4,
                 global_blocks=(1,), embed_dim=32, decoder_mlp=64)


# ---------------------------------------------------------------------------
# image encoder


def _rel_pos_bias(q, rel_h, rel_w, h, w):
    """Decomposed relative position bias (SAM's add_decomposed_rel_pos).

    q: (B, H*W, heads, d) reshaped externally; here q: (Bh, h*w, d).
    rel_h/rel_w: (2*size-1, d) tables. Returns bias (Bh, h*w, h*w)."""
    # relative coordinate lookup
    coords = jnp.arange(h)
    rel = coords[:, None] - coords[None, :] + (h - 1)  # (h, h)
    Rh = rel_h[rel]  # (h, h, d)
    coords = jnp.arange(w)
    rel = coords[:, None] - coords[None, :] + (w - 1)
    Rw = rel_w[rel]  # (w, w, d)
    Bh = q.shape[0]
    qr = q.reshape(Bh, h, w, -1)
    bias_h = jnp.einsum("bhwd,hkd->bhwk", qr, Rh)  # (Bh, h, w, h)
    bias_w = jnp.einsum("bhwd,wkd->bhwk", qr, Rw)  # (Bh, h, w, w)
    bias = bias_h[:, :, :, :, None] + bias_w[:, :, :, None, :]
    return bias.reshape(Bh, h * w, h * w)


def _sam_attention(x, p, heads, h, w):
    """x: (B, h*w, D) attention with decomposed rel-pos."""
    B, N, D = x.shape
    d = D // heads
    qkv = linear(x, p["qkv"]).reshape(B, N, 3, heads, d)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3).reshape(B * heads, N, d)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3).reshape(B * heads, N, d)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3).reshape(B * heads, N, d)
    att = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * d**-0.5
    att = att + _rel_pos_bias(q, p["rel_pos_h"], p["rel_pos_w"], h, w)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bqk,bkd->bqd", att, v, preferred_element_type=jnp.float32)
    out = out.reshape(B, heads, N, d).transpose(0, 2, 1, 3).reshape(B, N, D)
    return linear(out, p["proj"])


def _window_partition(x, win):
    """(B, H, W, D) -> (B*nW, win*win, D), with padding. Returns also pads."""
    B, H, W, D = x.shape
    ph = (win - H % win) % win
    pw = (win - W % win) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // win, win, Wp // win, win, D)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, D)
    return x, (Hp, Wp, ph, pw)


def _window_unpartition(x, win, pads, B, H, W):
    Hp, Wp, ph, pw = pads
    D = x.shape[-1]
    x = x.reshape(B, Hp // win, Wp // win, win, win, D)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, D)
    return x[:, :H, :W]


def _encoder_block(x, p, cfg: SAMConfig, is_global: bool):
    """x: (B, H, W, D)."""
    B, H, W, D = x.shape
    shortcut = x
    xn = layer_norm(x, p["norm1"])
    if is_global:
        tokens = xn.reshape(B, H * W, D)
        att = _sam_attention(tokens, p["attn"], cfg.heads, H, W)
        att = att.reshape(B, H, W, D)
    else:
        win = cfg.window
        tokens, pads = _window_partition(xn, win)
        att = _sam_attention(tokens, p["attn"], cfg.heads, win, win)
        att = _window_unpartition(att, win, pads, B, H, W)
    x = shortcut + att
    x = x + _mlp(layer_norm(x, p["norm2"]), p["mlp"])
    return x


def _layer_norm_2d(x, p, eps=1e-6):
    """channel-wise LN over (B, C, H, W)."""
    mu = x.mean(axis=1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + eps)
    return x * p["weight"][None, :, None, None] + p["bias"][None, :, None, None]


def _conv(x, p, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x.astype(p["weight"].dtype), p["weight"], (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in p:
        out = out + p["bias"][None, :, None, None]
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def sam_encode_image(params, img, cfg: SAMConfig):
    """img: (B, 3, S, S) already SAM-normalised. -> (B, 256, S/16, S/16)."""
    p = params["image_encoder"]
    x = jax.lax.conv_general_dilated(
        img.astype(p["patch_embed"]["weight"].dtype),
        p["patch_embed"]["weight"], (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + p["patch_embed"]["bias"][None, :, None, None]
    x = x.transpose(0, 2, 3, 1)  # (B, h, w, D)
    x = x + p["pos_embed"]
    for i, blk in enumerate(p["blocks"]):
        x = _encoder_block(x, blk, cfg, is_global=i in cfg.global_blocks)
    x = x.transpose(0, 3, 1, 2)  # (B, D, h, w)
    x = _conv(x, {"weight": p["neck"]["conv1"]["weight"]})
    x = _layer_norm_2d(x, p["neck"]["ln1"])
    x = _conv(x, {"weight": p["neck"]["conv2"]["weight"]})
    x = _layer_norm_2d(x, p["neck"]["ln2"])
    return x


# ---------------------------------------------------------------------------
# prompt encoder + mask decoder


def _pe_encode(coords, pe_gaussian):
    """coords normalised to [0,1], (..., 2) -> (..., embed_dim) fourier PE."""
    c = 2.0 * coords - 1.0
    proj = c @ pe_gaussian  # (..., embed_dim/2)
    proj = 2.0 * jnp.pi * proj
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def _decoder_attention(q, k, v, p, heads):
    B, Nq, D = q.shape
    d_out = p["q_proj"]["weight"].shape[1]
    d = d_out // heads
    qq = linear(q, p["q_proj"]).reshape(B, Nq, heads, d).transpose(0, 2, 1, 3)
    kk = linear(k, p["k_proj"]).reshape(B, -1, heads, d).transpose(0, 2, 1, 3)
    vv = linear(v, p["v_proj"]).reshape(B, -1, heads, d).transpose(0, 2, 1, 3)
    att = jnp.einsum("bhqd,bhkd->bhqk", qq, kk, preferred_element_type=jnp.float32) * d**-0.5
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, vv, preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, Nq, d_out)
    return linear(out, p["out_proj"])


def _two_way_block(queries, keys, qpe, kpe, p, heads, skip_first_pe):
    """SAM TwoWayAttentionBlock semantics: on the first block the self-attn
    output REPLACES the queries (no residual, no PE); afterwards standard
    residual + PE-added attention."""
    if skip_first_pe:
        queries = _decoder_attention(queries, queries, queries, p["self_attn"], heads)
    else:
        q_in = queries + qpe
        queries = queries + _decoder_attention(q_in, q_in, queries, p["self_attn"], heads)
    queries = layer_norm(queries, p["norm1"])
    q = queries + qpe
    k = keys + kpe
    queries = layer_norm(
        queries + _decoder_attention(q, k, keys, p["cross_attn_t2i"], heads), p["norm2"]
    )
    # SAM's decoder MLPBlock uses ReLU (not the ViT GELU)
    mlp_out = linear(jax.nn.relu(linear(queries, p["mlp"]["fc1"])), p["mlp"]["fc2"])
    queries = layer_norm(queries + mlp_out, p["norm3"])
    q = queries + qpe
    keys = layer_norm(
        keys + _decoder_attention(k, q, queries, p["cross_attn_i2t"], heads), p["norm4"]
    )
    return queries, keys


@functools.partial(jax.jit, static_argnames=("cfg",))
def sam_predict_masks(params, image_embedding, boxes, cfg: SAMConfig):
    """image_embedding: (1, 256, h, w); boxes: (B, 4) xyxy normalised [0,1].
    Returns (masks (B, num_mask_tokens, 4h, 4w) logits, iou (B, num_mask_tokens))."""
    pe = params["prompt_encoder"]
    dec = params["mask_decoder"]
    B = boxes.shape[0]
    h, w = image_embedding.shape[-2:]
    D = cfg.embed_dim

    # box corners as two points with corner embeddings
    corners = boxes.reshape(B, 2, 2)
    corner_pe = _pe_encode(corners, pe["pe_gaussian"])
    corner_pe = corner_pe.at[:, 0].add(pe["point_embeddings"][2])
    corner_pe = corner_pe.at[:, 1].add(pe["point_embeddings"][3])
    sparse = corner_pe  # (B, 2, D)

    # dense PE grid for the image
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid_pe = _pe_encode(jnp.stack([gx, gy], -1), pe["pe_gaussian"])  # (h, w, D)
    img_pe = grid_pe.reshape(1, h * w, D)

    src = image_embedding + pe["no_mask_embed"][None, :, None, None]
    src = jnp.broadcast_to(src, (B, D, h, w)).reshape(B, D, h * w).transpose(0, 2, 1)

    tokens = jnp.concatenate(
        [
            jnp.broadcast_to(dec["iou_token"][None, None], (B, 1, D)),
            jnp.broadcast_to(dec["mask_tokens"][None], (B, cfg.num_mask_tokens, D)),
            sparse,
        ],
        axis=1,
    )
    qpe = tokens  # SAM uses token values themselves as their PE
    kpe = jnp.broadcast_to(img_pe, (B, h * w, D))

    queries, keys = tokens, src
    for i, blk in enumerate(dec["blocks"]):
        queries, keys = _two_way_block(
            queries, keys, qpe, kpe, blk, cfg.decoder_heads, skip_first_pe=(i == 0)
        )
    # final token-to-image attention
    q = queries + qpe
    k = keys + kpe
    queries = queries + _decoder_attention(q, k, keys, dec["final_attn"], cfg.decoder_heads)
    queries = layer_norm(queries, dec["norm_final"])

    iou_tok = queries[:, 0]
    mask_toks = queries[:, 1 : 1 + cfg.num_mask_tokens]

    # upscale image features 4x
    feat = keys.transpose(0, 2, 1).reshape(B, D, h, w)
    x = jax.lax.conv_transpose(
        feat.astype(dec["upscale"]["conv1"]["weight"].dtype),
        dec["upscale"]["conv1"]["weight"], (2, 2), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), transpose_kernel=True,
    ) + dec["upscale"]["conv1"]["bias"][None, :, None, None]
    x = _layer_norm_2d(x, dec["upscale"]["ln"])
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_transpose(
        x.astype(dec["upscale"]["conv2"]["weight"].dtype),
        dec["upscale"]["conv2"]["weight"], (2, 2), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), transpose_kernel=True,
    ) + dec["upscale"]["conv2"]["bias"][None, :, None, None]
    x = jax.nn.gelu(x, approximate=False)  # (B, D/8, 4h, 4w)

    hyper = jnp.stack(
        [
            _mlp3(mask_toks[:, i], dec["hyper_mlps"][i])
            for i in range(cfg.num_mask_tokens)
        ],
        axis=1,
    )  # (B, T, D/8)
    Bc, Dc, Hc, Wc = x.shape
    masks = jnp.einsum("btd,bdhw->bthw", hyper, x, preferred_element_type=jnp.float32)
    iou = _mlp3(iou_tok, dec["iou_mlp"])  # (B, T)
    return masks, iou


def _mlp3(x, p):
    for i, layer in enumerate(p):
        x = linear(x, layer)
        if i < len(p) - 1:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# init (random, for tests / before checkpoint conversion)


def init_params(key, cfg: SAMConfig) -> Dict:
    def _keystream(k):
        # unbounded deterministic key stream: a statically sized split
        # under-counted at production decoder width (StopIteration at ViT-B)
        i = 0
        while True:
            yield jax.random.fold_in(k, i)
            i += 1

    ks = _keystream(key)
    D, E = cfg.dim, cfg.embed_dim
    g = cfg.img_size // cfg.patch_size

    def conv_p(cin, cout, k, bias=True):
        p = {"weight": jax.random.normal(next(ks), (cout, cin, k, k)) * 0.05}
        if bias:
            p["bias"] = jnp.zeros((cout,))
        return p

    blocks = []
    for i in range(cfg.depth):
        size = g if i in cfg.global_blocks else cfg.window
        blocks.append(
            {
                "norm1": _init_ln(D),
                "attn": {
                    "qkv": _init_linear(next(ks), D, 3 * D),
                    "proj": _init_linear(next(ks), D, D),
                    "rel_pos_h": jax.random.normal(next(ks), (2 * size - 1, D // cfg.heads)) * 0.02,
                    "rel_pos_w": jax.random.normal(next(ks), (2 * size - 1, D // cfg.heads)) * 0.02,
                },
                "norm2": _init_ln(D),
                "mlp": {
                    "fc1": _init_linear(next(ks), D, 4 * D),
                    "fc2": _init_linear(next(ks), 4 * D, D),
                },
            }
        )
    image_encoder = {
        "patch_embed": {
            "weight": jax.random.normal(next(ks), (D, 3, cfg.patch_size, cfg.patch_size)) * 0.02,
            "bias": jnp.zeros((D,)),
        },
        "pos_embed": jax.random.normal(next(ks), (1, g, g, D)) * 0.02,
        "blocks": blocks,
        "neck": {
            "conv1": conv_p(D, E, 1, bias=False),
            "ln1": _init_ln(E),
            "conv2": conv_p(E, E, 3, bias=False),
            "ln2": _init_ln(E),
        },
    }
    prompt_encoder = {
        "pe_gaussian": jax.random.normal(next(ks), (2, E // 2)),
        "point_embeddings": jax.random.normal(next(ks), (4, E)) * 0.02,
        "not_a_point": jax.random.normal(next(ks), (E,)) * 0.02,
        "no_mask_embed": jax.random.normal(next(ks), (E,)) * 0.02,
    }

    def attn_p(downsample=1):
        d = E // downsample
        return {
            "q_proj": _init_linear(next(ks), E, d),
            "k_proj": _init_linear(next(ks), E, d),
            "v_proj": _init_linear(next(ks), E, d),
            "out_proj": _init_linear(next(ks), d, E),
        }

    dec_blocks = []
    for _ in range(cfg.decoder_depth):
        dec_blocks.append(
            {
                "self_attn": attn_p(),
                "norm1": _init_ln(E),
                "cross_attn_t2i": attn_p(2),
                "norm2": _init_ln(E),
                "mlp": {
                    "fc1": _init_linear(next(ks), E, cfg.decoder_mlp),
                    "fc2": _init_linear(next(ks), cfg.decoder_mlp, E),
                },
                "norm3": _init_ln(E),
                "cross_attn_i2t": attn_p(2),
                "norm4": _init_ln(E),
            }
        )
    up_dim = E // 4
    mask_decoder = {
        "iou_token": jax.random.normal(next(ks), (E,)) * 0.02,
        "mask_tokens": jax.random.normal(next(ks), (cfg.num_mask_tokens, E)) * 0.02,
        "blocks": dec_blocks,
        "final_attn": attn_p(2),
        "norm_final": _init_ln(E),
        "upscale": {
            "conv1": {"weight": jax.random.normal(next(ks), (E, up_dim, 2, 2)) * 0.05,
                       "bias": jnp.zeros((up_dim,))},
            "ln": _init_ln(up_dim),
            "conv2": {"weight": jax.random.normal(next(ks), (up_dim, up_dim // 2, 2, 2)) * 0.05,
                       "bias": jnp.zeros((up_dim // 2,))},
        },
        "hyper_mlps": [
            [
                _init_linear(next(ks), E, E),
                _init_linear(next(ks), E, E),
                _init_linear(next(ks), E, up_dim // 2),
            ]
            for _ in range(cfg.num_mask_tokens)
        ],
        "iou_mlp": [
            _init_linear(next(ks), E, E),
            _init_linear(next(ks), E, E),
            _init_linear(next(ks), E, cfg.num_mask_tokens),
        ],
    }
    return {
        "image_encoder": image_encoder,
        "prompt_encoder": prompt_encoder,
        "mask_decoder": mask_decoder,
    }
