"""DINOv2 ViT in JAX (feature-analysis capability).

The reference ships DINOv2 as standalone analysis tooling (dinov2.py:25-79:
torch.hub dinov2_vitb14 with forward hooks on every block). This port
returns every block's tokens and attention maps directly — the JAX
equivalent of hook capture — for the feature-analyzer tool
(tools/dinov2_analyze.py).

Architecture (ViT-B/14): patch 14, cls token, learned pos embed with
bicubic interpolation to the input grid, pre-norm blocks with LayerScale.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List

import jax
import jax.numpy as jnp

from ..mast3r.vit import layer_norm, linear, _init_linear, _init_ln


@dataclasses.dataclass(frozen=True)
class DINOv2Config:
    patch_size: int = 14
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    pos_grid: int = 37  # 518 / 14


TINY_DINO = DINOv2Config(patch_size=8, dim=32, depth=2, heads=2, pos_grid=8)


def _block(x, p, heads):
    B, N, D = x.shape
    d = D // heads
    xn = layer_norm(x, p["norm1"])
    qkv = linear(xn, p["qkv"]).reshape(B, N, 3, heads, d)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * d**-0.5
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v, preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
    x = x + p["ls1"] * linear(out, p["proj"])
    xn = layer_norm(x, p["norm2"])
    h = jax.nn.gelu(linear(xn, p["fc1"]), approximate=False)
    x = x + p["ls2"] * linear(h, p["fc2"])
    return x, att


@functools.partial(jax.jit, static_argnames=("cfg",))
def dinov2_forward(params, img, cfg: DINOv2Config):
    """img: (B, 3, H, W), H/W multiples of patch_size.

    Returns dict with 'tokens': list per block (B, 1+N, D), 'attn': list per
    block (B, heads, 1+N, 1+N), 'final' (B, 1+N, D) post-norm."""
    B, _, H, W = img.shape
    ps = cfg.patch_size
    x = jax.lax.conv_general_dilated(
        img.astype(params["patch_embed"]["weight"].dtype),
        params["patch_embed"]["weight"], (ps, ps), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + params["patch_embed"]["bias"][None, :, None, None]
    h, w = x.shape[2], x.shape[3]
    x = x.reshape(B, cfg.dim, h * w).transpose(0, 2, 1)

    # interpolate pos embed to the input grid
    pos = params["pos_embed"]  # (1, 1 + g*g, D)
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    g = cfg.pos_grid
    patch_pos = patch_pos.reshape(1, g, g, cfg.dim)
    patch_pos = jax.image.resize(patch_pos, (1, h, w, cfg.dim), "bicubic")
    patch_pos = patch_pos.reshape(1, h * w, cfg.dim)

    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.dim)) + cls_pos
    x = jnp.concatenate([cls, x + patch_pos], axis=1)

    tokens, attns = [], []
    for blk in params["blocks"]:
        x, att = _block(x, blk, cfg.heads)
        tokens.append(x)
        attns.append(att)
    final = layer_norm(x, params["norm"])
    return {"tokens": tokens, "attn": attns, "final": final, "grid": (h, w)}


def init_params(key, cfg: DINOv2Config) -> Dict:
    ks = iter(jax.random.split(key, cfg.depth * 4 + 8))
    D = cfg.dim
    params = {
        "patch_embed": {
            "weight": jax.random.normal(next(ks), (D, 3, cfg.patch_size, cfg.patch_size)) * 0.02,
            "bias": jnp.zeros((D,)),
        },
        "cls_token": jax.random.normal(next(ks), (1, 1, D)) * 0.02,
        "pos_embed": jax.random.normal(next(ks), (1, 1 + cfg.pos_grid**2, D)) * 0.02,
        "blocks": [],
        "norm": _init_ln(D),
    }
    for _ in range(cfg.depth):
        params["blocks"].append(
            {
                "norm1": _init_ln(D),
                "qkv": _init_linear(next(ks), D, 3 * D),
                "proj": _init_linear(next(ks), D, D),
                "ls1": jnp.full((D,), 1e-5),
                "norm2": _init_ln(D),
                "fc1": _init_linear(next(ks), D, int(D * cfg.mlp_ratio)),
                "fc2": _init_linear(next(ks), int(D * cfg.mlp_ratio), D),
                "ls2": jnp.full((D,), 1e-5),
            }
        )
    return params


def convert_state_dict(sd, cfg: DINOv2Config):
    """torch.hub dinov2 state dict -> params."""
    import numpy as np

    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    t = lambda w: np.ascontiguousarray(np.asarray(w).T)
    params = {
        "patch_embed": {
            "weight": sd["patch_embed.proj.weight"],
            "bias": sd["patch_embed.proj.bias"],
        },
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "blocks": [],
        "norm": {"weight": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        params["blocks"].append(
            {
                "norm1": {"weight": sd[f"{b}.norm1.weight"], "bias": sd[f"{b}.norm1.bias"]},
                "qkv": {"weight": t(sd[f"{b}.attn.qkv.weight"]), "bias": sd[f"{b}.attn.qkv.bias"]},
                "proj": {"weight": t(sd[f"{b}.attn.proj.weight"]), "bias": sd[f"{b}.attn.proj.bias"]},
                "ls1": sd[f"{b}.ls1.gamma"],
                "norm2": {"weight": sd[f"{b}.norm2.weight"], "bias": sd[f"{b}.norm2.bias"]},
                "fc1": {"weight": t(sd[f"{b}.mlp.fc1.weight"]), "bias": sd[f"{b}.mlp.fc1.bias"]},
                "fc2": {"weight": t(sd[f"{b}.mlp.fc2.weight"]), "bias": sd[f"{b}.mlp.fc2.bias"]},
                "ls2": sd[f"{b}.ls2.gamma"],
            }
        )
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
