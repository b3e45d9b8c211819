"""BERT-base text encoder in JAX (GroundingDINO's text tower).

The reference uses HF BERT inside the pip groundingdino package
(SURVEY.md §2.3; text transformer consumed at
GroundingDINO-main/groundingdino/models/GroundingDINO/groundingdino.py).
Weights live inside groundingdino_swint_ogc.pth under `bert.*` and convert
directly. Post-norm encoder (BERT layout), additive attention mask — the
detector passes the phrase-block mask produced by
generate_masks_with_special_tokens (sub-sentence isolation).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..mast3r.vit import linear, _init_linear, _init_ln


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    dim: int = 768
    layers: int = 12
    heads: int = 12
    mlp: int = 3072
    max_pos: int = 512
    type_vocab: int = 2


TINY_BERT = BertConfig(vocab_size=128, dim=32, layers=2, heads=2, mlp=64, max_pos=64)


def _ln(x, p, eps=1e-12):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def bert_forward(params, input_ids, attention_mask, cfg: BertConfig,
                 position_ids: Optional[jax.Array] = None):
    """input_ids: (B, L) int32; attention_mask: (B, L, L) bool or (B, L)
    padding mask. Returns (B, L, dim)."""
    B, L = input_ids.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(L), (B, L))
    emb = (
        params["word_emb"][input_ids]
        + params["pos_emb"][position_ids]
        + params["type_emb"][jnp.zeros_like(input_ids)]
    )
    x = _ln(emb, params["emb_ln"])

    if attention_mask.ndim == 2:
        att_mask = attention_mask[:, None, :] & attention_mask[:, :, None]
    else:
        att_mask = attention_mask
    bias = jnp.where(att_mask[:, None], 0.0, -1e9)  # (B, 1, L, L)

    H = cfg.heads
    d = cfg.dim // H
    for blk in params["layers"]:
        q = linear(x, blk["q"]).reshape(B, L, H, d).transpose(0, 2, 1, 3)
        k = linear(x, blk["k"]).reshape(B, L, H, d).transpose(0, 2, 1, 3)
        v = linear(x, blk["v"]).reshape(B, L, H, d).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * d**-0.5
        att = jax.nn.softmax(att + bias, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, cfg.dim)
        x = _ln(x + linear(out, blk["attn_out"]), blk["attn_ln"])
        h = jax.nn.gelu(linear(x, blk["fc1"]), approximate=False)
        x = _ln(x + linear(h, blk["fc2"]), blk["out_ln"])
    return x


def init_bert(key, cfg: BertConfig) -> Dict:
    ks = iter(jax.random.split(key, cfg.layers * 8 + 8))
    params = {
        "word_emb": jax.random.normal(next(ks), (cfg.vocab_size, cfg.dim)) * 0.02,
        "pos_emb": jax.random.normal(next(ks), (cfg.max_pos, cfg.dim)) * 0.02,
        "type_emb": jax.random.normal(next(ks), (cfg.type_vocab, cfg.dim)) * 0.02,
        "emb_ln": _init_ln(cfg.dim),
        "layers": [],
    }
    for _ in range(cfg.layers):
        params["layers"].append(
            {
                "q": _init_linear(next(ks), cfg.dim, cfg.dim),
                "k": _init_linear(next(ks), cfg.dim, cfg.dim),
                "v": _init_linear(next(ks), cfg.dim, cfg.dim),
                "attn_out": _init_linear(next(ks), cfg.dim, cfg.dim),
                "attn_ln": _init_ln(cfg.dim),
                "fc1": _init_linear(next(ks), cfg.dim, cfg.mlp),
                "fc2": _init_linear(next(ks), cfg.mlp, cfg.dim),
                "out_ln": _init_ln(cfg.dim),
            }
        )
    return params
