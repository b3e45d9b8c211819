"""GroundingDINO open-vocabulary detector in JAX.

Re-design of the reference detector (GroundingDINO-main/groundingdino/models/
GroundingDINO/groundingdino.py:412 `build_groundingdino`, transformer.py:40,
fuse_modules.py:99/252, utils.py:233 ContrastiveEmbed) for XLA:

  Swin-T backbone (swin.py) -> 4 feature levels (256-d neck)
  BERT text tower (bert.py) with sub-sentence attention masks
  6 encoder layers: bi-directional image<->text fusion, text self-attention,
    multi-scale deformable image self-attention (ops/msda.py)
  two-stage proposal selection (top num_queries by text-grounded score)
  6 decoder layers: query self-attn, text cross-attn, deformable cross-attn,
    iterative box refinement
  classification = ContrastiveEmbed (query . text features, max over tokens)

All shapes static per (H, W, L) so the whole detector is one jitted program.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.msda import multi_scale_deformable_attention
from ..mast3r.vit import linear, _init_linear, _init_ln
from ..mast3r.vit import layer_norm as _layer_norm_e6


def layer_norm(x, p):
    """torch nn.LayerNorm default eps=1e-5 (GDINO constructs every
    LayerNorm with defaults; the MASt3R helper defaults to CroCo's 1e-6)."""
    return _layer_norm_e6(x, p, eps=1e-5)
from .bert import BertConfig, TINY_BERT, bert_forward, init_bert
from .swin import SwinConfig, TINY_SWIN, init_swin, swin_forward


@dataclasses.dataclass(frozen=True)
class GroundingDINOConfig:
    swin: SwinConfig = SwinConfig()
    bert: BertConfig = BertConfig()
    dim: int = 256
    heads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    ffn: int = 2048
    num_queries: int = 900
    n_levels: int = 4
    n_points: int = 4
    max_text_len: int = 256


TINY_GDINO = GroundingDINOConfig(
    swin=TINY_SWIN, bert=TINY_BERT, dim=32, heads=2, enc_layers=2, dec_layers=2,
    ffn=64, num_queries=20, n_points=2, max_text_len=32,
)


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def _sine_pos_embed_2d(H, W, dim, tempH=20.0, tempW=20.0):
    """PositionEmbeddingSineHW parity (num_pos_feats=dim/2)."""
    npf = dim // 2
    ys = jnp.arange(1, H + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, W))
    xs = jnp.arange(1, W + 1, dtype=jnp.float32)[None, :] * jnp.ones((H, 1))
    eps = 1e-6
    ys = ys / (ys[-1:, :] + eps) * 2 * jnp.pi
    xs = xs / (xs[:, -1:] + eps) * 2 * jnp.pi
    dim_tx = tempW ** (2 * (jnp.arange(npf) // 2) / npf)
    dim_ty = tempH ** (2 * (jnp.arange(npf) // 2) / npf)
    pos_x = xs[..., None] / dim_tx
    pos_y = ys[..., None] / dim_ty
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=3).reshape(H, W, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=3).reshape(H, W, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)  # (H, W, dim)


def _sine_embed_boxes(boxes, dim):
    """(.., 4) cxcywh in [0,1] -> (.., 2*dim) sine embedding (cx, cy, w, h
    each dim/2) following DINO's gen_sineembed_for_position."""
    npf = dim // 2
    scale = 2 * jnp.pi
    t = 10000 ** (2 * (jnp.arange(npf) // 2) / npf)

    def emb(v):
        p = v[..., None] * scale / t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1).reshape(
            *v.shape, npf
        )

    # reference concat order is (y, x, w, h) — utils.py:227
    return jnp.concatenate([emb(boxes[..., 1]), emb(boxes[..., 0]),
                            emb(boxes[..., 2]), emb(boxes[..., 3])], axis=-1)


def _sine_pos_1d(pos, dim):
    """get_sine_pos_embed parity (reference utils.py:24-53, exchange_xy
    False): scalar positions -> (.., dim) interleaved sin/cos embedding,
    temperature 10000. Used for the per-phrase text position embedding
    (reference transformer.py:539-543)."""
    npf = dim
    dim_t = 10000.0 ** (2 * (jnp.arange(npf) // 2) / npf)
    x = pos[..., None] * (2 * jnp.pi) / dim_t  # (..., npf)
    return jnp.stack(
        [jnp.sin(x[..., 0::2]), jnp.cos(x[..., 1::2])], axis=-1
    ).reshape(*x.shape[:-1], npf)


def _mha(q, k, v, p, heads, bias=None):
    B, Nq, D = q.shape
    d = D // heads
    qq = linear(q, p["q"]).reshape(B, Nq, heads, d).transpose(0, 2, 1, 3)
    kk = linear(k, p["k"]).reshape(B, -1, heads, d).transpose(0, 2, 1, 3)
    vv = linear(v, p["v"]).reshape(B, -1, heads, d).transpose(0, 2, 1, 3)
    att = jnp.einsum("bhqd,bhkd->bhqk", qq, kk, preferred_element_type=jnp.float32) * d**-0.5
    if bias is not None:
        att = att + bias
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, vv, preferred_element_type=jnp.float32)
    return linear(out.transpose(0, 2, 1, 3).reshape(B, Nq, D), p["out"])


def _bi_attention(img, text, p, heads, text_mask):
    """BiMultiHeadAttention inside BiAttentionBlock (reference
    fuse_modules.py:99-295): joint attention matrix, softmax both ways,
    residual with layer-scale gammas. NOTE the reference's residual base is
    the LAYERNORMED input, not the raw one — BiAttentionBlock.forward
    overwrites `v = self.layer_norm_v(v)` before `v = v + gamma_v * dv`
    (fuse_modules.py:287-294); parity-tested in
    tests/test_gdino_torch_parity.py."""
    B, Ni, D = img.shape
    Nt = text.shape[1]
    d = D // heads
    imgn = layer_norm(img, p["ln_v"])
    textn = layer_norm(text, p["ln_l"])
    vq = linear(imgn, p["v_proj"]).reshape(B, Ni, heads, d)
    lq = linear(textn, p["l_proj"]).reshape(B, Nt, heads, d)
    vv = linear(imgn, p["values_v"]).reshape(B, Ni, heads, d)
    lv = linear(textn, p["values_l"]).reshape(B, Nt, heads, d)
    att = jnp.einsum("bihd,bjhd->bhij", vq, lq, preferred_element_type=jnp.float32) * d**-0.5
    att = jnp.clip(att, -50000.0, 50000.0)
    mask = jnp.where(text_mask[:, None, None, :], 0.0, -1e9)
    att_v2l = jax.nn.softmax(att + mask, axis=-1)  # img attends text
    att_l2v = jax.nn.softmax(att, axis=-2).transpose(0, 1, 3, 2)  # text attends img
    dv = jnp.einsum("bhit,bthd->bihd", att_v2l, lv).reshape(B, Ni, D)
    dl = jnp.einsum("bhti,bihd->bthd", att_l2v, vv).reshape(B, Nt, D)
    img = imgn + p["gamma_v"] * linear(dv, p["out_v"])
    text = textn + p["gamma_l"] * linear(dl, p["out_l"])
    return img, text


def _deformable_attn(query, query_pos, value, ref_points, spatial_shapes, p, cfg):
    """Deformable attention (self or cross). ref_points: (B, Q, 4) cxcywh or
    (B, Q, 2) centers, normalised."""
    B, Q, D = query.shape
    nH, nL, nP = cfg.heads, cfg.n_levels, cfg.n_points
    q = query if query_pos is None else query + query_pos
    offsets = linear(q, p["sampling_offsets"]).reshape(B, Q, nH, nL, nP, 2)
    weights = linear(q, p["attn_weights"]).reshape(B, Q, nH, nL * nP)
    weights = jax.nn.softmax(weights, axis=-1).reshape(B, Q, nH, nL, nP)
    v = linear(value, p["value_proj"]).reshape(B, -1, nH, D // nH)
    if ref_points.shape[-1] == 4:
        centers = ref_points[:, :, None, None, None, :2]
        wh = ref_points[:, :, None, None, None, 2:]
        locs = centers + offsets / nP * wh * 0.5
    else:
        shapes_wh = jnp.asarray([[w, h] for (h, w) in spatial_shapes], jnp.float32)
        locs = (
            ref_points[:, :, None, None, None, :]
            + offsets / shapes_wh[None, None, None, :, None, :]
        )
    out = multi_scale_deformable_attention(v, spatial_shapes, locs, weights)
    return linear(out, p["output_proj"])


def _ffn(x, p):
    h = jax.nn.relu(linear(x, p["fc1"]))
    return layer_norm(x + linear(h, p["fc2"]), p["ln"])


def _encoder_layer(img, img_pos, text, text_pos, ref_points, spatial_shapes,
                   text_mask, text_self_mask, p, cfg):
    # 1. fusion
    img, text = _bi_attention(img, text, p["fusion"], cfg.heads, text_mask)
    # 2. text self-attention (vanilla) — the text enhancer attends within
    # PHRASE blocks (reference transformer.py:572-577 passes
    # src_mask=~text_self_attention_masks; the key-padding variant is
    # commented out in transformer_vanilla.py:118)
    tq = text + text_pos
    bias = jnp.where(text_self_mask[:, None], 0.0, -1e9)  # (B, 1, L, L)
    t_att = _mha(tq, tq, text, p["text_attn"], cfg.heads, bias)
    text = layer_norm(text + t_att, p["text_ln1"])
    text = _ffn(text, p["text_ffn"])
    # 3. image deformable self-attention
    a = _deformable_attn(img, img_pos, img, ref_points, spatial_shapes,
                         p["deform"], cfg)
    img = layer_norm(img + a, p["img_ln1"])
    img = _ffn(img, p["img_ffn"])
    return img, text


def _decoder_layer(tgt, query_pos, memory, text, ref_points, spatial_shapes,
                   text_mask, p, cfg):
    # self-attention
    q = tgt + query_pos
    tgt = layer_norm(tgt + _mha(q, q, tgt, p["self_attn"], cfg.heads), p["ln1"])
    # text cross-attention
    bias = jnp.where(text_mask[:, None, None, :], 0.0, -1e9)
    tgt = layer_norm(
        tgt + _mha(tgt + query_pos, text, text, p["text_cross"], cfg.heads, bias),
        p["ln2"],
    )
    # deformable cross-attention into image memory
    a = _deformable_attn(tgt, query_pos, memory, ref_points, spatial_shapes,
                         p["deform"], cfg)
    tgt = layer_norm(tgt + a, p["ln3"])
    return _ffn(tgt, p["ffn"])


def _contrastive_logits(queries, text, text_mask, max_text_len):
    """ContrastiveEmbed (reference utils.py:233): query . text^T with padding
    masked to -inf, padded/truncated to max_text_len."""
    logits = jnp.einsum("bqd,btd->bqt", queries, text, preferred_element_type=jnp.float32)
    logits = jnp.where(text_mask[:, None, :], logits, -jnp.inf)
    L = logits.shape[-1]
    if L < max_text_len:
        pad = jnp.full((*logits.shape[:2], max_text_len - L), -jnp.inf)
        logits = jnp.concatenate([logits, pad], axis=-1)
    return logits[..., :max_text_len]


@functools.partial(jax.jit, static_argnames=("cfg",))
def groundingdino_forward(params, img, input_ids, text_self_mask, text_pad_mask,
                          cfg: GroundingDINOConfig, position_ids=None):
    """img: (B, 3, H, W) normalised; input_ids: (B, L);
    text_self_mask: (B, L, L) phrase-block self-attention mask;
    text_pad_mask: (B, L) True on real tokens;
    position_ids: (B, L) per-phrase position ids (reference
    generate_masks_with_special_tokens_and_transfer_map; arange fallback).
    Returns dict(logits (B, Q, max_text_len), boxes (B, Q, 4) cxcywh)."""
    B = img.shape[0]
    D = cfg.dim
    if position_ids is None:
        position_ids = jnp.broadcast_to(
            jnp.arange(input_ids.shape[1]), input_ids.shape
        )

    # ---- backbone + neck
    feats = swin_forward(img, params["backbone"], cfg.swin)
    srcs = []
    for i, f in enumerate(feats):
        x = jax.lax.conv_general_dilated(
            f.astype(params["input_proj"][i]["weight"].dtype),
            params["input_proj"][i]["weight"], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + params["input_proj"][i]["bias"][None, :, None, None]
        x = _group_norm(x, params["input_proj"][i]["gn"])
        srcs.append(x)
    # extra level: 3x3 stride-2 conv on the last backbone map. torch uses
    # padding=1 which differs from XLA "SAME" on even inputs (SAME pads
    # (0,1) asymmetrically for stride 2; torch pads (1,1) and drops the
    # trailing column) — use explicit torch-equivalent padding
    x = jax.lax.conv_general_dilated(
        feats[-1].astype(params["input_proj"][3]["weight"].dtype),
        params["input_proj"][3]["weight"], (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + params["input_proj"][3]["bias"][None, :, None, None]
    srcs.append(_group_norm(x, params["input_proj"][3]["gn"]))

    spatial_shapes = tuple((s.shape[2], s.shape[3]) for s in srcs)
    tokens, poss = [], []
    for lvl, s in enumerate(srcs):
        Hl, Wl = s.shape[2], s.shape[3]
        tokens.append(s.reshape(B, D, Hl * Wl).transpose(0, 2, 1))
        pe = _sine_pos_embed_2d(Hl, Wl, D).reshape(1, Hl * Wl, D)
        poss.append(pe + params["level_embed"][lvl][None, None])
    memory = jnp.concatenate(tokens, axis=1)  # (B, N, D)
    mem_pos = jnp.concatenate(poss, axis=1)

    # per-token normalised center reference points for encoder self-attn
    refs = []
    for Hl, Wl in spatial_shapes:
        ys = (jnp.arange(Hl) + 0.5) / Hl
        xs = (jnp.arange(Wl) + 0.5) / Wl
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        refs.append(jnp.stack([gx, gy], -1).reshape(Hl * Wl, 2))
    enc_refs = jnp.broadcast_to(jnp.concatenate(refs, 0)[None], (B, memory.shape[1], 2))

    # ---- text tower (per-phrase position ids, reference bertwarper usage)
    text = bert_forward(params["bert"], input_ids, text_self_mask, cfg.bert,
                        position_ids=position_ids)
    text = linear(text, params["feat_map"])  # 768 -> 256

    # sine embedding of the per-phrase position ids (reference
    # transformer.py:539-543), NOT a learned table
    text_pos = _sine_pos_1d(position_ids.astype(jnp.float32), D)

    # ---- encoder
    for lp in params["enc_layers"]:
        memory, text = _encoder_layer(
            memory, mem_pos, text, text_pos, enc_refs, spatial_shapes,
            text_pad_mask, text_self_mask, lp, cfg,
        )

    # ---- two-stage proposals (gen_encoder_output_proposals parity,
    # reference utils.py:56-116): per-level anchor wh = 0.05 * 2^lvl;
    # proposals outside (0.01, 0.99) are invalidated — their memory rows are
    # ZEROED before the output projection and their anchor logits are +inf
    whs = jnp.concatenate([
        jnp.full((Hl * Wl, 2), 0.05 * (2.0 ** lvl), jnp.float32)
        for lvl, (Hl, Wl) in enumerate(spatial_shapes)
    ], axis=0)[None]  # (1, N, 2)
    anchors = jnp.concatenate(
        [enc_refs, jnp.broadcast_to(whs, (B, enc_refs.shape[1], 2))], axis=-1
    )
    valid = ((anchors > 0.01) & (anchors < 0.99)).all(-1, keepdims=True)
    anchors_unsig = jnp.where(
        valid, jnp.log(anchors / (1.0 - anchors)), jnp.inf
    )
    out_mem = jnp.where(valid, memory, 0.0)
    out_mem = layer_norm(linear(out_mem, params["enc_output"]), params["enc_output_ln"])
    enc_logits = _contrastive_logits(out_mem, text, text_pad_mask, cfg.max_text_len)
    scores = jnp.where(jnp.isfinite(enc_logits), enc_logits, -jnp.inf).max(-1)
    _, topk = jax.lax.top_k(scores, cfg.num_queries)
    delta = _mlp3(out_mem, params["enc_bbox"])
    props = jax.nn.sigmoid(anchors_unsig + delta)
    ref = jnp.take_along_axis(props, topk[..., None], axis=1)  # (B, Q, 4)

    tgt = jnp.broadcast_to(params["tgt_embed"][None], (B, cfg.num_queries, D))

    # ---- decoder with iterative refinement
    boxes_out = []
    for lp in params["dec_layers"]:
        qpos = _mlp2(_sine_embed_boxes(ref, D), params["ref_point_head"])
        tgt = _decoder_layer(
            tgt, qpos, memory, text, jax.lax.stop_gradient(ref), spatial_shapes,
            text_pad_mask, lp, cfg,
        )
        delta = _mlp3(tgt, params["bbox_embed"])
        ref = jax.nn.sigmoid(_inverse_sigmoid(ref) + delta)
        boxes_out.append(ref)

    # the classification head reads the NORMED decoder output (reference
    # transformer.py:135,730: intermediate.append(self.norm(output))); box
    # refinement above uses the raw output
    tgt_n = layer_norm(tgt, params["dec_norm"])
    logits = _contrastive_logits(tgt_n, text, text_pad_mask, cfg.max_text_len)
    return {"logits": logits, "boxes": boxes_out[-1]}


def _group_norm(x, p, groups=32, eps=1e-5):
    B, C, H, W = x.shape
    g = min(groups, C)
    xg = x.reshape(B, g, C // g, H, W)
    mu = xg.mean(axis=(2, 3, 4), keepdims=True)
    var = ((xg - mu) ** 2).mean(axis=(2, 3, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(B, C, H, W)
    return x * p["weight"][None, :, None, None] + p["bias"][None, :, None, None]


def _mlp3(x, p):
    x1 = jax.nn.relu(linear(x, p[0]))
    x2 = jax.nn.relu(linear(x1, p[1]))
    return linear(x2, p[2])


def _mlp2(x, p):
    return linear(jax.nn.relu(linear(x, p[0])), p[1])


# ---------------------------------------------------------------------------
# init


def init_params(key, cfg: GroundingDINOConfig) -> Dict:
    ks = iter(jax.random.split(key, 1024))
    D = cfg.dim

    def attn_p():
        return {
            "q": _init_linear(next(ks), D, D),
            "k": _init_linear(next(ks), D, D),
            "v": _init_linear(next(ks), D, D),
            "out": _init_linear(next(ks), D, D),
        }

    def deform_p():
        return {
            "sampling_offsets": _init_linear(next(ks), D, cfg.heads * cfg.n_levels * cfg.n_points * 2),
            "attn_weights": _init_linear(next(ks), D, cfg.heads * cfg.n_levels * cfg.n_points),
            "value_proj": _init_linear(next(ks), D, D),
            "output_proj": _init_linear(next(ks), D, D),
        }

    def ffn_p():
        return {
            "fc1": _init_linear(next(ks), D, cfg.ffn),
            "fc2": _init_linear(next(ks), cfg.ffn, D),
            "ln": _init_ln(D),
        }

    def fusion_p():
        return {
            "ln_v": _init_ln(D),
            "ln_l": _init_ln(D),
            "v_proj": _init_linear(next(ks), D, D),
            "l_proj": _init_linear(next(ks), D, D),
            "values_v": _init_linear(next(ks), D, D),
            "values_l": _init_linear(next(ks), D, D),
            "out_v": _init_linear(next(ks), D, D),
            "out_l": _init_linear(next(ks), D, D),
            "gamma_v": jnp.full((D,), 0.125),
            "gamma_l": jnp.full((D,), 0.125),
        }

    swin_dims = [cfg.swin.embed_dim * 2**i for i in cfg.swin.out_indices]
    input_proj = []
    for i, sd in enumerate(swin_dims + [swin_dims[-1]]):
        k = 1 if i < len(swin_dims) else 3
        input_proj.append(
            {
                "weight": jax.random.normal(next(ks), (D, sd, k, k)) * 0.02,
                "bias": jnp.zeros((D,)),
                "gn": _init_ln(D),
            }
        )

    params = {
        "backbone": init_swin(next(ks), cfg.swin),
        "bert": init_bert(next(ks), cfg.bert),
        "feat_map": _init_linear(next(ks), cfg.bert.dim, D),
        "input_proj": input_proj,
        "level_embed": jax.random.normal(next(ks), (cfg.n_levels, D)) * 0.02,
        "enc_layers": [
            {
                "fusion": fusion_p(),
                "text_attn": attn_p(),
                "text_ln1": _init_ln(D),
                "text_ffn": ffn_p(),
                "deform": deform_p(),
                "img_ln1": _init_ln(D),
                "img_ffn": ffn_p(),
            }
            for _ in range(cfg.enc_layers)
        ],
        "enc_output": _init_linear(next(ks), D, D),
        "enc_output_ln": _init_ln(D),
        "enc_bbox": [_init_linear(next(ks), D, D), _init_linear(next(ks), D, D),
                     _init_linear(next(ks), D, 4)],
        "tgt_embed": jax.random.normal(next(ks), (cfg.num_queries, D)) * 0.02,
        "ref_point_head": [_init_linear(next(ks), 2 * D, D), _init_linear(next(ks), D, D)],
        "dec_layers": [
            {
                "self_attn": attn_p(),
                "ln1": _init_ln(D),
                "text_cross": attn_p(),
                "ln2": _init_ln(D),
                "deform": deform_p(),
                "ln3": _init_ln(D),
                "ffn": ffn_p(),
            }
            for _ in range(cfg.dec_layers)
        ],
        "dec_norm": _init_ln(D),
        "bbox_embed": [_init_linear(next(ks), D, D), _init_linear(next(ks), D, D),
                       _init_linear(next(ks), D, 4)],
    }
    return params
