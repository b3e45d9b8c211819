"""groundingdino_swint_ogc.pth -> JAX params.

The reference loads this checkpoint at frontend init (utils/slam_frontend.py
:201,:241). Key mapping follows the official module tree
(module.backbone.0.*, module.bert.*, module.transformer.*); the loader
strips a leading 'module.' when present. Exact numerical parity requires
the checkpoint, absent from this environment — the mapping is best-effort
and validated structurally (missing/unexpected keys are reported).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from .model import GroundingDINOConfig


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


class _SD:
    """state-dict view that records misses instead of raising."""

    def __init__(self, sd):
        self.sd = sd
        self.missing: List[str] = []

    def lin(self, p, bias=True):
        if f"{p}.weight" not in self.sd:
            self.missing.append(p)
            return None
        out = {"weight": _t(self.sd[f"{p}.weight"])}
        if bias and f"{p}.bias" in self.sd:
            out["bias"] = np.asarray(self.sd[f"{p}.bias"])
        return out

    def raw(self, k):
        if k not in self.sd:
            self.missing.append(k)
            return None
        return np.asarray(self.sd[k])

    def ln(self, p):
        return {"weight": self.raw(f"{p}.weight"), "bias": self.raw(f"{p}.bias")}


def convert_swin(s: "_SD", bb: str, swin_cfg) -> Dict:
    """Swin backbone subtree (official layout `<bb>.patch_embed/layers/norm*`)
    -> JAX param tree for swin.swin_forward. Exposed separately so the HF
    parity tests can validate this converter piece against SwinBackbone."""
    swin = {
        "patch_embed": {
            "weight": s.raw(f"{bb}.patch_embed.proj.weight"),
            "bias": s.raw(f"{bb}.patch_embed.proj.bias"),
        },
        "patch_norm": s.ln(f"{bb}.patch_embed.norm"),
        "stages": [],
        "out_norms": {},
    }
    for si, depth in enumerate(swin_cfg.depths):
        blocks = []
        for bi in range(depth):
            b = f"{bb}.layers.{si}.blocks.{bi}"
            blocks.append(
                {
                    "norm1": s.ln(f"{b}.norm1"),
                    "attn": {
                        "qkv": s.lin(f"{b}.attn.qkv"),
                        "proj": s.lin(f"{b}.attn.proj"),
                        "rel_pos_bias": s.raw(f"{b}.attn.relative_position_bias_table"),
                    },
                    "norm2": s.ln(f"{b}.norm2"),
                    "mlp": {"fc1": s.lin(f"{b}.mlp.fc1"), "fc2": s.lin(f"{b}.mlp.fc2")},
                }
            )
        stage = {"blocks": blocks}
        if si < len(swin_cfg.depths) - 1:
            stage["downsample"] = {
                "norm": s.ln(f"{bb}.layers.{si}.downsample.norm"),
                "reduction": s.lin(f"{bb}.layers.{si}.downsample.reduction", bias=False),
            }
        swin["stages"].append(stage)
    for si in swin_cfg.out_indices:
        swin["out_norms"][str(si)] = s.ln(f"{bb}.norm{si}")
    return swin


def convert_bert(s: "_SD", bp: str, bert_cfg) -> Dict:
    """BERT subtree (HF BertModel layout under prefix `<bp>`) -> JAX param
    tree for bert.bert_forward."""
    bert = {
        "word_emb": s.raw(f"{bp}.embeddings.word_embeddings.weight"),
        "pos_emb": s.raw(f"{bp}.embeddings.position_embeddings.weight"),
        "type_emb": s.raw(f"{bp}.embeddings.token_type_embeddings.weight"),
        "emb_ln": s.ln(f"{bp}.embeddings.LayerNorm"),
        "layers": [],
    }
    for i in range(bert_cfg.layers):
        b = f"{bp}.encoder.layer.{i}"
        bert["layers"].append(
            {
                "q": s.lin(f"{b}.attention.self.query"),
                "k": s.lin(f"{b}.attention.self.key"),
                "v": s.lin(f"{b}.attention.self.value"),
                "attn_out": s.lin(f"{b}.attention.output.dense"),
                "attn_ln": s.ln(f"{b}.attention.output.LayerNorm"),
                "fc1": s.lin(f"{b}.intermediate.dense"),
                "fc2": s.lin(f"{b}.output.dense"),
                "out_ln": s.ln(f"{b}.output.LayerNorm"),
            }
        )
    return bert


def normalize_state_dict(sd: Dict) -> Dict:
    """torch tensors -> numpy; strip a leading 'module.'."""
    return {
        (k[7:] if k.startswith("module.") else k): (
            v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        )
        for k, v in sd.items()
    }


def convert_state_dict(sd: Dict, cfg: GroundingDINOConfig):
    sd = normalize_state_dict(sd)
    s = _SD(sd)

    # ---- swin backbone (backbone.0.*)
    swin = convert_swin(s, "backbone.0", cfg.swin)

    # ---- bert (bert.bert.* in the official ckpt)
    bp = "bert.bert" if "bert.bert.embeddings.word_embeddings.weight" in sd else "bert"
    bert = convert_bert(s, bp, cfg.bert)

    # ---- neck, transformer, heads
    def attn_p(prefix):
        # torch MultiheadAttention: in_proj_weight (3D, D) packed
        w = s.raw(f"{prefix}.in_proj_weight")
        b = s.raw(f"{prefix}.in_proj_bias")
        D = cfg.dim
        if w is None:
            return None
        return {
            "q": {"weight": _t(w[:D]), "bias": b[:D]},
            "k": {"weight": _t(w[D : 2 * D]), "bias": b[D : 2 * D]},
            "v": {"weight": _t(w[2 * D :]), "bias": b[2 * D :]},
            "out": s.lin(f"{prefix}.out_proj"),
        }

    def deform_p(prefix):
        return {
            "sampling_offsets": s.lin(f"{prefix}.sampling_offsets"),
            "attn_weights": s.lin(f"{prefix}.attention_weights"),
            "value_proj": s.lin(f"{prefix}.value_proj"),
            "output_proj": s.lin(f"{prefix}.output_proj"),
        }

    input_proj = []
    for i in range(cfg.n_levels):
        input_proj.append(
            {
                "weight": s.raw(f"input_proj.{i}.0.weight"),
                "bias": s.raw(f"input_proj.{i}.0.bias"),
                "gn": s.ln(f"input_proj.{i}.1"),
            }
        )

    tr = "transformer"
    enc_layers = []
    for i in range(cfg.enc_layers):
        e = f"{tr}.encoder.layers.{i}"
        f = f"{tr}.encoder.fusion_layers.{i}"
        t = f"{tr}.encoder.text_layers.{i}"
        enc_layers.append(
            {
                "fusion": {
                    "ln_v": s.ln(f"{f}.layer_norm_v"),
                    "ln_l": s.ln(f"{f}.layer_norm_l"),
                    "v_proj": s.lin(f"{f}.attn.v_proj"),
                    "l_proj": s.lin(f"{f}.attn.l_proj"),
                    "values_v": s.lin(f"{f}.attn.values_v_proj"),
                    "values_l": s.lin(f"{f}.attn.values_l_proj"),
                    "out_v": s.lin(f"{f}.attn.out_v_proj"),
                    "out_l": s.lin(f"{f}.attn.out_l_proj"),
                    "gamma_v": s.raw(f"{f}.gamma_v"),
                    "gamma_l": s.raw(f"{f}.gamma_l"),
                },
                "text_attn": attn_p(f"{t}.self_attn"),
                "text_ln1": s.ln(f"{t}.norm1"),
                "text_ffn": {
                    "fc1": s.lin(f"{t}.linear1"),
                    "fc2": s.lin(f"{t}.linear2"),
                    "ln": s.ln(f"{t}.norm2"),
                },
                "deform": deform_p(f"{e}.self_attn"),
                "img_ln1": s.ln(f"{e}.norm1"),
                "img_ffn": {
                    "fc1": s.lin(f"{e}.linear1"),
                    "fc2": s.lin(f"{e}.linear2"),
                    "ln": s.ln(f"{e}.norm2"),
                },
            }
        )

    dec_layers = []
    for i in range(cfg.dec_layers):
        d = f"{tr}.decoder.layers.{i}"
        dec_layers.append(
            {
                "self_attn": attn_p(f"{d}.self_attn"),
                "ln1": s.ln(f"{d}.norm2"),
                "text_cross": attn_p(f"{d}.ca_text"),
                "ln2": s.ln(f"{d}.catext_norm"),
                "deform": deform_p(f"{d}.cross_attn"),
                "ln3": s.ln(f"{d}.norm1"),
                "ffn": {
                    "fc1": s.lin(f"{d}.linear1"),
                    "fc2": s.lin(f"{d}.linear2"),
                    "ln": s.ln(f"{d}.norm3"),
                },
            }
        )

    params = {
        "backbone": swin,
        "bert": bert,
        "feat_map": s.lin("feat_map"),
        "input_proj": input_proj,
        "level_embed": s.raw(f"{tr}.level_embed"),
        "enc_layers": enc_layers,
        "enc_output": s.lin(f"{tr}.enc_output"),
        "enc_output_ln": s.ln(f"{tr}.enc_output_norm"),
        "enc_bbox": [
            s.lin(f"{tr}.enc_out_bbox_embed.layers.{j}") for j in range(3)
        ],
        "tgt_embed": s.raw(f"{tr}.tgt_embed.weight"),
        "ref_point_head": [
            s.lin(f"{tr}.decoder.ref_point_head.layers.{j}") for j in range(2)
        ],
        "dec_layers": dec_layers,
        # final decoder norm feeding the classification head
        # (reference transformer.py:135)
        "dec_norm": s.ln(f"{tr}.decoder.norm"),
        "bbox_embed": [s.lin(f"bbox_embed.0.layers.{j}") for j in range(3)],
    }
    import jax
    import jax.numpy as jnp

    if s.missing:
        import warnings

        warnings.warn(
            f"GroundingDINO conversion: {len(s.missing)} unmapped keys, e.g. "
            f"{s.missing[:5]} — verify against the real checkpoint"
        )
    return jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32) if x is not None else None, params
    )


def load_converted(path: str, cfg: GroundingDINOConfig):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    if any(k.startswith("model.backbone.conv_encoder") for k in sd):
        sd = convert_hf_state_dict(sd)
    return convert_state_dict(sd, cfg)


def _rename_hf_swin_backbone(hf_sd: Dict, prefix: str) -> Dict:
    """HF Swin(Backbone) layout -> official GroundingDINO Swin layout under
    ``prefix`` (e.g. 'backbone.0'), fusing HF's split q/k/v into the
    official packed qkv."""
    out = {}
    qkv: Dict = {}
    for k, v in hf_sd.items():
        if "relative_position_index" in k or k.startswith("pooler"):
            continue
        nk = k
        nk = nk.replace("embeddings.patch_embeddings.projection", "patch_embed.proj")
        nk = nk.replace("embeddings.norm", "patch_embed.norm")
        nk = nk.replace("encoder.layers.", "layers.")
        nk = nk.replace("layernorm_before", "norm1").replace("layernorm_after", "norm2")
        nk = nk.replace("attention.output.dense", "attn.proj")
        nk = nk.replace(
            "attention.self.relative_position_bias_table",
            "attn.relative_position_bias_table",
        )
        nk = nk.replace("intermediate.dense", "mlp.fc1")
        nk = nk.replace("output.dense", "mlp.fc2")
        if "hidden_states_norms.stage" in nk:
            si = int(nk.split("hidden_states_norms.stage")[1].split(".")[0]) - 1
            out[f"{prefix}.norm{si}.{nk.rsplit('.', 1)[1]}"] = v
            continue
        part = None
        for p in ("query", "key", "value"):
            if f"attention.self.{p}" in nk:
                part = p
        if part is not None:
            base = nk.split(".attention.self.")[0]
            kind = nk.rsplit(".", 1)[1]
            qkv.setdefault((base, kind), {})[part] = np.asarray(v)
        else:
            out[f"{prefix}.{nk}"] = v
    for (base, kind), parts in qkv.items():
        out[f"{prefix}.{base}.attn.qkv.{kind}"] = np.concatenate(
            [parts["query"], parts["key"], parts["value"]], axis=0
        )
    return out


def convert_hf_state_dict(sd: Dict) -> Dict:
    """HuggingFace `GroundingDinoForObjectDetection` state-dict layout ->
    the official groundingdino_swint_ogc.pth layout `convert_state_dict`
    consumes. Lets HF-hub checkpoints (IDEA-Research/grounding-dino-tiny)
    drive this port; also the bridge the HF parity tests push random
    weights through. Packs HF's split q/k/v attentions back into torch
    MultiheadAttention in_proj layout."""
    sd = normalize_state_dict(sd)
    out: Dict = {}
    packed: Dict = {}

    def pack(dst: str, part: str, kind: str, v):
        packed.setdefault((dst, kind), {})[part] = np.asarray(v)

    swin_sub = {}
    for k, v in sd.items():
        if "position_ids" in k:
            continue
        if k.startswith("model.backbone.conv_encoder.model."):
            swin_sub[k[len("model.backbone.conv_encoder.model."):]] = v
            continue
        if k.startswith("model.text_backbone."):
            out["bert." + k[len("model.text_backbone."):]] = v
            continue
        if k.startswith("model.text_projection."):
            out[k.replace("model.text_projection", "feat_map")] = v
            continue
        if k.startswith("model.input_proj_vision."):
            out[k.replace("model.input_proj_vision", "input_proj")] = v
            continue
        if k == "model.level_embed":
            out["transformer.level_embed"] = v
            continue
        if k.startswith("model.encoder.layers."):
            i = k.split(".")[3]
            rest = k.split(f"model.encoder.layers.{i}.")[1]
            if rest.startswith("deformable_layer."):
                r = rest[len("deformable_layer."):]
                r = (
                    r.replace("self_attn_layer_norm", "norm1")
                    .replace("final_layer_norm", "norm2")
                    .replace("fc1", "linear1")
                    .replace("fc2", "linear2")
                )
                out[f"transformer.encoder.layers.{i}.{r}"] = v
            elif rest.startswith("text_enhancer_layer."):
                r = rest[len("text_enhancer_layer."):]
                dst = f"transformer.encoder.text_layers.{i}"
                done = False
                for p in ("query", "key", "value"):
                    if r.startswith(f"self_attn.{p}."):
                        pack(f"{dst}.self_attn", p, r.rsplit(".", 1)[1], v)
                        done = True
                if done:
                    continue
                r = (
                    r.replace("layer_norm_before", "norm1")
                    .replace("layer_norm_after", "norm2")
                    .replace("fc1", "linear1")
                    .replace("fc2", "linear2")
                )
                out[f"{dst}.{r}"] = v
            elif rest.startswith("fusion_layer."):
                r = rest[len("fusion_layer."):]
                r = (
                    r.replace("layer_norm_vision", "layer_norm_v")
                    .replace("layer_norm_text", "layer_norm_l")
                    .replace("attn.vision_proj", "attn.v_proj")
                    .replace("attn.text_proj", "attn.l_proj")
                    .replace("attn.values_vision_proj", "attn.values_v_proj")
                    .replace("attn.values_text_proj", "attn.values_l_proj")
                    .replace("attn.out_vision_proj", "attn.out_v_proj")
                    .replace("attn.out_text_proj", "attn.out_l_proj")
                    .replace("vision_param", "gamma_v")
                    .replace("text_param", "gamma_l")
                )
                out[f"transformer.encoder.fusion_layers.{i}.{r}"] = v
            continue
        if k.startswith("model.decoder.layers."):
            i = k.split(".")[3]
            rest = k.split(f"model.decoder.layers.{i}.")[1]
            dst = f"transformer.decoder.layers.{i}"
            done = False
            for attn, official in (
                ("self_attn.", "self_attn"),
                ("encoder_attn_text.", "ca_text"),
            ):
                if rest.startswith(attn):
                    r = rest[len(attn):]
                    p = r.split(".")[0]
                    if p in ("query", "key", "value"):
                        pack(f"{dst}.{official}", p, r.rsplit(".", 1)[1], v)
                    else:  # out_proj
                        out[f"{dst}.{official}.{r}"] = v
                    done = True
                    break
            if done:
                continue
            r = (
                rest.replace("self_attn_layer_norm", "norm2")
                .replace("encoder_attn_text_layer_norm", "catext_norm")
                .replace("encoder_attn_layer_norm", "norm1")
                .replace("encoder_attn", "cross_attn")
                .replace("final_layer_norm", "norm3")
                .replace("fc1", "linear1")
                .replace("fc2", "linear2")
            )
            out[f"{dst}.{r}"] = v
            continue
        if k.startswith("model.decoder.bbox_embed.") or k.startswith(
            "model.decoder.class_embed"
        ):
            # tied duplicates of the top-level shared heads
            continue
        if k.startswith("model.decoder.reference_points_head."):
            out[k.replace(
                "model.decoder.reference_points_head",
                "transformer.decoder.ref_point_head",
            )] = v
            continue
        if k.startswith("model.decoder.layer_norm."):
            out[k.replace("model.decoder.layer_norm", "transformer.decoder.norm")] = v
            continue
        if k.startswith("model.enc_output_norm."):
            out[k.replace("model.enc_output_norm", "transformer.enc_output_norm")] = v
            continue
        if k.startswith("model.enc_output."):
            out[k.replace("model.enc_output", "transformer.enc_output")] = v
            continue
        if k.startswith("model.encoder_output_bbox_embed."):
            out[k.replace(
                "model.encoder_output_bbox_embed",
                "transformer.enc_out_bbox_embed",
            )] = v
            continue
        if k == "model.query_position_embeddings.weight":
            out["transformer.tgt_embed.weight"] = v
            continue
        if k.startswith("bbox_embed."):
            out[k] = v  # same layout (shared heads: index 0 is read)
            continue
        import warnings

        warnings.warn(f"convert_hf_state_dict: unmapped key {k}")
    for (dst, kind), parts in packed.items():
        out[f"{dst}.in_proj_{kind}"] = np.concatenate(
            [parts["query"], parts["key"], parts["value"]], axis=0
        )
    out.update(_rename_hf_swin_backbone(swin_sub, "backbone.0"))
    return out
