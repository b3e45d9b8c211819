"""sam_vit_b_01ec64.pth -> JAX params (reference checkpoint at
utils/slam_frontend.py:1231)."""
from __future__ import annotations

import numpy as np

from .model import SAMConfig


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _lin(sd, p):
    out = {"weight": _t(sd[f"{p}.weight"])}
    if f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _conv(sd, p, bias=True):
    out = {"weight": np.asarray(sd[f"{p}.weight"])}
    if bias and f"{p}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{p}.bias"])
    return out


def _ln(sd, p):
    return {"weight": np.asarray(sd[f"{p}.weight"]), "bias": np.asarray(sd[f"{p}.bias"])}


def convert_state_dict(sd, cfg: SAMConfig):
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    ie = "image_encoder"
    blocks = []
    for i in range(cfg.depth):
        b = f"{ie}.blocks.{i}"
        blocks.append(
            {
                "norm1": _ln(sd, f"{b}.norm1"),
                "attn": {
                    "qkv": _lin(sd, f"{b}.attn.qkv"),
                    "proj": _lin(sd, f"{b}.attn.proj"),
                    "rel_pos_h": np.asarray(sd[f"{b}.attn.rel_pos_h"]),
                    "rel_pos_w": np.asarray(sd[f"{b}.attn.rel_pos_w"]),
                },
                "norm2": _ln(sd, f"{b}.norm2"),
                "mlp": {"fc1": _lin(sd, f"{b}.mlp.lin1"), "fc2": _lin(sd, f"{b}.mlp.lin2")},
            }
        )
    image_encoder = {
        "patch_embed": {
            "weight": np.asarray(sd[f"{ie}.patch_embed.proj.weight"]),
            "bias": np.asarray(sd[f"{ie}.patch_embed.proj.bias"]),
        },
        "pos_embed": np.asarray(sd[f"{ie}.pos_embed"]),
        "blocks": blocks,
        "neck": {
            "conv1": _conv(sd, f"{ie}.neck.0", bias=False),
            "ln1": _ln(sd, f"{ie}.neck.1"),
            "conv2": _conv(sd, f"{ie}.neck.2", bias=False),
            "ln2": _ln(sd, f"{ie}.neck.3"),
        },
    }
    pe = "prompt_encoder"
    prompt_encoder = {
        "pe_gaussian": np.asarray(sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"]),
        "point_embeddings": np.stack(
            [np.asarray(sd[f"{pe}.point_embeddings.{i}.weight"])[0] for i in range(4)]
        ),
        "not_a_point": np.asarray(sd[f"{pe}.not_a_point_embed.weight"])[0],
        "no_mask_embed": np.asarray(sd[f"{pe}.no_mask_embed.weight"])[0],
    }
    md = "mask_decoder"

    def attn_p(prefix):
        return {
            "q_proj": _lin(sd, f"{prefix}.q_proj"),
            "k_proj": _lin(sd, f"{prefix}.k_proj"),
            "v_proj": _lin(sd, f"{prefix}.v_proj"),
            "out_proj": _lin(sd, f"{prefix}.out_proj"),
        }

    dec_blocks = []
    for i in range(cfg.decoder_depth):
        b = f"{md}.transformer.layers.{i}"
        dec_blocks.append(
            {
                "self_attn": attn_p(f"{b}.self_attn"),
                "norm1": _ln(sd, f"{b}.norm1"),
                "cross_attn_t2i": attn_p(f"{b}.cross_attn_token_to_image"),
                "norm2": _ln(sd, f"{b}.norm2"),
                "mlp": {"fc1": _lin(sd, f"{b}.mlp.lin1"), "fc2": _lin(sd, f"{b}.mlp.lin2")},
                "norm3": _ln(sd, f"{b}.norm3"),
                "cross_attn_i2t": attn_p(f"{b}.cross_attn_image_to_token"),
                "norm4": _ln(sd, f"{b}.norm4"),
            }
        )
    n_hyper = cfg.num_mask_tokens
    mask_decoder = {
        "iou_token": np.asarray(sd[f"{md}.iou_token.weight"])[0],
        "mask_tokens": np.asarray(sd[f"{md}.mask_tokens.weight"]),
        "blocks": dec_blocks,
        "final_attn": attn_p(f"{md}.transformer.final_attn_token_to_image"),
        "norm_final": _ln(sd, f"{md}.transformer.norm_final_attn"),
        "upscale": {
            "conv1": _conv(sd, f"{md}.output_upscaling.0"),
            "ln": _ln(sd, f"{md}.output_upscaling.1"),
            "conv2": _conv(sd, f"{md}.output_upscaling.3"),
        },
        "hyper_mlps": [
            [
                _lin(sd, f"{md}.output_hypernetworks_mlps.{i}.layers.{j}")
                for j in range(3)
            ]
            for i in range(n_hyper)
        ],
        "iou_mlp": [
            _lin(sd, f"{md}.iou_prediction_head.layers.{j}") for j in range(3)
        ],
    }
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        {
            "image_encoder": image_encoder,
            "prompt_encoder": prompt_encoder,
            "mask_decoder": mask_decoder,
        },
    )


def load_converted(path: str, cfg: SAMConfig):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return convert_state_dict(sd, cfg)
