"""Torch-checkpoint -> JAX params conversion for MASt3R ViT-L.

Consumes the official `MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth`
(reference README.md:61-67; loaded by the SLAM frontend at
utils/slam_frontend.py:1214). Linear weights transpose (out,in)->(in,out);
convs keep OIHW.

Key mapping notes (torch module tree -> our param dicts):
  patch_embed.proj                       -> patch_embed.proj
  enc_blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}
  decoder_embed                          -> decoder_embed
  dec_blocks{,2}.N.{norm1,attn.*,cross_attn.{projq,projk,projv,proj},
                    norm2,norm3,norm_y,mlp.*}
  enc_norm / dec_norm
  downstream_head{1,2}.dpt.act_postprocess.{0..3}.{0: 1x1 proj, 1: resample}
  downstream_head{1,2}.dpt.scratch.layer{1..4}_rn
  downstream_head{1,2}.dpt.scratch.refinenet{1..4}.{resConfUnit1/2, out_conv}
  downstream_head{1,2}.dpt.head.{0,2,4}
  downstream_head{1,2}.head_local_features.{fc1,fc2}
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from .model import MASt3RConfig


def _t(w):  # torch Linear weight -> ours
    return np.ascontiguousarray(np.asarray(w).T)


def _lin(sd, prefix):
    p = {"weight": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _conv(sd, prefix, bias=True):
    p = {"weight": np.asarray(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _ln(sd, prefix):
    return {"weight": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _enc_block(sd, prefix):
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": {"qkv": _lin(sd, f"{prefix}.attn.qkv"), "proj": _lin(sd, f"{prefix}.attn.proj")},
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp": {"fc1": _lin(sd, f"{prefix}.mlp.fc1"), "fc2": _lin(sd, f"{prefix}.mlp.fc2")},
    }


def _dec_block(sd, prefix):
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": {"qkv": _lin(sd, f"{prefix}.attn.qkv"), "proj": _lin(sd, f"{prefix}.attn.proj")},
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "norm3": _ln(sd, f"{prefix}.norm3"),
        "norm_y": _ln(sd, f"{prefix}.norm_y"),
        "cross_attn": {
            "projq": _lin(sd, f"{prefix}.cross_attn.projq"),
            "projk": _lin(sd, f"{prefix}.cross_attn.projk"),
            "projv": _lin(sd, f"{prefix}.cross_attn.projv"),
            "proj": _lin(sd, f"{prefix}.cross_attn.proj"),
        },
        "mlp": {"fc1": _lin(sd, f"{prefix}.mlp.fc1"), "fc2": _lin(sd, f"{prefix}.mlp.fc2")},
    }


def _dpt(sd, prefix):
    p = {
        "proj": [],
        "resample": {},
        "scratch": [],
        "refine": [],
        "head": {},
    }
    for i in range(4):
        p["proj"].append(_conv(sd, f"{prefix}.act_postprocess.{i}.0"))
    p["resample"][0] = _conv(sd, f"{prefix}.act_postprocess.0.1")
    p["resample"][1] = _conv(sd, f"{prefix}.act_postprocess.1.1")
    p["resample"][3] = _conv(sd, f"{prefix}.act_postprocess.3.1")
    for i in range(1, 5):
        p["scratch"].append(_conv(sd, f"{prefix}.scratch.layer{i}_rn", bias=False))
    for i in range(1, 5):
        rp = f"{prefix}.scratch.refinenet{i}"
        p["refine"].append(
            {
                "rcu1": {
                    "conv1": _conv(sd, f"{rp}.resConfUnit1.conv1"),
                    "conv2": _conv(sd, f"{rp}.resConfUnit1.conv2"),
                },
                "rcu2": {
                    "conv1": _conv(sd, f"{rp}.resConfUnit2.conv1"),
                    "conv2": _conv(sd, f"{rp}.resConfUnit2.conv2"),
                },
                "out_conv": _conv(sd, f"{rp}.out_conv"),
            }
        )
    p["head"]["conv1"] = _conv(sd, f"{prefix}.head.0")
    p["head"]["conv2"] = _conv(sd, f"{prefix}.head.2")
    p["head"]["conv3"] = _conv(sd, f"{prefix}.head.4")
    return p


def convert_state_dict(sd: Dict[str, "np.ndarray"], cfg: MASt3RConfig) -> Dict:
    """Torch state_dict (tensors or arrays) -> our nested param dict."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)) for k, v in sd.items()}
    params = {
        "patch_embed": {"proj": _conv(sd, "patch_embed.proj")},
        "enc_blocks": [_enc_block(sd, f"enc_blocks.{i}") for i in range(cfg.enc_depth)],
        "enc_norm": _ln(sd, "enc_norm"),
        "decoder_embed": _lin(sd, "decoder_embed"),
        "dec_blocks": [_dec_block(sd, f"dec_blocks.{i}") for i in range(cfg.dec_depth)],
        "dec_blocks2": [_dec_block(sd, f"dec_blocks2.{i}") for i in range(cfg.dec_depth)],
        "dec_norm": _ln(sd, "dec_norm"),
    }
    for n, h in (("downstream_head1", "head1"), ("downstream_head2", "head2")):
        params[h] = {
            "dpt": _dpt(sd, f"{n}.dpt"),
            "local_features": {
                "fc1": _lin(sd, f"{n}.head_local_features.fc1"),
                "fc2": _lin(sd, f"{n}.head_local_features.fc2"),
            },
        }
    import jax.numpy as jnp
    import jax

    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


def load_converted(path: str, cfg: MASt3RConfig) -> Dict:
    """Load a torch .pth checkpoint and convert (requires torch, CPU-only)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    return convert_state_dict(sd, cfg)
