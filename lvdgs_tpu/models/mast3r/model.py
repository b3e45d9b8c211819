"""AsymmetricMASt3R in JAX: two-view pointmap + descriptor network.

Capability parity with reference mast3r/model.py:40-68 (AsymmetricMASt3R,
ViT-L metric variant) and the missing dust3r AsymmetricCroCo3DStereo:

  encode both images with a shared RoPE ViT-L encoder, run two
  cross-attending decoders, and produce per view:
    pts3d (H, W, 3)  — metric pointmap in view-1 frame
    conf (H, W)      — confidence (exp mode, >=1)
    desc (H, W, 24)  — L2-normalised local descriptors (catMLP pixel-shuffle
                       head, reference mast3r/catmlp_dpt_head.py:42-96)
    desc_conf (H, W)

The per-frame SLAM loop calls this twice per tracked frame (reference
utils/slam_frontend.py:1448,1455), so the forward is one jitted program,
batched over the two views where the architecture allows (shared encoder).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from . import vit
from .dpt import dpt_forward, init_dpt


@dataclasses.dataclass(frozen=True)
class MASt3RConfig:
    patch_size: int = 16
    enc_dim: int = 1024
    enc_depth: int = 24
    enc_heads: int = 16
    dec_dim: int = 768
    dec_depth: int = 12
    dec_heads: int = 12
    local_feat_dim: int = 24
    two_confs: bool = True
    rope_base: float = 100.0
    # ('exp', -inf, inf) metric depth mode; conf ('exp', 1, inf)
    conf_vmin: float = 1.0
    desc_conf_vmin: float = 0.0

    @property
    def hooks(self):
        l2 = self.dec_depth
        return (0, l2 * 2 // 4, l2 * 3 // 4, l2)


TINY = MASt3RConfig(enc_dim=64, enc_depth=2, enc_heads=2, dec_dim=48, dec_depth=4,
                    dec_heads=2, local_feat_dim=8)


def init_params(key: jax.Array, cfg: MASt3RConfig) -> Dict:
    ks = iter(jax.random.split(key, cfg.enc_depth + 2 * cfg.dec_depth + 16))
    d, dd = cfg.enc_dim, cfg.dec_dim
    idim = d + dd
    params = {
        "patch_embed": {
            "proj": {
                "weight": jax.random.normal(next(ks), (d, 3, cfg.patch_size, cfg.patch_size))
                * 0.02,
                "bias": jnp.zeros((d,)),
            }
        },
        "enc_blocks": [vit.init_encoder_block(next(ks), d) for _ in range(cfg.enc_depth)],
        "enc_norm": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "decoder_embed": vit._init_linear(next(ks), d, dd),
        "dec_blocks": [vit.init_decoder_block(next(ks), dd) for _ in range(cfg.dec_depth)],
        "dec_blocks2": [vit.init_decoder_block(next(ks), dd) for _ in range(cfg.dec_depth)],
        "dec_norm": {"weight": jnp.ones((dd,)), "bias": jnp.zeros((dd,))},
    }
    nch = 3 + 1  # pts3d + conf
    for h in ("head1", "head2"):
        params[h] = {
            "dpt": init_dpt(
                next(ks),
                dim_tokens=(d, dd, dd, dd),
                num_channels=nch,
            ),
            "local_features": vit.init_mlp(
                next(ks),
                idim,
                int(4.0 * idim),
            ),
        }
        # catMLP output size: (local_feat_dim + two_confs) * ps^2
        out_dim = (cfg.local_feat_dim + int(cfg.two_confs)) * cfg.patch_size**2
        params[h]["local_features"]["fc2"] = vit._init_linear(
            next(ks), int(4.0 * idim), out_dim
        )
    return params


def _encode(img, params, cfg: MASt3RConfig):
    tokens, pos = vit.patch_embed(img, params["patch_embed"], cfg.patch_size)
    rope = vit.rope2d_angles(pos, cfg.enc_dim // cfg.enc_heads, cfg.rope_base)
    for blk in params["enc_blocks"]:
        tokens = vit.encoder_block(tokens, blk, cfg.enc_heads, rope)
    tokens = vit.layer_norm(tokens, params["enc_norm"])
    return tokens, pos


def _decode(f1, pos1, f2, pos2, params, cfg: MASt3RConfig):
    """Returns the per-layer output lists for both views:
    [enc(1024), dec_1..dec_L(768)] with the last layer normed."""
    rope1 = vit.rope2d_angles(pos1, cfg.dec_dim // cfg.dec_heads, cfg.rope_base)
    rope2 = vit.rope2d_angles(pos2, cfg.dec_dim // cfg.dec_heads, cfg.rope_base)
    outs1, outs2 = [f1], [f2]
    x1 = vit.linear(f1, params["decoder_embed"])
    x2 = vit.linear(f2, params["decoder_embed"])
    for blk1, blk2 in zip(params["dec_blocks"], params["dec_blocks2"]):
        x1n = vit.decoder_block(x1, x2, blk1, cfg.dec_heads, rope1, rope2)
        x2n = vit.decoder_block(x2, x1, blk2, cfg.dec_heads, rope2, rope1)
        x1, x2 = x1n, x2n
        outs1.append(x1)
        outs2.append(x2)
    outs1[-1] = vit.layer_norm(outs1[-1], params["dec_norm"])
    outs2[-1] = vit.layer_norm(outs2[-1], params["dec_norm"])
    return outs1, outs2


def _pixel_shuffle(x, r):
    """(B, C*r^2, h, w) -> (B, C, h*r, w*r), torch F.pixel_shuffle parity."""
    B, Cr2, h, w = x.shape
    C = Cr2 // (r * r)
    x = x.reshape(B, C, r, r, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, C, h * r, w * r)


def _head(outs, grid_hw, hp, cfg: MASt3RConfig):
    """catMLP + DPT head (reference mast3r/catmlp_dpt_head.py:71-96)."""
    hooks = [outs[i] for i in cfg.hooks]
    raw = dpt_forward(hooks, grid_hw, hp["dpt"])  # (B, 3+conf, H, W)

    cat = jnp.concatenate([outs[0], outs[-1]], axis=-1)  # (B, N, enc+dec)
    lf = vit.mlp(cat, hp["local_features"])  # (B, N, (lfd+tc)*ps^2)
    B, N, _ = lf.shape
    h, w = grid_hw
    lf = lf.transpose(0, 2, 1).reshape(B, -1, h, w)
    lf = _pixel_shuffle(lf, cfg.patch_size)  # (B, lfd+tc, H, W)

    out = jnp.concatenate([raw, lf], axis=1)
    fmap = out.transpose(0, 2, 3, 1)  # (B, H, W, D)

    # postprocess (reference mast3r/catmlp_dpt_head.py:25-39; dust3r
    # reg_dense_depth 'exp' metric mode, reg_dense_conf 'exp')
    xyz = fmap[..., 0:3]
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts3d = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
    conf = cfg.conf_vmin + jnp.exp(fmap[..., 3])
    start = 4
    desc = fmap[..., start : start + cfg.local_feat_dim]
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    if cfg.two_confs:
        desc_conf = cfg.desc_conf_vmin + jnp.exp(fmap[..., start + cfg.local_feat_dim])
    else:
        desc_conf = conf
    return {"pts3d": pts3d, "conf": conf, "desc": desc, "desc_conf": desc_conf}


@functools.partial(jax.jit, static_argnames=("cfg",))
def mast3r_forward_fused(params, img_kf, img_cur, cfg: MASt3RConfig):
    """Fused per-frame forward: BOTH of the reference frontend's per-tracked-
    frame MASt3R calls in one program — get_pose's (last_kf, cur) pair and
    get_depth's (cur, cur) pair (utils/slam_frontend.py:1448,1455 run these
    as two sequential stereo forwards, i.e. 4 encoder passes). Here the two
    images are encoded ONCE (one batch-2 encoder pass instead of four
    single-image ones) and the asymmetric decoder + heads run the two pairs
    as one batch-2 pass — larger MXU batches, half the encoder FLOPs, one
    dispatch.

    Returns (pred1_pose, pred2_pose, pred1_depth): pose preds are views of
    the (kf, cur) pair (feed to matching + PnP), depth pred is view 1 of the
    (cur, cur) pair (pointmap z = mono depth, reference get_depth
    utils/init_pose.py:189-208)."""
    ps = cfg.patch_size
    H, W = img_kf.shape[-2:]
    grid_hw = (H // ps, W // ps)
    both = jnp.concatenate([img_kf, img_cur], axis=0)
    tokens, pos = _encode(both, params, cfg)  # pos is (N, 2), batch-free
    B = img_kf.shape[0]
    f_kf, f_cur = tokens[:B], tokens[B:]
    # pair batch: row 0 = (kf, cur) pose pair, row 1 = (cur, cur) depth pair
    f1 = jnp.concatenate([f_kf, f_cur], axis=0)
    f2 = jnp.concatenate([f_cur, f_cur], axis=0)
    outs1, outs2 = _decode(f1, pos, f2, pos, params, cfg)
    pred1 = _head(outs1, grid_hw, params["head1"], cfg)
    pred2 = _head(outs2, grid_hw, params["head2"], cfg)
    pose1 = {k: v[:B] for k, v in pred1.items()}
    pose2 = {k: v[:B] for k, v in pred2.items()}
    depth1 = {k: v[B:] for k, v in pred1.items()}
    return pose1, pose2, depth1


@functools.partial(jax.jit, static_argnames=("cfg",))
def mast3r_forward(params, img1, img2, cfg: MASt3RConfig):
    """img1, img2: (B, 3, H, W) normalised to [-1, 1] (ImgNorm 0.5/0.5).

    Returns (pred1, pred2) dicts with pts3d/conf/desc/desc_conf, pts3d of
    view 2 expressed in view 1's frame (dust3r convention)."""
    ps = cfg.patch_size
    H, W = img1.shape[-2:]
    grid_hw = (H // ps, W // ps)
    # shared encoder — batch the two views through one pass
    both = jnp.concatenate([img1, img2], axis=0)
    tokens, pos = _encode(both, params, cfg)
    B = img1.shape[0]
    f1, f2 = tokens[:B], tokens[B:]
    outs1, outs2 = _decode(f1, pos, f2, pos, params, cfg)
    pred1 = _head(outs1, grid_hw, params["head1"], cfg)
    pred2 = _head(outs2, grid_hw, params["head2"], cfg)
    return pred1, pred2
