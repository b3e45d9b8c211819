"""Tiny torch-style roundtrip tests for the GroundingDINO and SAM weight
converters (the MASt3R converter already has one, test_mast3r.py).

Strategy (same as MASt3R's): fabricate a checkpoint-style state dict FROM a
randomly-initialised JAX param tree by applying the converter's inverse
mapping (torch linear weights are transposed, embeddings row-wrapped, ...),
run the real converter, and require the output tree to equal the source
exactly. This pins every key name and every transpose in the converter —
the best obtainable parity evidence while the real checkpoints are absent
(VERDICT r1 item 5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _flat(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flat(v, f"{prefix}/{i}"))
    else:
        out[prefix] = np.asarray(tree)
    return out


def assert_trees_equal(a, b, atol=0.0):
    fa, fb = _flat(a), _flat(b)
    assert set(fa) == set(fb), (
        sorted(set(fa) - set(fb))[:5], sorted(set(fb) - set(fa))[:5]
    )
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], atol=atol, err_msg=k)


# ---------------------------------------------------------------------------
# SAM


def test_sam_convert_roundtrip_tiny():
    from lvdgs_tpu.models.sam.model import TINY, init_params
    from lvdgs_tpu.models.sam.convert import convert_state_dict

    cfg = TINY
    params = init_params(jax.random.PRNGKey(3), cfg)
    sd = {}

    def put_lin(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["weight"]).T.copy()
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_conv(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["weight"])
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_ln(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["weight"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    ie = params["image_encoder"]
    sd["image_encoder.patch_embed.proj.weight"] = np.asarray(ie["patch_embed"]["weight"])
    sd["image_encoder.patch_embed.proj.bias"] = np.asarray(ie["patch_embed"]["bias"])
    sd["image_encoder.pos_embed"] = np.asarray(ie["pos_embed"])
    for i, b in enumerate(ie["blocks"]):
        p = f"image_encoder.blocks.{i}"
        put_ln(f"{p}.norm1", b["norm1"])
        put_lin(f"{p}.attn.qkv", b["attn"]["qkv"])
        put_lin(f"{p}.attn.proj", b["attn"]["proj"])
        sd[f"{p}.attn.rel_pos_h"] = np.asarray(b["attn"]["rel_pos_h"])
        sd[f"{p}.attn.rel_pos_w"] = np.asarray(b["attn"]["rel_pos_w"])
        put_ln(f"{p}.norm2", b["norm2"])
        put_lin(f"{p}.mlp.lin1", b["mlp"]["fc1"])
        put_lin(f"{p}.mlp.lin2", b["mlp"]["fc2"])
    put_conv("image_encoder.neck.0", ie["neck"]["conv1"])
    put_ln("image_encoder.neck.1", ie["neck"]["ln1"])
    put_conv("image_encoder.neck.2", ie["neck"]["conv2"])
    put_ln("image_encoder.neck.3", ie["neck"]["ln2"])

    pe = params["prompt_encoder"]
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = np.asarray(
        pe["pe_gaussian"]
    )
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = np.asarray(
            pe["point_embeddings"][i]
        )[None]
    sd["prompt_encoder.not_a_point_embed.weight"] = np.asarray(pe["not_a_point"])[None]
    sd["prompt_encoder.no_mask_embed.weight"] = np.asarray(pe["no_mask_embed"])[None]

    md = params["mask_decoder"]
    sd["mask_decoder.iou_token.weight"] = np.asarray(md["iou_token"])[None]
    sd["mask_decoder.mask_tokens.weight"] = np.asarray(md["mask_tokens"])

    def put_attn(prefix, p):
        for k_ours, k_theirs in (
            ("q_proj", "q_proj"), ("k_proj", "k_proj"),
            ("v_proj", "v_proj"), ("out_proj", "out_proj"),
        ):
            put_lin(f"{prefix}.{k_theirs}", p[k_ours])

    for i, b in enumerate(md["blocks"]):
        p = f"mask_decoder.transformer.layers.{i}"
        put_attn(f"{p}.self_attn", b["self_attn"])
        put_ln(f"{p}.norm1", b["norm1"])
        put_attn(f"{p}.cross_attn_token_to_image", b["cross_attn_t2i"])
        put_ln(f"{p}.norm2", b["norm2"])
        put_lin(f"{p}.mlp.lin1", b["mlp"]["fc1"])
        put_lin(f"{p}.mlp.lin2", b["mlp"]["fc2"])
        put_ln(f"{p}.norm3", b["norm3"])
        put_attn(f"{p}.cross_attn_image_to_token", b["cross_attn_i2t"])
        put_ln(f"{p}.norm4", b["norm4"])
    put_attn("mask_decoder.transformer.final_attn_token_to_image", md["final_attn"])
    put_ln("mask_decoder.transformer.norm_final_attn", md["norm_final"])
    put_conv("mask_decoder.output_upscaling.0", md["upscale"]["conv1"])
    put_ln("mask_decoder.output_upscaling.1", md["upscale"]["ln"])
    put_conv("mask_decoder.output_upscaling.3", md["upscale"]["conv2"])
    for i, mlps in enumerate(md["hyper_mlps"]):
        for j, lin in enumerate(mlps):
            put_lin(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}", lin)
    for j, lin in enumerate(md["iou_mlp"]):
        put_lin(f"mask_decoder.iou_prediction_head.layers.{j}", lin)

    converted = convert_state_dict(sd, cfg)
    assert_trees_equal(params, converted)

    # the converted tree must actually run the model
    from lvdgs_tpu.models.sam.model import sam_encode_image, sam_predict_masks

    img = jnp.zeros((1, 3, cfg.img_size, cfg.img_size), jnp.float32)
    emb = sam_encode_image(converted, img, cfg)
    masks, iou = sam_predict_masks(
        converted, emb[0], jnp.array([[10.0, 10.0, 60.0, 60.0]]), cfg
    )
    assert np.all(np.isfinite(np.asarray(masks)))


# ---------------------------------------------------------------------------
# GroundingDINO


def test_gdino_convert_roundtrip_tiny():
    from lvdgs_tpu.models.groundingdino.model import TINY_GDINO, init_params
    from lvdgs_tpu.models.groundingdino.convert import convert_state_dict

    cfg = TINY_GDINO
    params = init_params(jax.random.PRNGKey(5), cfg)
    sd = {}

    def put_lin(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["weight"]).T.copy()
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_ln(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["weight"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_attn(prefix, p):
        # torch MultiheadAttention packs q/k/v into in_proj_weight (3D, D)
        sd[f"{prefix}.in_proj_weight"] = np.concatenate(
            [np.asarray(p[k]["weight"]).T for k in ("q", "k", "v")], axis=0
        )
        sd[f"{prefix}.in_proj_bias"] = np.concatenate(
            [np.asarray(p[k]["bias"]) for k in ("q", "k", "v")], axis=0
        )
        put_lin(f"{prefix}.out_proj", p["out"])

    def put_deform(prefix, p):
        put_lin(f"{prefix}.sampling_offsets", p["sampling_offsets"])
        put_lin(f"{prefix}.attention_weights", p["attn_weights"])
        put_lin(f"{prefix}.value_proj", p["value_proj"])
        put_lin(f"{prefix}.output_proj", p["output_proj"])

    def put_ffn(prefix_fc1, prefix_fc2, prefix_ln, p):
        put_lin(prefix_fc1, p["fc1"])
        put_lin(prefix_fc2, p["fc2"])
        put_ln(prefix_ln, p["ln"])

    # swin backbone
    bb = "backbone.0"
    sw = params["backbone"]
    sd[f"{bb}.patch_embed.proj.weight"] = np.asarray(sw["patch_embed"]["weight"])
    sd[f"{bb}.patch_embed.proj.bias"] = np.asarray(sw["patch_embed"]["bias"])
    put_ln(f"{bb}.patch_embed.norm", sw["patch_norm"])
    for si, stage in enumerate(sw["stages"]):
        for bi, b in enumerate(stage["blocks"]):
            pre = f"{bb}.layers.{si}.blocks.{bi}"
            put_ln(f"{pre}.norm1", b["norm1"])
            put_lin(f"{pre}.attn.qkv", b["attn"]["qkv"])
            put_lin(f"{pre}.attn.proj", b["attn"]["proj"])
            sd[f"{pre}.attn.relative_position_bias_table"] = np.asarray(
                b["attn"]["rel_pos_bias"]
            )
            put_ln(f"{pre}.norm2", b["norm2"])
            put_lin(f"{pre}.mlp.fc1", b["mlp"]["fc1"])
            put_lin(f"{pre}.mlp.fc2", b["mlp"]["fc2"])
        if "downsample" in stage:
            put_ln(f"{bb}.layers.{si}.downsample.norm", stage["downsample"]["norm"])
            put_lin(
                f"{bb}.layers.{si}.downsample.reduction",
                stage["downsample"]["reduction"],
            )
    for si, norm in sw["out_norms"].items():
        put_ln(f"{bb}.norm{si}", norm)

    # bert (official checkpoint nests under bert.bert)
    bert = params["bert"]
    bp = "bert.bert"
    sd[f"{bp}.embeddings.word_embeddings.weight"] = np.asarray(bert["word_emb"])
    sd[f"{bp}.embeddings.position_embeddings.weight"] = np.asarray(bert["pos_emb"])
    sd[f"{bp}.embeddings.token_type_embeddings.weight"] = np.asarray(bert["type_emb"])
    put_ln(f"{bp}.embeddings.LayerNorm", bert["emb_ln"])
    for i, layer in enumerate(bert["layers"]):
        b = f"{bp}.encoder.layer.{i}"
        put_lin(f"{b}.attention.self.query", layer["q"])
        put_lin(f"{b}.attention.self.key", layer["k"])
        put_lin(f"{b}.attention.self.value", layer["v"])
        put_lin(f"{b}.attention.output.dense", layer["attn_out"])
        put_ln(f"{b}.attention.output.LayerNorm", layer["attn_ln"])
        put_lin(f"{b}.intermediate.dense", layer["fc1"])
        put_lin(f"{b}.output.dense", layer["fc2"])
        put_ln(f"{b}.output.LayerNorm", layer["out_ln"])

    # neck / transformer / heads
    put_lin("feat_map", params["feat_map"])
    for i, ip in enumerate(params["input_proj"]):
        sd[f"input_proj.{i}.0.weight"] = np.asarray(ip["weight"])
        sd[f"input_proj.{i}.0.bias"] = np.asarray(ip["bias"])
        put_ln(f"input_proj.{i}.1", ip["gn"])
    tr = "transformer"
    sd[f"{tr}.level_embed"] = np.asarray(params["level_embed"])
    for i, e in enumerate(params["enc_layers"]):
        ep = f"{tr}.encoder.layers.{i}"
        fp = f"{tr}.encoder.fusion_layers.{i}"
        tp = f"{tr}.encoder.text_layers.{i}"
        fu = e["fusion"]
        put_ln(f"{fp}.layer_norm_v", fu["ln_v"])
        put_ln(f"{fp}.layer_norm_l", fu["ln_l"])
        put_lin(f"{fp}.attn.v_proj", fu["v_proj"])
        put_lin(f"{fp}.attn.l_proj", fu["l_proj"])
        put_lin(f"{fp}.attn.values_v_proj", fu["values_v"])
        put_lin(f"{fp}.attn.values_l_proj", fu["values_l"])
        put_lin(f"{fp}.attn.out_v_proj", fu["out_v"])
        put_lin(f"{fp}.attn.out_l_proj", fu["out_l"])
        sd[f"{fp}.gamma_v"] = np.asarray(fu["gamma_v"])
        sd[f"{fp}.gamma_l"] = np.asarray(fu["gamma_l"])
        put_attn(f"{tp}.self_attn", e["text_attn"])
        put_ln(f"{tp}.norm1", e["text_ln1"])
        put_ffn(f"{tp}.linear1", f"{tp}.linear2", f"{tp}.norm2", e["text_ffn"])
        put_deform(f"{ep}.self_attn", e["deform"])
        put_ln(f"{ep}.norm1", e["img_ln1"])
        put_ffn(f"{ep}.linear1", f"{ep}.linear2", f"{ep}.norm2", e["img_ffn"])
    put_lin(f"{tr}.enc_output", params["enc_output"])
    put_ln(f"{tr}.enc_output_norm", params["enc_output_ln"])
    for j, lin in enumerate(params["enc_bbox"]):
        put_lin(f"{tr}.enc_out_bbox_embed.layers.{j}", lin)
    sd[f"{tr}.tgt_embed.weight"] = np.asarray(params["tgt_embed"])
    for j, lin in enumerate(params["ref_point_head"]):
        put_lin(f"{tr}.decoder.ref_point_head.layers.{j}", lin)
    for i, d in enumerate(params["dec_layers"]):
        dp = f"{tr}.decoder.layers.{i}"
        put_attn(f"{dp}.self_attn", d["self_attn"])
        put_ln(f"{dp}.norm2", d["ln1"])
        put_attn(f"{dp}.ca_text", d["text_cross"])
        put_ln(f"{dp}.catext_norm", d["ln2"])
        put_deform(f"{dp}.cross_attn", d["deform"])
        put_ln(f"{dp}.norm1", d["ln3"])
        put_ffn(f"{dp}.linear1", f"{dp}.linear2", f"{dp}.norm3", d["ffn"])
    for j, lin in enumerate(params["bbox_embed"]):
        put_lin(f"bbox_embed.0.layers.{j}", lin)
    put_ln(f"{tr}.decoder.norm", params["dec_norm"])

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any unmapped key fails the test
        converted = convert_state_dict(sd, cfg)
    assert_trees_equal(params, converted)
