"""Full-model numerical parity of the JAX SAM port against HuggingFace
`SamModel` (VERDICT r4 missing #1).

The offline image carries no SAM checkpoint, but `transformers` ships a
reference-grade torch implementation of the whole encoder+decoder. A tiny
random-weight HF model is built, its state dict is renamed into the
OFFICIAL sam_vit checkpoint layout (the layout `sam/convert.py` consumes —
HF's own conversion script is the inverse of this rename), pushed through
the repo converter, and the full forward (image encode -> box prompt ->
mask decode) is asserted numerically equal. This validates the converter
against a FOREIGN implementation — the previous self-roundtrip tests could
not catch a systematic layout error.

Reference model being mirrored: segment_anything pip package, loaded at
reference utils/slam_frontend.py:502 (sam_vit_b_01ec64.pth).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from lvdgs_tpu.models.sam.convert import convert_state_dict
from lvdgs_tpu.models.sam.model import (
    SAMConfig,
    sam_encode_image,
    sam_predict_masks,
)

# tiny matched pair: ours <-> HF
CFG = SAMConfig(
    img_size=128,
    patch_size=16,
    dim=64,
    depth=2,
    heads=2,
    window=4,
    global_blocks=(1,),
    embed_dim=32,
    decoder_depth=2,
    decoder_heads=8,
    decoder_mlp=64,
    num_mask_tokens=4,
)


def _hf_model():
    from transformers import (
        SamConfig,
        SamMaskDecoderConfig,
        SamModel,
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    vc = SamVisionConfig(
        hidden_size=CFG.dim,
        num_hidden_layers=CFG.depth,
        num_attention_heads=CFG.heads,
        image_size=CFG.img_size,
        patch_size=CFG.patch_size,
        window_size=CFG.window,
        global_attn_indexes=list(CFG.global_blocks),
        output_channels=CFG.embed_dim,
        # HF builds the (shared) positional embedding from the VISION config;
        # its output dim must match the prompt/decoder hidden size
        num_pos_feats=CFG.embed_dim // 2,
    )
    pc = SamPromptEncoderConfig(
        hidden_size=CFG.embed_dim,
        image_embedding_size=CFG.img_size // CFG.patch_size,
        image_size=CFG.img_size,
        patch_size=CFG.patch_size,
    )
    mc = SamMaskDecoderConfig(
        hidden_size=CFG.embed_dim,
        num_hidden_layers=CFG.decoder_depth,
        num_attention_heads=CFG.decoder_heads,
        mlp_dim=CFG.decoder_mlp,
    )
    cfg = SamConfig(
        vision_config=vc.to_dict(),
        prompt_encoder_config=pc.to_dict(),
        mask_decoder_config=mc.to_dict(),
    )
    torch.manual_seed(0)
    m = SamModel(cfg).eval()
    # official SAM uses ONE PositionEmbeddingRandom for both the dense image
    # PE and the sparse prompt PE; HF splits it into two separate modules
    # (shared_image_embedding / prompt_encoder.shared_embedding). Tie them
    # the way a converted official checkpoint would be.
    with torch.no_grad():
        m.shared_image_embedding.positional_embedding.copy_(
            m.prompt_encoder.shared_embedding.positional_embedding
        )
    return m


def _rename_hf_to_official(hf_sd: dict) -> dict:
    """Invert HF's convert_sam_to_hf key mapping for the pieces the repo
    converter consumes."""
    out = {}
    for k, v in hf_sd.items():
        nk = k
        if k.startswith("vision_encoder."):
            nk = k.replace("vision_encoder.", "image_encoder.")
            nk = nk.replace("patch_embed.projection", "patch_embed.proj")
            nk = nk.replace("layers.", "blocks.")
            nk = nk.replace("layer_norm1", "norm1").replace("layer_norm2", "norm2")
            nk = (
                nk.replace("neck.conv1", "neck.0")
                .replace("neck.norm1", "neck.1")
                .replace("neck.conv2", "neck.2")
                .replace("neck.norm2", "neck.3")
            )
        elif k.startswith("prompt_encoder."):
            nk = k.replace(
                "shared_embedding.positional_embedding",
                "pe_layer.positional_encoding_gaussian_matrix",
            )
            nk = nk.replace(".point_embed.", ".point_embeddings.")
        elif k.startswith("mask_decoder."):
            nk = k
            for i in range(1, 5):
                nk = nk.replace(f"layer_norm{i}", f"norm{i}")
            nk = nk.replace("layer_norm_final_attn", "norm_final_attn")
            nk = (
                nk.replace("upscale_conv1", "output_upscaling.0")
                .replace("upscale_layer_norm", "output_upscaling.1")
                .replace("upscale_conv2", "output_upscaling.3")
            )
            # HF 3-layer MLP: proj_in / layers.0 / proj_out  <->  official
            # MLPBlock layers.0 / layers.1 / layers.2
            if "output_hypernetworks_mlps" in nk or "iou_prediction_head" in nk:
                nk = nk.replace("layers.0", "layers.1")
                nk = nk.replace("proj_in", "layers.0").replace(
                    "proj_out", "layers.2"
                )
        out[nk] = v
    return out


@pytest.fixture(scope="module")
def models():
    hf = _hf_model()
    sd = _rename_hf_to_official(hf.state_dict())
    params = convert_state_dict(sd, CFG)
    return hf, params


def test_image_encoder_parity(models):
    hf, params = models
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (1, 3, CFG.img_size, CFG.img_size)).astype(np.float32)
    with torch.no_grad():
        ref = hf.vision_encoder(torch.from_numpy(img)).last_hidden_state.numpy()
    ours = np.asarray(sam_encode_image(params, jnp.asarray(img), CFG))
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 1e-4, np.max(np.abs(ours - ref))


def test_full_forward_box_to_mask_parity(models):
    hf, params = models
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (1, 3, CFG.img_size, CFG.img_size)).astype(np.float32)
    boxes_px = np.array(
        [[8.0, 12.0, 70.0, 90.0], [40.0, 5.0, 120.0, 60.0]], np.float32
    )
    with torch.no_grad():
        out = hf(
            pixel_values=torch.from_numpy(img),
            input_boxes=torch.from_numpy(boxes_px[None]),
            multimask_output=True,
        )
    ref_masks = out.pred_masks[0].numpy()  # (NB, 3, 4h, 4w)
    ref_iou = out.iou_scores[0].numpy()  # (NB, 3)

    emb = sam_encode_image(params, jnp.asarray(img), CFG)
    # official/HF prompt encoder shifts boxes to pixel centers (+0.5) before
    # normalising by the padded-square size
    boxes_n = (boxes_px + 0.5) / CFG.img_size
    masks, iou = sam_predict_masks(params, emb, jnp.asarray(boxes_n), CFG)
    ours_masks = np.asarray(masks)[:, 1:4]  # multimask tokens 1..3
    ours_iou = np.asarray(iou)[:, 1:4]

    assert ours_masks.shape == ref_masks.shape, (ours_masks.shape, ref_masks.shape)
    scale = max(1.0, float(np.abs(ref_masks).max()))
    assert np.max(np.abs(ours_masks - ref_masks)) / scale < 1e-4, (
        np.max(np.abs(ours_masks - ref_masks)),
        scale,
    )
    assert np.max(np.abs(ours_iou - ref_iou)) < 1e-4
