"""FULL GroundingDINO forward parity against HuggingFace
`GroundingDinoForObjectDetection` (VERDICT r4 missing #1): tiny matched
configs, random HF weights renamed to the official checkpoint layout
(`convert_hf_state_dict`), pushed through the repo converter, and the whole
backbone -> BERT -> fusion encoder -> two-stage proposal selection ->
decoder -> ContrastiveEmbed pipeline compared end to end (boxes + logits).

The reference model being mirrored is GroundingDINO-main/groundingdino/
models/GroundingDINO/groundingdino.py:379 (backbone/ and bertwarper are
absent from the snapshot — HF is the only executable oracle for the full
net). Writing this test surfaced five real parity bugs in the port, fixed
alongside it: missing decoder final norm (transformer.py:135,730), proposal
wh = 0.05*2^lvl + invalid-proposal masking (utils.py:56-116), '.'-included
phrase blocks + per-phrase position ids
(generate_masks_with_special_tokens_and_transfer_map), sine (not learned)
text position embeddings (transformer.py:539-543), and the text enhancer
attending with the phrase mask rather than the pad mask
(transformer.py:572-577).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from lvdgs_tpu.models.groundingdino.bert import BertConfig
from lvdgs_tpu.models.groundingdino.convert import (
    convert_hf_state_dict,
    convert_state_dict,
)
from lvdgs_tpu.models.groundingdino.model import (
    GroundingDINOConfig,
    groundingdino_forward,
)
from lvdgs_tpu.models.groundingdino.swin import SwinConfig

# HF hardcodes the special token ids of the real BERT vocab
CLS, SEP, DOT = 101, 102, 1012

CFG = GroundingDINOConfig(
    swin=SwinConfig(embed_dim=16, depths=(1, 2, 2, 1), heads=(1, 2, 4, 8),
                    window=2, patch_size=4, out_indices=(1, 2, 3)),
    bert=BertConfig(vocab_size=2000, dim=32, layers=2, heads=2, mlp=64,
                    max_pos=64),
    dim=32,
    heads=2,
    enc_layers=2,
    dec_layers=2,
    ffn=64,
    num_queries=12,
    n_levels=4,
    n_points=2,
    max_text_len=32,
)


@pytest.fixture(scope="module")
def models():
    from transformers import (
        BertConfig as HFBertConfig,
        GroundingDinoConfig,
        GroundingDinoForObjectDetection,
        SwinConfig as HFSwinConfig,
    )

    swin = HFSwinConfig(
        image_size=128,
        patch_size=CFG.swin.patch_size,
        embed_dim=CFG.swin.embed_dim,
        depths=list(CFG.swin.depths),
        num_heads=list(CFG.swin.heads),
        window_size=CFG.swin.window,
        drop_path_rate=0.0,
        out_features=[f"stage{i + 1}" for i in CFG.swin.out_indices],
    )
    bert = HFBertConfig(
        vocab_size=CFG.bert.vocab_size,
        hidden_size=CFG.bert.dim,
        num_hidden_layers=CFG.bert.layers,
        num_attention_heads=CFG.bert.heads,
        intermediate_size=CFG.bert.mlp,
        max_position_embeddings=CFG.bert.max_pos,
    )
    cfg = GroundingDinoConfig(
        backbone_config=swin,
        text_config=bert,
        num_queries=CFG.num_queries,
        encoder_layers=CFG.enc_layers,
        decoder_layers=CFG.dec_layers,
        encoder_ffn_dim=CFG.ffn,
        decoder_ffn_dim=CFG.ffn,
        encoder_attention_heads=CFG.heads,
        decoder_attention_heads=CFG.heads,
        d_model=CFG.dim,
        num_feature_levels=CFG.n_levels,
        encoder_n_points=CFG.n_points,
        decoder_n_points=CFG.n_points,
        max_text_len=CFG.max_text_len,
        dropout=0.0,
    )
    torch.manual_seed(0)
    hf = GroundingDinoForObjectDetection(cfg).eval()
    params = convert_state_dict(convert_hf_state_dict(hf.state_dict()), CFG)
    return hf, params


def test_full_forward_parity(models):
    hf, params = models
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, 128, 128)).astype(np.float32)
    # "cat . dog chair ." style prompt with real special ids
    ids = np.array([[CLS, 400, 500, DOT, 600, 700, DOT, SEP]], np.int64)
    L = ids.shape[1]

    with torch.no_grad():
        out = hf(
            pixel_values=torch.from_numpy(img),
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones_like(torch.from_numpy(ids)),
        )
    ref_logits = out.logits.numpy()[0]  # (Q, max_text_len)
    ref_boxes = out.pred_boxes.numpy()[0]  # (Q, 4)

    from lvdgs_tpu.models.groundingdino.inference import build_text_masks

    self_mask, pad_mask, position_ids = build_text_masks(
        ids[0].astype(np.int32), (CLS, SEP, DOT)
    )
    ours = groundingdino_forward(
        params,
        jnp.asarray(img),
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(self_mask)[None],
        jnp.asarray(pad_mask)[None],
        CFG,
        position_ids=jnp.asarray(position_ids, jnp.int32)[None],
    )
    our_logits = np.asarray(ours["logits"][0])
    our_boxes = np.asarray(ours["boxes"][0])

    assert our_boxes.shape == ref_boxes.shape
    assert np.max(np.abs(our_boxes - ref_boxes)) < 1e-4, np.max(
        np.abs(our_boxes - ref_boxes)
    )
    # logits are -inf beyond the real tokens on both sides
    fin_ref = np.isfinite(ref_logits)
    fin_ours = np.isfinite(our_logits)
    np.testing.assert_array_equal(fin_ref, fin_ours)
    scale = max(1.0, float(np.abs(ref_logits[fin_ref]).max()))
    err = np.max(np.abs(our_logits[fin_ours] - ref_logits[fin_ref])) / scale
    assert err < 1e-4, err
