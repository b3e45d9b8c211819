"""GroundingDINO port: MSDA vs reference fallback math, Swin shapes, BERT
masking, end-to-end detector with random weights."""
import jax
import jax.numpy as jnp
import numpy as np

from lvdgs_tpu.ops.msda import multi_scale_deformable_attention, _bilinear_sample
from lvdgs_tpu.models.groundingdino.swin import TINY_SWIN, init_swin, swin_forward
from lvdgs_tpu.models.groundingdino.bert import TINY_BERT, init_bert, bert_forward
from lvdgs_tpu.models.groundingdino.model import (
    TINY_GDINO, init_params, groundingdino_forward,
)
from lvdgs_tpu.models.groundingdino.inference import (
    GroundingDINODetector, WordPieceTokenizer, build_text_masks,
)


def _msda_reference(value, shapes, locs, weights):
    """Direct NumPy port of the reference pure fallback
    (ms_deform_attn.py:93-131) using grid_sample semantics."""
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(np.asarray(value))
    locs = torch.from_numpy(np.asarray(locs))
    weights = torch.from_numpy(np.asarray(weights))
    B, _, nH, c = value.shape
    _, Q, _, nL, nP, _ = locs.shape
    splits = [h * w for h, w in shapes]
    value_list = value.split(splits, dim=1)
    sampling_grids = 2 * locs - 1
    out = []
    for lvl, (H, W) in enumerate(shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(B * nH, c, H, W)
        grid = sampling_grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        sampled = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros",
                                align_corners=False)
        out.append(sampled)
    w = weights.transpose(1, 2).reshape(B * nH, 1, Q, nL * nP)
    res = (torch.stack(out, dim=-2).flatten(-2) * w).sum(-1)
    return res.view(B, nH * c, Q).transpose(1, 2).numpy()


def test_msda_matches_torch_fallback():
    rng = np.random.default_rng(0)
    B, nH, c, Q, nP = 2, 2, 4, 5, 3
    shapes = ((6, 8), (3, 4))
    N = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, N, nH, c)).astype(np.float32)
    locs = rng.uniform(0.05, 0.95, size=(B, Q, nH, len(shapes), nP, 2)).astype(np.float32)
    weights = rng.uniform(size=(B, Q, nH, len(shapes), nP)).astype(np.float32)
    weights /= weights.sum(axis=(-1, -2), keepdims=True)
    ours = np.asarray(
        multi_scale_deformable_attention(jnp.asarray(value), shapes,
                                         jnp.asarray(locs), jnp.asarray(weights))
    )
    ref = _msda_reference(value, shapes, locs, weights)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_swin_shapes():
    cfg = TINY_SWIN
    params = init_swin(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 3, 64, 96))
    outs = swin_forward(img, params, cfg)
    assert len(outs) == 3
    # stages 1, 2, 3 at strides 8, 16, 32
    assert outs[0].shape == (1, cfg.embed_dim * 2, 8, 12)
    assert outs[1].shape == (1, cfg.embed_dim * 4, 4, 6)
    assert outs[2].shape == (1, cfg.embed_dim * 8, 2, 3)
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))


def test_bert_phrase_mask_isolation():
    cfg = TINY_BERT
    params = init_bert(jax.random.PRNGKey(1), cfg)
    ids = np.array([1, 5, 6, 2, 7, 8, 2, 3], np.int32)  # [CLS] 5 6 . 7 8 . [SEP]
    mask, pad, position_ids = build_text_masks(ids, (1, 2, 3))
    # tokens 5,6 (segment 1) must not attend to 7,8 (segment 2)
    assert not mask[1, 4] and not mask[4, 1]
    assert mask[1, 2] and mask[4, 5]
    # official semantics: the terminating '.' attends WITH its phrase;
    # [CLS]/[SEP] are self-only; position ids reset per phrase
    assert mask[1, 3] and mask[3, 1]
    assert not mask[0, 1] and not mask[7, 6]
    np.testing.assert_array_equal(position_ids, [0, 0, 1, 2, 0, 1, 2, 0])
    out = bert_forward(params, jnp.asarray(ids)[None], jnp.asarray(mask)[None], cfg)
    assert out.shape == (1, 8, cfg.dim)
    # isolation: changing segment-2 tokens must not change segment-1 outputs
    ids2 = ids.copy()
    ids2[4] = 9
    out2 = bert_forward(params, jnp.asarray(ids2)[None], jnp.asarray(mask)[None], cfg)
    np.testing.assert_allclose(np.asarray(out[0, 1:4]), np.asarray(out2[0, 1:4]), atol=1e-5)


def test_detector_end_to_end_random_weights():
    cfg = TINY_GDINO
    params = init_params(jax.random.PRNGKey(2), cfg)
    det = GroundingDINODetector(params, cfg, image_size=64)
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, size=(48, 64, 3)).astype(np.uint8)
    boxes, scores = det(img, "car . person .", box_threshold=0.0)
    assert boxes.shape[1] == 4 if len(boxes) else True
    assert len(boxes) == len(scores)
    # with threshold 0 every query above -inf scores; boxes inside image bounds-ish
    if len(boxes):
        assert np.isfinite(boxes).all()


def test_tokenizer_fallback():
    tok = WordPieceTokenizer(None)
    ids = tok("car . truck")
    assert ids[0] == tok.cls and ids[-1] == tok.sep
    assert tok.dot in ids


def test_tokenizer_packaged_vocab():
    """No vocab_path -> the packaged prompt-lexicon vocab loads; the whole
    SLAM prompt surface tokenizes [UNK]-free and off-lexicon ASCII words
    fall back to char pieces, never [UNK] (VERDICT r2 #7)."""
    from lvdgs_tpu.perception.masking import ScenePromptManager

    tok = WordPieceTokenizer(None)
    assert tok.vocab, "packaged prompt_vocab.txt missing"
    for scene in ScenePromptManager.SCENES.values():
        for phrases in scene.values():
            for phrase in phrases:
                ids = tok(phrase + " .")
                assert tok.unk not in ids, phrase
    # off-lexicon word: char continuation, not [UNK]
    assert tok.unk not in tok("zeppelin .")
    # distinct lexicon words get distinct single ids
    assert tok("car .")[1] != tok("truck .")[1]


def test_masker_warmup_health():
    """Masker init runs the detector/segmenter self-test and reports health
    (reference _warmup_detector parity, utils/slam_frontend.py:251-276)."""
    from lvdgs_tpu.perception.masking import DynamicObjectMasker

    calls = {}

    def fake_detector(img, prompt):
        calls["det"] = (img.shape, prompt)
        return np.array([[10.0, 10.0, 50.0, 50.0]]), np.array([0.9])

    def fake_segmenter(img, boxes):
        calls["seg"] = boxes.shape
        return np.ones((len(boxes), img.shape[0], img.shape[1]), bool)

    m = DynamicObjectMasker(detector=fake_detector, segmenter=fake_segmenter)
    assert "det" in calls and "seg" in calls  # warmup ran at init
    h = m.warmup()
    assert h["detector_ok"] and h["n_boxes"] == 1
    assert h["segmenter_ok"]
    assert "car" in calls["det"][1]  # scene prompt used

    def broken_detector(img, prompt):
        raise RuntimeError("boom")

    m2 = DynamicObjectMasker(detector=broken_detector, segmenter=None)
    h2 = m2.warmup()
    assert h2["detector_ok"] is False and h2["segmenter_ok"] is None
