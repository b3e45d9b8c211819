"""Numerical parity of the JAX GroundingDINO blocks against the reference's
OWN torch modules (VERDICT r3 #5): fuse_modules.BiAttentionBlock,
transformer_vanilla.TransformerEncoderLayer, utils.ContrastiveEmbed and
utils.gen_sineembed_for_position are loadable standalone (importlib on the
file path dodges the torchvision-needing package __init__; timm's DropPath
is stubbed — identity at drop_path=0, the inference regime).

Identical random weights are pushed through both implementations; outputs
must agree to ~1e-5 (float32 reduction-order noise).
"""


import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/GroundingDINO-main/groundingdino/models/GroundingDINO"


def _load_ref_module(name: str):
    """importlib-load a reference module file standalone (no package).

    fuse_modules imports DropPath from timm (absent here); at drop_path=0
    the reference wraps nn.Identity instead, so the import line is patched
    to an Identity alias at load time — stubbing timm in sys.modules
    corrupts transformers' package probing in shared-process test runs."""
    pkg_name = "refgdino"
    if pkg_name not in sys.modules:
        # transformer_vanilla does `from .utils import ...`: load it under
        # a synthetic package whose __path__ is the reference directory
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [REF]
        sys.modules[pkg_name] = pkg
    full = f"{pkg_name}.{name}"
    if full in sys.modules:
        return sys.modules[full]
    path = f"{REF}/{name}.py"
    src = open(path).read().replace(
        "from timm.models.layers import DropPath",
        "import torch.nn; DropPath = torch.nn.Identity",
    )
    mod = types.ModuleType(full)
    mod.__file__ = path
    mod.__package__ = pkg_name
    sys.modules[full] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def _lin(tmod):
    return {
        "weight": tmod.weight.detach().numpy().T.copy(),
        "bias": tmod.bias.detach().numpy().copy(),
    }


def _ln(tmod):
    return {
        "weight": tmod.weight.detach().numpy().copy(),
        "bias": tmod.bias.detach().numpy().copy(),
    }


def test_bi_attention_matches_torch():
    """JAX _bi_attention vs reference BiAttentionBlock (fuse_modules.py:
    99-295) with identical weights: both streams to 1e-5."""
    import jax.numpy as jnp

    from lvdgs_tpu.models.groundingdino.model import _bi_attention

    fuse = _load_ref_module("fuse_modules")
    torch.manual_seed(0)
    D, heads, Ni, Nt = 32, 4, 24, 7
    blk = fuse.BiAttentionBlock(
        v_dim=D, l_dim=D, embed_dim=D, num_heads=heads, dropout=0.0,
        drop_path=0.0, init_values=1.0 / 4,
    ).eval()

    rng = np.random.default_rng(1)
    v = rng.normal(size=(1, Ni, D)).astype(np.float32)
    l = rng.normal(size=(1, Nt, D)).astype(np.float32)
    pad = np.array([[True] * 5 + [False] * 2])  # last 2 text tokens padded

    with torch.no_grad():
        tv, tl = blk(
            torch.from_numpy(v), torch.from_numpy(l),
            attention_mask_v=None,
            attention_mask_l=torch.from_numpy(~pad),
        )

    p = {
        "ln_v": _ln(blk.layer_norm_v), "ln_l": _ln(blk.layer_norm_l),
        "v_proj": _lin(blk.attn.v_proj), "l_proj": _lin(blk.attn.l_proj),
        "values_v": _lin(blk.attn.values_v_proj),
        "values_l": _lin(blk.attn.values_l_proj),
        "out_v": _lin(blk.attn.out_v_proj), "out_l": _lin(blk.attn.out_l_proj),
        "gamma_v": blk.gamma_v.detach().numpy().copy(),
        "gamma_l": blk.gamma_l.detach().numpy().copy(),
    }
    jv, jl = _bi_attention(jnp.asarray(v), jnp.asarray(l), p, heads,
                           jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=2e-5)
    # padded text rows attend unmasked image in both; compare real tokens
    np.testing.assert_allclose(
        np.asarray(jl)[:, :5], tl.numpy()[:, :5], atol=2e-5
    )


def test_text_encoder_layer_matches_torch():
    """JAX text self-attention block (_mha + post-norm FFN, the text
    enhancer inside _encoder_layer) vs reference transformer_vanilla.
    TransformerEncoderLayer with identical weights."""
    import jax.numpy as jnp

    from lvdgs_tpu.models.groundingdino.model import _ffn, _mha, layer_norm

    tv_mod = _load_ref_module("transformer_vanilla")
    torch.manual_seed(0)
    D, heads, Nt = 32, 4, 9
    layer = tv_mod.TransformerEncoderLayer(
        d_model=D, nhead=heads, dim_feedforward=64, dropout=0.0
    ).eval()

    rng = np.random.default_rng(2)
    src = rng.normal(size=(Nt, 1, D)).astype(np.float32)  # (L, B, D) torch MHA
    # phrase-block self-attention mask (bs, L, L): True = ALLOWED in the
    # reference convention fed to nn.MultiheadAttention as bool attn_mask
    # where True means BLOCKED — groundingdino passes ~text_self_attention_masks
    allow = np.zeros((1, Nt, Nt), bool)
    allow[0, :5, :5] = True
    allow[0, 5:, 5:] = True

    with torch.no_grad():
        t_out = layer(
            torch.from_numpy(src),
            src_mask=torch.from_numpy(~allow),
            src_key_padding_mask=None,
        )

    wq, wk, wv = layer.self_attn.in_proj_weight.detach().numpy().reshape(3, D, D)
    bq, bk, bv = layer.self_attn.in_proj_bias.detach().numpy().reshape(3, D)
    p_attn = {
        "q": {"weight": wq.T.copy(), "bias": bq.copy()},
        "k": {"weight": wk.T.copy(), "bias": bk.copy()},
        "v": {"weight": wv.T.copy(), "bias": bv.copy()},
        "out": _lin(layer.self_attn.out_proj),
    }
    p_ln1 = _ln(layer.norm1)
    p_ffn = {"fc1": _lin(layer.linear1), "fc2": _lin(layer.linear2),
             "ln": _ln(layer.norm2)}

    x = jnp.asarray(src.transpose(1, 0, 2))  # (B, L, D)
    bias = jnp.where(jnp.asarray(allow)[:, None, :, :], 0.0, -1e9)
    att = _mha(x, x, x, p_attn, heads, bias)
    out = layer_norm(x + att, p_ln1)
    out = _ffn(out, p_ffn)
    np.testing.assert_allclose(
        np.asarray(out)[0], t_out.numpy()[:, 0], atol=2e-5
    )


def test_contrastive_embed_matches_torch():
    import jax.numpy as jnp

    from lvdgs_tpu.models.groundingdino.model import _contrastive_logits

    utils = _load_ref_module("utils")
    D, Q, Nt, maxlen = 16, 11, 6, 24
    ce = utils.ContrastiveEmbed(max_text_len=maxlen)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, Q, D)).astype(np.float32)
    y = rng.normal(size=(1, Nt, D)).astype(np.float32)
    mask = np.array([[True] * 4 + [False] * 2])

    with torch.no_grad():
        t_out = ce(
            torch.from_numpy(x),
            {"encoded_text": torch.from_numpy(y),
             "text_token_mask": torch.from_numpy(mask)},
        ).numpy()

    j_out = np.asarray(
        _contrastive_logits(jnp.asarray(x), jnp.asarray(y),
                            jnp.asarray(mask), maxlen)
    )
    finite = np.isfinite(t_out)
    assert (np.isfinite(j_out) == finite).all()
    np.testing.assert_allclose(j_out[finite], t_out[finite], atol=2e-5)


def test_sine_embed_boxes_matches_torch():
    """_sine_embed_boxes vs reference gen_sineembed_for_position
    (utils.py:204-230) on 4D cxcywh boxes — order (y, x, w, h)."""
    import jax.numpy as jnp

    from lvdgs_tpu.models.groundingdino.model import _sine_embed_boxes

    utils = _load_ref_module("utils")
    rng = np.random.default_rng(4)
    boxes = rng.uniform(0.05, 0.95, size=(13, 1, 4)).astype(np.float32)
    with torch.no_grad():
        t_out = utils.gen_sineembed_for_position(
            torch.from_numpy(boxes)
        ).numpy()  # (Q, B, 512)
    j_out = np.asarray(_sine_embed_boxes(jnp.asarray(boxes), 256))
    np.testing.assert_allclose(j_out, t_out, atol=2e-5)


def test_get_sine_pos_embed_matches_torch():
    """Reference get_sine_pos_embed (utils.py:24-53) vs a direct JAX
    transliteration of the same formula used by the model's positional
    paths — pins the (sin even, cos odd, exchange_xy) convention."""
    import jax.numpy as jnp

    utils = _load_ref_module("utils")
    rng = np.random.default_rng(5)
    pos = rng.uniform(0, 1, size=(2, 7, 2)).astype(np.float32)
    with torch.no_grad():
        t_out = utils.get_sine_pos_embed(
            torch.from_numpy(pos), num_pos_feats=64, exchange_xy=True
        ).numpy()

    npf = 64
    t = 10000 ** (2 * (jnp.arange(npf) // 2) / npf)

    def emb(v):
        p = v[..., None] * 2 * np.pi / t
        return jnp.stack(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        ).reshape(*v.shape, npf)

    j_out = np.asarray(
        jnp.concatenate([emb(jnp.asarray(pos[..., 1])),
                         emb(jnp.asarray(pos[..., 0]))], axis=-1)
    )
    np.testing.assert_allclose(j_out, t_out, atol=2e-5)


def test_tokenizer_matches_hf_bert_tokenizer(tmp_path):
    """WordPieceTokenizer vs transformers.BertTokenizer on the SAME vocab
    file: identical ids for scene prompts (incl. multi-piece words and
    [UNK]s). Pins the splitting algorithm so a user-supplied real
    bert-base-uncased vocab.txt yields HF-parity ids (the reference
    tokenizes via HF at utils/slam_frontend.py:227-235)."""
    transformers = pytest.importorskip("transformers")

    from lvdgs_tpu.models.groundingdino.inference import WordPieceTokenizer

    vocab = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", ".", ",",
        "car", "truck", "person", "bus", "bicycle", "walking", "walk",
        "##ing", "##s", "##cycle", "bi", "motor", "a", "the", "pedestrian",
    ]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")

    hf = transformers.BertTokenizer(vocab_file=str(path), do_lower_case=True)
    ours = WordPieceTokenizer(vocab_path=str(path))

    prompts = [
        "car . truck . person",
        "walking pedestrian . bicycle . motorcycle",
        "cars . buses . unknownword",
        "the Bus . a person walking",
    ]
    for prompt in prompts:
        hf_ids = hf(prompt)["input_ids"]
        assert ours(prompt) == hf_ids, (prompt, ours(prompt), hf_ids)
