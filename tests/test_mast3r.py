"""MASt3R architecture: shapes, RoPE properties, matching, preprocessing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvdgs_tpu.models.mast3r.model import MASt3RConfig, TINY, init_params, mast3r_forward
from lvdgs_tpu.models.mast3r import vit
from lvdgs_tpu.models.mast3r.matching import fast_reciprocal_nns
from lvdgs_tpu.models.mast3r.inference import preprocess_image


def test_forward_shapes_tiny():
    cfg = TINY
    params = init_params(jax.random.PRNGKey(0), cfg)
    H, W = 64, 96
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.normal(size=(1, 3, H, W)), jnp.float32)
    img2 = jnp.asarray(rng.normal(size=(1, 3, H, W)), jnp.float32)
    pred1, pred2 = mast3r_forward(params, img1, img2, cfg)
    for pred in (pred1, pred2):
        assert pred["pts3d"].shape == (1, H, W, 3)
        assert pred["conf"].shape == (1, H, W)
        assert pred["desc"].shape == (1, H, W, cfg.local_feat_dim)
        assert pred["desc_conf"].shape == (1, H, W)
        # conf >= vmin, desc unit-norm
        assert float(pred["conf"].min()) >= cfg.conf_vmin
        norms = jnp.linalg.norm(pred["desc"], axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
    # outputs finite and the two heads differ (asymmetric)
    assert np.all(np.isfinite(np.asarray(pred1["pts3d"])))
    assert float(jnp.abs(pred1["desc"] - pred2["desc"]).max()) > 1e-6


def test_rope_preserves_norm_and_relativity():
    d = 16
    pos = jnp.array([[3, 7], [0, 0], [5, 2]])
    cos, sin = vit.rope2d_angles(pos, d)
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 3, d))
    q_rot = vit.apply_rope2d(q, cos, sin)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(q_rot, axis=-1)),
        np.asarray(jnp.linalg.norm(q, axis=-1)),
        rtol=1e-5,
    )
    # relative property: <R(p1)q, R(p2)k> == <R(p1+s)q, R(p2+s)k>
    k = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 3, d))
    def dots(shift):
        c1, s1 = vit.rope2d_angles(pos + shift, d)
        return jnp.einsum(
            "bhnd,bhnd->bhn", vit.apply_rope2d(q, c1, s1), vit.apply_rope2d(k, c1, s1)
        )
    np.testing.assert_allclose(
        np.asarray(dots(jnp.array([0, 0]))), np.asarray(dots(jnp.array([11, 4]))),
        rtol=1e-4,
    )


def test_matching_identity_descriptors():
    # identical descriptor fields -> matches must be the identity mapping
    rng = np.random.default_rng(3)
    desc = rng.normal(size=(32, 48, 8)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    m1, m2 = fast_reciprocal_nns(desc, desc, subsample=8)
    assert len(m1) > 10
    np.testing.assert_array_equal(m1, m2)


def test_matching_shifted_descriptors():
    # desc2 is desc1 shifted 5 px right: matches should recover the shift
    rng = np.random.default_rng(4)
    base = rng.normal(size=(32, 64, 8)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    d2 = np.roll(base, 5, axis=1)
    m1, m2 = fast_reciprocal_nns(base, d2, subsample=8)
    assert len(m1) > 5
    dx = (m2[:, 0] - m1[:, 0]) % 64
    frac = np.mean(dx == 5)
    assert frac > 0.8, f"only {frac:.0%} matches recover the shift"


def test_preprocess_image_shape_alignment():
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, size=(3, 370, 1226)).astype(np.float32)
    out, (H, W) = preprocess_image(img, 512)
    assert out.shape == (3, H, W)
    assert H % 16 == 0 and W % 16 == 0
    assert max(H, W) <= 512
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6


def test_pixel_shuffle_matches_torch_semantics():
    from lvdgs_tpu.models.mast3r.model import _pixel_shuffle
    import torch

    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 8 * 4, 3, 5)).astype(np.float32)
    ours = np.asarray(_pixel_shuffle(jnp.asarray(x), 2))
    theirs = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_convert_roundtrip_tiny():
    """Build a torch-style state dict for the tiny config and convert."""
    import torch

    cfg = TINY
    params = init_params(jax.random.PRNGKey(7), cfg)

    # fabricate a state dict from our own params (inverse mapping)
    sd = {}

    def put_lin(prefix, p):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(p["weight"]).T.copy())
        if "bias" in p:
            sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["bias"]))

    def put_conv(prefix, p):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(p["weight"]))
        if "bias" in p:
            sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["bias"]))

    def put_ln(prefix, p):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(p["weight"]))
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["bias"]))

    put_conv("patch_embed.proj", params["patch_embed"]["proj"])
    put_ln("enc_norm", params["enc_norm"])
    put_ln("dec_norm", params["dec_norm"])
    put_lin("decoder_embed", params["decoder_embed"])
    for i, blk in enumerate(params["enc_blocks"]):
        put_ln(f"enc_blocks.{i}.norm1", blk["norm1"])
        put_lin(f"enc_blocks.{i}.attn.qkv", blk["attn"]["qkv"])
        put_lin(f"enc_blocks.{i}.attn.proj", blk["attn"]["proj"])
        put_ln(f"enc_blocks.{i}.norm2", blk["norm2"])
        put_lin(f"enc_blocks.{i}.mlp.fc1", blk["mlp"]["fc1"])
        put_lin(f"enc_blocks.{i}.mlp.fc2", blk["mlp"]["fc2"])
    for name, blocks in (("dec_blocks", params["dec_blocks"]), ("dec_blocks2", params["dec_blocks2"])):
        for i, blk in enumerate(blocks):
            put_ln(f"{name}.{i}.norm1", blk["norm1"])
            put_ln(f"{name}.{i}.norm2", blk["norm2"])
            put_ln(f"{name}.{i}.norm3", blk["norm3"])
            put_ln(f"{name}.{i}.norm_y", blk["norm_y"])
            put_lin(f"{name}.{i}.attn.qkv", blk["attn"]["qkv"])
            put_lin(f"{name}.{i}.attn.proj", blk["attn"]["proj"])
            for q in ("projq", "projk", "projv", "proj"):
                put_lin(f"{name}.{i}.cross_attn.{q}", blk["cross_attn"][q])
            put_lin(f"{name}.{i}.mlp.fc1", blk["mlp"]["fc1"])
            put_lin(f"{name}.{i}.mlp.fc2", blk["mlp"]["fc2"])
    for n, h in (("downstream_head1", "head1"), ("downstream_head2", "head2")):
        hp = params[h]
        for i in range(4):
            put_conv(f"{n}.dpt.act_postprocess.{i}.0", hp["dpt"]["proj"][i])
        for i in (0, 1, 3):
            put_conv(f"{n}.dpt.act_postprocess.{i}.1", hp["dpt"]["resample"][i])
        for i in range(4):
            put_conv(f"{n}.dpt.scratch.layer{i+1}_rn", hp["dpt"]["scratch"][i])
            rp = f"{n}.dpt.scratch.refinenet{i+1}"
            put_conv(f"{rp}.resConfUnit1.conv1", hp["dpt"]["refine"][i]["rcu1"]["conv1"])
            put_conv(f"{rp}.resConfUnit1.conv2", hp["dpt"]["refine"][i]["rcu1"]["conv2"])
            put_conv(f"{rp}.resConfUnit2.conv1", hp["dpt"]["refine"][i]["rcu2"]["conv1"])
            put_conv(f"{rp}.resConfUnit2.conv2", hp["dpt"]["refine"][i]["rcu2"]["conv2"])
            put_conv(f"{rp}.out_conv", hp["dpt"]["refine"][i]["out_conv"])
        put_conv(f"{n}.dpt.head.0", hp["dpt"]["head"]["conv1"])
        put_conv(f"{n}.dpt.head.2", hp["dpt"]["head"]["conv2"])
        put_conv(f"{n}.dpt.head.4", hp["dpt"]["head"]["conv3"])
        put_lin(f"{n}.head_local_features.fc1", hp["local_features"]["fc1"])
        put_lin(f"{n}.head_local_features.fc2", hp["local_features"]["fc2"])

    from lvdgs_tpu.models.mast3r.convert import convert_state_dict

    converted = convert_state_dict(sd, cfg)
    # forward outputs must match bitwise-ish
    rng = np.random.default_rng(8)
    img = jnp.asarray(rng.normal(size=(1, 3, 32, 48)), jnp.float32)
    a1, a2 = mast3r_forward(params, img, img, cfg)
    b1, b2 = mast3r_forward(converted, img, img, cfg)
    np.testing.assert_allclose(np.asarray(a1["pts3d"]), np.asarray(b1["pts3d"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2["desc"]), np.asarray(b2["desc"]), atol=1e-5)


def test_fused_forward_matches_two_calls():
    """mast3r_forward_fused must reproduce BOTH single-pair calls it fuses:
    pose preds == mast3r_forward(kf, cur), depth pred == view 1 of
    mast3r_forward(cur, cur) (the reference's two per-frame forwards,
    utils/slam_frontend.py:1448,1455)."""
    from lvdgs_tpu.models.mast3r.model import mast3r_forward_fused

    cfg = TINY
    params = init_params(jax.random.PRNGKey(0), cfg)
    kf = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32, 48))
    cur = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 32, 48))

    pose1, pose2, depth1 = mast3r_forward_fused(params, kf, cur, cfg)
    ref_p1, ref_p2 = mast3r_forward(params, kf, cur, cfg)
    ref_d1, _ = mast3r_forward(params, cur, cur, cfg)

    for k in ("pts3d", "conf", "desc", "desc_conf"):
        np.testing.assert_allclose(
            np.asarray(pose1[k]), np.asarray(ref_p1[k]), atol=2e-5,
            err_msg=f"pose pred1 {k}")
        np.testing.assert_allclose(
            np.asarray(pose2[k]), np.asarray(ref_p2[k]), atol=2e-5,
            err_msg=f"pose pred2 {k}")
        np.testing.assert_allclose(
            np.asarray(depth1[k]), np.asarray(ref_d1[k]), atol=2e-5,
            err_msg=f"depth pred1 {k}")


def test_fused_priors_cache_flow():
    """make_fused_priors: depth_prior(image, last_kf_cam=...) runs the fused
    forward and caches the pose pair; pose_prior consumes the cache (no
    second forward) and composes onto the estimated keyframe pose."""
    from lvdgs_tpu.core.camera import Intrinsics
    from lvdgs_tpu.models.mast3r.inference import (
        MASt3RInference, make_fused_priors)

    cfg = TINY
    model = MASt3RInference(init_params(jax.random.PRNGKey(0), cfg), cfg,
                            size=48)
    calls = {"fused": 0, "pair": 0}
    orig_fused, orig_pair = model.infer_fused, model.infer_pair

    def counting_fused(a, b):
        calls["fused"] += 1
        return orig_fused(a, b)

    def counting_pair(a, b):
        calls["pair"] += 1
        return orig_pair(a, b)

    model.infer_fused = counting_fused
    model.infer_pair = counting_pair

    intr = Intrinsics(40.0, 40.0, 24.0, 16.0, 48, 32)
    depth_prior, pose_prior = make_fused_priors(model, intr)
    assert getattr(depth_prior, "wants_kf", False)

    img = np.random.default_rng(0).random((3, 32, 48), np.float32)

    class FakeCam:
        uid = 7
        image = img
        R = np.eye(3, dtype=np.float32)
        T = np.zeros(3, np.float32)

    class FakeMap:
        def params(self):
            raise AssertionError("PnP path should not render: <6 matches "
                                 "on random descriptors returns identity "
                                 "before rasterize")

    # no keyframe yet: plain get_depth path (one pair forward)
    d0 = depth_prior(img)
    assert d0.shape == (32, 48) and np.isfinite(d0).all()
    assert calls == {"fused": 0, "pair": 1}

    # with a keyframe: fused forward, cache set
    d1 = depth_prior(img, last_kf_cam=FakeCam())
    assert d1.shape == (32, 48) and np.isfinite(d1).all()
    assert calls == {"fused": 1, "pair": 1}
