"""SAM port: shapes, window partition round-trip, rel-pos bias, end-to-end
segmenter call with random weights."""
import jax
import jax.numpy as jnp
import numpy as np

from lvdgs_tpu.models.sam.model import (
    SAMConfig, TINY, init_params, sam_encode_image, sam_predict_masks,
    _window_partition, _window_unpartition,
)


def test_window_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 13, 8)), jnp.float32)
    win = 4
    parts, pads = _window_partition(x, win)
    back = _window_unpartition(parts, win, pads, 2, 10, 13)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_encoder_shapes_tiny():
    cfg = TINY
    params = init_params(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 3, cfg.img_size, cfg.img_size))
    emb = sam_encode_image(params, img, cfg)
    g = cfg.img_size // cfg.patch_size
    assert emb.shape == (1, cfg.embed_dim, g, g)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_mask_decoder_shapes_tiny():
    cfg = TINY
    params = init_params(jax.random.PRNGKey(1), cfg)
    g = cfg.img_size // cfg.patch_size
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.embed_dim, g, g))
    boxes = jnp.asarray([[0.1, 0.1, 0.6, 0.7], [0.2, 0.3, 0.9, 0.8]])
    masks, iou = sam_predict_masks(params, emb, boxes, cfg)
    assert masks.shape == (2, cfg.num_mask_tokens, 4 * g, 4 * g)
    assert iou.shape == (2, cfg.num_mask_tokens)
    assert np.all(np.isfinite(np.asarray(masks)))


def test_segmenter_end_to_end_random_weights():
    from lvdgs_tpu.models.sam.inference import SAMSegmenter

    cfg = TINY
    seg = SAMSegmenter(init_params(jax.random.PRNGKey(3), cfg), cfg)
    rng = np.random.default_rng(4)
    img = (rng.uniform(0, 255, size=(48, 64, 3))).astype(np.uint8)
    boxes = np.array([[5, 5, 30, 40]], np.float32)
    masks = seg(img, boxes)
    assert masks.shape == (1, 48, 64)
    assert masks.dtype == bool
