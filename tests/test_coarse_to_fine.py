"""Coarse-to-fine matching (models/mast3r/coarse_to_fine.py — capability
parity with reference mast3r/utils/coarse_to_fine.py:214)."""
import numpy as np

from lvdgs_tpu.models.mast3r.coarse_to_fine import (
    greedy_cover,
    refine_matches,
    select_crop_pairs,
    window_grid,
)


def test_window_grid_invariants():
    for (H, W) in [(370, 1226), (480, 640), (100, 100), (40, 900)]:
        cells = window_grid(H, W, maxdim=512, overlap=0.5)
        assert len(cells) >= 1
        w = cells[:, 2] - cells[:, 0]
        h = cells[:, 3] - cells[:, 1]
        # 16-aligned uniform window size, fully inside the image
        assert (w % 16 == 0).all() and (h % 16 == 0).all()
        assert (w == w[0]).all() and (h == h[0]).all()
        assert (cells[:, 0] >= 0).all() and (cells[:, 1] >= 0).all()
        assert (cells[:, 2] <= W).all() and (cells[:, 3] <= H).all()
        # coverage: first window starts at 0, last ends at the image edge
        assert cells[:, 0].min() == 0 and cells[:, 1].min() == 0
        assert cells[:, 2].max() == W or w[0] == (W // 16) * 16
        assert cells[:, 3].max() == H or h[0] == (H // 16) * 16


def test_greedy_cover_reaches_target():
    rng = np.random.default_rng(0)
    weights = rng.uniform(0, 1, (12, 200)) * (rng.uniform(size=(12, 200)) > 0.7)
    picked = greedy_cover(weights, coverage=0.9)
    covered = weights[picked].max(axis=0).sum()
    assert covered >= 0.9 * weights.max(axis=0).sum()
    # greedy picks the single best row first
    assert picked[0] == int(weights.sum(axis=1).argmax())
    assert greedy_cover(np.zeros((3, 5))) == []
    assert greedy_cover(weights, coverage=0.9, max_pairs=2).__len__() <= 2


def test_select_crop_pairs_cover_correspondences():
    rng = np.random.default_rng(1)
    H, W = 256, 512
    # two clusters of correspondences, shifted by (+30, +10) in image b
    qa = rng.uniform([10, 10], [120, 120], (40, 2))
    qb = rng.uniform([300, 120], [480, 240], (40, 2))
    p_q = np.concatenate([qa, qb])
    p_b = p_q + np.array([30.0, 10.0])
    p_b = np.clip(p_b, 0, [W - 1, H - 1])
    pairs = select_crop_pairs((H, W), (H, W), p_q, p_b, maxdim=160,
                              overlap=0.5, coverage=0.9)
    assert len(pairs) >= 2  # distinct clusters need distinct windows
    # every pair's query cell holds >= 10 correspondences, and the partner
    # cell holds those correspondences' landing points
    for cq, cb in pairs:
        inside_q = ((cq[0] <= p_q[:, 0]) & (p_q[:, 0] < cq[2])
                    & (cq[1] <= p_q[:, 1]) & (p_q[:, 1] < cq[3]))
        assert inside_q.sum() >= 10
        land = p_b[inside_q]
        frac_in_b = ((cb[0] <= land[:, 0]) & (land[:, 0] < cb[2])
                     & (cb[1] <= land[:, 1]) & (land[:, 1] < cb[3])).mean()
        assert frac_in_b > 0.6, (cq, cb, frac_in_b)


class _CoordModel:
    """MASt3RInference-compatible stub: descriptors are random-Fourier
    features of each pixel's GLOBAL coordinates, which the stub reads out of
    the image's channels (img[0]=x/1000, img[1]=y/1000) — so it works on
    crops without any dataset lookup, like the real net."""

    def __init__(self, dim=24, pool=2, seed=0):
        rng = np.random.default_rng(seed)
        self.F = rng.normal(size=(dim // 2, 2)) * np.logspace(
            -1.0, 0.3, dim // 2
        )[:, None]
        self.pool = pool

    def infer_pair(self, img1, img2):
        def desc(img):
            p = self.pool
            _, H, W = img.shape
            xy = img[:2, : H // p * p, : W // p * p]
            xy = xy.reshape(2, H // p, p, W // p, p).mean(axis=(2, 4))
            ang = np.tensordot(self.F, xy * 1000.0, axes=(1, 0))
            d = np.concatenate([np.sin(ang), np.cos(ang)], axis=0)
            d = d / np.linalg.norm(d, axis=0, keepdims=True)
            return {"desc": d.transpose(1, 2, 0)[None].astype(np.float32)}

        d1, d2 = desc(np.asarray(img1)), desc(np.asarray(img2))
        return d1, d2, d1["desc"].shape[1:3]


def test_refine_matches_end_to_end():
    H, W = 96, 160
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    img = np.stack([u / 1000.0, v / 1000.0, np.zeros_like(u)])
    model = _CoordModel()
    m1, m2 = refine_matches(model, img, img, maxdim=64, overlap=0.5,
                            coverage=0.95, subsample=4)
    assert len(m1) > 20
    # identical images: matches must be (near-)identity at full resolution
    err = np.abs(m1 - m2).max()
    assert err <= 2, err
    assert (m1[:, 0] < W).all() and (m1[:, 1] < H).all()
    assert (m1 >= 0).all() and (m2 >= 0).all()
