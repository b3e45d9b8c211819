"""MASt3R cloud-opt suite: triangulation, TSDF refinement, sparse GA.

Functional tests on synthetic geometry with known ground truth (reference
mast3r/cloud_opt/ has no tests; SURVEY.md §4 strategy: closed-form
geometry checks + convergence trends)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvdgs_tpu.models.mast3r.cloud_opt import (
    SparseGAConfig,
    batched_triangulate,
    compute_min_spanning_tree,
    matches_to_depths,
    sparse_global_alignment,
    tsdf_refine_depths,
)


def _lookat_cams(n, radius=4.0):
    """n cameras on a circle looking at the origin. Returns (c2w (n,4,4))."""
    cams = []
    for k in range(n):
        ang = 0.35 * k
        center = np.array([radius * np.sin(ang), 0.3 * k, -radius * np.cos(ang)])
        fwd = -center / np.linalg.norm(center)
        right = np.cross([0, 1, 0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([right, up, fwd], axis=1)
        c2w[:3, 3] = center
        cams.append(c2w)
    return np.stack(cams)


def _project_np(pts, w2c, K):
    pc = pts @ w2c[:3, :3].T + w2c[:3, 3]
    xy = pc[:, :2] / pc[:, 2:3]
    return xy * np.diag(K)[:2] + K[:2, 2], pc[:, 2]


def test_batched_triangulate_recovers_points():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3)) * 0.5
    c2w = _lookat_cams(3)
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    pts2d, projs = [], []
    for c in c2w:
        w2c = np.linalg.inv(c)
        xy, _ = _project_np(pts, w2c, K)
        pts2d.append(xy)
        projs.append(K @ w2c[:3])
    out = batched_triangulate(
        jnp.asarray(np.stack(pts2d)[None], jnp.float32),
        jnp.asarray(np.stack(projs)[None], jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(out[0]), pts, atol=1e-2)


def test_matches_to_depths_aggregates():
    rng = np.random.default_rng(1)
    H, W = 8, 10
    c2w = _lookat_cams(3)
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]])
    # a plane of points in front of cam0 at depth ~4
    w2c0 = np.linalg.inv(c2w[0])
    ys, xs = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
    d0 = 4.0 + 0.1 * rng.random((H, W))
    pc = np.stack([(xs - K[0, 2]) / K[0, 0] * d0, (ys - K[1, 2]) / K[1, 1] * d0, d0], -1)
    pw = pc.reshape(-1, 3) @ c2w[0][:3, :3].T + c2w[0][:3, 3]
    matches = []
    for c in c2w[1:]:
        xy2, _ = _project_np(pw, np.linalg.inv(c), K)
        xy1 = np.stack([xs, ys], -1).reshape(-1, 2)
        m = np.concatenate([xy1, xy2, np.ones((H * W, 1))], -1)
        matches.append(m.reshape(H, W, 5))
    extr = np.stack([np.linalg.inv(c)[:3] for c in c2w])
    intr = np.stack([K] * 3)
    _, depths, confs = matches_to_depths(
        jnp.asarray(intr[None], jnp.float32),
        jnp.asarray(extr[None], jnp.float32),
        jnp.asarray(np.stack(matches)[None], jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(depths[0]), d0, atol=0.02)


def test_tsdf_refine_pulls_depth_to_surface():
    """Perturbed depth of one view must move toward the consensus of the
    other (clean) views."""
    rng = np.random.default_rng(2)
    H, W = 16, 16
    c2w = _lookat_cams(4, radius=3.0)
    f, pp = 40.0, np.array([W / 2, H / 2])
    # GT: a sphere of radius 1 at origin -> render exact depths per view
    def render_depth(c):
        ys, xs = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
        rays = np.stack([(xs - pp[0]) / f, (ys - pp[1]) / f, np.ones((H, W))], -1)
        rays_w = rays @ c[:3, :3].T
        o = c[:3, 3]
        # solve |o + t r|^2 = 1
        a = (rays_w**2).sum(-1)
        b = 2 * (rays_w * o).sum(-1)
        cc = (o**2).sum() - 1.0
        disc = b * b - 4 * a * cc
        t = (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a)
        hit = disc > 0
        z = t * rays[..., 2] * np.linalg.norm(rays_w, axis=-1) / np.linalg.norm(
            rays, axis=-1
        )
        return np.where(hit, t, 2.5), hit  # ray length as proxy depth

    # use ray-length depth consistently (pinhole z = t * rz with |r| ...)
    depths, hits = zip(*[render_depth(c) for c in c2w])
    depths = np.stack(depths).astype(np.float32)
    # depth here = distance along unit-z ray; convert: rays had z=1 so
    # camera depth equals t / |ray| * ... keep simple: treat as depth.
    confs = np.where(np.stack(hits), 3.0, 0.0).astype(np.float32)

    noisy = depths.copy()
    noise = (rng.random((H, W)).astype(np.float32) - 0.5) * 0.2
    noisy[0] = depths[0] + noise * hits[0]

    refined = tsdf_refine_depths(
        jnp.asarray(noisy),
        jnp.asarray(confs),
        jnp.asarray(c2w.astype(np.float32)),
        jnp.full((4,), f, jnp.float32),
        jnp.asarray(np.tile(pp, (4, 1)), jnp.float32),
        jax.random.PRNGKey(0),
        thresh=0.15,
        nsamples=64,
    )
    err_before = np.abs(noisy[0] - depths[0])[hits[0]].mean()
    err_after = np.abs(np.asarray(refined[0]) - depths[0])[hits[0]].mean()
    assert err_after < err_before * 0.8, (err_before, err_after)


def test_mst():
    scores = np.array(
        [[0, 5, 1, 0], [5, 0, 4, 0.5], [1, 4, 0, 3], [0, 0.5, 3, 0]]
    )
    root, edges = compute_min_spanning_tree(scores)
    # max spanning tree edges: (0,1), (1,2), (2,3) - a chain
    es = {tuple(sorted(e)) for e in edges}
    assert es == {(0, 1), (1, 2), (2, 3)}
    assert root in (1, 2)  # farthest from leaves on the chain
    assert len(edges) == 3


def test_sparse_ga_recovers_geometry():
    """4 views of a synthetic surface; exact correspondences on the anchor
    grid; optimizer must reduce pairwise 3D error by >5x and reproduce
    relative camera directions."""
    rng = np.random.default_rng(3)
    subsample = 8
    hs, ws = 6, 8
    W, H = ws * subsample, hs * subsample
    f = 70.0
    pp = np.array([W / 2, H / 2])
    c2w = _lookat_cams(4, radius=3.5)

    # GT world surface: bumpy plane z=0 sphere-ish in front of all cams
    def depth_of(c):
        ys, xs = np.meshgrid(
            np.arange(hs) * subsample + subsample / 2,
            np.arange(ws) * subsample + subsample / 2,
            indexing="ij",
        )
        rays = np.stack([(xs - pp[0]) / f, (ys - pp[1]) / f, np.ones((hs, ws))], -1)
        rays_w = rays @ c[:3, :3].T
        o = c[:3, 3]
        # intersect with sphere radius 1.2 at origin
        a = (rays_w**2).sum(-1)
        b = 2 * (rays_w * o).sum(-1)
        cc = (o**2).sum() - 1.2**2
        disc = np.maximum(b * b - 4 * a * cc, 0.01)
        t = (-b - np.sqrt(disc)) / (2 * a)
        return t, rays_w, o

    anchors_w = []
    depths = []
    for c in c2w:
        t, rays_w, o = depth_of(c)
        anchors_w.append(o + rays_w * t[..., None])
        depths.append(t)  # depth along the (unit-z-in-camera) ray ~ camera z
    anchors_w = [a.reshape(-1, 3) for a in anchors_w]

    # correspondences: project anchor points of img i into img j and keep
    # in-bounds matches (conf 2.0)
    pair_matches = []
    ys, xs = np.meshgrid(
        np.arange(hs) * subsample + subsample / 2,
        np.arange(ws) * subsample + subsample / 2,
        indexing="ij",
    )
    K = np.array([[f, 0, pp[0]], [0, f, pp[1]], [0, 0, 1]])
    for i in range(4):
        for j in range(i + 1, 4):
            xyj, zj = _project_np(anchors_w[i], np.linalg.inv(c2w[j]), K)
            ok = (zj > 0.5) & (xyj[:, 0] > 0) & (xyj[:, 0] < W) & (xyj[:, 1] > 0) & (xyj[:, 1] < H)
            xy1 = np.stack([xs, ys], -1).reshape(-1, 2)[ok]
            pair_matches.append((i, j, xy1, xyj[ok], np.full(ok.sum(), 2.0)))

    cfg = SparseGAConfig(niter1=300, niter2=100)
    res = sparse_global_alignment(
        imsizes=np.tile([[W, H]], (4, 1)),
        base_focals=np.full(4, f * 1.15),  # wrong focal init
        pps=np.tile(pp, (4, 1)),
        canonical_depths=[d * (1.0 + 0.15 * rng.standard_normal()) for d in depths],
        pair_matches=pair_matches,
        subsample=subsample,
        cfg=cfg,
    )
    assert np.isfinite(float(res.loss1)) and np.isfinite(float(res.loss2))

    # relative camera geometry up to similarity: Umeyama-align estimated
    # camera centers to GT and check residual against the scene scale.
    # (Anchor-level match error carries an irreducible floor from snapping
    # match pixels of image j to the anchor grid near the sphere silhouette,
    # so camera geometry is the meaningful convergence criterion.)
    c_gt = c2w[:, :3, 3]
    c_est = np.asarray(res.cam2w)[:, :3, 3]
    mu_g, mu_e = c_gt.mean(0), c_est.mean(0)
    g0, e0 = c_gt - mu_g, c_est - mu_e
    U, D, Vt = np.linalg.svd(e0.T @ g0)
    Smat = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R = U @ Smat @ Vt
    s = (D * np.diag(Smat)).sum() / max((e0**2).sum(), 1e-12)
    resid = np.linalg.norm(s * e0 @ R - g0, axis=-1)
    scene_scale = np.linalg.norm(g0, axis=-1).mean()
    assert resid.max() / scene_scale < 0.25, (resid, scene_scale)

    # normalized pairwise camera distances must match GT
    d_gt = np.linalg.norm(c_gt[:, None] - c_gt[None], axis=-1)
    d_est = np.linalg.norm(c_est[:, None] - c_est[None], axis=-1)
    d_gt /= d_gt.max()
    d_est /= max(d_est.max(), 1e-9)
    assert np.abs(d_gt - d_est).max() < 0.2
