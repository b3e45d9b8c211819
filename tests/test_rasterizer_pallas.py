"""Pallas blending kernel vs the XLA scan path: forward and gradients."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvdgs_tpu.core.camera import Intrinsics
from lvdgs_tpu.core import lie
from lvdgs_tpu.ops.rasterizer import RenderConfig, rasterize

INTR = Intrinsics(fx=80.0, fy=80.0, cx=32.0, cy=24.0, width=64, height=48)
CFG_XLA = RenderConfig(tile_size=16, max_per_tile=64, gaussian_chunk=8, tile_chunk=16,
                       use_pallas=False)
CFG_PALLAS = dataclasses.replace(CFG_XLA, use_pallas=True, tile_group=4,
                                 use_packed=False)
# packed (group-CSR) kernels with a non-binding budget: output must be
# bitwise-equal to the dense pallas path (same slots, same order)
CFG_PACKED = dataclasses.replace(CFG_PALLAS, use_packed=True,
                                 slot_budget_per_tile=64)
# a binding budget (waterfill truncation): quality degrades gracefully
CFG_PACKED_TIGHT = dataclasses.replace(CFG_PACKED, slot_budget_per_tile=32)


def make_scene(n=80, seed=0):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [rng.normal(size=(n, 2)) * 1.2, rng.uniform(2.0, 6.0, size=(n, 1))], axis=1
    )
    params = {
        "means": jnp.asarray(means, jnp.float32),
        "features_dc": jnp.asarray(rng.normal(size=(n, 3)) * 0.5, jnp.float32),
        "log_scales": jnp.asarray(rng.uniform(-2.5, -1.0, size=(n, 3)), jnp.float32),
        "quats": jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        "logit_opacities": jnp.asarray(rng.uniform(-1.0, 2.5, size=(n,)), jnp.float32),
    }
    return params, jnp.ones((n,), bool)


@pytest.mark.parametrize("cfg", [CFG_PALLAS, CFG_PACKED])
def test_pallas_forward_matches_xla(cfg):
    params, active = make_scene(100, seed=1)
    a = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_XLA)
    b = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, cfg)
    # early-exit differences only affect pixels already saturated below T_EPS
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image), atol=3e-4)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth), atol=3e-3)
    np.testing.assert_allclose(np.asarray(a.opacity), np.asarray(b.opacity), atol=3e-4)
    nt_a, nt_b = np.asarray(a.n_touched), np.asarray(b.n_touched)
    assert np.mean(nt_a == nt_b) > 0.97


@pytest.mark.parametrize("pcfg", [CFG_PALLAS, CFG_PACKED])
@pytest.mark.parametrize("field", ["means", "log_scales", "logit_opacities", "features_dc"])
def test_pallas_gradients_match_xla(field, pcfg):
    params, active = make_scene(40, seed=2)

    def loss(p, cfg):
        out = rasterize(p, active, jnp.eye(3), jnp.zeros(3), INTR, cfg)
        return ((out.image - 0.3) ** 2).mean() + 0.05 * (out.depth**2).mean() + (
            0.1 * out.opacity.mean()
        )

    ga = jax.grad(lambda p: loss(p, CFG_XLA))(params)[field]
    gb = jax.grad(lambda p: loss(p, pcfg))(params)[field]
    ga, gb = np.asarray(ga), np.asarray(gb)
    denom = np.abs(ga).max() + 1e-8
    np.testing.assert_allclose(gb / denom, ga / denom, atol=2e-3)


def test_pallas_pose_gradient():
    params, active = make_scene(30, seed=3)

    def loss(tau):
        R, t = lie.apply_delta(jnp.eye(3), jnp.zeros(3), tau)
        out = rasterize(params, active, R, t, INTR, CFG_PALLAS)
        return ((out.image - 0.25) ** 2).mean()

    g = np.asarray(jax.grad(loss)(jnp.zeros(6)))
    assert np.all(np.isfinite(g)) and np.linalg.norm(g) > 1e-7

    def loss_xla(tau):
        R, t = lie.apply_delta(jnp.eye(3), jnp.zeros(3), tau)
        out = rasterize(params, active, R, t, INTR, CFG_XLA)
        return ((out.image - 0.25) ** 2).mean()

    g_ref = np.asarray(jax.grad(loss_xla)(jnp.zeros(6)))
    np.testing.assert_allclose(g, g_ref, rtol=2e-2, atol=1e-6)


def test_pallas_nonuniform_tiles():
    # heavy occupancy in one tile, zero in others
    params, active = make_scene(120, seed=4)
    params = dict(params)
    params["means"] = params["means"].at[:, :2].multiply(0.05)  # cluster centrally
    a = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_XLA)
    b = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_PALLAS)
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image), atol=3e-4)


def test_packed_tight_budget_degrades_gracefully():
    """A binding slot budget truncates the deepest tiles' back slots via the
    waterfill cap — output stays finite and close to the exact render."""
    params, active = make_scene(150, seed=5)
    params = dict(params)
    params["means"] = params["means"].at[:, :2].multiply(0.1)  # dense center
    a = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_XLA)
    b = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_PACKED_TIGHT)
    ia, ib = np.asarray(a.image), np.asarray(b.image)
    assert np.all(np.isfinite(ib))
    # truncation only drops occluded back slots; error stays small
    assert np.abs(ia - ib).mean() < 0.02


def test_packed_bins_precomputed_reuse():
    from lvdgs_tpu.ops.rasterizer import prepare_bins

    params, active = make_scene(60, seed=6)
    bins = prepare_bins(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_PACKED,
                        margin=4.0)
    a = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_PACKED)
    b = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_PACKED,
                  bins=bins)
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image), atol=3e-4)


CFG_FEEDBACK = dataclasses.replace(CFG_PACKED, saturation_feedback=True)


def _two_cluster_scene():
    """One tile ROW (= one tile group at TG=4, ntx=4) holds an opaque cluster
    that saturates early; another row holds a translucent cluster needing its
    full depth. A uniform binding budget waterfill-truncates both; feedback
    caps the saturated group and the waterfill hands its chunks to the
    translucent one."""
    rng = np.random.default_rng(11)

    def cluster(n, px0, px1, py0, py1, z, op, scale):
        # positions spread uniformly over a pixel box (a splat "wall", the
        # realistic saturating case — stacked same-position Gaussians never
        # saturate their rims)
        px = rng.uniform(px0, px1, size=n)
        py = rng.uniform(py0, py1, size=n)
        zz = z + rng.uniform(0, 1.0, size=n)
        means = np.stack(
            [
                (px - INTR.cx) / INTR.fx * zz,
                (py - INTR.cy) / INTR.fy * zz,
                zz,
            ],
            axis=1,
        )
        return {
            "means": means,
            "features_dc": rng.normal(size=(n, 3)) * 0.5,
            "log_scales": np.full((n, 3), scale),
            "quats": rng.normal(size=(n, 4)),
            "logit_opacities": np.full((n,), op),
        }
    # walls blanket a full 16x16 tile plus the splat radius so every pixel
    # of the target tile is covered (tile 1 in row 0 / tile 9 in row 2).
    # The opaque row = a dense front wall + 136 fully-occluded fillers
    # behind it (the dead depth saturation feedback should reclaim).
    a_front = cluster(128, 10.0, 38.0, -8.0, 24.0, 4.0, 6.0, -1.9)
    a_back = cluster(136, 10.0, 38.0, -8.0, 24.0, 6.0, 3.5, -1.9)
    b = cluster(100, 10.0, 38.0, 26.0, 54.0, 4.0, -2.6, -2.3)  # translucent
    a = {k: np.concatenate([a_front[k], a_back[k]], 0) for k in a_front}
    params = {
        k: jnp.asarray(np.concatenate([a[k], b[k]], 0), jnp.float32) for k in a
    }
    n_total = params["means"].shape[0]
    return params, jnp.ones((n_total,), bool)


def test_saturation_feedback_identity_when_unsaturated():
    """With nothing saturated the probe must not change the packing: output
    bitwise-equal to the plain packed path."""
    params, active = make_scene(60, seed=6)
    a = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_PACKED)
    b = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_FEEDBACK)
    np.testing.assert_array_equal(np.asarray(a.image), np.asarray(b.image))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))


def test_saturation_feedback_reclaims_dead_depth():
    """The probe must cap the opaque-wall tiles well below their binned
    depth (the 136 fillers behind the wall are dead), leave the translucent
    tiles' allocation intact, and keep the render essentially exact."""
    from lvdgs_tpu.ops.rasterizer import prepare_bins

    params, active = _two_cluster_scene()
    cfg_exact = dataclasses.replace(CFG_XLA, max_per_tile=224, gaussian_chunk=32)
    full = dataclasses.replace(
        CFG_PACKED, max_per_tile=224, slot_budget_per_tile=224
    )
    full_fb = dataclasses.replace(full, saturation_feedback=True)
    bu = prepare_bins(params, active, jnp.eye(3), jnp.zeros(3), INTR, full)
    bf = prepare_bins(params, active, jnp.eye(3), jnp.zeros(3), INTR, full_fb)
    ka_u = np.asarray(bu.kalloc)
    ka_f = np.asarray(bf.kalloc)
    # tile 1 (row 0) holds the wall + dead filler: allocation must shrink
    assert ka_u[1] >= 180, ka_u
    assert ka_f[1] <= ka_u[1] - 64, (ka_u[1], ka_f[1])
    # translucent tile 9 keeps (almost) everything
    assert ka_f[9] >= ka_u[9] - 32, (ka_u[9], ka_f[9])

    exact = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, cfg_exact)
    fb = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, full_fb,
                   bins=bf)
    ie = np.asarray(exact.image)
    err_fb = np.abs(np.asarray(fb.image) - ie).mean()
    assert np.all(np.isfinite(np.asarray(fb.image)))
    assert err_fb < 2e-3, err_fb


def test_pose_lin_matches_autodiff():
    """rasterize_pose_lin must equal the plain packed render in value and in
    tau-gradient (it only restructures the backward contraction)."""
    from lvdgs_tpu.ops.rasterizer import prepare_bins, rasterize_pose_lin

    params, active = make_scene(120, seed=9)
    R0, t0 = jnp.eye(3), jnp.zeros(3)
    bins = prepare_bins(params, active, R0, t0, INTR, CFG_PACKED, margin=4.0)
    gt = rasterize(params, active, R0, t0, INTR, CFG_PACKED).image * 0.8

    def loss_ad(tau):
        R, t = lie.apply_delta(R0, t0, tau)
        out = rasterize(params, active, R, t, INTR, CFG_PACKED, bins=bins,
                        need_n_touched=False)
        return (out.opacity * jnp.abs(out.image - gt)).mean()

    def loss_lin(tau):
        out = rasterize_pose_lin(params, active, R0, t0, tau, INTR,
                                 CFG_PACKED, bins)
        return (out.opacity * jnp.abs(out.image - gt)).mean()

    v_ad, g_ad = jax.value_and_grad(loss_ad)(jnp.zeros(6))
    v_lin, g_lin = jax.value_and_grad(loss_lin)(jnp.zeros(6))
    np.testing.assert_allclose(float(v_lin), float(v_ad), rtol=1e-6)
    ga, gl = np.asarray(g_ad), np.asarray(g_lin)
    denom = np.abs(ga).max() + 1e-12
    np.testing.assert_allclose(gl / denom, ga / denom, atol=5e-4)

    # value parity away from tau=0 too (fields are evaluated at tau exactly)
    tau1 = jnp.array([0.003, -0.002, 0.004, 0.001, -0.001, 0.002])
    v_ad1 = loss_ad(tau1)
    v_lin1 = loss_lin(tau1)
    np.testing.assert_allclose(float(v_lin1), float(v_ad1), rtol=1e-5)


def test_blend_bf16_close_to_f32():
    """bf16 weight math in the packed kernels: forward within bf16 noise of
    f32 (alpha relative error ~2^-8), gradients directionally equal — the
    optimizer-facing quality bar (RenderConfig.blend_bf16)."""
    cfg_bf = dataclasses.replace(CFG_PACKED, blend_bf16=True)
    params, active = make_scene(120, seed=11)

    a = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_PACKED)
    b = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, cfg_bf)
    img_a, img_b = np.asarray(a.image), np.asarray(b.image)
    # ~0.4% relative alpha error compounds through the transmittance chain;
    # bound the pixel error at ~2% absolute and require high PSNR
    assert np.abs(img_a - img_b).max() < 0.02
    mse = np.mean((img_a - img_b) ** 2)
    assert 10 * np.log10(1.0 / max(mse, 1e-12)) > 45.0

    def loss(p, cfg):
        out = rasterize(p, active, jnp.eye(3), jnp.zeros(3), INTR, cfg,
                        need_n_touched=False)
        return (out.opacity * jnp.abs(out.image - 0.4)).mean()

    ga = jax.grad(lambda p: loss(p, CFG_PACKED))(params)
    gb = jax.grad(lambda p: loss(p, cfg_bf))(params)
    for field in ["means", "log_scales", "logit_opacities", "features_dc"]:
        va = np.asarray(ga[field]).ravel()
        vb = np.asarray(gb[field]).ravel()
        cos = np.dot(va, vb) / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12)
        assert cos > 0.999, f"{field}: grad cosine {cos}"


def test_median_depth_kernel_matches_scan():
    """pallas_median_depth (interpret mode) vs the XLA-scan fallback in
    rasterize_median_depth: identical crossing depths on every pixel."""
    from lvdgs_tpu.ops.rasterizer import (
        bin_gaussians, project_gaussians, rasterize_median_depth,
        _tiles_to_image,
    )
    from lvdgs_tpu.ops.rasterizer_pallas import pallas_median_depth

    params, active = make_scene(120, seed=3)
    R, t = jnp.eye(3), jnp.zeros(3)
    # scan fallback (the CPU default inside rasterize_median_depth)
    dmed_scan, opac_scan = rasterize_median_depth(
        params, active, R, t, INTR, CFG_XLA
    )

    ntx, nty = CFG_XLA.grid(INTR)
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"], active, R, t,
        INTR,
    )
    opac = jnp.where(active, jax.nn.sigmoid(params["logit_opacities"]), 0.0)
    tile_idx, slot_valid = bin_gaussians(
        proj["mean2d"], proj["radius"], proj["depth"], proj["valid"],
        ntx=ntx, nty=nty, tile_size=CFG_XLA.tile_size,
        max_per_tile=CFG_XLA.max_per_tile, tile_chunk=CFG_XLA.tile_chunk,
        coarse_factor=CFG_XLA.coarse_factor,
        max_per_coarse=CFG_XLA.max_per_coarse,
        use_approx_topk=CFG_XLA.use_approx_topk,
        approx_recall=CFG_XLA.approx_recall,
    )
    C = proj["mean2d"].shape[0]
    padr = lambda a: jnp.concatenate(  # noqa: E731
        [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0
    )
    fields = jnp.concatenate(
        [padr(proj["mean2d"]), padr(proj["conic"]),
         jnp.zeros((C + 1, 3), jnp.float32),
         padr(proj["depth"][:, None]), padr(opac[:, None])], axis=1,
    )
    tp = fields[jnp.minimum(tile_idx, C).T]
    counts = slot_valid.sum(axis=1).astype(jnp.int32)
    dmed_t, opac_t = pallas_median_depth(
        tp, counts, ntx=ntx, nty=nty, tile_size=CFG_XLA.tile_size,
        tile_group=4, interpret=True,
    )
    dmed_k = _tiles_to_image(dmed_t, ntx, nty, CFG_XLA.tile_size,
                             INTR.height, INTR.width)[None]
    np.testing.assert_allclose(
        np.asarray(dmed_k), np.asarray(dmed_scan), atol=1e-5
    )
    # opacity agrees wherever the march did NOT early-exit (never-crossed
    # pixels); crossed pixels stop at >= 0.5 by design
    crossed = np.asarray(dmed_scan[0]) > 0
    ok = ~crossed
    np.testing.assert_allclose(
        np.asarray(_tiles_to_image(opac_t, ntx, nty, CFG_XLA.tile_size,
                                   INTR.height, INTR.width))[ok],
        np.asarray(opac_scan[0])[ok], atol=1e-5,
    )


def test_median_depth_front_surface_semantics():
    """Two-wall scene: alpha-mean depth lands off the front surface; the
    median depth sits exactly on it (the scale-alignment measurement the
    SLAM loop consumes — see rasterize_median_depth docstring)."""
    from lvdgs_tpu.ops.rasterizer import rasterize_median_depth

    rng = np.random.default_rng(0)

    def wall(z, n, op):
        xs = rng.uniform(-3, 3, n)
        ys = rng.uniform(-2, 2, n)
        return np.stack([xs, ys, np.full(n, z)], 1), np.full(n, op)

    m1, o1 = wall(5.0, 300, 0.6)
    m2, o2 = wall(10.0, 300, 0.95)
    op = np.concatenate([o1, o2])
    params = {
        "means": jnp.asarray(np.concatenate([m1, m2]), jnp.float32),
        "features_dc": jnp.zeros((600, 3), jnp.float32),
        "log_scales": jnp.full((600, 3), np.log(0.3), jnp.float32),
        "quats": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (600, 1)),
        "logit_opacities": jnp.asarray(np.log(op / (1 - op)), jnp.float32),
    }
    active = jnp.ones((600,), bool)
    out = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_XLA)
    md, _ = rasterize_median_depth(
        params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG_XLA
    )
    opac = np.asarray(out.opacity[0])
    mdn = np.asarray(md[0])
    sel = (opac > 0.95) & (mdn > 0)
    assert sel.sum() > 100
    # the median depth sits ON the front surface; the alpha-mean is pulled
    # off it (by (1-opacity) shallow + back-wall deep leakage — magnitude
    # depends on surfel density, direction on which term dominates)
    md_err = abs(np.median(mdn[sel]) - 5.0)
    ad_err = abs(np.median(np.asarray(out.depth[0])[sel]) - 5.0)
    assert md_err < 0.2, md_err
    assert ad_err > md_err + 0.05, (ad_err, md_err)
