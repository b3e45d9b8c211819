"""Hierarchical binning must match exact single-level binning when no
truncation occurs."""
import jax
import jax.numpy as jnp
import numpy as np

from lvdgs_tpu.core.camera import Intrinsics
from lvdgs_tpu.ops.rasterizer import RenderConfig, bin_gaussians, project_gaussians, rasterize

INTR = Intrinsics(fx=200.0, fy=200.0, cx=160.0, cy=120.0, width=320, height=240)


def _scene(n=6000, seed=0):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [rng.normal(size=(n, 2)) * 2.0, rng.uniform(2.0, 10.0, size=(n, 1))], axis=1
    )
    params = {
        "means": jnp.asarray(means, jnp.float32),
        "features_dc": jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        "log_scales": jnp.asarray(rng.uniform(-3.0, -1.8, size=(n, 3)), jnp.float32),
        "quats": jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        "logit_opacities": jnp.asarray(rng.uniform(0.0, 2.0, size=(n,)), jnp.float32),
    }
    return params, jnp.ones((n,), bool)


def test_hierarchical_matches_exact():
    params, active = _scene()
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"], active,
        jnp.eye(3), jnp.zeros(3), INTR,
    )
    ntx, nty = 20, 15
    kw = dict(ntx=ntx, nty=nty, tile_size=16, max_per_tile=256, tile_chunk=64)
    exact_idx, exact_valid = bin_gaussians(
        proj["mean2d"], proj["radius"], proj["depth"], proj["valid"],
        max_per_coarse=10**9, **kw,  # force single-level
    )
    hier_idx, hier_valid = bin_gaussians(
        proj["mean2d"], proj["radius"], proj["depth"], proj["valid"],
        coarse_factor=4, max_per_coarse=2048, **kw,
    )
    np.testing.assert_array_equal(np.asarray(exact_valid), np.asarray(hier_valid))
    np.testing.assert_array_equal(np.asarray(exact_idx), np.asarray(hier_idx))


def test_hierarchical_render_matches():
    params, active = _scene(4000, seed=1)
    cfg_exact = RenderConfig(tile_size=16, max_per_tile=256, gaussian_chunk=32,
                             tile_chunk=64, max_per_coarse=10**9)
    cfg_hier = RenderConfig(tile_size=16, max_per_tile=256, gaussian_chunk=32,
                            tile_chunk=64, coarse_factor=4, max_per_coarse=1024)
    a = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, cfg_exact)
    b = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, cfg_hier)
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.n_touched), np.asarray(b.n_touched))


def _assert_margin_invariants(kw, hier_kw=None):
    """Margin binning invariants on saturated tiles: (1) every slot a
    zero-margin binning selects is kept (no eviction by margin-only
    candidates); (2) slot lists stay depth-sorted."""
    params, active = _scene(6000, seed=3)
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"], active,
        jnp.eye(3), jnp.zeros(3), INTR,
    )
    extra = hier_kw or {}
    base_idx, base_valid = bin_gaussians(
        proj["mean2d"], proj["radius"], proj["depth"], proj["valid"], 0.0,
        **kw, **extra,
    )
    m_idx, m_valid = bin_gaussians(
        proj["mean2d"], proj["radius"], proj["depth"], proj["valid"], 24.0,
        **kw, **extra,
    )
    C = proj["mean2d"].shape[0]
    depth = np.concatenate([np.asarray(proj["depth"]), [np.inf]])
    base_idx = np.asarray(base_idx)
    base_valid = np.asarray(base_valid)
    m_idx = np.asarray(m_idx)
    m_valid = np.asarray(m_valid)
    assert base_valid.sum(1).max() == kw["max_per_tile"], "test needs saturation"
    for t in range(base_idx.shape[0]):
        real = set(base_idx[t][base_valid[t]].tolist())
        got = set(m_idx[t][m_valid[t]].tolist())
        assert real <= got, f"tile {t}: margin evicted {real - got}"
        d = depth[m_idx[t][m_valid[t]]]
        assert np.all(np.diff(d) >= 0), f"tile {t}: slots not depth-sorted"


def test_margin_no_eviction_single_level():
    _assert_margin_invariants(
        dict(ntx=20, nty=15, tile_size=16, max_per_tile=64, tile_chunk=64),
        dict(max_per_coarse=10**9),
    )


def test_margin_no_eviction_hierarchical():
    _assert_margin_invariants(
        dict(ntx=20, nty=15, tile_size=16, max_per_tile=64, tile_chunk=64),
        dict(coarse_factor=4, max_per_coarse=4096),
    )


def test_bin_bucket_exact_when_not_binding():
    """Active-prefix bucket binning (RenderConfig.bin_bucket) is bitwise
    identical to full-capacity binning while n_valid <= bucket: the depth
    sort packs every valid candidate into the prefix, so the slice drops
    only invalid slots."""
    params, active = _scene(6000, seed=2)
    # half the slots inactive, scattered (fragmented free list)
    act = np.ones(6000, bool)
    act[::3] = False
    active = jnp.asarray(act)
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"], active,
        jnp.eye(3), jnp.zeros(3), INTR,
    )
    kw = dict(ntx=20, nty=15, tile_size=16, max_per_tile=256, tile_chunk=64,
              coarse_factor=4, max_per_coarse=1024)
    full_idx, full_valid = bin_gaussians(
        proj["mean2d"], proj["radius"], proj["depth"], proj["valid"], 2.0, **kw
    )
    n_valid = int(np.asarray(proj["valid"]).sum())
    bucket = -(-n_valid // 512) * 512  # smallest 512-multiple covering valid
    assert bucket < 6000
    b_idx, b_valid = bin_gaussians(
        proj["mean2d"], proj["radius"], proj["depth"], proj["valid"], 2.0,
        bin_bucket=bucket, **kw
    )
    np.testing.assert_array_equal(np.asarray(full_valid), np.asarray(b_valid))
    np.testing.assert_array_equal(np.asarray(full_idx), np.asarray(b_idx))


def test_bin_bucket_binding_drops_farthest_only():
    """When the bucket binds, the selection equals binning the NEAREST
    `bucket` valid Gaussians (farthest-only degradation)."""
    params, active = _scene(4000, seed=3)
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"], active,
        jnp.eye(3), jnp.zeros(3), INTR,
    )
    kw = dict(ntx=20, nty=15, tile_size=16, max_per_tile=256, tile_chunk=64,
              coarse_factor=4, max_per_coarse=1024)
    bucket = 2048
    b_idx, b_valid = bin_gaussians(
        proj["mean2d"], proj["radius"], proj["depth"], proj["valid"], 0.0,
        bin_bucket=bucket, **kw
    )
    # emulate: invalidate all but the nearest `bucket` valid gaussians
    depth = np.asarray(proj["depth"])
    valid = np.asarray(proj["valid"])
    order = np.argsort(np.where(valid, depth, np.inf), kind="stable")
    keep = np.zeros(4000, bool)
    keep[order[:bucket]] = True
    ref_idx, ref_valid = bin_gaussians(
        proj["mean2d"], proj["radius"], proj["depth"],
        jnp.asarray(valid & keep), 0.0, **kw
    )
    np.testing.assert_array_equal(np.asarray(ref_valid), np.asarray(b_valid))
    np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(b_idx))
