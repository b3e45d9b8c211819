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
