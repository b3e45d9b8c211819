"""Rasterizer correctness: forward vs NumPy reference, gradients vs finite
differences, pose gradients through se(3) delta."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvdgs_tpu.core.camera import Intrinsics
from lvdgs_tpu.core import lie
from lvdgs_tpu.ops.rasterizer import RenderConfig, rasterize
from reference_rasterizer import render_np

INTR = Intrinsics(fx=60.0, fy=60.0, cx=32.0, cy=24.0, width=64, height=48)
CFG = RenderConfig(tile_size=16, max_per_tile=64, gaussian_chunk=8, tile_chunk=16)


def make_scene(n=50, seed=0, spread=1.0):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [rng.normal(size=(n, 2)) * spread, rng.uniform(2.0, 6.0, size=(n, 1))], axis=1
    )
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    params = {
        "means": jnp.asarray(means, jnp.float32),
        "features_dc": jnp.asarray(rng.normal(size=(n, 3)) * 0.5, jnp.float32),
        "log_scales": jnp.asarray(rng.uniform(-2.5, -1.0, size=(n, 3)), jnp.float32),
        "quats": jnp.asarray(quats, jnp.float32),
        "logit_opacities": jnp.asarray(rng.uniform(-1.0, 2.0, size=(n,)), jnp.float32),
    }
    active = jnp.ones((n,), bool)
    return params, active


def test_forward_matches_numpy_reference():
    params, active = make_scene(60, seed=1)
    R = jnp.eye(3)
    t = jnp.zeros(3)
    out = rasterize(params, active, R, t, INTR, CFG)
    ref = render_np(params, active, np.eye(3), np.zeros(3), INTR)

    # f32 (jax) vs f64 (reference) flips pixels sitting exactly on the
    # alpha/transmittance thresholds; tolerances account for that.
    np.testing.assert_allclose(np.asarray(out.image), ref["render"], atol=4e-3)
    np.testing.assert_allclose(np.asarray(out.depth), ref["depth"], atol=3e-2)
    np.testing.assert_allclose(np.asarray(out.opacity), ref["opacity"], atol=4e-3)
    np.testing.assert_allclose(np.asarray(out.radii), ref["radii"], atol=1.0)
    np.testing.assert_array_equal(
        np.asarray(out.visibility_filter), ref["visibility_filter"]
    )
    nt, nt_ref = np.asarray(out.n_touched), ref["n_touched"]
    assert np.all(np.abs(nt - nt_ref) <= np.maximum(3, 0.05 * nt_ref))


def test_forward_rotated_camera():
    params, active = make_scene(40, seed=2)
    from scipy.spatial.transform import Rotation

    R = Rotation.from_euler("xyz", [0.1, -0.2, 0.05]).as_matrix().astype(np.float32)
    t = np.array([0.1, -0.05, 0.3], np.float32)
    out = rasterize(params, active, jnp.asarray(R), jnp.asarray(t), INTR, CFG)
    ref = render_np(params, active, R, t, INTR)
    np.testing.assert_allclose(np.asarray(out.image), ref["render"], atol=4e-3)
    nt, nt_ref = np.asarray(out.n_touched), ref["n_touched"]
    assert np.all(np.abs(nt - nt_ref) <= np.maximum(3, 0.05 * nt_ref))


def test_overflow_tile_capacity_safe():
    # more gaussians in one tile than max_per_tile: must not crash, and the
    # front-most ones win
    params, active = make_scene(300, seed=3, spread=0.05)
    cfg = RenderConfig(tile_size=16, max_per_tile=32, gaussian_chunk=8, tile_chunk=16)
    out = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, cfg)
    assert np.all(np.isfinite(np.asarray(out.image)))
    assert float(out.opacity.max()) <= 1.0 + 1e-5


@jax.jit
def _loss_fn(params, active, R, t):
    out = rasterize(params, active, R, t, INTR, CFG)
    target = 0.3
    return ((out.image - target) ** 2).mean() + 0.1 * (out.depth**2).mean()


@pytest.mark.parametrize("field", ["means", "log_scales", "logit_opacities", "features_dc", "quats"])
def test_param_gradients_finite_difference(field):
    params, active = make_scene(12, seed=4)
    R = jnp.eye(3)
    t = jnp.zeros(3)
    g = jax.grad(lambda p: _loss_fn(p, active, R, t))(params)[field]
    g = np.asarray(g, np.float64)

    rng = np.random.default_rng(5)
    # probe a few random coordinates with central differences
    flat_g = g.reshape(-1)
    base = np.asarray(params[field], np.float64).reshape(-1)
    eps = 3e-3
    checked = 0
    for idx in rng.choice(base.size, size=min(8, base.size), replace=False):
        p_plus = {k: v for k, v in params.items()}
        p_minus = {k: v for k, v in params.items()}
        bp = base.copy()
        bp[idx] += eps
        p_plus[field] = jnp.asarray(bp.reshape(g.shape), jnp.float32)
        bm = base.copy()
        bm[idx] -= eps
        p_minus[field] = jnp.asarray(bm.reshape(g.shape), jnp.float32)
        fd = (float(_loss_fn(p_plus, active, R, t)) - float(_loss_fn(p_minus, active, R, t))) / (
            2 * eps
        )
        if abs(fd) < 1e-6 and abs(flat_g[idx]) < 1e-6:
            continue
        np.testing.assert_allclose(flat_g[idx], fd, rtol=0.12, atol=2e-4)
        checked += 1
    assert checked >= 1


def test_pose_gradient_finite_difference():
    params, active = make_scene(15, seed=6)
    R0 = jnp.eye(3)
    t0 = jnp.zeros(3)

    @jax.jit
    def loss(tau):
        R, t = lie.apply_delta(R0, t0, tau)
        return _loss_fn(params, active, R, t)

    tau0 = jnp.zeros(6)
    g = np.asarray(jax.grad(loss)(tau0), np.float64)
    eps = 1e-3
    for i in range(6):
        dp = np.zeros(6)
        dp[i] = eps
        fd = (float(loss(jnp.asarray(dp, jnp.float32))) - float(loss(jnp.asarray(-dp, jnp.float32)))) / (
            2 * eps
        )
        np.testing.assert_allclose(g[i], fd, rtol=0.1, atol=5e-4)
    assert np.linalg.norm(g) > 1e-6  # pose gradients actually flow


def test_vs_offset_gradient_is_screen_space_grad():
    params, active = make_scene(10, seed=7)
    C = params["means"].shape[0]

    def loss(vs):
        out = rasterize(params, active, jnp.eye(3), jnp.zeros(3), INTR, CFG, vs_offset=vs)
        return ((out.image - 0.25) ** 2).mean()

    g = jax.grad(loss)(jnp.zeros((C, 2)))
    assert np.asarray(jnp.abs(g)).sum() > 0.0  # densification signal exists


def test_background_color():
    params, active = make_scene(5, seed=8)
    cfg_w = RenderConfig(tile_size=16, max_per_tile=64, gaussian_chunk=8, white_background=True)
    out = rasterize(params, active, jnp.eye(3), jnp.array([0.0, 0.0, -100.0]), INTR, cfg_w)
    # gaussians pushed behind the camera -> pure background
    np.testing.assert_allclose(np.asarray(out.image), 1.0, atol=1e-6)


def test_degenerate_covariance_gradients_stay_finite():
    """r4 regression: a denormal-determinant 2D covariance (extremely
    anisotropic gaussian viewed edge-on) used to pass the det>0 cull and
    overflow the conic/backward 1/det^2 chain — one such gaussian NaN'd
    the whole map through a single Adam step. The projection now culls
    det <= 1e-6; gradients through a scene seeded with degenerate members
    must stay finite for every parameter."""
    import jax

    rng = np.random.default_rng(7)
    n = 64
    means = np.concatenate(
        [rng.normal(size=(n, 2)) * 1.0, rng.uniform(2.0, 5.0, size=(n, 1))],
        axis=1,
    ).astype(np.float32)
    log_scales = rng.uniform(-2.5, -1.0, size=(n, 3)).astype(np.float32)
    # a handful of degenerate members: two axes collapsed to ~0 scale
    log_scales[:8, 1:] = -18.0
    params = {
        "means": jnp.asarray(means),
        "features_dc": jnp.asarray(rng.normal(size=(n, 3)) * 0.5, jnp.float32),
        "log_scales": jnp.asarray(log_scales),
        "quats": jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        "logit_opacities": jnp.asarray(
            rng.uniform(0.0, 3.0, size=(n,)), jnp.float32
        ),
    }
    active = jnp.ones((n,), bool)
    intr = Intrinsics(fx=80.0, fy=80.0, cx=32.0, cy=24.0, width=64, height=48)
    cfg = RenderConfig(tile_size=16, max_per_tile=64, gaussian_chunk=8,
                       tile_chunk=16)

    def loss(p):
        out = rasterize(p, active, jnp.eye(3), jnp.zeros(3), intr, cfg)
        return jnp.abs(out.image).mean() + jnp.abs(out.depth).mean()

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), f"non-finite grad in {k}"
