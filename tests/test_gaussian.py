"""Gaussian map: seeding, allocation, densify/prune, optimizer."""
import jax
import jax.numpy as jnp
import numpy as np

from lvdgs_tpu.core.camera import Camera, Intrinsics
from lvdgs_tpu.gaussian import model as gm

INTR = Intrinsics(fx=60.0, fy=60.0, cx=32.0, cy=24.0, width=64, height=48)


def _camera_with_depth(seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.uniform(0, 1, size=(3, 48, 64)), jnp.float32)
    depth = jnp.asarray(rng.uniform(2.0, 5.0, size=(48, 64)), jnp.float32)
    cam = Camera.create(0, img, INTR, mono_depth=depth)
    return cam, depth


def test_backproject_roundtrip():
    cam, depth = _camera_with_depth()
    pts = gm.backproject(depth, cam.R, cam.T, INTR)
    # reproject
    p_cam = pts @ np.asarray(cam.R).T + np.asarray(cam.T)
    u = INTR.fx * p_cam[..., 0] / p_cam[..., 2] + INTR.cx
    v = INTR.fy * p_cam[..., 1] / p_cam[..., 2] + INTR.cy
    uu, vv = np.meshgrid(np.arange(64), np.arange(48))
    np.testing.assert_allclose(np.asarray(u), uu, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), vv, atol=1e-3)
    np.testing.assert_allclose(np.asarray(p_cam[..., 2]), np.asarray(depth), atol=1e-4)


def test_seed_from_depth_fills_slots():
    cam, depth = _camera_with_depth()
    # zero out some depth -> those pixels must not seed
    depth = depth.at[:10].set(0.0)
    gmap = gm.create_map(4096)
    gmap = gm.seed_from_depth(gmap, cam, depth, INTR, kf_id=0, downsample=4)
    n = int(gmap.num_active)
    # stride 2 -> 24*32 = 768 candidates minus 5 zero rows (~160)
    assert 500 < n <= 768
    assert np.all(np.asarray(gmap.unique_kf_ids)[np.asarray(gmap.active)] == 0)
    # colors decoded back to image values
    cols = np.asarray(gmap.colors)[np.asarray(gmap.active)]
    assert cols.min() >= 0.0 and cols.max() <= 1.0


def test_seed_capacity_overflow():
    cam, depth = _camera_with_depth()
    gmap = gm.create_map(100)  # less capacity than candidates
    gmap = gm.seed_from_depth(gmap, cam, depth, INTR, kf_id=3, downsample=4)
    assert int(gmap.num_active) == 100  # filled, no overflow


def test_prune_and_opacity_reset():
    cam, depth = _camera_with_depth()
    gmap = gm.create_map(2048)
    gmap = gm.seed_from_depth(gmap, cam, depth, INTR, kf_id=0, downsample=16)
    n0 = int(gmap.num_active)
    mask = jnp.arange(2048) < 10
    gmap2 = gm.prune_points(gmap, mask & gmap.active)
    assert int(gmap2.num_active) == n0 - int((mask & gmap.active).sum())

    gmap3 = gm.reset_opacity(gmap)
    op = np.asarray(gmap3.opacities)[np.asarray(gmap3.active)]
    assert np.all(op <= 0.011)


def test_densify_clone_and_split():
    cam, depth = _camera_with_depth()
    gmap = gm.create_map(4096)
    gmap = gm.seed_from_depth(gmap, cam, depth, INTR, kf_id=0, downsample=16)
    n0 = int(gmap.num_active)
    # fake gradient stats above threshold for first 20 active slots
    act_idx = np.nonzero(np.asarray(gmap.active))[0][:20]
    ga = np.zeros(4096, np.float32)
    ga[act_idx] = 1.0
    gmap = gmap.replace(
        grad_accum=jnp.asarray(ga), grad_denom=jnp.asarray((ga > 0).astype(np.float32))
    )
    # small scales -> clones
    gmap2 = gm.densify_and_prune(
        gmap,
        jax.random.PRNGKey(0),
        grad_threshold=0.5,
        min_opacity=0.005,
        extent=1000.0,  # huge extent => everything "small" => clone
        max_screen_size=None,
    )
    assert int(gmap2.num_active) == n0 + 20

    # tiny extent => everything "large" => split (2 children, parent pruned)
    gmap3 = gm.densify_and_prune(
        gmap,
        jax.random.PRNGKey(1),
        grad_threshold=0.5,
        min_opacity=0.005,
        extent=1e-9,
        max_screen_size=None,
    )
    assert int(gmap3.num_active) == n0 + 20  # -20 parents +40 children


def test_adam_step_moves_active_only():
    cam, depth = _camera_with_depth()
    gmap = gm.create_map(512)
    gmap = gm.seed_from_depth(gmap, cam, depth, INTR, kf_id=0, downsample=64)
    opt = gm.MapOptimizer(spatial_scale=2.0)
    state = opt.init(gmap)
    grads = {f: jnp.ones_like(getattr(gmap, f)) for f in gm.PARAM_FIELDS}
    gmap2, state2 = opt.step(gmap, grads, state, jnp.asarray(100))
    moved = np.abs(np.asarray(gmap2.means - gmap.means)).sum(axis=1)
    act = np.asarray(gmap.active)
    assert np.all(moved[act] > 0)
    assert np.all(moved[~act] == 0)


def test_position_lr_schedule():
    lr0 = float(gm.position_lr(jnp.asarray(0), lr_init=0.0016, lr_final=0.00016,
                               lr_delay_mult=0.01, max_steps=30000, spatial_scale=1.0))
    lr_end = float(gm.position_lr(jnp.asarray(30000), lr_init=0.0016, lr_final=0.00016,
                                  lr_delay_mult=0.01, max_steps=30000, spatial_scale=1.0))
    assert abs(lr0 - 0.0016) < 1e-7
    assert abs(lr_end - 0.00016) < 1e-7
