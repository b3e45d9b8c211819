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


def test_seed_step_matches_eager():
    """The one-dispatch jitted seeding (gm.seed_step, the SLAM hot path)
    must produce the same map and Adam-state surgery as the eager op path."""
    cam, depth = _camera_with_depth(seed=7)
    depth = depth.at[5:9].set(0.0)
    gmap = gm.create_map(2048)
    opt = gm.MapOptimizer()
    opt_state = opt.init(gmap)

    g_eager, s_eager = gm.seed_from_depth(
        gmap, cam, depth, INTR, kf_id=4, downsample=4, opt_state=opt_state
    )
    g_jit, s_jit = gm.seed_step(
        gmap, cam, depth, jnp.asarray(4, jnp.int32), opt.init(gmap),
        intr=INTR, downsample=4, point_size=0.01, adaptive_pointsize=True,
    )
    for f in gm.PARAM_FIELDS:
        # jit fuses the backprojection math differently -> float-epsilon
        # differences; allocation/masks must be exact
        np.testing.assert_allclose(
            np.asarray(getattr(g_eager, f)), np.asarray(getattr(g_jit, f)),
            atol=1e-5, rtol=1e-6,
        )
    np.testing.assert_array_equal(np.asarray(g_eager.active), np.asarray(g_jit.active))
    np.testing.assert_array_equal(
        np.asarray(g_eager.unique_kf_ids), np.asarray(g_jit.unique_kf_ids)
    )
    for f in gm.PARAM_FIELDS:
        np.testing.assert_array_equal(np.asarray(s_eager.m[f]), np.asarray(s_jit.m[f]))


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


def test_densify_aux_vis_inheritance():
    """aux_vis columns follow clone/split children and zero on prune
    (ADVICE r2: mapping's period-probe visibility must stay valid through
    mid-period densification)."""
    cam, depth = _camera_with_depth()
    gmap = gm.create_map(4096)
    gmap = gm.seed_from_depth(gmap, cam, depth, INTR, kf_id=0, downsample=16)
    act_idx = np.nonzero(np.asarray(gmap.active))[0]
    hot = act_idx[:20]
    ga = np.zeros(4096, np.float32)
    ga[hot] = 1.0
    gmap = gmap.replace(
        grad_accum=jnp.asarray(ga), grad_denom=jnp.asarray((ga > 0).astype(np.float32))
    )
    # visibility snapshot: rows = 2 fake window cams; mark the hot slots
    # visible in cam0, everything active visible in cam1
    vis = np.zeros((2, 4096), bool)
    vis[0, hot] = True
    vis[1, act_idx] = True
    vis = jnp.asarray(vis)

    # clone path: children must inherit the parent's per-cam columns
    g2, vis2 = gm.densify_and_prune(
        gmap,
        jax.random.PRNGKey(0),
        grad_threshold=0.5,
        min_opacity=0.005,
        extent=1000.0,
        max_screen_size=None,
        aux_vis=vis,
    )
    vis2 = np.asarray(vis2)
    act2 = np.asarray(g2.active)
    new_slots = np.nonzero(act2 & ~np.asarray(gmap.active))[0]
    assert len(new_slots) == 20
    assert vis2[0, new_slots].all() and vis2[1, new_slots].all()
    # untouched slots keep their original columns
    assert (vis2[:, act_idx] == np.asarray(vis)[:, act_idx]).all()

    # split path: children inherit, pruned parents zero
    g3, vis3 = gm.densify_and_prune(
        gmap,
        jax.random.PRNGKey(1),
        grad_threshold=0.5,
        min_opacity=0.005,
        extent=1e-9,
        max_screen_size=None,
        aux_vis=vis,
    )
    vis3 = np.asarray(vis3)
    act3 = np.asarray(g3.active)
    children = np.nonzero(act3 & ~np.asarray(gmap.active))[0]
    assert len(children) == 40
    assert vis3[0, children].all() and vis3[1, children].all()
    assert not vis3[:, hot].any()  # split parents pruned -> columns zeroed
    # opacity-pruned slots must zero too
    low_op = gmap.replace(
        logit_opacities=gmap.logit_opacities.at[hot[0]].set(-12.0)
    )
    g4, vis4 = gm.densify_and_prune(
        low_op,
        jax.random.PRNGKey(2),
        grad_threshold=10.0,  # no densify
        min_opacity=0.005,
        extent=1000.0,
        max_screen_size=None,
        aux_vis=vis,
    )
    assert not np.asarray(vis4)[:, hot[0]].any()


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


def test_grow_capacity_preserves_slots_and_optimizer():
    """Growth appends slots: existing indices, params, Adam moments, and
    rendering must be unchanged; new slots inert (inactive, opacity -10)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lvdgs_tpu.gaussian import model as gm

    rng = np.random.default_rng(0)
    g = gm.create_map(128)
    n = 40
    g = g.replace(
        means=g.means.at[:n].set(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)),
        logit_opacities=g.logit_opacities.at[:n].set(1.0),
        active=g.active.at[:n].set(True),
        unique_kf_ids=g.unique_kf_ids.at[:n].set(3),
    )
    opt = gm.MapOptimizer()
    s = opt.init(g)
    s = s.replace(m={**s.m, "means": s.m["means"].at[:n].set(0.5)},
                  count=jnp.asarray(7, jnp.int32))

    g2, s2 = gm.grow_capacity(g, 512, s)
    assert g2.capacity == 512
    assert int(g2.num_active) == n
    np.testing.assert_array_equal(np.asarray(g2.means[:128]), np.asarray(g.means))
    np.testing.assert_array_equal(np.asarray(g2.active[128:]), False)
    assert float(g2.logit_opacities[200]) == -10.0  # inert padding
    assert int(g2.unique_kf_ids[300]) == -1
    np.testing.assert_array_equal(np.asarray(s2.m["means"][:128]), np.asarray(s.m["means"]))
    assert float(jnp.abs(s2.m["means"][128:]).max()) == 0.0
    assert int(s2.count) == 7

    # rendering unchanged: padded slots contribute nothing
    from lvdgs_tpu.core.camera import Intrinsics
    from lvdgs_tpu.ops.rasterizer import RenderConfig, rasterize

    intr = Intrinsics(fx=60.0, fy=60.0, cx=32.0, cy=24.0, width=64, height=48)
    cfg = RenderConfig(tile_size=16, max_per_tile=64, gaussian_chunk=16, tile_chunk=16)
    a = rasterize(g.params(), g.active, jnp.eye(3), jnp.zeros(3) + jnp.array([0, 0, 4.0]), intr, cfg)
    b = rasterize(g2.params(), g2.active, jnp.eye(3), jnp.zeros(3) + jnp.array([0, 0, 4.0]), intr, cfg)
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image), atol=1e-6)
