"""Tracking and mapping step tests on a synthetic scene.

Builds a ground-truth Gaussian map, renders GT observations, then checks:
- tracking recovers a perturbed camera pose,
- mapping (initialization mode) fits a freshly seeded map to observations,
- covisibility pruning runs and respects window validity.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lvdgs_tpu.core.camera import Camera, Intrinsics
from lvdgs_tpu.core import lie
from lvdgs_tpu.gaussian import model as gm
from lvdgs_tpu.ops.rasterizer import RenderConfig, rasterize
from lvdgs_tpu.slam import state as slam_state
from lvdgs_tpu.slam.tracking import TrackingConfig, track_camera
from lvdgs_tpu.slam.mapping import MappingConfig, mapping_run, covisibility_prune

INTR = Intrinsics(fx=80.0, fy=80.0, cx=32.0, cy=24.0, width=64, height=48)
CFG = RenderConfig(tile_size=16, max_per_tile=128, gaussian_chunk=16, tile_chunk=16)


def gt_scene(n=400, seed=0):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [rng.normal(size=(n, 2)) * 1.2, rng.uniform(3.0, 7.0, size=(n, 1))], axis=1
    )
    params = {
        "means": jnp.asarray(means, jnp.float32),
        "features_dc": jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        "log_scales": jnp.asarray(rng.uniform(-2.2, -1.4, size=(n, 3)), jnp.float32),
        "quats": jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        "logit_opacities": jnp.asarray(rng.uniform(1.0, 3.0, size=(n,)), jnp.float32),
    }
    return params, jnp.ones((n,), bool)


def render_gt(params, active, R, t):
    out = rasterize(params, active, R, t, INTR, CFG)
    return out


def test_tracking_recovers_pose():
    params, active = gt_scene()
    R0, t0 = jnp.eye(3), jnp.zeros(3)
    gt_out = render_gt(params, active, R0, t0)

    cam = Camera.create(5, gt_out.image, INTR)
    # perturb the pose seed
    tau_pert = jnp.array([0.02, -0.015, 0.03, 0.008, -0.006, 0.01])
    Rp, tp = lie.apply_delta(R0, t0, tau_pert)
    cam = cam.update_RT(Rp, tp)

    tcfg = TrackingConfig(max_iters=60)
    res = track_camera(params, active, cam, INTR, CFG, tcfg)

    err0 = float(jnp.linalg.norm(tp - t0)) + float(jnp.linalg.norm(lie.so3_log(Rp @ R0.T)))
    err1 = float(jnp.linalg.norm(res.T - t0)) + float(
        jnp.linalg.norm(lie.so3_log(res.R @ R0.T))
    )
    assert err1 < 0.35 * err0, f"pose error {err0} -> {err1}"
    assert int(res.iterations) > 3
    assert float(res.median_depth) > 0


def test_tracking_convergence_exit():
    params, active = gt_scene()
    cam = Camera.create(1, render_gt(params, active, jnp.eye(3), jnp.zeros(3)).image, INTR)
    # a generous convergence threshold must trigger the early exit: Adam step
    # norms are bounded by the learning rates (~5.5e-3 for 6 dof)
    tcfg = TrackingConfig(max_iters=100, convergence_eps=2e-2)
    res = track_camera(params, active, cam, INTR, CFG, tcfg)
    assert int(res.iterations) < 100


def _make_kfbuf_and_map(seed=0):
    params, active = gt_scene(seed=seed)
    buf = slam_state.create_keyframe_buffer(8, INTR.height, INTR.width)

    out0 = render_gt(params, active, jnp.eye(3), jnp.zeros(3))
    depth0 = jnp.where(out0.opacity[0] > 0.5, out0.depth[0] / jnp.maximum(out0.opacity[0], 1e-6), 0.0)
    cam0 = Camera.create(0, out0.image, INTR, mono_depth=depth0)
    buf, slot0 = slam_state.add_keyframe(buf, cam0)

    gmap = gm.create_map(4096)
    gmap = gm.seed_from_depth(gmap, cam0, depth0, INTR, kf_id=0, downsample=4)
    return buf, gmap, params, active


def test_mapping_initialization_reduces_loss():
    buf, gmap, gt_params, gt_active = _make_kfbuf_and_map()
    opt = gm.MapOptimizer(spatial_scale=2.0)
    opt_state = opt.init(gmap)
    mcfg = MappingConfig(
        window_size=1,
        n_random=0,
        initialization=True,
        init_gaussian_update=100000,  # no densify in this short test
        init_gaussian_reset=100000,
        densify_from_iter=100000,
    )
    window = jnp.array([0], jnp.int32)

    res = mapping_run(
        gmap,
        opt_state,
        buf,
        window,
        jax.random.PRNGKey(0),
        jnp.zeros((), jnp.int32),
        jnp.asarray(1, jnp.int32),
        intr=INTR,
        rcfg=CFG,
        opt=opt,
        mcfg=mcfg,
    )
    loss_first = float(res.last_loss)

    res2 = mapping_run(
        res.gmap,
        res.opt_state,
        res.kfbuf,
        window,
        jax.random.PRNGKey(1),
        res.iteration_count,
        jnp.asarray(60, jnp.int32),
        intr=INTR,
        rcfg=CFG,
        opt=opt,
        mcfg=mcfg,
    )
    loss_late = float(res2.last_loss)
    assert loss_late < loss_first * 0.8, f"{loss_first} -> {loss_late}"
    assert int(res2.iteration_count) == 61
    # visibility recorded for the single window camera
    assert int(res.occ_visibility[0].sum()) > 0


def test_mapping_window_with_replay_and_pose_refinement():
    params, active = gt_scene(seed=3)
    buf = slam_state.create_keyframe_buffer(8, INTR.height, INTR.width)
    poses = []
    for i, dx in enumerate([0.0, 0.05, 0.1, 0.15]):
        R, t = jnp.eye(3), jnp.array([dx, 0.0, 0.0])
        out = rasterize(params, active, R, t, INTR, CFG)
        depth = jnp.where(out.opacity[0] > 0.5, out.depth[0] / jnp.maximum(out.opacity[0], 1e-6), 0.0)
        cam = Camera.create(i, out.image, INTR, mono_depth=depth).update_RT(R, t)
        buf, _ = slam_state.add_keyframe(buf, cam)
        poses.append((R, t))

    gmap = gm.create_map(4096)
    cam0 = slam_state.camera_from_slot(buf, jnp.asarray(0))
    gmap = gm.seed_from_depth(gmap, cam0, buf.mono_depth[0], INTR, kf_id=0, downsample=4)
    opt = gm.MapOptimizer(spatial_scale=2.0)
    opt_state = opt.init(gmap)

    mcfg = MappingConfig(window_size=4, n_random=2, gaussian_update_every=100000, gaussian_reset=100000)
    # window: newest first (reference convention), slots 3,2,1,0
    window = jnp.array([3, 2, 1, 0], jnp.int32)
    res = mapping_run(
        gmap,
        opt_state,
        buf,
        window,
        jax.random.PRNGKey(0),
        jnp.zeros((), jnp.int32),
        jnp.asarray(10, jnp.int32),
        intr=INTR,
        rcfg=CFG,
        opt=opt,
        mcfg=mcfg,
    )
    assert np.isfinite(float(res.last_loss))
    # frame 0 pose must stay pinned
    np.testing.assert_allclose(np.asarray(res.kfbuf.T[0]), np.zeros(3), atol=1e-7)
    # occ visibility has entries for all four window cams
    assert np.all(np.asarray(res.occ_visibility.sum(axis=1)) > 0)

    # covisibility prune with full window runs
    g2, occ, initialized = covisibility_prune(
        res.gmap,
        res.kfbuf,
        window,
        jnp.asarray(False),
        intr=INTR,
        rcfg=CFG,
        prune_num=1,
        window_size=4,
    )
    assert bool(initialized)
    assert int(g2.num_active) <= int(res.gmap.num_active)

    # from_occ variant: fed the same visibility the render path computes,
    # it must make identical prune decisions
    from lvdgs_tpu.slam.mapping import covisibility_prune_from_occ

    def exact_occ(slot):
        out = rasterize(
            res.gmap.params(), res.gmap.active, res.kfbuf.R[slot],
            res.kfbuf.T[slot], INTR, CFG,
        )
        return out.n_touched > 0

    occ_in = jnp.stack([exact_occ(s) for s in np.asarray(window)])
    g3, occ3, init3 = covisibility_prune_from_occ(
        res.gmap,
        res.kfbuf,
        window,
        occ_in,
        jnp.asarray(False),
        prune_num=1,
        window_size=4,
    )
    assert bool(init3) == bool(initialized)
    np.testing.assert_array_equal(np.asarray(g3.active), np.asarray(g2.active))
    np.testing.assert_array_equal(np.asarray(occ3), np.asarray(occ))


def test_mapping_partial_window_padded():
    buf, gmap, *_ = _make_kfbuf_and_map(seed=5)
    opt = gm.MapOptimizer()
    opt_state = opt.init(gmap)
    mcfg = MappingConfig(window_size=4, n_random=2, gaussian_update_every=100000, gaussian_reset=100000)
    window = jnp.array([0, -1, -1, -1], jnp.int32)  # only one valid
    res = mapping_run(
        gmap,
        opt_state,
        buf,
        window,
        jax.random.PRNGKey(0),
        jnp.zeros((), jnp.int32),
        jnp.asarray(3, jnp.int32),
        intr=INTR,
        rcfg=CFG,
        opt=opt,
        mcfg=mcfg,
    )
    assert np.isfinite(float(res.last_loss))
    # padded slots report no visibility
    assert int(res.occ_visibility[1:].sum()) == 0


def test_mapping_with_saturation_feedback_exact_visibility():
    """Feedback-capped mapping must source occ_visibility from the probe's
    FULL-depth blend (prepare_bins_with_touched), not from the capped
    renders — capped n_touched under-reports and over-prunes (round-2
    regression). With one iteration (map ~unchanged), the probe visibility
    must agree with a dense render's n_touched>0 almost everywhere."""
    import dataclasses

    buf, gmap, *_ = _make_kfbuf_and_map(seed=7)
    opt = gm.MapOptimizer(spatial_scale=2.0)
    opt_state = opt.init(gmap)
    mcfg = MappingConfig(
        window_size=1, n_random=0, up_pose=False,
        gaussian_update_every=100000, gaussian_reset=100000,
    )
    cfg_fb = dataclasses.replace(
        CFG, use_packed=True, slot_budget_per_tile=64, tile_group=4,
        saturation_feedback=True,
    )
    window = jnp.array([0], jnp.int32)
    # dense reference visibility at the pre-run map (gmap is DONATED to
    # mapping_run); the 1-iteration run's probe sees this same map
    dense = rasterize(
        gmap.params(), gmap.active, buf.R[0], buf.T[0], INTR, CFG
    )
    occ_dense = np.asarray(dense.n_touched > 0)

    res = mapping_run(
        gmap, opt_state, buf, window,
        jax.random.PRNGKey(0), jnp.zeros((), jnp.int32),
        jnp.asarray(1, jnp.int32),
        intr=INTR, rcfg=cfg_fb, opt=opt, mcfg=mcfg,
    )
    assert np.isfinite(float(res.last_loss))
    occ_fb = np.asarray(res.occ_visibility[0])
    both = max(occ_dense.sum(), 1)
    agree = (occ_dense == occ_fb).mean()
    assert agree > 0.99, f"visibility agreement {agree} ({occ_fb.sum()} vs {occ_dense.sum()} of {both})"


def test_tracking_with_saturation_feedback_recovers_pose():
    """track_camera with the packed+feedback config (probe-once caps carried
    across rebins, prepare_bins_with_caps) must still recover a perturbed
    pose — exercises the lax.cond probe path end-to-end on CPU."""
    import dataclasses

    params, active = gt_scene()
    R0, t0 = jnp.eye(3), jnp.zeros(3)
    gt_out = render_gt(params, active, R0, t0)

    cam = Camera.create(5, gt_out.image, INTR)
    tau_pert = jnp.array([0.02, -0.015, 0.03, 0.008, -0.006, 0.01])
    Rp, tp = lie.apply_delta(R0, t0, tau_pert)
    cam = cam.update_RT(Rp, tp)

    cfg_fb = dataclasses.replace(
        CFG, use_packed=True, slot_budget_per_tile=96, tile_group=4,
        saturation_feedback=True,
    )
    tcfg = TrackingConfig(max_iters=60, rebin_every=10)
    res = track_camera(params, active, cam, INTR, cfg_fb, tcfg)

    err0 = float(jnp.linalg.norm(tp - t0)) + float(
        jnp.linalg.norm(lie.so3_log(Rp @ R0.T))
    )
    err1 = float(jnp.linalg.norm(res.T - t0)) + float(
        jnp.linalg.norm(lie.so3_log(res.R @ R0.T))
    )
    assert err1 < 0.5 * err0, f"pose error {err0} -> {err1}"


def test_tracking_pyramid_recovers_pose():
    """Coarse-to-fine tracking (track_camera_pyramid): the half-res stage +
    short full-res polish must recover a perturbed pose as well as the
    single-stage tracker."""
    from lvdgs_tpu.slam.tracking import track_camera_pyramid

    params, active = gt_scene()
    R0, t0 = jnp.eye(3), jnp.zeros(3)
    gt_out = render_gt(params, active, R0, t0)

    cam = Camera.create(5, gt_out.image, INTR)
    tau_pert = jnp.array([0.02, -0.015, 0.03, 0.008, -0.006, 0.01])
    Rp, tp = lie.apply_delta(R0, t0, tau_pert)
    cam = cam.update_RT(Rp, tp)

    tcfg = TrackingConfig(max_iters=60, pyramid=True, coarse_iters=40)
    res = track_camera_pyramid(params, active, cam, INTR, CFG, tcfg)

    err0 = float(jnp.linalg.norm(tp - t0)) + float(
        jnp.linalg.norm(lie.so3_log(Rp @ R0.T))
    )
    err1 = float(jnp.linalg.norm(res.T - t0)) + float(
        jnp.linalg.norm(lie.so3_log(res.R @ R0.T))
    )
    assert err1 < 0.35 * err0, f"pose error {err0} -> {err1}"
    assert int(res.iterations) > 3
    assert float(res.median_depth) > 0
    # full-res bookkeeping shapes
    assert res.image.shape == (3, INTR.height, INTR.width)
    assert int((np.asarray(res.n_touched) > 0).sum()) > 0
