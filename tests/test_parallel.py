"""Multi-device sharded mapping step on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices"),
]


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_step_matches_single_device():
    """The 4x2 sharded mapping step must match a single-device step."""
    from lvdgs_tpu.parallel.mesh import make_mesh
    from lvdgs_tpu.parallel.dp_mapping import make_sharded_mapping_step
    from lvdgs_tpu.gaussian.model import PARAM_FIELDS
    import __graft_entry__ as ge

    params, active, intr, rcfg = ge._tiny_scene(n=256, h=32, w=32)
    m = {f: jnp.zeros_like(params[f]) for f in PARAM_FIELDS}
    v = {f: jnp.zeros_like(params[f]) for f in PARAM_FIELDS}
    count = jnp.zeros((), jnp.int32)
    rng = np.random.default_rng(0)
    B = 4
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, size=(B, 3, 32, 32)), jnp.float32),
        "mono_depths": jnp.asarray(rng.uniform(2, 6, size=(B, 32, 32)), jnp.float32),
        "Rs": jnp.tile(jnp.eye(3)[None], (B, 1, 1)),
        "Ts": jnp.zeros((B, 3)),
        "taus": jnp.zeros((B, 6)),
    }

    results = {}
    for name, (nd, ng) in {"multi": (4, 2), "single": (1, 1)}.items():
        mesh = make_mesh(n_data=nd, n_gauss=ng, devices=jax.devices()[: nd * ng])
        step, shard_fn = make_sharded_mapping_step(mesh, intr, rcfg)
        p, a, mm, vv, cb = shard_fn(params, active, m, v, batch)
        out = step(p, a, mm, vv, count, cb["images"], cb["mono_depths"], cb["Rs"],
                   cb["Ts"], cb["taus"])
        results[name] = out

    # Adam with eps=1e-15 at step 1 is a sign(g)-sized update, so reduction
    # -order noise on near-zero grads flips a handful of entries by ~lr;
    # compare losses tightly and params to within one update magnitude.
    np.testing.assert_allclose(
        float(results["multi"][4]), float(results["single"][4]), rtol=1e-5
    )
    for f in PARAM_FIELDS:
        a = np.asarray(results["multi"][0][f])
        b = np.asarray(results["single"][0][f])
        np.testing.assert_allclose(a, b, atol=6e-3, err_msg=f)
        frac_equal = np.mean(np.abs(a - b) < 1e-6)
        assert frac_equal > 0.95, f"{f}: only {frac_equal:.2%} bitwise-close"


def test_camera_dp_mapping_run_matches_single():
    """mapping_run with a "data" mesh (camera-DP shard_map gradients) must
    match the single-chip unrolled path on the same inputs."""
    from jax.sharding import Mesh
    from lvdgs_tpu.core.camera import Intrinsics
    from lvdgs_tpu.gaussian import model as gm
    from lvdgs_tpu.ops.rasterizer import RenderConfig
    from lvdgs_tpu.slam import state as slam_state
    from lvdgs_tpu.slam.mapping import MappingConfig, mapping_run
    from lvdgs_tpu.slam.state import KeyframeBuffer

    H, W = 32, 32
    intr = Intrinsics(fx=40.0, fy=40.0, cx=16.0, cy=12.0, width=W, height=H)
    rcfg = RenderConfig(tile_size=16, max_per_tile=64, gaussian_chunk=8,
                        tile_chunk=16, use_pallas=False)
    rng = np.random.default_rng(3)
    C = 256
    gmap = gm.create_map(C)
    n = 128
    means = np.concatenate(
        [rng.normal(size=(n, 2)) * 1.0, rng.uniform(2.0, 6.0, size=(n, 1))], 1
    )
    gmap = gmap.replace(
        means=gmap.means.at[:n].set(jnp.asarray(means, jnp.float32)),
        features_dc=gmap.features_dc.at[:n].set(
            jnp.asarray(rng.normal(size=(n, 3)) * 0.3, jnp.float32)),
        log_scales=gmap.log_scales.at[:n].set(
            jnp.asarray(rng.uniform(-2.5, -1.5, size=(n, 3)), jnp.float32)),
        quats=gmap.quats.at[:n].set(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)),
        logit_opacities=gmap.logit_opacities.at[:n].set(
            jnp.asarray(rng.uniform(0.0, 2.0, size=(n,)), jnp.float32)),
        active=gmap.active.at[:n].set(True),
    )
    opt = gm.MapOptimizer()
    opt_state = opt.init(gmap)

    kfbuf = slam_state.create_keyframe_buffer(8, H, W)
    from lvdgs_tpu.core.camera import Camera
    for i in range(3):
        img = jnp.asarray(rng.uniform(0, 1, size=(3, H, W)), jnp.float32)
        cam = Camera.create(i, img, intr, mono_depth=jnp.asarray(
            rng.uniform(2, 6, size=(H, W)), jnp.float32,
        )).update_RT(jnp.eye(3), jnp.asarray([0.02 * i, 0.0, 0.0], jnp.float32))
        kfbuf, _ = slam_state.add_keyframe(kfbuf, cam)

    window = jnp.asarray([0, 1, 2, -1], jnp.int32)
    mcfg = MappingConfig(window_size=4, n_random=1, up_pose=True,
                         gaussian_update_every=10**6, gaussian_reset=10**6,
                         rebin_every=2)
    key = jax.random.PRNGKey(0)

    def run(mesh):
        g = jax.tree.map(lambda a: a.copy(), gmap)
        s = jax.tree.map(lambda a: a.copy(), opt_state)
        return mapping_run(
            g, s, kfbuf, window, key, jnp.zeros((), jnp.int32),
            jnp.asarray(4, jnp.int32), 0,
            intr=intr, rcfg=rcfg, opt=opt, mcfg=mcfg, mesh=mesh,
        )

    ref = run(None)
    mesh = Mesh(np.array(jax.devices()[:5]), ("data",))
    out = run(mesh)

    np.testing.assert_allclose(float(out.last_loss), float(ref.last_loss), rtol=1e-5)
    for f in gm.PARAM_FIELDS:
        a = np.asarray(getattr(out.gmap, f))
        b = np.asarray(getattr(ref.gmap, f))
        np.testing.assert_allclose(a, b, atol=5e-3, err_msg=f)
    np.testing.assert_allclose(
        np.asarray(out.kfbuf.R), np.asarray(ref.kfbuf.R), atol=1e-5
    )


def test_tile_sharded_tracking_matches_single():
    """track_camera_sharded (tile rows over the mesh, psum'd pose grads)
    must converge to the same pose as the single-chip tracker."""
    from jax.sharding import Mesh
    from lvdgs_tpu.core import lie
    from lvdgs_tpu.core.camera import Camera, Intrinsics
    from lvdgs_tpu.ops.rasterizer import RenderConfig, rasterize
    from lvdgs_tpu.slam.tracking import (
        TrackingConfig, track_camera, track_camera_sharded,
    )

    intr = Intrinsics(fx=80.0, fy=80.0, cx=32.0, cy=24.0, width=64, height=48)
    rcfg = RenderConfig(tile_size=16, max_per_tile=64, gaussian_chunk=8,
                        tile_chunk=16, tile_group=4, use_packed=True,
                        slot_budget_per_tile=64)
    rng = np.random.default_rng(7)
    n = 120
    means = np.concatenate(
        [rng.normal(size=(n, 2)) * 1.2, rng.uniform(2.0, 6.0, size=(n, 1))], 1
    )
    params = {
        "means": jnp.asarray(means, jnp.float32),
        "features_dc": jnp.asarray(rng.normal(size=(n, 3)) * 0.5, jnp.float32),
        "log_scales": jnp.asarray(rng.uniform(-2.5, -1.0, size=(n, 3)), jnp.float32),
        "quats": jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        "logit_opacities": jnp.asarray(rng.uniform(0.0, 2.5, size=(n,)), jnp.float32),
    }
    active = jnp.ones((n,), bool)

    gt = rasterize(params, active, jnp.eye(3), jnp.zeros(3), intr, rcfg)
    tau = jnp.asarray([0.02, -0.015, 0.01, 0.004, -0.003, 0.002], jnp.float32)
    Rp, Tp = lie.apply_delta(jnp.eye(3), jnp.zeros(3), tau)
    cam = Camera.create(0, gt.image, intr).update_RT(Rp, Tp)

    # lin_period off: the single-chip tracker's period-linearized rendering
    # is a (validated) approximation the sharded path doesn't use — this
    # test isolates SHARDING equivalence, so both sides render exactly
    tcfg = TrackingConfig(max_iters=30, rebin_every=5, lin_period=False)
    ref = track_camera(params, active, cam, intr, rcfg, tcfg)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    out = track_camera_sharded(params, active, cam, intr, rcfg, tcfg, mesh=mesh)

    np.testing.assert_allclose(np.asarray(out.R), np.asarray(ref.R), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.T), np.asarray(ref.T), atol=5e-4)
    np.testing.assert_allclose(float(out.loss), float(ref.loss), rtol=5e-3)
    np.testing.assert_allclose(
        np.asarray(out.image), np.asarray(ref.image), atol=1e-3
    )
    assert int((np.asarray(out.n_touched) > 0).sum()) > 0


def test_camera_dp_mapping_with_masker_matches_single():
    """Masked-loss mapping composes with camera-DP (the round-1 exclusivity
    is lifted): with static masks on every window keyframe, the sharded
    path's traced window/replay flag must reproduce the single-chip static
    switch exactly."""
    from jax.sharding import Mesh
    from lvdgs_tpu.core.camera import Camera, Intrinsics
    from lvdgs_tpu.gaussian import model as gm
    from lvdgs_tpu.ops.rasterizer import RenderConfig
    from lvdgs_tpu.slam import state as slam_state
    from lvdgs_tpu.slam.mapping import MappingConfig, mapping_run

    H, W = 32, 32
    intr = Intrinsics(fx=40.0, fy=40.0, cx=16.0, cy=12.0, width=W, height=H)
    rcfg = RenderConfig(tile_size=16, max_per_tile=64, gaussian_chunk=8,
                        tile_chunk=16, use_pallas=False)
    rng = np.random.default_rng(9)
    C = 256
    gmap = gm.create_map(C)
    n = 128
    means = np.concatenate(
        [rng.normal(size=(n, 2)) * 1.0, rng.uniform(2.0, 6.0, size=(n, 1))], 1
    )
    gmap = gmap.replace(
        means=gmap.means.at[:n].set(jnp.asarray(means, jnp.float32)),
        features_dc=gmap.features_dc.at[:n].set(
            jnp.asarray(rng.normal(size=(n, 3)) * 0.3, jnp.float32)),
        log_scales=gmap.log_scales.at[:n].set(
            jnp.asarray(rng.uniform(-2.5, -1.5, size=(n, 3)), jnp.float32)),
        quats=gmap.quats.at[:n].set(jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)),
        logit_opacities=gmap.logit_opacities.at[:n].set(
            jnp.asarray(rng.uniform(0.0, 2.0, size=(n,)), jnp.float32)),
        active=gmap.active.at[:n].set(True),
    )
    opt = gm.MapOptimizer()
    opt_state = opt.init(gmap)

    kfbuf = slam_state.create_keyframe_buffer(8, H, W)
    for i in range(3):
        img = jnp.asarray(rng.uniform(0, 1, size=(3, H, W)), jnp.float32)
        static = jnp.asarray(rng.random((H, W)) > 0.25)  # per-kf static mask
        cam = Camera.create(
            i, img, intr,
            mono_depth=jnp.asarray(rng.uniform(2, 6, size=(H, W)), jnp.float32),
        ).replace(
            static_mask=static, has_static_mask=jnp.asarray(True),
        ).update_RT(jnp.eye(3), jnp.asarray([0.02 * i, 0.0, 0.0], jnp.float32))
        kfbuf, _ = slam_state.add_keyframe(kfbuf, cam)

    window = jnp.asarray([0, 1, 2, -1], jnp.int32)
    mcfg = MappingConfig(window_size=4, n_random=1, up_pose=True,
                         use_masked_loss=True,
                         gaussian_update_every=10**6, gaussian_reset=10**6,
                         rebin_every=2)
    key = jax.random.PRNGKey(0)

    def run(mesh):
        g = jax.tree.map(lambda a: a.copy(), gmap)
        s = jax.tree.map(lambda a: a.copy(), opt_state)
        return mapping_run(
            g, s, kfbuf, window, key, jnp.zeros((), jnp.int32),
            jnp.asarray(4, jnp.int32), 0,
            intr=intr, rcfg=rcfg, opt=opt, mcfg=mcfg, mesh=mesh,
        )

    ref = run(None)
    out = run(Mesh(np.array(jax.devices()[:5]), ("data",)))
    np.testing.assert_allclose(float(out.last_loss), float(ref.last_loss), rtol=1e-5)
    for f in gm.PARAM_FIELDS:
        np.testing.assert_allclose(
            np.asarray(getattr(out.gmap, f)), np.asarray(getattr(ref.gmap, f)),
            atol=5e-3, err_msg=f,
        )


def test_street_scale_dp_parity_with_single_device():
    """Street-scene SLAM run (the quality bench's scene at test scale) on
    the 8-device data-parallel mesh vs single-device: trajectory and render
    quality must agree (VERDICT r3 #9 — beyond one-step gradient
    equivalence). Tolerances cover cross-device reduction-order noise
    accumulated over a full run."""
    from lvdgs_tpu.core.config import load_config
    from lvdgs_tpu.eval.ate import eval_ate
    from lvdgs_tpu.eval.rendering import eval_rendering
    from lvdgs_tpu.slam.system import SLAM
    import os

    n_frames = 16

    def _cfg(dp: bool):
        config = load_config(os.path.join(
            os.path.dirname(__file__), "..", "configs", "mono", "synthetic",
            "base_config.yaml"))
        config["Dataset"].update({
            "scene": "street", "n_frames": n_frames, "step": 0.5,
            "accel_frames": 4, "street_half_width": 8.0,
            "street_spacing": 0.5, "photo_gain_jitter": 0.0,
            "photo_bias_jitter": 0.0, "photo_noise": 0.0,
            "mono_scale_error": 1.0, "mono_noise": 0.0,
            "pcd_downsample": 16, "pcd_downsample_init": 8,
        })
        config["Dataset"]["Calibration"].update({
            "width": 160, "height": 48, "fx": 95.0, "fy": 95.0,
            "cx": 80.0, "cy": 24.0,
        })
        config["Training"].update({
            "pose_seed": "constant_velocity", "init_itr_num": 250,
            "mapping_itr_num": 25, "tracking_itr_num": 30,
            "kf_interval": 3, "window_size": 6, "single_thread": True,
            # pin the keyframe cadence: the policy's overlap thresholds sit
            # near decision boundaries on this mini scene, so cross-device
            # reduction noise otherwise bifurcates the two runs into
            # different keyframe REGIMES (one fires initial BA, the other
            # doesn't) and the comparison stops being about parity
            "kf_overlap": 1.1,
        })
        config["Results"].update({
            "save_results": False, "eval_rendering": False,
            "color_refinement": False,
        })
        config["Performance"] = {
            "tile_size": 16, "max_per_tile": 128, "gaussian_chunk": 16,
            "tile_chunk": 32, "map_capacity": 16384, "kf_capacity": 32,
            "data_parallel": dp,
        }
        return config

    results = {}
    for dp in (False, True):
        slam = SLAM(_cfg(dp), save_dir=None)
        if dp:
            assert slam.mesh is not None, "data_parallel mesh not active"
        for i in range(n_frames):
            slam.process_frame(i)
        ate = float(eval_ate(slam.frames, slam.kf_indices, None, 0,
                             final=True, monocular=True))
        m = eval_rendering(slam.gmap, slam.frames, slam.dataset, slam.intr,
                           slam.rcfg, save_dir=None,
                           kf_indices=slam.kf_indices, iteration="dp_parity")
        results[dp] = (ate, m["mean_psnr"])

    ate_sd, psnr_sd = results[False]
    ate_dp, psnr_dp = results[True]
    assert np.isfinite(ate_dp) and np.isfinite(psnr_dp)
    # same quality regime (keyframe cadence pinned above): ATE within 10 cm
    # or 40% relative, PSNR within 2 dB — cross-device reduction order
    # accumulates over a full run, so bitwise-style tolerances belong to
    # the one-step equivalence tests, not this end-to-end one
    assert abs(ate_dp - ate_sd) < max(0.10, 0.40 * ate_sd), (ate_dp, ate_sd)
    assert abs(psnr_dp - psnr_sd) < 2.0, (psnr_dp, psnr_sd)
