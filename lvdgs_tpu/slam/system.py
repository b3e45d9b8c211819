"""Single-process SLAM orchestrator.

Replaces the reference's two torch.multiprocessing processes + mp.Queue
protocol (slam.py [missing in snapshot] + FrontEnd utils/slam_frontend.py:1740
+ BackEnd utils/slam_backend.py:485) with one host scheduler driving jitted
device programs. The queue messages become function boundaries with the same
semantics:

  request_init      -> _backend_init        (seed + 1050-iter init mapping)
  request_keyframe  -> _backend_keyframe    (seed + windowed mapping + prune)
  sync_backend      -> pose write-back from the device keyframe buffer
  color_refinement  -> color_refine_run     (26k-iter polish, one dispatch)

Host-side responsibilities: dataset IO, keyframe policy, window management,
per-frame bookkeeping, eval. Device-side: everything numeric.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.camera import Camera, Intrinsics
from ..core.config import DotDict
from ..core.log import Log, PhaseTimer
from ..core.losses import compute_grad_mask
from ..data.datasets import load_dataset
from ..eval.ate import eval_ate
from ..eval.rendering import eval_rendering
from ..gaussian import model as gm
from ..io.ply import save_gaussians_ply
from ..ops.rasterizer import RenderConfig, rasterize, rasterize_median_depth
from . import state as slam_state
from .depth_alignment import process_depth
from .keyframe import (
    add_to_window, is_keyframe, keyframe_rotation_delta_deg,
    visibility_pair_stats, visibility_window_stats,
)
from .mapping import (
    MappingConfig, color_refine_run, covisibility_prune,
    covisibility_prune_from_occ, global_ba_run, mapping_run,
)
from .tracking import (
    TrackingConfig, track_camera, track_camera_pyramid, track_camera_sharded,
)


@jax.jit
def _scale_obs_device(rd: jax.Array, gd: jax.Array) -> jax.Array:
    """median(render/GT depth) + valid count, ONE dispatch + one 2-float
    fetch. Eager op chains cost ~27 ms of relay round-trip PER OP here;
    the original eager version burned ~500 ms per keyframe (r4 bench)."""
    ok = (rd > 0.1) & (gd > 0.1) & jnp.isfinite(rd) & jnp.isfinite(gd)
    ratio = jnp.where(ok, rd / jnp.maximum(gd, 1e-6), jnp.nan)
    return jnp.stack([jnp.nanmedian(ratio), ok.sum().astype(jnp.float32)])


@functools.partial(jax.jit, static_argnames=("thr",))
def _anchor_refuse(render_depth, mono, scale, *, thr: float):
    """Re-fuse depth at the CLAMPED anchor scale (one dispatch; see
    mono_scale_anchor in _fused_keyframe_depth)."""
    mono_scaled = mono * scale
    rel = jnp.abs(render_depth - mono_scaled) / (mono_scaled + 1e-8)
    err = (rel > thr) | (render_depth == 0.0)
    return jnp.where(err, mono_scaled, render_depth)


@functools.partial(jax.jit, static_argnames=("thr",))
def _fusion_finalize(image, mono, fused, scale, *, thr: float):
    """Maskless fusion tail (valid-RGB gate + mono rescale) as one
    dispatch instead of four eager relay round-trips."""
    valid_rgb = image.sum(axis=0) > thr
    return jnp.where(valid_rgb, fused, 0.0), mono * scale


def _dilate_mask(mask: jax.Array, kernel: int) -> jax.Array:
    """Binary dilation via max-pooling (replaces cv2.dilate at reference
    utils/slam_frontend.py:1260-1266)."""
    pad = kernel // 2
    return (
        jax.lax.reduce_window(
            mask.astype(jnp.float32),
            -jnp.inf,
            jax.lax.max,
            (kernel, kernel),
            (1, 1),
            [(pad, pad), (pad, pad)],
        )
        > 0.5
    )


@jax.jit
def _pack_track_record(R, T, R_gt, T_gt, ea, eb, median_depth, n_touched,
                       last_vis):
    """Everything the frame loop needs from a tracked frame, packed into ONE
    device program + ONE fetched vector: pose record (offsets 0:26, layout
    shared with SLAM._store_frame_record), median depth (26), and the
    keyframe policy's visibility-pair stats (27:31; counts are exact in f32
    below 2^24). Eagerly, each of these ~6 ops and 3 fetches is its own
    ~27 ms relay round trip."""
    curr_vis = n_touched > 0
    stats = visibility_pair_stats(curr_vis, last_vis)
    packed = jnp.concatenate(
        [
            R.reshape(-1), T, R_gt.reshape(-1), T_gt,
            jnp.stack([ea, eb]), median_depth[None],
            stats.astype(jnp.float32),
        ]
    )
    return packed, curr_vis


class SLAM:
    """End-to-end monocular Gaussian-splatting SLAM (dynamic-scene capable)."""

    def __init__(self, config: dict, save_dir: Optional[str] = None, masker=None,
                 pose_prior=None, depth_prior=None, scale_remedy=None):
        self.config = config
        self.save_dir = save_dir or config.get("Results", {}).get("save_dir", "results")
        tr = config["Training"]
        ds_cfg = config["Dataset"]
        opt_params = DotDict(config.get("opt_params", {}))

        if tr.get("pose_seed") == "sim_prior" and ds_cfg.get("type", "KITTI") != "synthetic":
            # the guard itself lives with pose_seed_mode below; refuse here
            # too, before dataset construction, so the error names the real
            # problem rather than whatever the dataset path raises first
            raise ValueError(
                "pose_seed=sim_prior is a GT-derived prior emulation for "
                f"synthetic benches only; refusing on dataset type "
                f"'{ds_cfg.get('type')}'"
            )

        self.dataset = load_dataset(None, ds_cfg.get("dataset_path", ""), config)
        self.intr: Intrinsics = self.dataset.intrinsics

        perf = config.get("Performance", {})
        self.rcfg = RenderConfig(
            tile_size=perf.get("tile_size", 16),
            max_per_tile=perf.get("max_per_tile", 512),
            gaussian_chunk=perf.get("gaussian_chunk", 32),
            tile_chunk=perf.get("tile_chunk", 128),
            white_background=config.get("model_params", {}).get("white_background", False),
        )
        # packed (group-CSR) renderer budgets per path, 0 = dense/exact.
        # Round-2 defaults (measured on the steady-state bench map): budget
        # 128 with SATURATION FEEDBACK (depth-sorted grouping + probe-capped
        # saturated tiles, ops/rasterizer.py) renders within float noise of
        # dense (71 dB) while cutting f+b 40 -> 23 ms; tracking additionally
        # uses the pose-linearized backward (rasterize_pose_lin). Round-1's
        # uniform budgets (160/192) cost 0.6/0.17 dB — feedback beats them
        # on both axes. Eval stays exact.
        import dataclasses as _dc
        # interpret-mode Pallas (CPU) makes the packed kernels far slower
        # than the XLA scan, so the packed default is TPU-only; configs can
        # still force budgets on any backend.
        on_cpu = jax.default_backend() == "cpu"
        # tracking fb96: pose-recovery within noise of dense (7.9 vs 8.2 cm,
        # rotation exact) at 1066 ms/100 iters vs dense 2745 — the feedback
        # caps make the small budget quality-safe (saturated tiles release
        # allocation instead of truncating needy ones)
        tb = perf.get("packed_tracking_budget", 0 if on_cpu else 96)
        # tracking feedback: the map is frozen there so caps are provably
        # valid, and policy visibility is dense-exact anyway.
        sat_t = perf.get("saturation_feedback", True)
        # mapping feedback: capped renders under-report n_touched (sub-LSB
        # contributors read untouched -> ~2x over-pruning, keyframe storms
        # when naively enabled in round 2). mapping_run now sources its
        # n_touched>0 consumers from the probe's FULL-depth visibility
        # (prepare_bins_with_touched), so the cap is a pure speed knob and
        # feedback-128 (exact at the 1-LSB tolerance) is the default.
        sat_m = perf.get("saturation_feedback_mapping", True)
        mb = perf.get("packed_mapping_budget", 0 if on_cpu else (128 if sat_m else 192))
        # bf16 weight math in the packed blend kernels (optimizer-facing
        # renders only; eval/prune renders stay exact f32). Opt-in until
        # quality-gated on the TPU.
        bfb = perf.get("blend_bf16", False)
        self.rcfg_track = (
            _dc.replace(self.rcfg, use_packed=True, slot_budget_per_tile=tb,
                        saturation_feedback=sat_t, blend_bf16=bfb)
            if tb else self.rcfg
        )
        self.rcfg_map = (
            _dc.replace(self.rcfg, use_packed=True, slot_budget_per_tile=mb,
                        saturation_feedback=sat_m, blend_bf16=bfb)
            if mb else self.rcfg
        )
        # active-prefix binning bucket (RenderConfig.bin_bucket): capacity
        # hysteresis keeps the map at up to ~2.6x its active count, and the
        # binning/coarse-topk cost is capacity-proportional — bucketing the
        # depth-sorted candidate prefix to ~1.25x the active count keeps it
        # active-proportional instead. Exact while the bucket holds (the
        # host re-buckets with headroom before every seeding and after every
        # prune); TPU-only by default — on CPU the recompile churn per
        # bucket step outweighs the win in tests.
        self._bin_bucket_step = 16384
        self._bin_bucket_enable = perf.get("bin_active_bucket", not on_cpu)
        # benches set this after their compile warmup: a bucket step swaps in
        # fresh program shapes (one-off compiles), so a short timed window
        # freezes the bucket — safe for ~8-13 keyframes of map growth thanks
        # to the 1.25x headroom; never set during normal runs
        self._bin_bucket_freeze = False
        # Honest phase attribution (VERDICT r3 weak #6): JAX dispatch is
        # async and block_until_ready is a relay no-op, so the first timer
        # that fetches a scalar eats every queued dispatch before it. With
        # synced_timers on, each timed phase ends with a one-scalar fetch
        # from an array that phase produced. Costs one host round trip per
        # phase (~27 ms through the axon tunnel) — bench/profiling only.
        self.synced_timers = bool(
            int(os.environ.get("LVDGS_SYNCED_TIMERS", "0"))
        ) or perf.get("synced_timers", False)
        # LVDGS_NAN_SCAN=1: after every SLAM phase, scan map params (split
        # by active/inactive rows) and phase outputs for non-finite values
        # and log the first offending phase. Forces a device fetch per phase
        # — debugging only, never on in benches.
        self._nan_scan_on = os.environ.get("LVDGS_NAN_SCAN", "") == "1"
        # the map starts small and grows by powers of two toward
        # map_capacity as it fills (gm.grow_capacity) — every
        # capacity-proportional cost then tracks the live map size
        self.max_capacity = perf.get("map_capacity", 2**17)
        # the active count piggybacks on f32 fetch columns (exact to 2^24)
        assert self.max_capacity <= 2**24, "map_capacity above 2^24 unsupported"
        capacity = min(perf.get("map_capacity_init", 2**14), self.max_capacity)
        kf_capacity = perf.get("kf_capacity", 512)

        self.monocular = tr.get("monocular", True)
        self.cameras_extent = float(config.get("model_params", {}).get("cameras_extent", 6.0))

        self.gmap = gm.create_map(capacity)
        self.opt = gm.MapOptimizer(
            feature_lr=opt_params.get("feature_lr", 0.0025),
            opacity_lr=opt_params.get("opacity_lr", 0.05),
            scaling_lr=opt_params.get("scaling_lr", 0.001),
            rotation_lr=opt_params.get("rotation_lr", 0.001),
            position_lr_init=opt_params.get("position_lr_init", 0.0016),
            position_lr_final=opt_params.get("position_lr_final", 0.00016),
            position_lr_max_steps=opt_params.get("position_lr_max_steps", 30000),
            spatial_scale=self.cameras_extent,
        )
        self.opt_state = self.opt.init(self.gmap)
        self.kfbuf = slam_state.create_keyframe_buffer(
            kf_capacity, self.intr.height, self.intr.width
        )

        self.tcfg = TrackingConfig(
            max_iters=tr.get("tracking_itr_num", 100),
            lr_rot=tr["lr"]["cam_rot_delta"],
            lr_trans=tr["lr"]["cam_trans_delta"],
            rgb_boundary_threshold=tr.get("rgb_boundary_threshold", 0.01),
            # ||tau|| < eps early exit (reference utils/pose_utils.py:82).
            # 1e-4 is reference parity; measured accuracy/time ladder on the
            # synthetic scene: 3e-4 halves iterations at ~3x the residual
            convergence_eps=tr.get("convergence_eps", 1e-4),
            # loss-plateau exit (period granularity): the Adam step-norm
            # criterion above cannot fire while gradients keep a consistent
            # direction (step magnitude floors at ~lr; see
            # tools/perf_track_convergence.py), so plateau detection is the
            # exit that actually bounds tracking cost on shallow valleys
            plateau_tol=tr.get("plateau_tol", 0.005),
            plateau_min_iters=tr.get("plateau_min_iters", 40),
            # coarse-to-fine tracking (track_camera_pyramid): half-res stage
            # first, 4x fewer budgeted rows/iter; single-chip path only
            pyramid=tr.get("track_pyramid", False),
            coarse_iters=tr.get("track_coarse_iters", 60),
            coarse_min_iters=tr.get("track_coarse_min_iters", 20),
            fine_min_iters=tr.get("track_fine_min_iters", 20),
            # OPT-IN: gate dynamic pixels out of the tracking loss. Default
            # off — reference parity (utils/slam_utils.py:53-62 never
            # masks) AND measured: on the CPU dynamic street with oracle
            # masks, masking tracking LOSES (ATE 1.70 m vs 0.32 m with
            # masked mapping alone — removing the near-field car pixels
            # costs more translation observability than the wrong-object
            # residual costs accuracy). See TrackingConfig.use_static_mask.
            use_static_mask=bool(tr.get("tracking_use_mask", False)),
        )

        common = dict(
            window_size=tr.get("window_size", 8),
            pose_window=tr.get("pose_window", 3),
            lambda_dssim=opt_params.get("lambda_dssim", 0.2),
            depth_lambda=tr.get("depth_lambda", 0.1),
            alpha=tr.get("alpha", 0.95),
            rgb_boundary_threshold=tr.get("rgb_boundary_threshold", 0.01),
            lr_rot=tr["lr"]["cam_rot_delta"] * 0.5,
            lr_trans=tr["lr"]["cam_trans_delta"] * 0.5,
            densify_grad_threshold=opt_params.get("densify_grad_threshold", 0.0002),
            percent_dense=opt_params.get("percent_dense", 0.01),
            gaussian_update_every=tr.get("gaussian_update_every", 150),
            gaussian_update_offset=tr.get("gaussian_update_offset", 50),
            gaussian_th=tr.get("gaussian_th", 0.7),
            gaussian_extent=self.cameras_extent * tr.get("gaussian_extent", 1.0),
            gaussian_reset=tr.get("gaussian_reset", 2001),
            size_threshold=tr.get("size_threshold", 20),
            monocular=self.monocular,
            use_masked_loss=masker is not None,
            rebin_every=perf.get("rebin_every", 20),
            bin_margin=perf.get("bin_margin", 16.0),
        )
        self.mcfg = MappingConfig(**common)
        self.mcfg_ba = MappingConfig(
            **{**common, "pose_window": tr.get("window_size", 8) - 1}
        )
        self.mcfg_init = MappingConfig(
            window_size=1,
            n_random=0,
            initialization=True,
            init_gaussian_update=tr.get("init_gaussian_update", 100),
            init_gaussian_reset=tr.get("init_gaussian_reset", 500),
            init_gaussian_th=tr.get("init_gaussian_th", 0.005),
            init_gaussian_extent=self.cameras_extent * tr.get("init_gaussian_extent", 30),
            densify_from_iter=opt_params.get("densify_from_iter", 500),
            densify_grad_threshold=opt_params.get("densify_grad_threshold", 0.0002),
            alpha=tr.get("alpha", 0.95),
            rgb_boundary_threshold=tr.get("rgb_boundary_threshold", 0.01),
            monocular=self.monocular,
            # init mapping is single-camera (rebinning is cheap) and the map
            # changes fastest there — staleness costs reconstruction quality
            # (~2.5 dB at rebin_every=10 on the synthetic drive scene)
            rebin_every=perf.get("init_rebin_every", 2),
            bin_margin=perf.get("bin_margin", 8.0),
        )

        # policy hyper-params
        self.kf_interval = tr.get("kf_interval", 5)
        # enforce the kf_interval minimum gap in THREADED mode too. The
        # reference paces keyframes in wall time instead (<=3 kf/s sleep,
        # utils/slam_frontend.py:1881-1885) — a cap that binds at its GPU
        # frame rates but not at a bench's; this gate is the
        # frame-count-domain equivalent (single-thread mode always gates)
        self.kf_time_gate = tr.get("kf_time_gate", False)
        self.window_size = tr.get("window_size", 8)
        self.single_thread = tr.get("single_thread", True)
        self.kf_translation = tr.get("kf_translation", 0.08)
        self.kf_min_translation = tr.get("kf_min_translation", 0.05)
        self.kf_overlap = tr.get("kf_overlap", 0.9)
        self.kf_cutoff = tr.get("kf_cutoff", 0.3)
        self.prune_num = tr.get("prune_num", 1)
        self.init_itr_num = tr.get("init_itr_num", 1050)
        self.mapping_itr_num = tr.get("mapping_itr_num", 150)
        self.mapping_itr_nosingle = tr.get("mapping_itr_nosingle", 10)
        self.pcd_downsample = ds_cfg.get("pcd_downsample", 64)
        self.pcd_downsample_init = ds_cfg.get("pcd_downsample_init", 32)
        self.point_size = ds_cfg.get("point_size", 0.01)
        self.adaptive_pointsize = ds_cfg.get("adaptive_pointsize", True)
        self.depth_cfg = config.get("depth", {})
        # surface-depth source for keyframe fusion / scale observation:
        # "median" (default) renders the transmittance-median depth — the
        # alpha-MEAN depth is unnormalized (sum of weights = opacity < 1),
        # so every surface reads (1-opacity) shallow and the bias COMPOUNDS
        # through the per-keyframe mono->render alignment (r4 street bench:
        # map scale drifted 0.8 -> 0.45x GT over 34 KFs, ATE 1.9 m).
        # "alpha" keeps the raw render-depth (reference-faithful) behavior.
        self.depth_fusion_source = tr.get("depth_fusion_source", "median")
        # clamp the per-keyframe mono->render alignment scale to a band
        # around the run's initial scale — kills the monocular gauge drift
        # (see _fused_keyframe_depth; divergence from the reference)
        self.mono_scale_anchor = tr.get("mono_scale_anchor", True)
        self.mono_scale_anchor_tol = tr.get("mono_scale_anchor_tol", 0.1)
        # gauge SERVO (r5): instead of only clamping the mono rescale (a
        # spring the r4 bench showed still lets the gauge walk 0.80 -> ~0.50),
        # apply the exact photometrically-invariant similarity rescale to
        # the whole world whenever the alignment scale drifts off the anchor
        # — see _apply_gauge_correction
        self.mono_scale_servo = tr.get("mono_scale_servo", True)
        self.mono_scale_servo_deadband = tr.get("mono_scale_servo_deadband", 0.02)
        # servo loop shaping (r5: a full-gain servo on the RAW per-KF
        # alignment scale chased measurement noise — world rescales swung
        # 0.80<->1.05 between keyframes and street ATE blew up to 9.8 m).
        # The drift estimate is the median of the last `servo_window` raw
        # scales; each event corrects `servo_gain` of the LOG drift and the
        # per-event rescale is clipped to +-`servo_max_step`.
        self.mono_scale_servo_window = tr.get("mono_scale_servo_window", 5)
        self.mono_scale_servo_gain = tr.get("mono_scale_servo_gain", 0.5)
        self.mono_scale_servo_max_step = tr.get(
            "mono_scale_servo_max_step", 0.05
        )
        self._servo_obs: list = []
        # map-scale drift telemetry on datasets that carry a depth channel
        # (RGB-D included): one extra device dispatch + 2-float fetch per
        # keyframe. Off -> only the sim_prior path (which CONSUMES the
        # observation) still records it.
        self.scale_telemetry = tr.get("scale_telemetry", True)
        self._anchor_scales: list = []
        self._mono_anchor_val: Optional[float] = None
        self.pose_seed_mode = tr.get("pose_seed", "constant_velocity")
        if self.pose_seed_mode == "sim_prior":
            # Synthetic-bench emulation of the MASt3R-PnP prior consumes
            # GT poses + GT depth at runtime; never read results from this
            # mode as prior-free (ADVICE r3). Refuse on real datasets.
            ds_type = config.get("Dataset", {}).get("type", "KITTI")
            if ds_type != "synthetic":
                raise ValueError(
                    "pose_seed=sim_prior is a GT-derived prior emulation for "
                    f"synthetic benches only; refusing on dataset type "
                    f"'{ds_type}' (use the real MASt3R prior or "
                    "constant_velocity)"
                )
            Log(
                "pose_seed=sim_prior: GT-derived pose-prior emulation active "
                "— results are NOT prior-free (emulates MASt3R-PnP, "
                "utils/init_pose.py:123-186)",
                tag="LVD-GS-TPU",
            )
        # sim_prior: MASt3R-PnP-class pose-prior emulation (see _pose_seed)
        self.sim_prior_trans_noise = tr.get("sim_prior_trans_noise", 0.02)
        self.sim_prior_rot_noise_deg = tr.get("sim_prior_rot_noise_deg", 0.2)
        self._map_scale_obs: Optional[float] = None  # see _map_scale_estimate
        self._scale_history: list = []  # (frame, obs) drift telemetry
        # (frame, rot_deg, t_dir_deg, |t|/|t_gt|) prior-seed diagnostics
        self._seed_err_history: list = []
        self.mono_depth_source = ds_cfg.get("mono_depth_source", "dataset")

        res = config.get("Results", {})
        self.save_results = res.get("save_results", True)
        self.save_trj = res.get("save_trj", True)
        self.save_trj_kf_intv = res.get("save_trj_kf_intv", 10)
        self.do_color_refinement = res.get("color_refinement", True)
        self.color_refinement_iters = res.get("color_refinement_iters", 26000)
        self.do_eval_rendering = res.get("eval_rendering", True)
        # thin the per-frame 6-panel viz dumps on long sequences without
        # code edits (ADVICE r3; viz_every=1 is reference parity)
        self.eval_viz_every = res.get("viz_every", 1)
        self.do_global_ba = res.get("global_BA", False)
        self.global_ba_iters = tr.get("global_BA_itr_num", 500)
        # per-keyframe rendered-vs-mono depth comparison panels at fusion
        # time (reference utils/init_pose.py:211-273, VERDICT r2 #6)
        self.save_depth_comparison = res.get("save_depth_comparison", False)

        # dynamic masking / pose-prior / depth-prior plug points
        self.masker = masker
        self.pose_prior = pose_prior  # callable(cam, last_kf_cam, slam) -> (R, T) seed
        self.depth_prior = depth_prior  # callable(image) -> mono depth (H, W)
        # callable(cam, last_kf_cam) -> scale; invoked when patch alignment
        # degenerates (reference utils/depth_utils.py:108-118)
        self.scale_remedy = scale_remedy

        # headless GUI feed (reference use_gui + GaussianPacket channel)
        self.viewer = None
        if res.get("use_gui", False):
            from ..gui.gui_utils import HeadlessViewer

            self.viewer = HeadlessViewer(
                os.path.join(self.save_dir or ".", "gui"),
                every=res.get("gui_every", 5),
            )

        # mutable state
        self.last_sent = 0  # idle-mapping counter (threaded-mode parity)
        self.idle_debt = 0  # accrued idle iterations, flushed in bursts
        self._last_curr_vis = None  # set by _track each frame
        self._last_track_stats = None
        self._cached_num_active = None  # refreshed by _sync_backend
        self.frames: Dict[int, dict] = {}
        self.kf_indices: List[int] = []
        self.kf_slots: Dict[int, int] = {}
        self.current_window: List[int] = []
        self.occ_visibility: Dict[int, jax.Array] = {}
        self.initialized = not self.monocular
        self.iteration_count = jnp.zeros((), jnp.int32)
        self.median_depth = 1.0
        self.rng = jax.random.PRNGKey(config.get("seed", 0))
        self.timer = PhaseTimer()
        self.frames_processed = 0
        self._cams: Dict[int, Camera] = {}

        # prune visibility source: False (default) reuses the mapping run's
        # final-iteration occ_visibility (reference-parity pre-step
        # visibility, no extra renders); True re-renders the window with the
        # exact dense config (one Adam step fresher, ~0.6 s/KF slower)
        self.exact_prune_visibility = perf.get("exact_prune_visibility", False)

        # device programs running longer than ~60 s get killed by the TPU
        # relay; mapping/refinement calls are chunked below this many
        # iterations (exact continuation via local_it0/it0 threading)
        self.max_iters_per_dispatch = perf.get("max_iters_per_dispatch", 300)

        # multi-chip: camera-data-parallel mapping gradients over a "data"
        # mesh (replicated map + psum'd grads, mapping.camera_grads_sharded).
        # Composes with the masker: the sharded path carries the
        # window/replay flag as traced per-camera data (round-1 exclusivity
        # lifted, VERDICT r1 item 8).
        self.mesh = None
        if perf.get("data_parallel", False) and len(jax.devices()) > 1:
            from jax.sharding import Mesh

            self.mesh = Mesh(np.array(jax.devices()), ("data",))
            Log(f"Camera-DP mapping over {len(jax.devices())} devices")

    # ------------------------------------------------------------------ utils

    def _run_mapping(self, window_slots, n_iters: int, mcfg):
        """mapping_run split into dispatch-size chunks. The per-dispatch
        budget scales inversely with the number of rendered cameras so a
        windowed 10-camera iteration gets ~10x fewer iterations per chunk
        than single-camera init mapping."""
        n_cams = mcfg.window_size + mcfg.n_random
        seg_limit = max(1, self.max_iters_per_dispatch // max(1, n_cams))
        local_it = 0
        res = None
        remaining = int(n_iters)
        while remaining > 0:
            seg = min(remaining, seg_limit)
            self.rng, key = jax.random.split(self.rng)
            res = mapping_run(
                self.gmap,
                self.opt_state,
                self.kfbuf,
                window_slots,
                key,
                self.iteration_count,
                jnp.asarray(seg, jnp.int32),
                local_it,
                intr=self.intr,
                rcfg=self.rcfg_map,
                opt=self.opt,
                mcfg=mcfg,
                mesh=self.mesh if not mcfg.initialization else None,
            )
            self.gmap, self.opt_state, self.kfbuf = res.gmap, res.opt_state, res.kfbuf
            self.iteration_count = res.iteration_count
            local_it += seg
            remaining -= seg
            # densification may approach the capacity ceiling mid-run; grow
            # between dispatch chunks so allocation never silently fails
            if remaining > 0 and self.gmap.capacity < self.max_capacity:
                if int(self.gmap.num_active) > 0.7 * self.gmap.capacity:
                    self._grow_to(self.gmap.capacity * 2)
        return res

    def _store_frame_record(self, idx: int, packed: np.ndarray, cam: Camera
                            ) -> None:
        """Unpack the shared 26-float pose-record layout (see
        _pack_track_record) into the host frame dict."""
        self.frames[idx] = {
            "R": packed[0:9].reshape(3, 3),
            "T": packed[9:12],
            "R_gt": packed[12:21].reshape(3, 3),
            "T_gt": packed[21:24],
            "exposure_a": float(packed[24]),
            "exposure_b": float(packed[25]),
            "static_mask": np.asarray(cam.static_mask)
            if self.masker is not None and bool(cam.has_static_mask)
            else None,
        }

    def _record_frame(self, idx: int, cam: Camera) -> None:
        # ONE host round-trip per frame (each np.asarray of a device array
        # costs a full ~27 ms relay round trip; six of them did not)
        packed = np.asarray(
            jnp.concatenate(
                [
                    cam.R.reshape(-1), cam.T, cam.R_gt.reshape(-1), cam.T_gt,
                    jnp.stack([cam.exposure_a, cam.exposure_b]),
                ]
            )
        )
        self._store_frame_record(idx, packed, cam)

    def _mono_depth_for(self, idx: int, image, dataset_depth, dataset_mono):
        """The reference gets mono depth from MASt3R every frame
        (utils/slam_frontend.py:1455); source is pluggable here."""
        if self.depth_prior is not None:
            if getattr(self.depth_prior, "wants_kf", False):
                # fused MASt3R prior (make_fused_priors): hand it the last
                # keyframe so one batch-2 forward serves both this mono
                # depth AND the pose seed's pair predictions
                last_kf_cam = (
                    self._cams.get(self.current_window[0])
                    if self.current_window else None
                )
                return jnp.asarray(
                    self.depth_prior(image, last_kf_cam=last_kf_cam),
                    jnp.float32,
                )
            return jnp.asarray(self.depth_prior(image), jnp.float32)
        if self.mono_depth_source == "gt" and dataset_depth is not None:
            return jnp.asarray(dataset_depth, jnp.float32)
        if dataset_mono is not None:
            return jnp.asarray(dataset_mono, jnp.float32)
        return jnp.zeros((self.intr.height, self.intr.width), jnp.float32)

    def _build_camera(self, idx: int, sample=None) -> Camera:
        image, depth, pose, mono = self.dataset[idx] if sample is None else sample
        gt_R = jnp.asarray(pose[:3, :3], jnp.float32)
        gt_T = jnp.asarray(pose[:3, 3], jnp.float32)
        cam = Camera.create(
            idx,
            jnp.asarray(image),
            self.intr,
            gt_R=gt_R,
            gt_T=gt_T,
            depth=None if depth is None else jnp.asarray(depth, jnp.float32),
        )
        cam = cam.replace(
            mono_depth=self._mono_depth_for(idx, image, depth, mono),
            grad_mask=compute_grad_mask(
                cam.image,
                self.config["Training"].get("edge_threshold", 1.1),
                self.config["Dataset"].get("type", "KITTI"),
            ),
        )
        if self.masker is not None:
            # maskers with their own host-side image source (IntervalMasker
            # with image_provider) skip the per-frame device->host image
            # fetch (~3 s/frame through the TPU relay on device-resident
            # datasets)
            img_np = (None if getattr(self.masker, "provides_images", False)
                      else np.asarray(cam.image))
            static = self.masker.get_static_mask(img_np, frame_idx=idx)
            cam = cam.replace(
                static_mask=jnp.asarray(static, bool),
                has_static_mask=jnp.asarray(True),
            )
        return cam

    def _map_scale_estimate(self) -> float:
        """Map scale relative to GT, for the `sim_prior` pose-seed emulation
        (synthetic benches) to express the simulated PnP prior in map scale,
        as the real PnP-vs-rendered-depth prior naturally is.

        Primary source: the per-keyframe rendered-depth / GT-depth median
        ratio observed at keyframe creation (_observe_map_scale) — a direct,
        feedback-free measurement of the same quantity the real PnP sees
        (its 3D points are unprojected RENDERED depth, utils/
        init_pose.py:145). The earlier estimated/GT camera-baseline ratio is
        kept only as a fallback before the first keyframe observation; as a
        primary source it was unstable — tracking's under-recovered
        translations shrink estimated baselines, which shrink the next
        prior's translations, a positive feedback loop (street bench: scale
        drifted 0.8 -> 0.67, ATE 8.7 m)."""
        if self._map_scale_obs is not None:
            return self._map_scale_obs
        kfs = self.kf_indices[-6:]
        ratios = []
        for a, b in zip(kfs[:-1], kfs[1:]):
            fa, fb = self.frames[a], self.frames[b]
            ca = -np.asarray(fa["R"]).T @ np.asarray(fa["T"])
            cb = -np.asarray(fb["R"]).T @ np.asarray(fb["T"])
            ga = -np.asarray(fa["R_gt"]).T @ np.asarray(fa["T_gt"])
            gb = -np.asarray(fb["R_gt"]).T @ np.asarray(fb["T_gt"])
            g = float(np.linalg.norm(ga - gb))
            if g > 1e-6:
                ratios.append(float(np.linalg.norm(ca - cb)) / g)
        return float(np.median(ratios)) if ratios else 1.0

    def _observe_map_scale(self, render_depth, cam: Camera) -> None:
        """sim_prior only: record median(rendered depth / GT depth) at a new
        keyframe — the map's metric scale as the real PnP prior experiences
        it. One host fetch per keyframe, gated off the per-frame hot path."""
        # ONE jitted dispatch + one 2-float fetch (eager chains and image
        # fetches here cost hundreds of ms/KF of relay round-trips, r4)
        packed = np.asarray(
            _scale_obs_device(jnp.asarray(render_depth), jnp.asarray(cam.depth))
        )
        if packed[1] >= 100 and np.isfinite(packed[0]):
            self._map_scale_obs = float(packed[0])
            # drift telemetry: (frame, scale) per keyframe — quality_bench
            # emits this so map-scale drift (the dominant monocular ATE
            # contributor) is diagnosable from committed artifacts
            self._scale_history.append((int(cam.uid), self._map_scale_obs))
            # bound the telemetry (it is serialized into checkpoints): keep
            # the most recent window — drift diagnosis reads the tail
            if len(self._scale_history) > 4096:
                del self._scale_history[:-4096]

    def _observe_seed_error(self, idx: int, cam: Camera, R_seed, T_seed,
                            last_cam) -> None:
        """Prior-path diagnostics (VERDICT r4 weak #4): per-frame error of
        the prior's RELATIVE pose (last_kf -> cur) against GT, split into
        scale-free rotation / translation-direction errors and a magnitude
        ratio (map scale rides the ratio, not the angles). Synthetic-GT
        only; appended to _seed_err_history and emitted by quality_bench."""
        if last_cam is None or getattr(cam, "R_gt", None) is None:
            return
        kf = self.frames.get(int(last_cam.uid))
        if kf is None:
            return
        R_kf, T_kf = np.asarray(kf["R"]), np.asarray(kf["T"])
        rel_R = R_seed @ R_kf.T
        rel_T = T_seed - rel_R @ T_kf
        Rg = np.asarray(cam.R_gt) @ np.asarray(kf["R_gt"]).T
        Tg = np.asarray(cam.T_gt) - Rg @ np.asarray(kf["T_gt"])
        cosr = np.clip((np.trace(rel_R @ Rg.T) - 1.0) / 2.0, -1.0, 1.0)
        rot_deg = float(np.degrees(np.arccos(cosr)))
        ng, ne = float(np.linalg.norm(Tg)), float(np.linalg.norm(rel_T))
        if ng > 1e-6 and ne > 1e-6:
            cosd = float(np.clip(np.dot(rel_T, Tg) / (ne * ng), -1.0, 1.0))
            dir_deg = float(np.degrees(np.arccos(cosd)))
            ratio = ne / ng
        else:
            dir_deg, ratio = 0.0, 1.0
        self._seed_err_history.append(
            (int(idx), rot_deg, dir_deg, round(ratio, 4))
        )
        if len(self._seed_err_history) > 4096:
            del self._seed_err_history[:-4096]

    def _pose_seed(self, idx: int, cam: Camera) -> Camera:
        if self.pose_prior is not None:
            last_kf_idx = self.current_window[0]
            last_cam = self._cams.get(last_kf_idx)
            seed = self.pose_prior(cam, last_cam, self)
            if seed is not None:
                R, T = seed
                self._observe_seed_error(idx, cam, np.asarray(R),
                                         np.asarray(T), last_cam)
                return cam.update_RT(jnp.asarray(R, jnp.float32), jnp.asarray(T, jnp.float32))
        mode = self.pose_seed_mode
        if mode == "gt":
            return cam.update_RT(cam.R_gt, cam.T_gt)
        if mode == "sim_prior":
            # Simulated MASt3R-PnP pose prior: the reference NEVER tracks
            # from a motion-model seed — every frame gets
            # rel_pose(last_kf -> cur) from descriptor matching + rendered
            # depth + PnP-RANSAC, composed onto the ESTIMATED last-keyframe
            # pose (utils/slam_frontend.py:1448,1457-1465;
            # utils/init_pose.py:123-186). With no MASt3R checkpoint in
            # this environment, emulate that prior's output: the GT
            # relative pose from the last keyframe, perturbed by a
            # PnP-class se(3) error (defaults 2 cm / 0.2 deg; deterministic
            # per frame). Photometric tracking then polishes it — the
            # reference's actual operating regime. Synthetic-data only.
            kf_idx = self.current_window[0] if self.current_window else 0
            kf = self.frames.get(kf_idx)
            if kf is not None:
                R_rel = np.asarray(cam.R_gt) @ np.asarray(kf["R_gt"]).T
                T_rel = np.asarray(cam.T_gt) - R_rel @ np.asarray(kf["T_gt"])
                # The real prior's PnP solves against RENDERED map depth
                # (utils/init_pose.py:145), so its translation arrives in
                # MAP scale — and the monocular map is born at the mono
                # prior's scale (init seeds from mono depth,
                # _fused_keyframe_depth). Injecting metric-scale T_rel into
                # a non-metric map makes the trajectory non-uniformly
                # scaled (Umeyama cannot correct it; measured 7.3 m vs
                # 2.5 m ATE on the street bench). Scale the GT relative
                # translation into map scale via the estimated/GT keyframe
                # baseline ratio.
                T_rel = self._map_scale_estimate() * T_rel
                rng = np.random.default_rng(917 + idx)
                tau = np.concatenate([
                    rng.normal(size=3) * self.sim_prior_trans_noise,
                    rng.normal(size=3)
                    * np.radians(self.sim_prior_rot_noise_deg),
                ]).astype(np.float32)
                Rn, Tn = lie.apply_delta(
                    jnp.asarray(R_rel, jnp.float32),
                    jnp.asarray(T_rel, jnp.float32),
                    jnp.asarray(tau),
                )
                Rn, Tn = np.asarray(Rn), np.asarray(Tn)
                R_seed = Rn @ np.asarray(kf["R"])
                T_seed = Rn @ np.asarray(kf["T"]) + Tn
                return cam.update_RT(
                    jnp.asarray(R_seed, jnp.float32),
                    jnp.asarray(T_seed, jnp.float32),
                )
        prev = self.frames.get(idx - 1)
        if prev is None:
            return cam
        if mode == "constant_velocity" and (idx - 2) in self.frames:
            p1 = self.frames[idx - 1]
            p2 = self.frames[idx - 2]
            T1 = np.eye(4)
            T1[:3, :3], T1[:3, 3] = p1["R"], p1["T"]
            T2 = np.eye(4)
            T2[:3, :3], T2[:3, 3] = p2["R"], p2["T"]
            seed = T1 @ np.linalg.inv(T2) @ T1
            return cam.update_RT(
                jnp.asarray(seed[:3, :3], jnp.float32), jnp.asarray(seed[:3, 3], jnp.float32)
            )
        return cam.update_RT(
            jnp.asarray(prev["R"], jnp.float32), jnp.asarray(prev["T"], jnp.float32)
        )

    # ----------------------------------------------------------- keyframe add

    def _fused_keyframe_depth(self, idx: int, cam: Camera, render_depth, render_opacity,
                              init: bool):
        """Reference add_new_keyframe (utils/slam_frontend.py:1268-1414):
        valid-RGB + expanded-static masking, mono-depth fallback for init,
        patch-based scale alignment against the rendered depth otherwise.
        Returns (depth_for_seeding, cam possibly with rescaled mono_depth).

        `render_opacity` is accepted but unused — EXACT parity with the live
        reference, which assigns `opacity = opacity.detach()` in
        add_new_keyframe (utils/slam_frontend.py:1381) and never reads it
        again: the opacity-gated mono-depth fill is a MonoGS-upstream
        behavior this fork replaced with process_depth's error-pixel fill
        (utils/depth_utils.py:127-135, mirrored in slam/depth_alignment.py),
        which fills erroneous/zero render-depth pixels with scaled mono
        depth regardless of opacity (VERDICT r2 #9)."""
        rgb_thr = self.config["Training"].get("rgb_boundary_threshold", 0.01)
        has_mask = self.masker is not None and bool(cam.has_static_mask)
        valid_rgb = None
        if has_mask or init or render_depth is None:
            # eager valid_rgb only where a later eager consumer needs it;
            # the maskless steady-state path folds it into _fusion_finalize
            valid_rgb = cam.image.sum(axis=0) > rgb_thr

        # masker-first guard: bool() of a device scalar is a ~27 ms relay
        # sync, pointless when no masker is configured
        if has_mask:
            # reference kernels (9 first frame / 7 after) are tuned for
            # KITTI-scale images; Training.mask_dilation rescales for
            # small-resolution scenes (tests) without touching the default
            base = self.config["Training"].get("mask_dilation", 7)
            kernel = base + 2 if idx == 0 else base
            expanded_dynamic = _dilate_mask(~cam.static_mask, kernel)
            valid_rgb = valid_rgb & ~expanded_dynamic
            # graded static-region health warnings (reference
            # utils/slam_frontend.py:1341-1356); keyframe-cadence only, so
            # the device fetch is off the per-frame hot path
            ratio = float((~expanded_dynamic).mean())
            if idx == 0 and ratio < 0.15:
                Log(
                    f"CRITICAL: first-frame static region only {ratio:.1%} — "
                    "initialization will suffer; check scene_type / "
                    "confidence threshold / mask expansion"
                )
            if ratio < 0.2:
                Log(
                    f"WARNING: expanded static region only {ratio:.1%} — "
                    "reconstruction quality at risk; consider reducing mask "
                    "expansion or adjusting scene prompts"
                )
            elif ratio < 0.4:
                Log(f"CAUTION: limited static region {ratio:.1%} — tracking "
                    "may be less stable")

        if init or render_depth is None:
            depth = jnp.where(valid_rgb, cam.mono_depth, 0.0)
            return depth, cam

        # scale-remedy fallback: when too few pixels survive alignment, the
        # reference recomputes the scale from cross-keyframe matched depths
        # (utils/depth_utils.py:108-118). Closure over the newest window
        # keyframe, mirroring the reference's last_kf context.
        remedy_fn = None
        if self.scale_remedy is not None and self.current_window:
            last_cam = self._cams.get(self.current_window[0])
            if last_cam is not None:
                remedy_fn = lambda: self.scale_remedy(cam, last_cam)  # noqa: E731

        if self.save_depth_comparison and self.save_dir:
            try:
                from ..eval.viz import save_depth_comparison

                save_depth_comparison(
                    render_depth, cam.mono_depth, cam.image, idx,
                    os.path.join(self.save_dir, "depth_comparison"),
                )
            except Exception as e:  # best-effort viz (matplotlib optional)
                Log(f"depth-comparison viz failed for frame {idx}: {e}")

        dc = self.depth_cfg
        fused, scale, _err, _nacc = process_depth(
            render_depth,
            cam.mono_depth,
            patch_size=dc.get("patch_size", 10),
            mean_threshold=dc.get("mean_threshold", 0.25),
            std_threshold=dc.get("std_threshold", 0.3),
            error_threshold=dc.get("error_threshold", 0.1),
            final_error_threshold=dc.get("final_error_threshold", 0.15),
            min_accurate_pixels_ratio=dc.get("min_accurate_pixels_ratio", 0.01),
            remedy_fn=remedy_fn,
        )
        if self.mono_scale_anchor:
            # DIVERGENCE from the reference: the mono->render alignment
            # scale is clamped to a band around the run's initial scale.
            # The reference re-anchors mono depth to the CURRENT render
            # every keyframe (utils/depth_utils.py process_depth), which
            # leaves the monocular scale gauge free — photometric losses
            # are scale-invariant and pose refinement + mapping walked the
            # street-bench map from 0.8x to 0.37x GT scale over ~25
            # keyframes (map_scale_history in the r4 artifacts), a
            # non-uniform trajectory scaling Umeyama cannot correct
            # (ATE 1.9-2.3 m). Clamping trusts the mono prior's GLOBAL
            # scale consistency (MASt3R is metric-ish; the per-KF band
            # still absorbs local pointmap scale variation).
            s_raw = float(scale)
            if self._mono_anchor_val is None:
                self._anchor_scales.append(s_raw)
                if len(self._anchor_scales) >= 3:
                    self._mono_anchor_val = float(
                        np.median(self._anchor_scales)
                    )
            elif self.mono_scale_servo and np.isfinite(s_raw) and s_raw > 0:
                # gauge SERVO (r5, divergence): s_raw drifting off the
                # anchor means the free monocular gauge has walked — the
                # map+trajectory are the thing that moved, not the mono
                # prior (which is globally consistent by construction).
                # Rescale the WHOLE world: an exact photometric invariant
                # (gaussian/model.py:gauge_rescale), so the correction is
                # loss-neutral and the alignment scale returns to the
                # anchor instead of compounding (the r4 clamp was a spring;
                # the bench gauge still bottomed at ~0.52 of birth scale).
                # Loop shaping: per-KF s_raw is a NOISY measurement
                # (+-10-20% on the street bench); the first full-gain servo
                # amplified that noise into 0.80<->1.05 world swings and
                # 9.8 m ATE. Servo on the MEDIAN of recent observations,
                # correct a fraction of the log drift, clip the step.
                self._servo_obs.append(s_raw)
                del self._servo_obs[: -self.mono_scale_servo_window]
                drift = float(np.median(self._servo_obs)) / self._mono_anchor_val
                if abs(drift - 1.0) > self.mono_scale_servo_deadband:
                    step = self.mono_scale_servo_max_step
                    k = float(np.clip(
                        drift ** -self.mono_scale_servo_gain,
                        1.0 - step, 1.0 + step,
                    ))
                    cam = self._apply_gauge_correction(k, cam)
                    # the fused depth was assembled in the OLD gauge from
                    # (render, mono*s_raw); both terms scale by k exactly
                    fused = fused * jnp.float32(k)
                    scale = s_raw * k
                    # recorded observations were measured in the old gauge
                    self._servo_obs = [s * k for s in self._servo_obs]
                # residual spring: the servo nudges the GAUGE slowly, but
                # the per-KF fusion must not inject raw scale noise into
                # depth targets meanwhile — clamp the APPLIED alignment
                # scale to the anchor band exactly like the non-servo path
                tol = self.mono_scale_anchor_tol
                lo = self._mono_anchor_val * (1.0 - tol)
                hi = self._mono_anchor_val * (1.0 + tol)
                if not (lo <= float(scale) <= hi):
                    s_c = float(np.clip(float(scale), lo, hi))
                    k_applied = float(scale) / s_raw  # 1.0 unless servoed
                    fused = _anchor_refuse(
                        jnp.asarray(render_depth) * jnp.float32(k_applied),
                        cam.mono_depth,
                        jnp.asarray(s_c, jnp.float32),
                        thr=dc.get("final_error_threshold", 0.15),
                    )
                    scale = s_c
            else:
                tol = self.mono_scale_anchor_tol
                lo = self._mono_anchor_val * (1.0 - tol)
                hi = self._mono_anchor_val * (1.0 + tol)
                if not (lo <= s_raw <= hi):
                    s_c = float(np.clip(s_raw, lo, hi))
                    fused = _anchor_refuse(
                        jnp.asarray(render_depth), cam.mono_depth,
                        jnp.asarray(s_c, jnp.float32),
                        thr=dc.get("final_error_threshold", 0.15),
                    )
                    scale = s_c
        if valid_rgb is None:
            # maskless steady state: one dispatch for the whole tail
            depth, new_mono = _fusion_finalize(
                cam.image, cam.mono_depth, fused,
                jnp.asarray(scale, jnp.float32), thr=rgb_thr,
            )
            return depth, cam.replace(mono_depth=new_mono)
        cam = cam.replace(mono_depth=cam.mono_depth * scale)
        depth = jnp.where(valid_rgb, fused, 0.0)
        return depth, cam

    def _apply_gauge_correction(self, k: float, cam: Camera) -> Camera:
        """Mono-scale servo: similarity-rescale the entire estimated world
        by ``k`` about the origin — map means/scales (+ Adam moments),
        keyframe-buffer poses and stored mono depths, the live window
        cameras, the recorded trajectory, and the map-scale observation.
        Rendering is exactly invariant under this transform (monocular
        gauge freedom), so it is loss-neutral; it pins the gauge to the
        mono prior's global scale. Returns the current camera in the new
        gauge. GT quantities (T_gt, cam.depth) are never touched."""
        kj = jnp.float32(k)
        self.gmap, self.opt_state = gm.gauge_rescale(
            self.gmap, self.opt_state, kj
        )
        self.kfbuf = self.kfbuf.replace(
            T=self.kfbuf.T * kj, mono_depth=self.kfbuf.mono_depth * kj
        )
        # live window cameras feed the pose prior / scale remedy; evicted
        # keyframes' Camera objects have no further consumers (mapping reads
        # kfbuf, eval reads self.frames)
        for i in self.current_window:
            c = self._cams.get(i)
            if c is not None:
                self._cams[i] = c.replace(
                    T=c.T * kj, mono_depth=c.mono_depth * kj
                )
        # the whole recorded trajectory moves with the gauge so the estimate
        # history stays internally consistent (host numpy — cheap)
        for f in self.frames.values():
            f["T"] = np.asarray(f["T"], np.float32) * k
        if self._map_scale_obs is not None:
            self._map_scale_obs = float(self._map_scale_obs) * k
        self.median_depth = float(self.median_depth) * k
        Log(f"gauge servo: world rescaled by {k:.4f} "
            f"(anchor {self._mono_anchor_val:.4f})")
        return cam.replace(T=cam.T * kj)

    def _grow_to(self, target: int) -> None:
        cap = self.gmap.capacity
        self._last_resize_kf = len(self.kf_indices)
        Log(f"Growing map capacity {cap} -> {target}")
        self.gmap, self.opt_state = gm.grow_capacity(
            self.gmap, target, self.opt_state
        )
        # visibility masks are compared elementwise across keyframes; pad
        # stored entries to the new capacity (growth appends slots, so old
        # indices stay valid)
        self.occ_visibility = {
            k: jnp.concatenate([v, jnp.zeros((target - v.shape[0],), bool)])
            if v.shape[0] < target
            else v
            for k, v in self.occ_visibility.items()
        }

    def _maybe_shrink(self) -> None:
        """Shrink capacity after big prunes (hysteresis: grow at 0.7
        occupancy, shrink only when actives fit in 0.2 of half, and never
        within 5 keyframes of any resize — the round-2 bench showed
        aggressive covisibility pruning swinging actives 14k<->40k within
        a few keyframes, thrashing 65k<->131k capacities and their
        compiled-program swaps) so capacity-proportional costs track the
        live map, not its high-water mark. Re-indexes stored visibility
        masks with the compaction order."""
        if len(self.kf_indices) - getattr(self, "_last_resize_kf", -10) < 5:
            return
        cap = self.gmap.capacity
        n = self._num_active_cached()
        min_cap = min(2**14, self.max_capacity)
        target = cap
        while target > min_cap and n <= 0.2 * (target // 2):
            target //= 2
        if target >= cap:
            return
        self._last_resize_kf = len(self.kf_indices)
        Log(f"Shrinking map capacity {cap} -> {target} ({n} active)")
        self.gmap, self.opt_state, take = gm.compact_and_resize(
            self.gmap, target, self.opt_state
        )
        self.occ_visibility = {
            k: v[take] for k, v in self.occ_visibility.items()
        }

    def _num_active_cached(self) -> int:
        """num_active as of the last _sync_backend. Valid at the next
        keyframe's _ensure_capacity (only tracking runs in between, which
        never changes actives) and in _maybe_shrink when called right after
        the sync (compaction keeps every active). Falls back to a device
        fetch when no sync has happened yet."""
        if self._cached_num_active is None:
            return int(self.gmap.num_active)
        return self._cached_num_active

    def _update_bin_bucket(self, lower_bound: int = 0) -> None:
        """Re-bucket active-prefix binning (RenderConfig.bin_bucket) to track
        the live active count. Grows immediately to >=1.25x the bound (so a
        seeding/densify burst cannot outrun it mid-dispatch); shrinks only
        with two full steps of slack to avoid recompile thrash. bucket == 0
        means full-capacity binning (used when the bucket wouldn't save
        anything). Pure scheduling: identical bins whenever the bucket does
        not bind, which the headroom + per-keyframe refresh guarantee."""
        if not self._bin_bucket_enable or self._bin_bucket_freeze:
            return
        import dataclasses as _dc

        step = self._bin_bucket_step
        cap = self.gmap.capacity
        lb = max(self._num_active_cached(), lower_bound)
        desired = -(-int(lb * 1.25) // step) * step
        if desired >= cap - step // 2:
            desired = 0  # no saving: bin at full capacity
        cur = self.rcfg_map.bin_bucket
        cur_eff = cur if cur else cap
        des_eff = desired if desired else cap
        if des_eff > cur_eff or des_eff <= cur_eff - 2 * step or (
            cur and cur > cap
        ):
            self.rcfg_track = _dc.replace(self.rcfg_track, bin_bucket=desired)
            self.rcfg_map = _dc.replace(self.rcfg_map, bin_bucket=desired)

    def _ensure_capacity(self, downsample: int) -> None:
        """Grow the map (powers of two, up to map_capacity) when the next
        seeding could approach saturation — keeps densification headroom
        while all capacity-proportional work tracks the live map size."""
        stride = max(1, int(round(np.sqrt(max(1, downsample)))))
        cand = -(-self.intr.height // stride) * (-(-self.intr.width // stride))
        need = self._num_active_cached() + cand
        cap = self.gmap.capacity
        target = cap
        while need > 0.7 * target and target < self.max_capacity:
            target *= 2
        target = min(target, self.max_capacity)
        if target > cap:
            self._grow_to(target)
        # the seeding about to run can push actives up to `need`; make the
        # binning bucket cover it before the next tracking/mapping dispatch
        self._update_bin_bucket(lower_bound=need)

    def _backend_init(self, idx: int, cam: Camera, depth) -> None:
        """Reference 'init' message handler (utils/slam_backend.py:514-528)."""
        self._ensure_capacity(self.pcd_downsample_init)
        self.gmap, self.opt_state = gm.seed_step(
            self.gmap,
            cam,
            depth,
            jnp.asarray(idx, jnp.int32),
            self.opt_state,
            intr=self.intr,
            downsample=self.pcd_downsample_init,
            point_size=self.point_size,
            adaptive_pointsize=self.adaptive_pointsize,
        )
        res = self._run_mapping(
            jnp.asarray([self.kf_slots[idx]], jnp.int32), self.init_itr_num, self.mcfg_init
        )
        self.occ_visibility[idx] = res.occ_visibility[0]
        self._nan_scan(f"backend_init[{idx}]", depth)
        Log(f"Initialized map ({int(self.gmap.num_active)} gaussians)")

    def _backend_keyframe(self, idx: int, depth) -> None:
        """Reference 'keyframe' message handler (utils/slam_backend.py:530-602)."""
        cam = self._cams[idx]
        self.timer.tic("kf_seed")
        self._ensure_capacity(self.pcd_downsample)
        self._cached_num_active = None  # seeding/mapping/prune change actives
        self.gmap, self.opt_state = gm.seed_step(
            self.gmap,
            cam,
            depth,
            jnp.asarray(idx, jnp.int32),
            self.opt_state,
            intr=self.intr,
            downsample=self.pcd_downsample,
            point_size=self.point_size,
            adaptive_pointsize=self.adaptive_pointsize,
        )
        self._phase_sync(self.gmap.num_active)
        self._nan_scan(f"kf_seed[{idx}]", depth)
        self.timer.toc("kf_seed")
        mcfg = self.mcfg
        if not self.initialized:
            if len(self.current_window) == self.window_size:
                iter_per_kf = 300  # initial BA (reference :557)
                mcfg = self.mcfg_ba
                Log("Performing initial BA for initialization")
            else:
                iter_per_kf = self.mapping_itr_num
        else:
            iter_per_kf = (
                self.mapping_itr_num if self.single_thread else self.mapping_itr_nosingle
            )
        # fold accrued idle iterations into this run (threaded-mode budget
        # the reference backend would have spent while the frontend tracked)
        iter_per_kf += self.idle_debt
        self.idle_debt = 0

        window_slots = self._window_slots()
        self.timer.tic("kf_mapping")
        res = self._run_mapping(window_slots, iter_per_kf, mcfg)
        self._phase_sync(None if res is None else res.occ_visibility)
        self._nan_scan(f"kf_mapping[{idx}]")
        self.timer.toc("kf_mapping")

        # map(prune=True) pass
        self.timer.tic("kf_prune")
        self.gmap, occ, initialized = self._prune(window_slots, res)
        self.initialized = bool(initialized)
        for i, kf_idx in enumerate(self.current_window):
            self.occ_visibility[kf_idx] = occ[i]
        self._sync_backend()  # also refreshes the cached active count
        self._maybe_shrink()
        self._update_bin_bucket()
        self._phase_sync(self.gmap.num_active)
        self._nan_scan(f"kf_prune[{idx}]")
        self.timer.toc("kf_prune")

    def _prune(self, window_slots, mapping_res):
        """Covisibility prune, sourcing visibility per the
        exact_prune_visibility knob (see __init__)."""
        if self.exact_prune_visibility or mapping_res is None:
            return covisibility_prune(
                self.gmap,
                self.kfbuf,
                window_slots,
                jnp.asarray(self.initialized),
                intr=self.intr,
                rcfg=self.rcfg,
                prune_num=self.prune_num,
                window_size=self.window_size,
            )
        return covisibility_prune_from_occ(
            self.gmap,
            self.kfbuf,
            window_slots,
            mapping_res.occ_visibility,
            jnp.asarray(self.initialized),
            prune_num=self.prune_num,
            window_size=self.window_size,
        )

    def _nan_scan(self, where: str, extra=None) -> None:
        """Opt-in (LVDGS_NAN_SCAN=1) non-finite detector: logs which map
        params contain NaN/Inf (active vs inactive rows separately) plus an
        optional phase-output array, tagged with the phase name — localizes
        corruption to the phase that introduced it."""
        if not self._nan_scan_on:
            return
        msgs = []
        act = np.asarray(self.gmap.active)
        for k, v in self.gmap.params().items():
            bad = ~np.isfinite(np.asarray(v))
            if bad.ndim > 1:
                bad = bad.any(axis=1)
            na, ni = int(bad[act].sum()), int(bad[~act].sum())
            if na or ni:
                msgs.append(f"{k}(act={na},inact={ni})")
        if extra is not None:
            nb = int((~np.isfinite(np.asarray(extra))).sum())
            if nb:
                msgs.append(f"phase_out({nb})")
        if msgs:
            Log(f"NANSCAN[{where}]: " + " ".join(msgs), tag="Debug")

    def _phase_sync(self, *arrays) -> None:
        """With synced_timers on, fetch one scalar from the first usable
        device array so the phase's queued device work completes before its
        toc (honest attribution; see __init__). No-op otherwise."""
        if not self.synced_timers:
            return
        for a in arrays:
            if a is not None and hasattr(a, "ravel") and getattr(a, "size", 0):
                jax.device_get(a.ravel()[0])
                return

    def _window_slots(self) -> jax.Array:
        slots = [self.kf_slots[k] for k in self.current_window]
        slots += [-1] * (self.window_size - len(slots))
        return jnp.asarray(slots, jnp.int32)

    def _sync_backend(self) -> None:
        """Adopt refined keyframe poses/exposures (reference sync_backend,
        utils/slam_frontend.py:1690-1697). One host fetch for all three
        buffers (each np.asarray costs a relay round trip)."""
        M = self.kfbuf.capacity
        packed = np.asarray(
            jnp.concatenate(
                [
                    self.kfbuf.R.reshape(M, 9),
                    self.kfbuf.T,
                    self.kfbuf.exposure_ab,
                    # piggyback the live active count on the same fetch:
                    # _ensure_capacity / _maybe_shrink read it each keyframe
                    # and a separate int() costs its own ~27 ms round trip
                    jnp.broadcast_to(
                        self.gmap.num_active.astype(jnp.float32)[None, None],
                        (M, 1),
                    ),
                ],
                axis=1,
            )
        )
        self._cached_num_active = int(packed[0, 14])
        R = packed[:, 0:9].reshape(M, 3, 3)
        T = packed[:, 9:12]
        ab = packed[:, 12:14]
        for kf_idx in self.current_window:
            slot = self.kf_slots[kf_idx]
            self.frames[kf_idx]["R"] = R[slot]
            self.frames[kf_idx]["T"] = T[slot]
            self.frames[kf_idx]["exposure_a"] = float(ab[slot, 0])
            self.frames[kf_idx]["exposure_b"] = float(ab[slot, 1])
            if kf_idx in self._cams:
                self._cams[kf_idx] = self._cams[kf_idx].update_RT(
                    jnp.asarray(R[slot]), jnp.asarray(T[slot])
                )

    # ------------------------------------------------------------- main steps

    def _initialize(self, idx: int, cam: Camera) -> None:
        cam = cam.update_RT(cam.R_gt, cam.T_gt)
        self._cams[idx] = cam
        self._record_frame(idx, cam)
        depth, cam = self._fused_keyframe_depth(idx, cam, None, None, init=True)
        self._cams[idx] = cam
        self.kf_indices.append(idx)
        self.kfbuf, slot = slam_state.add_keyframe(self.kfbuf, cam)
        self.kf_slots[idx] = int(slot)
        self.current_window = [idx]
        self._backend_init(idx, cam, depth)

    def _track(self, idx: int, cam: Camera):
        cam = self._pose_seed(idx, cam)
        if self.mesh is not None:
            # tile-sharded multi-chip tracking (rows over the mesh, psum'd
            # pose gradients — slam.tracking.track_camera_sharded)
            res = track_camera_sharded(
                self.gmap.params(), self.gmap.active, cam, self.intr,
                self.rcfg_track, self.tcfg, mesh=self.mesh,
            )
        elif self.tcfg.pyramid:
            res = track_camera_pyramid(
                self.gmap.params(), self.gmap.active, cam, self.intr,
                self.rcfg_track, self.tcfg,
            )
        else:
            res = track_camera(
                self.gmap.params(), self.gmap.active, cam, self.intr,
                self.rcfg_track, self.tcfg,
            )
        cam = cam.update_RT(res.R, res.T).replace(
            exposure_a=res.exposure_a, exposure_b=res.exposure_b
        )
        self._cams[idx] = cam
        # ONE device program + ONE host fetch for everything the frame loop
        # needs from this frame (pose record, median depth, policy stats —
        # previously 3 separate fetches plus ~6 eager op dispatches)
        last_kf = self.current_window[0] if self.current_window else None
        last_vis = (
            self.occ_visibility[last_kf]
            if last_kf is not None and last_kf in self.occ_visibility
            else jnp.zeros_like(self.gmap.active)
        )
        packed_dev, curr_vis = _pack_track_record(
            cam.R, cam.T, cam.R_gt, cam.T_gt, cam.exposure_a, cam.exposure_b,
            res.median_depth, res.n_touched, last_vis,
        )
        packed = np.asarray(packed_dev)
        self._store_frame_record(idx, packed, cam)
        self.median_depth = float(packed[26])
        self._last_track_stats = packed[27:31].astype(np.int64)
        self._last_curr_vis = curr_vis
        return cam, res

    def _make_keyframe(self, idx: int, cam: Camera, track_res,
                       curr_vis) -> None:
        # curr_vis comes from _track's fused fetch (the EXACT final render's
        # n_touched — recomputing it here from a budgeted render would skew
        # window-eviction overlaps)
        if self.current_window:
            occ_stack = jnp.stack(
                [self.occ_visibility[k] for k in self.current_window]
            )
            wstats = np.asarray(visibility_window_stats(curr_vis, occ_stack))
            ratios = {
                k: int(wstats[i, 0]) / max(min(int(wstats[i, 1]), int(wstats[i, 2])), 1)
                for i, k in enumerate(self.current_window)
            }
        else:
            ratios = None
        self.current_window, removed = add_to_window(
            cur_frame_idx=idx,
            overlap_min_ratios=ratios,
            curr_visibility=curr_vis,
            occ_visibility=self.occ_visibility,
            window=self.current_window,
            poses={k: (self.frames[k]["R"], self.frames[k]["T"]) for k in
                   [idx] + self.current_window},
            window_size=self.window_size,
            kf_cutoff=self.kf_cutoff,
            initialized=self.initialized,
        )
        if removed is not None:
            self.occ_visibility.pop(removed, None)

        # keyframe mask overlay dump (reference :1538-1577)
        if (
            self.masker is not None
            and getattr(self.masker, "save_images", False)
            and bool(cam.has_static_mask)
        ):
            self.masker.save_keyframe_overlay(cam.image, cam.static_mask, idx)

        self.timer.tic("kf_fusion")
        render_depth = track_res.depth[0]
        render_opacity = track_res.opacity[0]
        if self.depth_fusion_source == "median":
            # front-surface (transmittance-median) depth for the scale
            # observation and mono->render alignment: the alpha-MEAN depth
            # is biased behind surfaces wherever background leaks through
            # partial opacity, and that bias compounds multiplicatively
            # through the per-keyframe alignment (see
            # ops/rasterizer.rasterize_median_depth). One extra dense
            # render per keyframe.
            md, mo = rasterize_median_depth(
                self.gmap.params(), self.gmap.active, cam.R, cam.T,
                self.intr, self.rcfg,
            )
            render_depth, render_opacity = md[0], mo[0]
        if self.pose_seed_mode == "sim_prior" or (
            self.scale_telemetry and cam.depth is not None
        ):
            # consumed by sim_prior; pure telemetry otherwise. Fires on ANY
            # dataset that populates cam.depth (synthetic GT or RGB-D
            # sensors) — Training.scale_telemetry=False turns the
            # per-keyframe dispatch off (ADVICE r4)
            self._observe_map_scale(render_depth, cam)
        depth, cam = self._fused_keyframe_depth(
            idx, cam, render_depth, render_opacity, init=False
        )
        self._phase_sync(depth)
        self.timer.toc("kf_fusion")
        self._cams[idx] = cam
        self.kf_indices.append(idx)
        self.kfbuf, slot = slam_state.add_keyframe(self.kfbuf, cam)
        self.kf_slots[idx] = int(slot)
        self._backend_keyframe(idx, depth)

    def process_frame(self, idx: int, sample=None) -> None:
        self.timer.tic("camera")
        cam = self._build_camera(idx, sample)
        self._phase_sync(cam.grad_mask)
        self.timer.toc("camera")
        if idx == 0 or not self.current_window:
            self._initialize(idx, cam)
            self.frames_processed += 1
            return

        self.initialized = self.initialized or (
            len(self.current_window) == self.window_size
        )

        self.timer.tic("tracking")
        cam, res = self._track(idx, cam)
        self.timer.toc("tracking")
        if self._nan_scan_on:
            self._nan_scan(f"track[{idx}]", np.concatenate(
                [np.asarray(cam.R).ravel(), np.asarray(cam.T).ravel()]))

        last_kf_idx = self.current_window[0]
        check_time = (idx - last_kf_idx) >= self.kf_interval
        curr_vis = self._last_curr_vis  # computed + fetched inside _track

        static_ratio = (
            float(cam.static_mask.mean())
            if self.masker is not None and bool(cam.has_static_mask)
            else None
        )
        stats = self._last_track_stats
        create_kf = is_keyframe(
            curr_R=self.frames[idx]["R"],
            curr_T=self.frames[idx]["T"],
            last_kf_R=self.frames[last_kf_idx]["R"],
            last_kf_T=self.frames[last_kf_idx]["T"],
            median_depth=self.median_depth,
            curr_visibility=curr_vis,
            last_kf_visibility=self.occ_visibility[last_kf_idx],
            kf_translation=self.kf_translation,
            kf_min_translation=self.kf_min_translation,
            kf_overlap=self.kf_overlap,
            static_ratio=static_ratio,
            overlap_stats=stats,
        )
        if len(self.current_window) < self.window_size:
            create_kf = check_time and (
                int(stats[2]) / max(int(stats[3]), 1)
            ) < self.kf_overlap
        if self.single_thread or self.kf_time_gate:
            create_kf = check_time and create_kf

        if create_kf:
            self.timer.tic("mapping")
            self._make_keyframe(idx, cam, res, curr_vis=curr_vis)
            self.timer.toc("mapping")
            self.last_sent = 0
        elif not self.single_thread and self.current_window:
            # threaded-mode parity: the reference backend keeps mapping while
            # idle — 1 iteration per loop, plus a 10-iteration prune+sync
            # batch every 10 sends (utils/slam_backend.py:495-501). The
            # 1-iteration runs are accrued as debt and flushed in one burst:
            # same iteration budget, but binning/dispatch overheads amortise
            # over the burst instead of being paid per frame (a 1-iteration
            # dispatch is ~70% overhead, see PERFORMANCE.md cost model).
            # DIVERGENCE from the reference: between flushes, frames are
            # tracked against a map up to 9 frames staler than the
            # reference's continuous 1-iter-per-frame idle mapping. This is
            # an interleaving change, not just a scheduling one; validated
            # on the synthetic bench only (ADVICE r1).
            self.timer.tic("idle_mapping")
            self.idle_debt += 1
            self.last_sent += 1
            if self.last_sent >= 10:
                idle_res = self._run_mapping(
                    self._window_slots(), 10 + self.idle_debt, self.mcfg
                )
                self.idle_debt = 0
                self.gmap, occ, initialized = self._prune(
                    self._window_slots(), idle_res
                )
                self.initialized = bool(initialized)
                for i, kf_idx in enumerate(self.current_window):
                    self.occ_visibility[kf_idx] = occ[i]
                self._sync_backend()
                self.last_sent = 0
                self._phase_sync(self.gmap.num_active)
                self._nan_scan(f"idle_mapping[{idx}]")
            self.timer.toc("idle_mapping")
        self.frames_processed += 1

        if self.viewer is not None:
            from ..gui.gui_utils import GaussianPacket, snapshot_gaussians

            self.viewer.put(
                GaussianPacket(
                    gaussians=snapshot_gaussians(self.gmap) if create_kf else None,
                    current_frame={"R": self.frames[idx]["R"], "T": self.frames[idx]["T"],
                                   "uid": idx},
                    render=np.asarray(res.image),
                    keyframes=[
                        {"R": self.frames[k]["R"], "T": self.frames[k]["T"], "uid": k}
                        for k in self.current_window
                    ],
                    kf_window={self.current_window[0]: self.current_window[1:]}
                    if self.current_window
                    else None,
                )
            )

        if (
            self.save_results
            and self.save_trj
            and create_kf
            and len(self.kf_indices) % self.save_trj_kf_intv == 0
        ):
            eval_ate(
                self.frames,
                self.kf_indices,
                self.save_dir,
                idx,
                monocular=self.monocular,
            )

    # ------------------------------------------------------------- checkpoint

    def save_state(self, path: str) -> None:
        """Full resumable state (new capability — the reference is
        output-only with no resume, SURVEY.md §5.4)."""
        from ..io.checkpoint import save_checkpoint

        save_checkpoint(
            path,
            {
                "gmap": self.gmap,
                "opt_state": self.opt_state,
                "kfbuf": self.kfbuf,
                "frames": self.frames,
                "kf_indices": list(self.kf_indices),
                "kf_slots": dict(self.kf_slots),
                "current_window": list(self.current_window),
                "occ_visibility": {k: np.asarray(v) for k, v in self.occ_visibility.items()},
                "initialized": self.initialized,
                "iteration_count": np.asarray(self.iteration_count),
                "median_depth": self.median_depth,
                "frames_processed": self.frames_processed,
                "rng": np.asarray(self.rng),
                "idle_debt": self.idle_debt,
                "last_sent": self.last_sent,
                "anchor_scales": list(self._anchor_scales),
                "mono_anchor_val": self._mono_anchor_val,
                "map_scale_obs": self._map_scale_obs,
                "scale_history": list(self._scale_history),
            },
        )

    def load_state(self, path: str) -> None:
        from ..io.checkpoint import load_checkpoint

        st = load_checkpoint(path)
        self.gmap = jax.tree.map(jnp.asarray, self.gmap.replace(
            **{f: st["gmap"][f] if isinstance(st["gmap"], dict) else getattr(st["gmap"], f)
               for f in self.gmap.__dataclass_fields__}
        ))
        so = st["opt_state"]
        self.opt_state = self.opt_state.replace(
            m=jax.tree.map(jnp.asarray, so["m"] if isinstance(so, dict) else so.m),
            v=jax.tree.map(jnp.asarray, so["v"] if isinstance(so, dict) else so.v),
            count=jnp.asarray(so["count"] if isinstance(so, dict) else so.count),
        )
        kb = st["kfbuf"]
        self.kfbuf = self.kfbuf.replace(
            **{f: jnp.asarray(kb[f] if isinstance(kb, dict) else getattr(kb, f))
               for f in self.kfbuf.__dataclass_fields__}
        )
        self.frames = {int(k): v for k, v in st["frames"].items()}
        self.kf_indices = [int(i) for i in st["kf_indices"]]
        self.kf_slots = {int(k): int(v) for k, v in st["kf_slots"].items()}
        self.current_window = [int(i) for i in st["current_window"]]
        self.occ_visibility = {int(k): jnp.asarray(v) for k, v in st["occ_visibility"].items()}
        self.initialized = bool(st["initialized"])
        self.iteration_count = jnp.asarray(st["iteration_count"])
        self.median_depth = float(st["median_depth"])
        self.frames_processed = int(st["frames_processed"])
        self.rng = jnp.asarray(st["rng"])
        # old checkpoints predate these counters; default to a fresh cadence
        self.idle_debt = int(st.get("idle_debt", 0))
        self.last_sent = int(st.get("last_sent", 0))
        self._anchor_scales = [float(s) for s in st.get("anchor_scales", [])]
        mav = st.get("mono_anchor_val")
        self._mono_anchor_val = None if mav is None else float(mav)
        mso = st.get("map_scale_obs")
        self._map_scale_obs = None if mso is None else float(mso)
        self._scale_history = [
            (int(f), float(s)) for f, s in st.get("scale_history", [])
        ]
        self._cached_num_active = None  # restored map invalidates the cache

    def global_ba(self, iters: Optional[int] = None) -> None:
        """Photometric global bundle adjustment over all keyframes (the
        reference carries the config flag but never implements it)."""
        iters = iters or self.global_ba_iters
        Log(f"Starting global BA ({iters} iters)")
        done = 0
        while done < iters:
            seg = min(iters - done, self.max_iters_per_dispatch)
            self.rng, key = jax.random.split(self.rng)
            self.gmap, self.opt_state, self.kfbuf = global_ba_run(
                self.gmap,
                self.opt_state,
                self.kfbuf,
                key,
                jnp.asarray(seg, jnp.int32),
                done,
                intr=self.intr,
                rcfg=self.rcfg_map,
                opt=self.opt,
                mcfg=self.mcfg,
            )
            done += seg
        self._sync_backend()
        # refresh every stored keyframe pose into the frame records
        R = np.asarray(self.kfbuf.R)
        T = np.asarray(self.kfbuf.T)
        for kf_idx, slot in self.kf_slots.items():
            self.frames[kf_idx]["R"] = R[slot]
            self.frames[kf_idx]["T"] = T[slot]
        Log("Global BA done")

    def color_refinement(self, iters: Optional[int] = None,
                         features_only: Optional[bool] = None) -> None:
        iters = iters or self.color_refinement_iters
        if features_only is None:
            features_only = self.config.get("Results", {}).get(
                "refine_features_only", False
            )
        Log(f"Starting color refinement ({iters} iters"
            f"{', features-only' if features_only else ''})")
        done = 0
        while done < iters:
            seg = min(iters - done, self.max_iters_per_dispatch)
            self.rng, key = jax.random.split(self.rng)
            self.gmap, self.opt_state = color_refine_run(
                self.gmap,
                self.opt_state,
                self.kfbuf,
                key,
                jnp.asarray(seg, jnp.int32),
                done,
                intr=self.intr,
                rcfg=self.rcfg_map,
                opt=self.opt,
                mcfg=self.mcfg,
                features_only=bool(features_only),
            )
            done += seg
            self._nan_scan(f"color_refine[{done}]")
        Log("Map refinement done")

    def run(self, n_frames: Optional[int] = None, progress: bool = True,
            checkpoint_every: Optional[int] = None) -> dict:
        n = len(self.dataset) if n_frames is None else min(n_frames, len(self.dataset))
        start = self.frames_processed  # resume support
        from ..data.prefetch import PrefetchLoader

        loader = PrefetchLoader(self.dataset, depth=4, start=start, end=n)
        # optional jax.profiler trace of the steady-state loop (SURVEY §5.1);
        # bounded to profile_frames so traces stay loadable in TensorBoard
        res = self.config.get("Results", {})
        profile_dir = res.get("profile_dir")
        profile_after = int(res.get("profile_after", 5))
        profile_frames = int(res.get("profile_frames", 10))
        profiling = False
        # reference pacing: sleep so keyframes arrive at <= pace_kf_hz
        # (utils/slam_frontend.py:1881-1885 caps at ~3/s); 0 disables. Only
        # binds when the system runs FASTER than the cap.
        pace_hz = float(self.config.get("Training", {}).get("pace_kf_hz", 0.0))
        t0 = time.perf_counter()
        for idx, sample in loader:
            f_start = time.perf_counter()
            kfs_before = len(self.kf_indices)
            if profile_dir and not profiling and idx - start == profile_after:
                import jax

                jax.profiler.start_trace(profile_dir)
                profiling = True
            self.process_frame(idx, sample)
            if profiling and idx - start >= profile_after + profile_frames:
                import jax

                jax.profiler.stop_trace()
                profiling = False
                Log(f"profiler trace written to {profile_dir}")
            if pace_hz > 0 and len(self.kf_indices) > kfs_before:
                budget = 1.0 / pace_hz - (time.perf_counter() - f_start)
                if budget > 0.01:
                    time.sleep(budget)
            if progress and idx % 25 == 0:
                Log(
                    f"frame {idx}/{n} kfs={len(self.kf_indices)} "
                    f"gaussians={int(self.gmap.num_active)}"
                )
            if checkpoint_every and (idx + 1) % checkpoint_every == 0:
                self.save_state(os.path.join(self.save_dir, "checkpoint"))
        if profiling:
            import jax

            jax.profiler.stop_trace()
        wall = time.perf_counter() - t0
        fps = n / wall

        results = {"fps": fps, "n_frames": n, "n_keyframes": len(self.kf_indices)}
        if self.do_global_ba:
            self.global_ba()
        if self.do_color_refinement:
            self.color_refinement()
        if self.save_results:
            results["ate_rmse"] = eval_ate(
                self.frames,
                self.kf_indices,
                self.save_dir,
                n,
                final=True,
                monocular=self.monocular,
            )
            ply_path = os.path.join(self.save_dir, "point_cloud", "final", "point_cloud.ply")
            save_gaussians_ply(self.gmap, ply_path)
        if self.do_eval_rendering:
            results.update(
                eval_rendering(
                    self.gmap,
                    self.frames,
                    self.dataset,
                    self.intr,
                    self.rcfg,
                    save_dir=self.save_dir if self.save_results else None,
                    kf_indices=self.kf_indices,
                    viz_every=self.eval_viz_every,
                )
            )
        results["timers"] = self.timer.summary()
        if self.viewer is not None:
            self.viewer.close()
        Log(f"SLAM done: {fps:.2f} fps, {len(self.kf_indices)} keyframes", tag="Eval")
        return results
