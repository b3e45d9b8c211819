"""Jitted frame-to-map tracking.

Re-design of the reference tracking inner loop (utils/slam_frontend.py:
1492-1533): up to `max_iters` Adam steps over a 6-dof se(3) pose delta and
affine exposure (a, b), each step rendering the map and differentiating the
exposure-compensated opacity-weighted masked L1 loss — with convergence exit
at ||tau|| < 1e-4 (reference utils/pose_utils.py:82).

TPU-native shape: the ENTIRE optimisation is one `lax.while_loop` inside one
jit — no per-iteration host dispatch (the reference pays a Python round-trip
+ kernel launches per iteration). Pose gradients flow through the rasterizer
by autodiff of `lie.apply_delta` (replacing the CUDA pose backward).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.camera import Camera, Intrinsics
from ..core.losses import get_median_depth
from ..ops.rasterizer import (
    PackedBins, RenderConfig, pose_lin_gather, prepare_bins,
    prepare_bins_with_caps, rasterize, rasterize_lin, rasterize_pose_lin,
)


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    max_iters: int = 100
    lr_rot: float = 0.003
    lr_trans: float = 0.001
    lr_exposure: float = 0.01
    convergence_eps: float = 1e-4
    rgb_boundary_threshold: float = 0.01
    b1: float = 0.9
    b2: float = 0.999
    adam_eps: float = 1e-8
    # tile binning is recomputed every `rebin_every` steps with a
    # `bin_margin`-pixel radius slack (pose deltas per Adam step are
    # sub-pixel, so the assignment stays valid between rebins; two-priority
    # margin selection keeps blend order exact). 20/16 measured
    # quality-neutral and ~8% faster than 10/8 (tools: /tmp rebin probe)
    rebin_every: int = 20
    bin_margin: float = 16.0
    # pose-linearized backward (rasterize_pose_lin): kills the per-Gaussian
    # scatter + projection transpose but pays a 6-tangent projection
    # Jacobian per iteration — whether it wins depends on map size vs rows
    pose_lin: bool = False
    # period-linearized rendering (packed path only): linearize the per-row
    # fields in the pose ONCE per rebin period (pose_lin_gather) and render
    # each iteration as value + Jacobian·tau_acc (rasterize_lin) — the
    # per-iteration chain becomes kernel-only (no projection, no row gather,
    # no backward scatter; those run once per period). First-order accurate
    # in the pose drift since the period start, which the rebin margin
    # already bounds to sub-pixel scale.
    lin_period: bool = True
    # loss-plateau early exit, checked at rebin-period boundaries: stop when
    # a full period improved the loss by less than `plateau_tol` (relative).
    # Motivation (tools/perf_track_convergence.py): with Adam, the step-norm
    # criterion ||tau|| < 1e-4 (reference utils/pose_utils.py:82) can only
    # fire when gradients oscillate — the bias-corrected step magnitude
    # floors at ~lr (1.2e-3 measured) while gradients keep a consistent
    # direction, so on scenes with a shallow photometric valley the loop
    # always runs to max_iters although the loss settles by ~iter 30-50.
    # The period check is above rebinning's ~0.1% loss jitter. <=0 disables.
    plateau_tol: float = 0.005
    plateau_min_iters: int = 40
    # coarse-to-fine (track_camera_pyramid): a half-resolution stage (4x
    # fewer tiles -> 4x fewer budgeted rows per iteration) seeds the
    # full-resolution loop, which then needs only a few periods to polish.
    # TPU-native speed choice with no reference counterpart (the reference
    # tracks full-res only, utils/slam_frontend.py:1468-1521); gated by the
    # same pose-recovery / e2e quality tools as the packed budgets.
    pyramid: bool = False
    coarse_iters: int = 60
    coarse_min_iters: int = 20
    fine_min_iters: int = 20  # pyramid fine stage: first-period exit allowed
    # saturation caps are probed on the first rebin and carried (the map is
    # frozen during tracking), but a large cumulative pose correction can
    # shift tile contents enough that a stale cap truncates useful depth at
    # the 1-LSB tolerance (ADVICE r2). Re-probe at the next rebin boundary
    # once the accumulated drift metric ||Δtrans|| + 10·||Δrot|| since the
    # last probe exceeds this (rotation weighted by its ~10x larger pixel
    # leverage at KITTI focal/depth scales; 0.02 ~ a few pixels, well inside
    # the 16 px rebin margin). <=0 re-probes every rebin.
    cap_reprobe_drift: float = 0.02
    # skip the final dense bookkeeping render (pyramid coarse stage only —
    # its n_touched is never consumed)
    final_render: bool = True
    # OPT-IN (Training.tracking_use_mask): gate dynamic pixels out of the
    # tracking loss with cam.static_mask. Off by default — reference
    # parity (utils/slam_utils.py:53-62 never masks) and MEASURED worse on
    # the dynamic street A/B (ATE 1.70 m masked-tracking vs 0.32 m with
    # masked mapping alone): with oracle masks the near-field moving-object
    # pixels carry most of the translation observability, and removing
    # them costs more than the wrong-object residual does
    use_static_mask: bool = False


class TrackState(NamedTuple):
    R: jax.Array
    T: jax.Array
    ab: jax.Array  # (2,)
    m_tau: jax.Array  # (6,)
    v_tau: jax.Array
    m_ab: jax.Array  # (2,)
    v_ab: jax.Array
    it: jax.Array  # () int32
    done: jax.Array  # () bool
    image: jax.Array  # (3, H, W) last render
    depth: jax.Array  # (1, H, W)
    opacity: jax.Array  # (1, H, W)
    n_touched: jax.Array  # (C,)
    loss: jax.Array
    caps: jax.Array  # (T,) saturation caps (-1 = probe at next rebin)
    tau_acc: jax.Array  # (6,) pose drift since the period's linearization
    drift_acc: jax.Array  # () pose drift metric since the last cap probe


class TrackResult(NamedTuple):
    R: jax.Array
    T: jax.Array
    exposure_a: jax.Array
    exposure_b: jax.Array
    image: jax.Array
    depth: jax.Array
    opacity: jax.Array
    n_touched: jax.Array
    median_depth: jax.Array
    iterations: jax.Array
    loss: jax.Array


@functools.partial(jax.jit, static_argnames=("intr", "rcfg", "tcfg"))
def track_camera(
    params,
    active,
    cam: Camera,
    intr: Intrinsics,
    rcfg: RenderConfig,
    tcfg: TrackingConfig,
) -> TrackResult:
    """Optimise the camera pose/exposure of `cam` against the current map.

    `cam.R/cam.T` must hold the pose seed (e.g. from the MASt3R PnP prior,
    reference utils/slam_frontend.py:1457-1465). The map is constant here.
    """
    params = jax.lax.stop_gradient(params)
    gt = cam.image
    rgb_mask = (gt.sum(axis=0) > tcfg.rgb_boundary_threshold) & cam.grad_mask
    if tcfg.use_static_mask:
        rgb_mask = rgb_mask & cam.static_mask
    rgb_mask = rgb_mask[None].astype(jnp.float32)

    def loss_fn(tau, ab, R, T, bins):
        # n_touched is consumed only by the keyframe policy AFTER the loop —
        # its per-Gaussian scatter is skipped on every optimisation step and
        # recovered with one final render
        if tcfg.pose_lin and isinstance(bins, PackedBins):
            # pose-linearized packed render: tau gradient contracts against
            # pre-gathered per-row Jacobians — no per-Gaussian scatter, no
            # projection transpose (see rasterize_pose_lin)
            out = rasterize_pose_lin(
                params, active, R, T, tau, intr, rcfg, bins,
                need_n_touched=False,
            )
        else:
            Rn, Tn = lie.apply_delta(R, T, tau)
            out = rasterize(
                params, active, Rn, Tn, intr, rcfg, bins=bins,
                need_n_touched=False,
            )
        image_ab = jnp.exp(ab[0]) * out.image + ab[1]
        l1 = out.opacity * jnp.abs(image_ab * rgb_mask - gt * rgb_mask)
        return l1.mean(), out

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
    lr_tau = jnp.concatenate(
        [jnp.full((3,), tcfg.lr_trans), jnp.full((3,), tcfg.lr_rot)]
    )

    def lin_loss_fn(tau, ab, tau_acc, tpj, bins):
        out = rasterize_lin(tpj, tau_acc + tau, intr, rcfg, bins)
        image_ab = jnp.exp(ab[0]) * out.image + ab[1]
        l1 = out.opacity * jnp.abs(image_ab * rgb_mask - gt * rgb_mask)
        return l1.mean(), out

    lin_grad_fn = jax.value_and_grad(lin_loss_fn, argnums=(0, 1), has_aux=True)

    def body_with_tpj(s: TrackState, tpj, bins) -> TrackState:
        """Period-linearized step: render at the accumulated pose drift;
        the whole chain is row-local (see rasterize_lin)."""
        (loss, out), (g_tau, g_ab) = lin_grad_fn(
            jnp.zeros(6), s.ab, s.tau_acc, tpj, bins
        )
        # non-finite guard: skip (zero) the update instead of poisoning the
        # pose and every later iteration through the Adam moments
        g_tau = jnp.where(jnp.isfinite(g_tau), g_tau, 0.0)
        g_ab = jnp.where(jnp.isfinite(g_ab), g_ab, 0.0)
        it = s.it + 1
        itf = it.astype(jnp.float32)

        m_tau = tcfg.b1 * s.m_tau + (1 - tcfg.b1) * g_tau
        v_tau = tcfg.b2 * s.v_tau + (1 - tcfg.b2) * g_tau * g_tau
        mhat = m_tau / (1 - tcfg.b1**itf)
        vhat = v_tau / (1 - tcfg.b2**itf)
        tau_new = -lr_tau * mhat / (jnp.sqrt(vhat) + tcfg.adam_eps)

        m_ab = tcfg.b1 * s.m_ab + (1 - tcfg.b1) * g_ab
        v_ab = tcfg.b2 * s.v_ab + (1 - tcfg.b2) * g_ab * g_ab
        ab = s.ab - tcfg.lr_exposure * (m_ab / (1 - tcfg.b1**itf)) / (
            jnp.sqrt(v_ab / (1 - tcfg.b2**itf)) + tcfg.adam_eps
        )

        R, T = lie.apply_delta(s.R, s.T, tau_new)
        done = jnp.linalg.norm(tau_new) < tcfg.convergence_eps
        return TrackState(
            R=R,
            T=T,
            ab=ab,
            m_tau=m_tau,
            v_tau=v_tau,
            m_ab=m_ab,
            v_ab=v_ab,
            it=it,
            done=done,
            image=out.image,
            depth=out.depth,
            opacity=out.opacity,
            n_touched=s.n_touched,
            loss=loss,
            caps=s.caps,
            # first-order accumulation of the left-multiplied deltas (BCH
            # truncation matches the linearization's own order)
            tau_acc=s.tau_acc + tau_new,
            drift_acc=s.drift_acc
            + jnp.linalg.norm(tau_new[:3])
            + 10.0 * jnp.linalg.norm(tau_new[3:]),
        )

    def body_with_bins(s: TrackState, bins) -> TrackState:
        (loss, out), (g_tau, g_ab) = grad_fn(jnp.zeros(6), s.ab, s.R, s.T, bins)
        # non-finite guard (see body_with_tpj)
        g_tau = jnp.where(jnp.isfinite(g_tau), g_tau, 0.0)
        g_ab = jnp.where(jnp.isfinite(g_ab), g_ab, 0.0)
        it = s.it + 1
        itf = it.astype(jnp.float32)

        m_tau = tcfg.b1 * s.m_tau + (1 - tcfg.b1) * g_tau
        v_tau = tcfg.b2 * s.v_tau + (1 - tcfg.b2) * g_tau * g_tau
        mhat = m_tau / (1 - tcfg.b1**itf)
        vhat = v_tau / (1 - tcfg.b2**itf)
        tau_new = -lr_tau * mhat / (jnp.sqrt(vhat) + tcfg.adam_eps)

        m_ab = tcfg.b1 * s.m_ab + (1 - tcfg.b1) * g_ab
        v_ab = tcfg.b2 * s.v_ab + (1 - tcfg.b2) * g_ab * g_ab
        ab = s.ab - tcfg.lr_exposure * (m_ab / (1 - tcfg.b1**itf)) / (
            jnp.sqrt(v_ab / (1 - tcfg.b2**itf)) + tcfg.adam_eps
        )

        R, T = lie.apply_delta(s.R, s.T, tau_new)
        done = jnp.linalg.norm(tau_new) < tcfg.convergence_eps
        return TrackState(
            R=R,
            T=T,
            ab=ab,
            m_tau=m_tau,
            v_tau=v_tau,
            m_ab=m_ab,
            v_ab=v_ab,
            it=it,
            done=done,
            image=out.image,
            depth=out.depth,
            opacity=out.opacity,
            n_touched=out.n_touched,
            loss=loss,
            caps=s.caps,
            tau_acc=s.tau_acc,
            drift_acc=s.drift_acc
            + jnp.linalg.norm(tau_new[:3])
            + 10.0 * jnp.linalg.norm(tau_new[3:]),
        )

    def outer_cond(s: TrackState):
        return (~s.done) & (s.it < tcfg.max_iters)

    def outer_body(s: TrackState) -> TrackState:
        # rebin at the current pose with a pixel-radius margin; saturation
        # caps are probed on the first rebin and carried (map frozen), then
        # re-probed once the accumulated pose drift since the last probe
        # could shift tile contents past the caps' 1-LSB validity (ADVICE r2)
        stale = s.drift_acc > tcfg.cap_reprobe_drift
        caps_in = jnp.where(stale, jnp.full_like(s.caps, -1), s.caps)
        bins, caps = prepare_bins_with_caps(
            params, active, s.R, s.T, intr, rcfg, tcfg.bin_margin, caps_in
        )
        s = s._replace(caps=caps, drift_acc=jnp.where(stale, 0.0, s.drift_acc))

        def inner_cond(st: TrackState):
            return (~st.done) & (st.it < tcfg.max_iters) & (
                st.it < s.it + tcfg.rebin_every
            )

        if tcfg.lin_period and isinstance(bins, PackedBins):
            # linearize the per-row fields at this period's pose; drift
            # accumulates in tau_acc and restarts at zero here
            tpj, _ = pose_lin_gather(params, active, s.R, s.T, intr, rcfg, bins)
            s = s._replace(tau_acc=jnp.zeros(6))
            body = lambda st: body_with_tpj(st, tpj, bins)  # noqa: E731
        else:
            body = lambda st: body_with_bins(st, bins)  # noqa: E731
        # peel the period's first iteration: its loss is the plateau baseline
        # for the FIRST period (which has no previous-period loss), making
        # plateau_min_iters < 2*rebin_every reachable — the pyramid fine
        # stage relies on a first-period exit
        s1 = body(s)
        s2 = jax.lax.while_loop(inner_cond, body, s1)
        if tcfg.plateau_tol > 0:
            # loss-plateau exit at period granularity (see TrackingConfig):
            # baseline = previous period's final loss, or this period's
            # first-iteration loss on the first period
            base = jnp.where(s.loss > 0, s.loss, s1.loss)
            plateau = (
                (base > 0)
                & (s2.it >= tcfg.plateau_min_iters)
                & (base - s2.loss < tcfg.plateau_tol * base)
            )
            s2 = s2._replace(done=s2.done | plateau)
        return s2

    H, W = intr.height, intr.width
    C = params["means"].shape[0]
    ntx, nty = rcfg.grid(intr)
    init = TrackState(
        R=cam.R,
        T=cam.T,
        ab=jnp.stack([cam.exposure_a, cam.exposure_b]),
        m_tau=jnp.zeros(6),
        v_tau=jnp.zeros(6),
        m_ab=jnp.zeros(2),
        v_ab=jnp.zeros(2),
        it=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        image=jnp.zeros((3, H, W), jnp.float32),
        depth=jnp.zeros((1, H, W), jnp.float32),
        opacity=jnp.zeros((1, H, W), jnp.float32),
        n_touched=jnp.zeros((C,), jnp.int32),
        loss=jnp.zeros(()),
        caps=jnp.full((ntx * nty,), -1, jnp.int32),
        tau_acc=jnp.zeros(6),
        drift_acc=jnp.zeros(()),
    )
    s = jax.lax.while_loop(outer_cond, outer_body, init)
    median_depth = get_median_depth(s.depth, s.opacity)
    # one exact render at the converged pose for the visibility bookkeeping.
    # Deliberately DENSE even when the optimisation used a packed slot
    # budget: a binding budget drops deep-tile Gaussians (n_touched=0),
    # which would silently skew curr_vis and hence keyframe selection /
    # window-eviction overlap ratios (ADVICE r1).
    rcfg_exact = dataclasses.replace(rcfg, use_packed=False)
    if tcfg.final_render:
        final_nt = rasterize(params, active, s.R, s.T, intr, rcfg_exact).n_touched
    else:
        # pyramid coarse stage: its n_touched is never consumed (the fine
        # stage redoes the bookkeeping at full resolution)
        final_nt = jnp.zeros((C,), jnp.int32)
    return TrackResult(
        R=s.R,
        T=s.T,
        exposure_a=s.ab[0],
        exposure_b=s.ab[1],
        image=s.image,
        depth=s.depth,
        opacity=s.opacity,
        n_touched=final_nt,
        median_depth=median_depth,
        iterations=s.it,
        loss=s.loss,
    )


def _downsample2_image(img: jax.Array) -> jax.Array:
    """(3, H, W) -> (3, H//2, W//2) 2x2 mean pool (crops odd edges)."""
    C, H, W = img.shape
    H2, W2 = H // 2, W // 2
    return img[:, : H2 * 2, : W2 * 2].reshape(C, H2, 2, W2, 2).mean(axis=(2, 4))


def _downsample2_mask(mask: jax.Array) -> jax.Array:
    """(H, W) bool -> (H//2, W//2) any-pool: a coarse pixel is loss-gated in
    if any of its fine pixels was."""
    H, W = mask.shape
    H2, W2 = H // 2, W // 2
    return mask[: H2 * 2, : W2 * 2].reshape(H2, 2, W2, 2).any(axis=(1, 3))


def half_res_intrinsics(intr: Intrinsics) -> Intrinsics:
    """Pixel-center-correct half-resolution intrinsics: fine-pixel center
    u_f maps to coarse coordinate (u_f - 0.5) / 2."""
    return Intrinsics(
        fx=intr.fx / 2.0,
        fy=intr.fy / 2.0,
        cx=(intr.cx - 0.5) / 2.0,
        cy=(intr.cy - 0.5) / 2.0,
        width=intr.width // 2,
        height=intr.height // 2,
        znear=intr.znear,
        zfar=intr.zfar,
    )


@functools.partial(jax.jit, static_argnames=("intr", "rcfg", "tcfg"))
def track_camera_pyramid(
    params,
    active,
    cam: Camera,
    intr: Intrinsics,
    rcfg: RenderConfig,
    tcfg: TrackingConfig,
) -> TrackResult:
    """Coarse-to-fine tracking (TrackingConfig.pyramid).

    A half-resolution stage runs first: 4x fewer tiles means 4x fewer
    budgeted rows through the row-serialized gather/blend plumbing per
    iteration. The full-resolution stage starts from the coarse pose and
    exposure, so its plateau exit typically fires after a period or two.
    The slot budget is doubled for the coarse stage (each coarse tile
    covers 4 fine tiles' content; front-most-kept truncation above that).
    TPU-native speed choice with no reference counterpart (the reference
    tracks full-res only, utils/slam_frontend.py:1468-1521); quality-gated
    by tools/perf_track_quality.py and the e2e tests like the packed
    budgets."""
    intr2 = half_res_intrinsics(intr)
    cam2 = cam.replace(
        image=_downsample2_image(cam.image),
        grad_mask=_downsample2_mask(cam.grad_mask),
        # unused by tracking; shapes must match intr2 for jit cache reuse
        depth=jnp.zeros((intr2.height, intr2.width), jnp.float32),
        mono_depth=jnp.zeros((intr2.height, intr2.width), jnp.float32),
        # all-pool (not the grad mask's any-pool): a coarse pixel is static
        # only if every fine pixel is — conservative at object borders
        static_mask=(
            ~_downsample2_mask(~cam.static_mask)
            if tcfg.use_static_mask
            else jnp.ones((intr2.height, intr2.width), bool)
        ),
    )
    rcfg2 = rcfg
    if rcfg.use_packed:
        rcfg2 = dataclasses.replace(
            rcfg,
            slot_budget_per_tile=min(
                rcfg.max_per_tile, rcfg.slot_budget_per_tile * 2
            ),
        )
    tcfg_c = dataclasses.replace(
        tcfg,
        max_iters=tcfg.coarse_iters,
        plateau_min_iters=tcfg.coarse_min_iters,
        final_render=False,
    )
    res_c = track_camera(params, active, cam2, intr2, rcfg2, tcfg_c)

    cam_f = cam.update_RT(res_c.R, res_c.T).replace(
        exposure_a=res_c.exposure_a, exposure_b=res_c.exposure_b
    )
    tcfg_f = dataclasses.replace(
        tcfg, plateau_min_iters=tcfg.fine_min_iters
    )
    res_f = track_camera(params, active, cam_f, intr, rcfg, tcfg_f)
    return res_f._replace(iterations=res_c.iterations + res_f.iterations)


@functools.partial(jax.jit, static_argnames=("intr", "rcfg", "tcfg", "mesh"))
def track_camera_sharded(
    params,
    active,
    cam: Camera,
    intr: Intrinsics,
    rcfg: RenderConfig,
    tcfg: TrackingConfig,
    mesh=None,
) -> TrackResult:
    """Tile-sharded multi-chip tracking (TPU-native; no reference equivalent
    — the reference is single-GPU, SURVEY.md §2.6).

    Sharding layout over the mesh's "data" axis: the tile grid is padded so
    tile groups never straddle rows, split into contiguous row blocks, one
    per device. Per optimisation step each device bins/packs/gathers/blends
    ONLY its rows (the row-serialized index plumbing — the single-chip
    bottleneck, PERFORMANCE.md — divides by the device count), computes the
    local masked-L1 contribution, and the 8-scalar (tau, exposure) gradient
    is psum'd over ICI. Projection stays replicated (dense C-row math).
    The final rendered frame is reassembled with one all_gather.

    Numerics match track_camera up to float reduction order."""
    from ..ops.rasterizer import (
        PackedBins, bin_gaussians, pack_bins, project_gaussians,
    )
    from ..ops.rasterizer_pallas import pallas_blend_packed
    from ..gaussian.model import SH_C0

    ND = mesh.shape["data"]
    ts, TG = rcfg.tile_size, rcfg.tile_group
    H, W = intr.height, intr.width
    ntx = -(-W // ts)
    nty = -(-H // ts)
    ntx_p = -(-ntx // TG) * TG  # groups never straddle tile rows
    rows_per = -(-nty // ND)
    nty_p = rows_per * ND
    T_local = ntx_p * rows_per
    groups_per = T_local // TG
    Hp, Wp = nty_p * ts, ntx_p * ts
    C = params["means"].shape[0]
    P = ts * ts
    interpret = jax.default_backend() == "cpu"
    budget = rcfg.slot_budget_per_tile if rcfg.use_packed else rcfg.max_per_tile

    params = jax.lax.stop_gradient(params)
    gt_pad = jnp.zeros((3, Hp, Wp), jnp.float32).at[:, :H, :W].set(cam.image)
    rgb_mask = (cam.image.sum(axis=0) > tcfg.rgb_boundary_threshold) & cam.grad_mask
    if tcfg.use_static_mask:
        rgb_mask = rgb_mask & cam.static_mask
    rgb_mask = rgb_mask.astype(jnp.float32)
    mask_pad = jnp.zeros((1, Hp, Wp), jnp.float32).at[0, :H, :W].set(rgb_mask)

    lr_tau = jnp.concatenate(
        [jnp.full((3,), tcfg.lr_trans), jnp.full((3,), tcfg.lr_rot)]
    )

    def shard_body(params, active, gt, maskp, R0, T0, ab0):
        chip = jax.lax.axis_index("data")
        row0 = chip * rows_per
        tile0 = row0 * ntx_p
        # the packed kernel takes a global TILE-id offset (local pack tile
        # ids start at 0; pixel coordinates must be global)
        tile_off = tile0[None].astype(jnp.int32)
        gt_l = jax.lax.dynamic_slice_in_dim(gt, row0 * ts, rows_per * ts, 1)
        mask_l = jax.lax.dynamic_slice_in_dim(maskp, row0 * ts, rows_per * ts, 1)

        def local_bins(R, T):
            proj = project_gaussians(
                params["means"], params["quats"], params["log_scales"], active,
                R, T, intr,
            )
            tile_idx, slot_valid = bin_gaussians(
                jax.lax.stop_gradient(proj["mean2d"]),
                jax.lax.stop_gradient(proj["radius"]),
                jax.lax.stop_gradient(proj["depth"]),
                proj["valid"],
                tcfg.bin_margin,
                ntx=ntx_p,
                nty=nty_p,
                tile_size=ts,
                max_per_tile=rcfg.max_per_tile,
                tile_chunk=rcfg.tile_chunk,
                coarse_factor=rcfg.coarse_factor,
                max_per_coarse=rcfg.max_per_coarse,
                use_approx_topk=rcfg.use_approx_topk,
                approx_recall=rcfg.approx_recall,
                bin_bucket=rcfg.bin_bucket,
            )
            ti_l = jax.lax.dynamic_slice_in_dim(tile_idx, tile0, T_local, 0)
            sv_l = jax.lax.dynamic_slice_in_dim(slot_valid, tile0, T_local, 0)
            return pack_bins(
                ti_l, sv_l, C, tile_group=TG, slot_budget_per_tile=budget
            )

        def render_local(tau, R, T, pbins, need_nt=True):
            Rn, Tn = lie.apply_delta(R, T, tau)
            proj = project_gaussians(
                params["means"], params["quats"], params["log_scales"], active,
                Rn, Tn, intr,
            )
            colors = jnp.clip(0.5 + SH_C0 * params["features_dc"], 0.0, 1.0)
            opac = jnp.where(
                active, jax.nn.sigmoid(params["logit_opacities"]), 0.0
            )
            pad = lambda a: jnp.concatenate(
                [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0
            )
            fields = jnp.concatenate(
                [
                    pad(proj["mean2d"]),
                    pad(proj["conic"]),
                    pad(colors),
                    pad(proj["depth"][:, None]),
                    pad(opac[:, None]),
                ],
                axis=1,
            )
            tp = fields[pbins.gid]
            acc, trans, nt = pallas_blend_packed(
                tp, pbins.cg, pbins.k0, tile_off, pbins.tids, ntx_p, nty_p,
                ts, TG, groups_per, interpret, need_nt, rcfg.blend_bf16,
            )
            acc_t = acc[:groups_per].transpose(0, 2, 1, 3).reshape(T_local, 4, P)
            trans_t = trans[:groups_per].reshape(T_local, P)
            # local tile block -> local pixel rows (3, rows_per*ts, Wp)
            img = acc_t[:, :3, :].reshape(rows_per, ntx_p, 3, ts, ts)
            img = jnp.moveaxis(img, 2, 0).transpose(0, 1, 3, 2, 4).reshape(
                3, rows_per * ts, Wp
            )
            dep = acc_t[:, 3, :].reshape(rows_per, ntx_p, ts, ts).transpose(
                0, 2, 1, 3
            ).reshape(1, rows_per * ts, Wp)
            alpha = (1.0 - trans_t).reshape(rows_per, ntx_p, ts, ts).transpose(
                0, 2, 1, 3
            ).reshape(1, rows_per * ts, Wp)
            if need_nt:
                n_touched = jnp.zeros((C,), jnp.int32).at[
                    pbins.gid.reshape(-1)
                ].add(nt.reshape(-1), mode="drop")
            else:
                n_touched = jnp.zeros((C,), jnp.int32)
            return img, dep, alpha, n_touched

        def loss_fn(tau, ab, R, T, pbins):
            img, dep, alpha, n_touched = render_local(
                tau, R, T, pbins, need_nt=False
            )
            image_ab = jnp.exp(ab[0]) * img + ab[1]
            l1 = alpha * jnp.abs(image_ab * maskl_c - gt_l * maskl_c)
            loss_local = l1.sum() / (3.0 * H * W)
            return loss_local, (img, dep, alpha, n_touched)

        maskl_c = mask_l  # closure alias
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

        class SState(NamedTuple):
            R: jax.Array
            T: jax.Array
            ab: jax.Array
            m_tau: jax.Array
            v_tau: jax.Array
            m_ab: jax.Array
            v_ab: jax.Array
            it: jax.Array
            done: jax.Array
            img: jax.Array
            dep: jax.Array
            alpha: jax.Array
            nt: jax.Array
            loss: jax.Array

        def body_with_bins(s, pbins):
            (loss_l, aux), (g_tau, g_ab) = grad_fn(
                jnp.zeros(6), s.ab, s.R, s.T, pbins
            )
            loss = jax.lax.psum(loss_l, "data")
            g_tau = jax.lax.psum(g_tau, "data")
            g_ab = jax.lax.psum(g_ab, "data")
            img, dep, alpha, nt = aux
            it = s.it + 1
            itf = it.astype(jnp.float32)

            m_tau = tcfg.b1 * s.m_tau + (1 - tcfg.b1) * g_tau
            v_tau = tcfg.b2 * s.v_tau + (1 - tcfg.b2) * g_tau * g_tau
            mhat = m_tau / (1 - tcfg.b1**itf)
            vhat = v_tau / (1 - tcfg.b2**itf)
            tau_new = -lr_tau * mhat / (jnp.sqrt(vhat) + tcfg.adam_eps)

            m_ab = tcfg.b1 * s.m_ab + (1 - tcfg.b1) * g_ab
            v_ab = tcfg.b2 * s.v_ab + (1 - tcfg.b2) * g_ab * g_ab
            ab = s.ab - tcfg.lr_exposure * (m_ab / (1 - tcfg.b1**itf)) / (
                jnp.sqrt(v_ab / (1 - tcfg.b2**itf)) + tcfg.adam_eps
            )

            R, T = lie.apply_delta(s.R, s.T, tau_new)
            done = jnp.linalg.norm(tau_new) < tcfg.convergence_eps
            return SState(R, T, ab, m_tau, v_tau, m_ab, v_ab, it, done,
                          img, dep, alpha, nt, loss)

        def outer_cond(s):
            return (~s.done) & (s.it < tcfg.max_iters)

        def outer_body(s):
            pbins = local_bins(s.R, s.T)

            def inner_cond(st):
                return (~st.done) & (st.it < tcfg.max_iters) & (
                    st.it < s.it + tcfg.rebin_every
                )

            # first iteration peeled: its loss is the first period's plateau
            # baseline (mirrors track_camera)
            s1 = body_with_bins(s, pbins)
            s2 = jax.lax.while_loop(
                inner_cond, lambda st: body_with_bins(st, pbins), s1
            )
            if tcfg.plateau_tol > 0:
                # same loss-plateau period exit as track_camera; losses are
                # psum'd so the decision is identical on every device
                base = jnp.where(s.loss > 0, s.loss, s1.loss)
                plateau = (
                    (base > 0)
                    & (s2.it >= tcfg.plateau_min_iters)
                    & (base - s2.loss < tcfg.plateau_tol * base)
                )
                s2 = s2._replace(done=s2.done | plateau)
            return s2

        hl = rows_per * ts
        init = SState(
            R=R0, T=T0, ab=ab0,
            m_tau=jnp.zeros(6), v_tau=jnp.zeros(6),
            m_ab=jnp.zeros(2), v_ab=jnp.zeros(2),
            it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool),
            img=jnp.zeros((3, hl, Wp), jnp.float32),
            dep=jnp.zeros((1, hl, Wp), jnp.float32),
            alpha=jnp.zeros((1, hl, Wp), jnp.float32),
            nt=jnp.zeros((C,), jnp.int32),
            loss=jnp.zeros(()),
        )
        s = jax.lax.while_loop(outer_cond, outer_body, init)

        # one exact local render at the converged pose for the visibility
        # bookkeeping (skipped on every optimisation step)
        fbins = local_bins(s.R, s.T)
        _fi, _fd, _fa, nt_final = render_local(jnp.zeros(6), s.R, s.T, fbins)

        # reassemble the full frame: one all_gather of the local row blocks
        img_full = jax.lax.all_gather(s.img, "data", axis=1, tiled=True)
        dep_full = jax.lax.all_gather(s.dep, "data", axis=1, tiled=True)
        alpha_full = jax.lax.all_gather(s.alpha, "data", axis=1, tiled=True)
        nt_full = jax.lax.psum(nt_final, "data")
        return (s.R, s.T, s.ab, img_full, dep_full, alpha_full, nt_full,
                s.it, s.loss)

    from jax.sharding import PartitionSpec as Pspec

    pspec = {f: Pspec() for f in params}
    out = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(pspec, Pspec(), Pspec(), Pspec(), Pspec(), Pspec(), Pspec()),
        out_specs=(Pspec(),) * 9,
        check_vma=False,
    )(params, active, gt_pad, mask_pad, cam.R, cam.T,
      jnp.stack([cam.exposure_a, cam.exposure_b]))

    R, T, ab, img, dep, alpha, nt, it, loss = out
    image = img[:, :H, :W]
    depth = dep[:, :H, :W]
    opacity = alpha[:, :H, :W]
    median_depth = get_median_depth(depth, opacity)
    return TrackResult(
        R=R, T=T, exposure_a=ab[0], exposure_b=ab[1],
        image=image, depth=depth, opacity=opacity, n_touched=nt,
        median_depth=median_depth, iterations=it, loss=loss,
    )
