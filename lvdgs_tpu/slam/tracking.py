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
from ..ops.rasterizer import RenderConfig, prepare_bins, rasterize


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
    # sub-pixel, so the assignment stays valid between rebins)
    rebin_every: int = 10
    bin_margin: float = 8.0


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
    rgb_mask = (
        (gt.sum(axis=0) > tcfg.rgb_boundary_threshold) & cam.grad_mask
    )[None].astype(jnp.float32)

    def loss_fn(tau, ab, R, T, bins):
        Rn, Tn = lie.apply_delta(R, T, tau)
        out = rasterize(params, active, Rn, Tn, intr, rcfg, bins=bins)
        image_ab = jnp.exp(ab[0]) * out.image + ab[1]
        l1 = out.opacity * jnp.abs(image_ab * rgb_mask - gt * rgb_mask)
        return l1.mean(), out

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
    lr_tau = jnp.concatenate(
        [jnp.full((3,), tcfg.lr_trans), jnp.full((3,), tcfg.lr_rot)]
    )

    def body_with_bins(s: TrackState, bins) -> TrackState:
        (loss, out), (g_tau, g_ab) = grad_fn(jnp.zeros(6), s.ab, s.R, s.T, bins)
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
        )

    def outer_cond(s: TrackState):
        return (~s.done) & (s.it < tcfg.max_iters)

    def outer_body(s: TrackState) -> TrackState:
        # rebin at the current pose with a pixel-radius margin
        bins = prepare_bins(params, active, s.R, s.T, intr, rcfg, margin=tcfg.bin_margin)

        def inner_cond(st: TrackState):
            return (~st.done) & (st.it < tcfg.max_iters) & (
                st.it < s.it + tcfg.rebin_every
            )

        return jax.lax.while_loop(
            inner_cond, lambda st: body_with_bins(st, bins), s
        )

    H, W = intr.height, intr.width
    C = params["means"].shape[0]
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
    )
    s = jax.lax.while_loop(outer_cond, outer_body, init)
    median_depth = get_median_depth(s.depth, s.opacity)
    return TrackResult(
        R=s.R,
        T=s.T,
        exposure_a=s.ab[0],
        exposure_b=s.ab[1],
        image=s.image,
        depth=s.depth,
        opacity=s.opacity,
        n_touched=s.n_touched,
        median_depth=median_depth,
        iterations=s.it,
        loss=s.loss,
    )
