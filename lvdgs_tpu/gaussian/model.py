"""Fixed-capacity Gaussian map: a structure-of-arrays pytree.

The reference's `GaussianModel` (missing from its snapshot; API reconstructed
in SURVEY.md §2.9 from call sites such as reference utils/slam_backend.py:76-145)
grows and shrinks tensors dynamically with torch.cat / boolean indexing. XLA
wants static shapes, so here the map has a fixed capacity `C` and an `active`
mask; densify/prune/seed are masked scatter operations at static shape:

- seeding (`extend_from_pcd_seq` parity): backproject a strided, masked depth
  map, compute initial scales from device-side 3-NN distances (replacing the
  CUDA `simple-knn` submodule), and write into free slots.
- densify: clone small high-gradient Gaussians, split large ones (3DGS
  semantics), writing children into free slots.
- prune: clear the active bit.

The optimizer is a hand-rolled per-field Adam so that per-slot state can be
zeroed when a slot is (re)allocated — mirroring 3DGS's optimizer-state
surgery on densification — and so the position learning rate can follow the
3DGS exponential schedule (`update_learning_rate`).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.camera import Camera, Intrinsics

SH_C0 = 0.28209479177387814

# learnable field names (everything else is bookkeeping)
PARAM_FIELDS = ("means", "features_dc", "log_scales", "quats", "logit_opacities")


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


class GaussianMap(struct.PyTreeNode):
    """All arrays have leading dim = capacity C."""

    means: jax.Array  # (C, 3) world positions
    features_dc: jax.Array  # (C, 3) SH DC coefficients (sh_degree=0)
    log_scales: jax.Array  # (C, 3)
    quats: jax.Array  # (C, 4) wxyz, normalised on use
    logit_opacities: jax.Array  # (C,)
    active: jax.Array  # (C,) bool
    unique_kf_ids: jax.Array  # (C,) int32, -1 when inactive
    n_obs: jax.Array  # (C,) int32 covisibility counter
    max_radii2d: jax.Array  # (C,) float32
    grad_accum: jax.Array  # (C,) accumulated ||d loss/d ndc_mean2d||
    grad_denom: jax.Array  # (C,) visibility count for grad_accum

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def num_active(self) -> jax.Array:
        return self.active.sum()

    @property
    def scaling(self) -> jax.Array:
        return jnp.exp(self.log_scales)

    @property
    def opacities(self) -> jax.Array:
        return jax.nn.sigmoid(self.logit_opacities)

    @property
    def colors(self) -> jax.Array:
        return jnp.clip(0.5 + SH_C0 * self.features_dc, 0.0, 1.0)

    def params(self) -> Dict[str, jax.Array]:
        return {f: getattr(self, f) for f in PARAM_FIELDS}

    def with_params(self, p: Dict[str, jax.Array]) -> "GaussianMap":
        return self.replace(**p)


def create_map(capacity: int) -> GaussianMap:
    return GaussianMap(
        means=jnp.zeros((capacity, 3), jnp.float32),
        features_dc=jnp.zeros((capacity, 3), jnp.float32),
        log_scales=jnp.full((capacity, 3), -10.0, jnp.float32),
        quats=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32), (capacity, 1)),
        logit_opacities=jnp.full((capacity,), -10.0, jnp.float32),
        active=jnp.zeros((capacity,), bool),
        unique_kf_ids=jnp.full((capacity,), -1, jnp.int32),
        n_obs=jnp.zeros((capacity,), jnp.int32),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        grad_denom=jnp.zeros((capacity,), jnp.float32),
    )


# ---------------------------------------------------------------------------
# free-slot allocation


def _alloc_destinations(active: jax.Array, want: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Map each wanted candidate to a free slot index, at static shape.

    Returns (dest, ok): dest[i] is the slot for candidate i (or C when the
    candidate is unwanted / no slot is free — use scatter mode='drop'),
    ok[i] says whether the write happens.
    """
    C = active.shape[0]
    # stable sort: free slots first, in index order
    free_order = jnp.argsort(active.astype(jnp.int32), stable=True)
    n_free = C - active.sum()
    cand_rank = jnp.cumsum(want.astype(jnp.int32)) - 1  # rank among wanted
    ok = want & (cand_rank < n_free) & (cand_rank >= 0)
    safe_rank = jnp.clip(cand_rank, 0, C - 1)
    dest = jnp.where(ok, free_order[safe_rank], C)
    return dest, ok


def zero_adam_slots(opt_state: "AdamState", dest: jax.Array, fields=PARAM_FIELDS) -> "AdamState":
    """Zero Adam moments at (re)allocated slots — parity with 3DGS's
    optimizer-state surgery (cat_tensors_to_optimizer zeroes exp_avg of new
    rows)."""
    new_m = dict(opt_state.m)
    new_v = dict(opt_state.v)
    for f in fields:
        zeros = jnp.zeros((dest.shape[0],) + opt_state.m[f].shape[1:], opt_state.m[f].dtype)
        new_m[f] = opt_state.m[f].at[dest].set(zeros, mode="drop")
        new_v[f] = opt_state.v[f].at[dest].set(zeros, mode="drop")
    return opt_state.replace(m=new_m, v=new_v)


def _write_new(
    gmap: GaussianMap,
    dest: jax.Array,
    ok: jax.Array,
    *,
    means,
    features_dc,
    log_scales,
    quats,
    logit_opacities,
    kf_id,
) -> GaussianMap:
    """Scatter new Gaussians into their destination slots (C == drop)."""

    def sc(arr, vals):
        return arr.at[dest].set(vals, mode="drop")

    okf = ok.astype(jnp.int32)
    return gmap.replace(
        means=sc(gmap.means, means),
        features_dc=sc(gmap.features_dc, features_dc),
        log_scales=sc(gmap.log_scales, log_scales),
        quats=sc(gmap.quats, quats),
        logit_opacities=sc(gmap.logit_opacities, logit_opacities),
        active=gmap.active.at[dest].set(ok, mode="drop"),
        unique_kf_ids=gmap.unique_kf_ids.at[dest].set(
            jnp.where(ok, kf_id, -1), mode="drop"
        ),
        n_obs=gmap.n_obs.at[dest].set(0 * okf, mode="drop"),
        max_radii2d=gmap.max_radii2d.at[dest].set(jnp.zeros_like(dest, jnp.float32), mode="drop"),
        grad_accum=gmap.grad_accum.at[dest].set(jnp.zeros_like(dest, jnp.float32), mode="drop"),
        grad_denom=gmap.grad_denom.at[dest].set(jnp.zeros_like(dest, jnp.float32), mode="drop"),
    )


# ---------------------------------------------------------------------------
# seeding from a depth map (extend_from_pcd_seq parity)


def _knn_mean_sq_dist(pts: jax.Array, valid: jax.Array, k: int = 3) -> jax.Array:
    """Mean squared distance to the k nearest valid neighbours.

    TPU-native replacement for the CUDA `simple-knn` distCUDA2 (SURVEY.md
    §2.8 item 2): blocked dense distances + top_k. pts is (P, 3) with a
    validity mask; invalid points get distance 1.
    """
    P = pts.shape[0]
    big = jnp.float32(1e12)
    block = 1024 if P > 1024 else P

    pts_sq = (pts**2).sum(-1)

    def body(i, acc):
        chunk = jax.lax.dynamic_slice_in_dim(pts, i * block, block, 0)
        chunk_sq = (chunk**2).sum(-1)
        d2 = (
            chunk_sq[:, None]
            - 2.0 * chunk @ pts.T
            + pts_sq[None, :]
        )
        # mask out self and invalid neighbours
        rows = jax.lax.broadcasted_iota(jnp.int32, (block, P), 0) + i * block
        cols = jax.lax.broadcasted_iota(jnp.int32, (block, P), 1)
        d2 = jnp.where((rows == cols) | ~valid[None, :], big, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        mean_d2 = (-neg_top).mean(axis=-1)
        return jax.lax.dynamic_update_slice_in_dim(acc, mean_d2, i * block, 0)

    acc = jnp.zeros((P,), jnp.float32)
    nblocks = -(-P // block)
    acc = jax.lax.fori_loop(0, nblocks, body, acc)
    return jnp.clip(jnp.where(valid, acc, 1.0), 1e-7, None)


def backproject(
    depth: jax.Array, cam_R: jax.Array, cam_T: jax.Array, intr: Intrinsics
) -> jax.Array:
    """Depth map (H, W) -> world points (H, W, 3) using w2c pose (R, T)."""
    H, W = depth.shape
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = (u - intr.cx) * depth / intr.fx
    y = (v - intr.cy) * depth / intr.fy
    p_cam = jnp.stack([x, y, depth], axis=-1)
    R_c2w = cam_R.T
    t_c2w = -(R_c2w @ cam_T)
    return p_cam @ R_c2w.T + t_c2w


def seed_from_depth(
    gmap: GaussianMap,
    cam: Camera,
    depth: jax.Array,
    intr: Intrinsics,
    *,
    kf_id: jax.Array | int,
    downsample: int,
    point_size: float = 0.01,
    adaptive_pointsize: bool = True,
    init_opacity: float = 0.5,
    opt_state: "AdamState | None" = None,
):
    """Seed new Gaussians from a (masked) depth map.

    Parity with the reconstructed `extend_from_pcd_seq` (SURVEY.md §2.9;
    MonoGS conventions): pixels are strided by `downsample`, invalid (zero)
    depth is skipped, colors come from the frame, initial scale is
    sqrt(mean 3-NN squared distance), optionally clamped to
    point_size * depth when adaptive_pointsize is on.
    """
    H, W = depth.shape
    stride = max(1, int(round(np.sqrt(downsample))))
    d_s = depth[::stride, ::stride]
    pts_w = backproject(depth, cam.R, cam.T, intr)[::stride, ::stride]
    cols = cam.image.transpose(1, 2, 0)[::stride, ::stride]

    P = d_s.size
    pts = pts_w.reshape(P, 3)
    rgb = cols.reshape(P, 3)
    d_flat = d_s.reshape(P)
    valid = d_flat > 0.0

    mean_sq = _knn_mean_sq_dist(pts, valid)
    scale = jnp.sqrt(mean_sq)
    if adaptive_pointsize:
        scale = jnp.minimum(scale, point_size * d_flat)
    scale = jnp.clip(scale, 1e-6, None)

    dest, ok = _alloc_destinations(gmap.active, valid)
    kf = jnp.asarray(kf_id, jnp.int32)
    out = _write_new(
        gmap,
        dest,
        ok,
        means=pts,
        features_dc=(rgb - 0.5) / SH_C0,
        log_scales=jnp.log(scale)[:, None].repeat(3, axis=1),
        quats=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32), (P, 1)),
        logit_opacities=jnp.full((P,), inverse_sigmoid(jnp.float32(init_opacity))),
        kf_id=jnp.full((P,), kf, jnp.int32),
    )
    if opt_state is None:
        return out
    return out, zero_adam_slots(opt_state, dest)


def _seed_step_impl(gmap, cam, depth, kf_id, opt_state, *, intr, downsample,
                    point_size, adaptive_pointsize):
    return seed_from_depth(
        gmap, cam, depth, intr,
        kf_id=kf_id, downsample=downsample, point_size=point_size,
        adaptive_pointsize=adaptive_pointsize, opt_state=opt_state,
    )


# One-dispatch seeding for the SLAM hot path: eager op-by-op execution of
# seed_from_depth costs ~60 separate dispatches (each a relay round trip on
# the tunnel — measured 3.6 s/keyframe in round 1); jitted it is one.
seed_step = jax.jit(
    _seed_step_impl,
    static_argnames=("intr", "downsample", "point_size", "adaptive_pointsize"),
    donate_argnames=("gmap", "opt_state"),
)


# ---------------------------------------------------------------------------
# densification / pruning (3DGS semantics at static shape)


def add_densification_stats(
    gmap: GaussianMap, vs_grad_ndc: jax.Array, visibility: jax.Array
) -> GaussianMap:
    """Accumulate ||d loss / d mean2d_ndc|| for visible Gaussians
    (reference utils/slam_backend.py:128-130 call sites)."""
    norm = jnp.linalg.norm(vs_grad_ndc, axis=-1)
    vis = visibility & gmap.active
    return gmap.replace(
        grad_accum=gmap.grad_accum + jnp.where(vis, norm, 0.0),
        grad_denom=gmap.grad_denom + vis.astype(jnp.float32),
    )


def update_max_radii(gmap: GaussianMap, radii: jax.Array, visibility: jax.Array) -> GaussianMap:
    return gmap.replace(
        max_radii2d=jnp.where(
            visibility & gmap.active, jnp.maximum(gmap.max_radii2d, radii), gmap.max_radii2d
        )
    )


def prune_points(gmap: GaussianMap, mask: jax.Array) -> GaussianMap:
    """Deactivate Gaussians where mask is True (reference API prune_points)."""
    keep = gmap.active & ~mask
    return gmap.replace(
        active=keep,
        unique_kf_ids=jnp.where(keep, gmap.unique_kf_ids, -1),
        logit_opacities=jnp.where(keep, gmap.logit_opacities, -10.0),
    )


def _zero_opacity_moments(opt_state: "AdamState", target: jax.Array) -> "AdamState":
    keep = ~target
    new_m = dict(opt_state.m)
    new_v = dict(opt_state.v)
    new_m["logit_opacities"] = jnp.where(keep, opt_state.m["logit_opacities"], 0.0)
    new_v["logit_opacities"] = jnp.where(keep, opt_state.v["logit_opacities"], 0.0)
    return opt_state.replace(m=new_m, v=new_v)


def reset_opacity(gmap: GaussianMap, opt_state: "AdamState | None" = None):
    """opacity <- min(opacity, 0.01) on active Gaussians (3DGS reset_opacity,
    which also resets the opacity optimizer moments)."""
    new_logit = inverse_sigmoid(jnp.minimum(gmap.opacities, 0.01))
    out = gmap.replace(
        logit_opacities=jnp.where(gmap.active, new_logit, gmap.logit_opacities)
    )
    if opt_state is None:
        return out
    return out, _zero_opacity_moments(opt_state, gmap.active)


def reset_opacity_nonvisible(
    gmap: GaussianMap, visible_any: jax.Array, opt_state: "AdamState | None" = None
):
    """Opacity reset restricted to Gaussians seen by no window keyframe
    (reference utils/slam_backend.py:375)."""
    target = gmap.active & ~visible_any
    new_logit = inverse_sigmoid(jnp.minimum(gmap.opacities, 0.01))
    out = gmap.replace(
        logit_opacities=jnp.where(target, new_logit, gmap.logit_opacities)
    )
    if opt_state is None:
        return out
    return out, _zero_opacity_moments(opt_state, target)


def _split_samples(key, means, log_scales, quats):
    """Sample new positions from the parent Gaussian (3DGS split)."""
    stds = jnp.exp(log_scales)
    eps = jax.random.normal(key, means.shape)
    # rotate sample by parent orientation
    from ..ops.rasterizer import quat_to_rotmat

    Rm = quat_to_rotmat(quats)
    offs = jnp.einsum("nij,nj->ni", Rm, eps * stds)
    return means + offs


def densify_and_prune(
    gmap: GaussianMap,
    key: jax.Array,
    *,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float | None,
    percent_dense: float = 0.01,
    opt_state: "AdamState | None" = None,
    aux_vis: jax.Array | None = None,
):
    """Clone + split + prune, 3DGS `densify_and_prune` semantics at static
    shape (consumed at reference utils/slam_backend.py:132-137, 364-369).

    `aux_vis` (optional, (..., C) bool) carries per-Gaussian visibility
    columns through the reshuffle: clone/split children inherit their
    parent's column and pruned slots are zeroed, so a visibility snapshot
    taken BEFORE this call stays valid afterwards. Used by the mapping
    loop's saturation-feedback path, whose full-depth probe visibility is
    measured once per rebin period — without inheritance, Gaussians
    split/cloned mid-period would read as unobserved by the covisibility
    prune and the opacity reset (ADVICE r2). Returned as a third element
    when provided."""
    grads = jnp.where(gmap.grad_denom > 0, gmap.grad_accum / jnp.maximum(gmap.grad_denom, 1.0), 0.0)
    scaling = gmap.scaling
    max_scale = scaling.max(axis=1)
    hi_grad = (grads >= grad_threshold) & gmap.active

    clone_mask = hi_grad & (max_scale <= percent_dense * extent)
    split_mask = hi_grad & (max_scale > percent_dense * extent)

    # --- clone: copy parameters verbatim into free slots
    dest, ok = _alloc_destinations(gmap.active, clone_mask)
    gmap = _write_new(
        gmap,
        dest,
        ok,
        means=gmap.means,
        features_dc=gmap.features_dc,
        log_scales=gmap.log_scales,
        quats=gmap.quats,
        logit_opacities=gmap.logit_opacities,
        kf_id=gmap.unique_kf_ids,
    )
    if opt_state is not None:
        opt_state = zero_adam_slots(opt_state, dest)
    if aux_vis is not None:
        # clone children inherit the parent's visibility column
        aux_vis = aux_vis.at[..., dest].set(aux_vis, mode="drop")

    # --- split: two children at 1/1.6 scale, parent pruned. At full
    # capacity a child may fail to allocate; a parent is only pruned when at
    # least one child was actually written (otherwise splitting at capacity
    # would silently destroy map mass).
    k1, k2 = jax.random.split(key)
    child_ls = gmap.log_scales - jnp.log(1.6)
    any_child_ok = jnp.zeros_like(split_mask)
    for kk in (k1, k2):
        child_means = _split_samples(kk, gmap.means, gmap.log_scales, gmap.quats)
        dest, ok = _alloc_destinations(gmap.active, split_mask)
        gmap = _write_new(
            gmap,
            dest,
            ok,
            means=child_means,
            features_dc=gmap.features_dc,
            log_scales=child_ls,
            quats=gmap.quats,
            logit_opacities=gmap.logit_opacities,
            kf_id=gmap.unique_kf_ids,
        )
        if opt_state is not None:
            opt_state = zero_adam_slots(opt_state, dest)
        if aux_vis is not None:
            # split children inherit the parent's visibility column
            aux_vis = aux_vis.at[..., dest].set(aux_vis, mode="drop")
        any_child_ok = any_child_ok | ok
    split_parent_prune = split_mask & any_child_ok
    gmap = prune_points(gmap, split_parent_prune)
    if aux_vis is not None:
        aux_vis = aux_vis & ~split_parent_prune

    # --- prune by opacity / screen size / world size
    prune_mask = gmap.active & (gmap.opacities < min_opacity)
    if max_screen_size is not None:
        big_vs = gmap.max_radii2d > max_screen_size
        big_ws = gmap.scaling.max(axis=1) > 0.1 * extent
        prune_mask = prune_mask | (gmap.active & (big_vs | big_ws))
    gmap = prune_points(gmap, prune_mask)
    if aux_vis is not None:
        aux_vis = aux_vis & ~prune_mask

    # reset densification stats (3DGS zeroes them after densify)
    gmap = gmap.replace(
        grad_accum=jnp.zeros_like(gmap.grad_accum),
        grad_denom=jnp.zeros_like(gmap.grad_denom),
        max_radii2d=jnp.zeros_like(gmap.max_radii2d),
    )
    if aux_vis is not None:
        if opt_state is None:
            return gmap, aux_vis
        return gmap, opt_state, aux_vis
    if opt_state is None:
        return gmap
    return gmap, opt_state


# ---------------------------------------------------------------------------
# optimizer: per-field Adam with 3DGS learning-rate semantics


def position_lr(
    step: jax.Array,
    *,
    lr_init: float,
    lr_final: float,
    lr_delay_mult: float,
    max_steps: int,
    spatial_scale: float,
) -> jax.Array:
    """3DGS exponential position LR schedule (`get_expon_lr_func`)."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return log_lerp * spatial_scale


@struct.dataclass
class AdamState:
    m: Dict[str, jax.Array]
    v: Dict[str, jax.Array]
    count: jax.Array


@dataclasses.dataclass(frozen=True)
class MapOptimizer:
    """Hand-rolled per-field Adam.

    Learning rates mirror the reference `opt_params`
    (configs/mono/KITTI/base_config.yaml:59-76): position uses the
    exponential schedule scaled by `spatial_scale` (cameras_extent),
    the rest are constant.
    """

    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.001
    rotation_lr: float = 0.001
    position_lr_init: float = 0.0016
    position_lr_final: float = 0.00016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30000
    spatial_scale: float = 1.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-15

    def init(self, gmap: GaussianMap) -> AdamState:
        zeros = {f: jnp.zeros_like(getattr(gmap, f)) for f in PARAM_FIELDS}
        return AdamState(
            m=zeros, v=jax.tree_util.tree_map(jnp.zeros_like, zeros), count=jnp.zeros((), jnp.int32)
        )

    def lrs(self, step: jax.Array) -> Dict[str, jax.Array]:
        return {
            "means": position_lr(
                step,
                lr_init=self.position_lr_init,
                lr_final=self.position_lr_final,
                lr_delay_mult=self.position_lr_delay_mult,
                max_steps=self.position_lr_max_steps,
                spatial_scale=self.spatial_scale,
            ),
            "features_dc": jnp.asarray(self.feature_lr),
            "log_scales": jnp.asarray(self.scaling_lr),
            "quats": jnp.asarray(self.rotation_lr),
            "logit_opacities": jnp.asarray(self.opacity_lr),
        }

    def step(
        self,
        gmap: GaussianMap,
        grads: Dict[str, jax.Array],
        state: AdamState,
        lr_step: jax.Array,
    ) -> Tuple[GaussianMap, AdamState]:
        count = state.count + 1
        lrs = self.lrs(lr_step)
        active = gmap.active
        new_params, new_m, new_v = {}, {}, {}
        for f in PARAM_FIELDS:
            g = grads[f]
            mask = active if g.ndim == 1 else active[:, None]
            # non-finite guard: one NaN/Inf gradient component (degenerate
            # projection, saturated blend) must cost one zeroed update, not
            # the whole map — a single poisoned Adam step is unrecoverable
            g = jnp.where(mask & jnp.isfinite(g), g, 0.0)
            m = self.b1 * state.m[f] + (1 - self.b1) * g
            v = self.b2 * state.v[f] + (1 - self.b2) * g * g
            mhat = m / (1 - self.b1 ** count)
            vhat = v / (1 - self.b2 ** count)
            upd = lrs[f] * mhat / (jnp.sqrt(vhat) + self.eps)
            new_params[f] = getattr(gmap, f) - jnp.where(mask, upd, 0.0)
            new_m[f] = m
            new_v[f] = v
        return gmap.with_params(new_params), AdamState(m=new_m, v=new_v, count=count)


@jax.jit
def gauge_rescale(gmap: GaussianMap, opt_state: "AdamState", k: jax.Array):
    """Similarity-rescale the map about the world origin by factor ``k``
    (means *= k, scales *= k). With camera translations rescaled by the same
    factor (the caller's job), every rendered image is IDENTICAL and depth
    scales by exactly k — the monocular gauge freedom. Used by the SLAM
    system's mono-scale servo to pin the free gauge to the mono prior's
    global scale instead of letting mapping/pose refinement walk it
    (r4 street bench: 0.80 -> ~0.50 over 90 frames; PERFORMANCE.md).

    Adam moments for ``means`` are EMAs of dL/dmeans, which scales by 1/k
    under the reparametrization — rescale m by 1/k and v by 1/k² so the
    next steps see consistent statistics. ``log_scales`` shift additively
    (gradients unchanged); other fields are gauge-invariant.
    """
    k = jnp.asarray(k, jnp.float32)
    gmap = gmap.replace(
        means=gmap.means * k,
        log_scales=gmap.log_scales + jnp.log(k),
    )
    m = dict(opt_state.m)
    v = dict(opt_state.v)
    m["means"] = m["means"] / k
    v["means"] = v["means"] / (k * k)
    return gmap, AdamState(m=m, v=v, count=opt_state.count)


@functools.partial(jax.jit, static_argnames=("new_capacity",))
def grow_capacity(
    gmap: GaussianMap,
    new_capacity: int,
    opt_state: "AdamState | None" = None,
):
    """Grow the map's slot capacity (one jitted dispatch — the ~40 eager
    concats cost >1 s of relay round trips per event).

    TPU-native counterpart of the reference's dynamic torch.cat growth
    (reconstructed GaussianModel API, SURVEY.md §2.9): shapes are static per
    compiled program, so the SLAM system starts with a small capacity and
    re-pads all per-slot arrays when the map approaches saturation —
    programs recompile once per capacity step (persistent-cached) and every
    capacity-proportional cost (projection, Adam, coarse binning, gradient
    scatters) tracks the live map size instead of a worst-case bound.

    Existing slot indices are preserved (everything is appended), so stale
    tile bins from a previous dispatch remain valid.
    """
    C = gmap.capacity
    if new_capacity <= C:
        return gmap if opt_state is None else (gmap, opt_state)
    fresh = create_map(new_capacity)

    def grown(old, init):
        return jnp.concatenate([old, init[C:]], axis=0)

    gmap = GaussianMap(
        **{
            f.name: grown(getattr(gmap, f.name), getattr(fresh, f.name))
            for f in dataclasses.fields(GaussianMap)
        }
    )
    if opt_state is None:
        return gmap
    pad = {
        f: jnp.zeros((new_capacity - C,) + opt_state.m[f].shape[1:], jnp.float32)
        for f in PARAM_FIELDS
    }
    opt_state = AdamState(
        m={f: jnp.concatenate([opt_state.m[f], pad[f]], 0) for f in PARAM_FIELDS},
        v={f: jnp.concatenate([opt_state.v[f], pad[f]], 0) for f in PARAM_FIELDS},
        count=opt_state.count,
    )
    return gmap, opt_state


@functools.partial(jax.jit, static_argnames=("new_capacity",))
def compact_and_resize(
    gmap: GaussianMap,
    new_capacity: int,
    opt_state: "AdamState | None" = None,
):
    """Compact active Gaussians to the slot prefix and resize capacity
    (one jitted dispatch; the shrink counterpart of grow_capacity).

    Returns (gmap, opt_state, take) where `take[j]` is the OLD slot that
    new slot j came from — callers must re-index any slot-aligned arrays
    they hold (e.g. per-keyframe visibility masks) with the same gather.
    Requires num_active <= new_capacity (inactive slots are inert, so the
    dropped tail carries no state).
    """
    order = jnp.argsort(~gmap.active, stable=True)  # active slots first
    take = order[:new_capacity]

    def g(arr):
        return arr[take]

    gmap = GaussianMap(
        **{f.name: g(getattr(gmap, f.name)) for f in dataclasses.fields(GaussianMap)}
    )
    if opt_state is None:
        return gmap, take
    opt_state = AdamState(
        m={f: opt_state.m[f][take] for f in PARAM_FIELDS},
        v={f: opt_state.v[f][take] for f in PARAM_FIELDS},
        count=opt_state.count,
    )
    return gmap, opt_state, take
