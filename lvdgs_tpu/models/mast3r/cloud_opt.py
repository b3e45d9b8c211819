"""MASt3R cloud optimization suite, TPU-native.

JAX re-design of the reference's `mast3r/cloud_opt/` package:

- `batched_triangulate` / `matches_to_depths`: batched DLT triangulation of
  2D matches and confidence-weighted depth aggregation (reference
  mast3r/cloud_opt/triangulation.py:13-81). The reference loops over
  sub-batches on GPU; here everything is one fused XLA program (normal
  equations + batched 3x3 solve instead of torch.linalg.lstsq).
- `tsdf_refine_depths`: TSDF-based depth refinement — for every pixel,
  search along the ray for the depth whose multi-view truncated signed
  distance is closest to zero (reference
  mast3r/cloud_opt/tsdf_optimizer.py:34-128, `TSDFPostProcess`). The
  reference loops per-view with a 1e7-point batch loop; here the whole
  (view, pixel, sample) lattice is one vmapped program.
- `sparse_scene_optimizer` / `sparse_global_alignment`: SfM-style sparse
  global alignment (reference mast3r/cloud_opt/sparse_ga.py:118-472):
  per-image quaternion+translation composed along a minimum-spanning-tree
  kinematic chain, log-focals, principal points, log-sizes and subsampled
  ("core") depthmaps, optimized in two phases — 3D matching loss (gamma
  1.1), then 2D reprojection loss (gamma 0.4) — with a cosine LR schedule.
  Correspondences are flattened into padded static-shape arrays and both
  phases run as single jitted Adam `lax.fori_loop`s (the reference runs a
  Python loop of 500 torch steps per phase).

Simplifications vs the reference, documented for parity review: canonical
views use confidence-weighted averaging (reference offers 'avg-angle'
weighting, sparse_ga.py:817-856); the low-confidence-pair dust3r fallback
loss (loss_dust3r_w) and the optional low-rank depth projection
(lora_depth, spectral_projection_of_depthmaps) are not implemented — the
SLAM loop never calls this module (SURVEY.md §2.2: optional capability).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# triangulation (reference mast3r/cloud_opt/triangulation.py)


def batched_triangulate(pts2d: jax.Array, proj_mats: jax.Array) -> jax.Array:
    """DLT triangulation. pts2d (B, Ncams, Npts, 2), proj_mats (B, Ncams, 3, 4)
    -> (B, Npts, 3) world points (NaN where the system is degenerate)."""
    B, Nc, Np, two = pts2d.shape
    assert two == 2 and proj_mats.shape == (B, Nc, 3, 4)
    # rows: P0 - x P2 and P1 - y P2  (reference triangulation.py:18-20)
    x = proj_mats[:, :, None, 0, :] - pts2d[..., 0:1] * proj_mats[:, :, None, 2, :]
    y = proj_mats[:, :, None, 1, :] - pts2d[..., 1:2] * proj_mats[:, :, None, 2, :]
    eq = jnp.concatenate([x, y], axis=1).transpose(0, 2, 1, 3)  # (B, Npts, 2Nc, 4)
    A = eq[..., :3]
    b = -eq[..., 3]
    # least squares via normal equations: (A^T A) p = A^T b
    AtA = jnp.einsum("bpni,bpnj->bpij", A, A)
    Atb = jnp.einsum("bpni,bpn->bpi", A, b)
    sol = jnp.linalg.solve(AtA, Atb[..., None])[..., 0]
    ok = jnp.linalg.det(AtA) > 1e-12
    return jnp.where(ok[..., None], sol, jnp.nan)


def matches_to_depths(
    intrinsics: jax.Array,  # (B, Ncams, 3, 3)
    extrinsics: jax.Array,  # (B, Ncams, 3, 4) w2c
    matches: jax.Array,  # (B, Ncams-1, H, W, 5) = (x1, y1, x2, y2, conf)
    min_num_valids_ratio: float = 0.3,
):
    """Triangulate per-pair matches against the reference view and aggregate
    into a confidence-weighted depth map (reference triangulation.py:24-81).
    Returns (points (B,H,W,3), depths (B,H,W), confs (B,H,W))."""
    B, Nv, H, W, five = matches.shape
    assert five == 5
    pts1 = matches[..., 0:2].reshape(B * Nv, 1, H * W, 2)
    pts2 = matches[..., 2:4].reshape(B * Nv, 1, H * W, 2)
    confs = matches[..., 4]

    P_all = jnp.einsum("bnij,bnjk->bnik", intrinsics, extrinsics)  # (B, Nc, 3, 4)
    P1 = jnp.broadcast_to(P_all[:, 0:1], (B, Nv, 3, 4)).reshape(B * Nv, 1, 3, 4)
    P2 = P_all[:, 1:].reshape(B * Nv, 1, 3, 4)

    pts3d = batched_triangulate(
        jnp.concatenate([pts1, pts2], axis=1), jnp.concatenate([P1, P2], axis=1)
    )  # (B*Nv, H*W, 3)
    pts3d = pts3d.reshape(B, Nv, H, W, 3)
    valid = jnp.isfinite(pts3d).all(axis=-1)
    confs = jnp.where(valid, confs, 0.0)
    w = confs / jnp.maximum(confs.sum(axis=1, keepdims=True), 1e-5)
    agg = jnp.nansum(jnp.where(valid[..., None], pts3d, 0.0) * w[..., None], axis=1)
    n_valid = valid.sum(axis=1)
    enough = n_valid > jnp.floor(Nv * min_num_valids_ratio)
    agg = jnp.where(enough[..., None], agg, jnp.nan)

    # world -> reference-camera depth
    E0 = extrinsics[:, 0]
    pc = jnp.einsum("bij,bhwj->bhwi", E0[:, :3, :3], agg) + E0[:, None, None, :3, 3]
    return agg, pc[..., 2], confs.sum(axis=1)


# ---------------------------------------------------------------------------
# TSDF depth refinement (reference mast3r/cloud_opt/tsdf_optimizer.py)


def _project(pts: jax.Array, cam2w: jax.Array, focals: jax.Array, pps: jax.Array):
    """(..., 3) world points -> pixel xy + camera depth for each of N views.
    cam2w (N,4,4), focals (N,) or (N,2), pps (N,2).
    Returns xy (N, ..., 2), z (N, ...)."""
    R = cam2w[:, :3, :3]
    t = cam2w[:, :3, 3]
    pc = jnp.einsum("nji,...j->n...i", R, pts) - jnp.einsum(
        "nji,nj->ni", R, t
    ).reshape((cam2w.shape[0],) + (1,) * (pts.ndim - 1) + (3,))
    f = focals[:, None] if focals.ndim == 1 else focals
    f = f.reshape((cam2w.shape[0],) + (1,) * (pts.ndim - 1) + (-1,))
    pp = pps.reshape((cam2w.shape[0],) + (1,) * (pts.ndim - 1) + (2,))
    z = pc[..., 2]
    xy = pc[..., :2] / jnp.maximum(jnp.abs(z[..., None]), 1e-9) * jnp.sign(
        z[..., None]
    ) * f + pp
    return xy, z


def tsdf_query(
    qpts: jax.Array,  # (Q, 3) world points
    depthmaps: jax.Array,  # (N, H, W)
    confs: jax.Array,  # (N, H, W)
    cam2w: jax.Array,  # (N, 4, 4)
    focals: jax.Array,
    pps: jax.Array,
    thresh: float,
):
    """Confidence-weighted truncated SDF of query points against all views
    (reference tsdf_optimizer.py:80-108 `_TSDF_query`). Returns (tsdf (Q,),
    valid (Q,))."""
    N, H, W = depthmaps.shape
    xy, z = _project(qpts, cam2w, focals, pps)  # (N, Q, 2), (N, Q)
    xi = jnp.round(xy[..., 0]).astype(jnp.int32)
    yi = jnp.round(xy[..., 1]).astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (z > 0)
    xi = jnp.clip(xi, 0, W - 1)
    yi = jnp.clip(yi, 0, H - 1)
    dm = jnp.take_along_axis(
        depthmaps.reshape(N, H * W), yi * W + xi, axis=1
    )
    cf = jnp.take_along_axis(confs.reshape(N, H * W), yi * W + xi, axis=1)
    sdf = dm - z
    unseen = sdf < -thresh
    tsdf = jnp.clip(sdf, -thresh, None)
    wgt = jnp.exp(cf) * (~unseen) * inb
    wsum = wgt.sum(axis=0)
    valid = wsum > 0
    return jnp.where(valid, (wgt * tsdf).sum(axis=0) / jnp.maximum(wsum, 1e-9), 0.0), valid


@functools.partial(jax.jit, static_argnames=("niter", "nsamples"))
def tsdf_refine_depths(
    depthmaps: jax.Array,  # (N, H, W)
    confs: jax.Array,  # (N, H, W)
    cam2w: jax.Array,  # (N, 4, 4)
    focals: jax.Array,  # (N,) or (N, 2)
    pps: jax.Array,  # (N, 2)
    key: jax.Array,
    thresh: float = 0.1,
    niter: int = 1,
    nsamples: int = 128,
):
    """Refine every depth map toward the TSDF zero level along each ray
    (reference tsdf_optimizer.py:34-78 `_refine_depths_with_TSDF`).
    Returns refined (N, H, W) depthmaps."""
    N, H, W = depthmaps.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    def refine_view(dm0, vi, key):
        def unproject(depth):
            # (H, W, S) depths -> world points for view vi
            f = focals[vi] if focals.ndim == 1 else focals[vi, 0]
            fy = focals[vi] if focals.ndim == 1 else focals[vi, 1]
            x = (xs[..., None] - pps[vi, 0]) / f * depth
            y = (ys[..., None] - pps[vi, 1]) / fy * depth
            pc = jnp.stack([x, y, depth], axis=-1)
            return jnp.einsum("ij,hwsj->hwsi", cam2w[vi, :3, :3], pc) + cam2w[vi, :3, 3]

        dm = dm0
        for it in range(niter):
            curthresh = (niter - it) * thresh
            k = jax.random.fold_in(key, it)
            offs = (jax.random.normal(k, (H, W, nsamples)) - 1.0) * curthresh
            cand = dm[..., None] + offs  # (H, W, S)
            pts = unproject(cand).reshape(-1, 3)
            vals, valid = tsdf_query(pts, depthmaps, confs, cam2w, focals, pps, curthresh)
            vals = jnp.where(valid, jnp.abs(vals), jnp.inf).reshape(H, W, nsamples)
            best = jnp.argmin(vals, axis=-1)
            allbad = ~jnp.isfinite(vals).any(axis=-1)
            picked = jnp.take_along_axis(cand, best[..., None], axis=-1)[..., 0]
            dm = jnp.where(allbad, dm, picked)
        return dm

    keys = jax.random.split(key, N)
    return jax.vmap(refine_view)(depthmaps, jnp.arange(N), keys)


# ---------------------------------------------------------------------------
# sparse global alignment (reference mast3r/cloud_opt/sparse_ga.py)


def gamma_loss(dist: jax.Array, gamma: float, clip: float = np.inf) -> jax.Array:
    """Robust |d|^gamma loss with unit slope at 0 (reference
    cloud_opt/utils/losses.py:19-28)."""
    if gamma == 1.0:
        return dist
    offset = (1.0 / gamma) ** (1.0 / (gamma - 1.0))
    return (jnp.clip(dist, None, clip) + offset) ** gamma - offset**gamma


def cosine_schedule(alpha, lr_base, lr_end=0.0):
    """Reference cloud_opt/utils/schedules.py:15-17."""
    return lr_end + (lr_base - lr_end) * (1 + jnp.cos(alpha * jnp.pi)) / 2


def _quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(…, 4) xyzw (roma convention, reference sparse_ga.py:172) -> (…,3,3)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


class Correspondences(NamedTuple):
    """Flattened static-shape correspondence set between image pairs.

    Each row m ties anchor `a1[m]` of image `i[m]` (at pixel `xy1[m]`) to
    anchor `a2[m]` of image `j[m]` (at pixel `xy2[m]`) with confidence
    `conf[m]` (0 for padding)."""

    i: jax.Array  # (M,) int32
    j: jax.Array  # (M,) int32
    a1: jax.Array  # (M,) int32 anchor index into core_depth[i]
    a2: jax.Array  # (M,) int32
    xy1: jax.Array  # (M, 2) float pixels in image i
    xy2: jax.Array  # (M, 2)
    conf: jax.Array  # (M,)
    # depth of the exact match pixel relative to its anchor's depth
    # (reference anchor_depth_offsets, sparse_ga.py:858-886); 1.0 when the
    # caller has no full-resolution depth to measure it from
    rel1: jax.Array  # (M,)
    rel2: jax.Array  # (M,)


@dataclasses.dataclass(frozen=True)
class SparseGAConfig:
    """Reference sparse_scene_optimizer defaults (sparse_ga.py:158-169)."""

    lr1: float = 0.2
    niter1: int = 500
    gamma1: float = 1.1
    lr2: float = 0.02
    niter2: int = 500
    gamma2: float = 0.4
    opt_pp: bool = True
    opt_depth: bool = True
    lr_end_factor: float = 1e-2
    b1: float = 0.9
    b2: float = 0.9  # reference uses Adam(betas=(0.9, 0.9)), sparse_ga.py:443
    eps: float = 1e-8


class SparseGAResult(NamedTuple):
    cam2w: jax.Array  # (N, 4, 4)
    intrinsics: jax.Array  # (N, 3, 3)
    anchor_depths: jax.Array  # (N, S) optimized anchor depths
    pts3d: jax.Array  # (N, S, 3) anchor points in world
    loss1: jax.Array
    loss2: jax.Array


@functools.partial(
    jax.jit, static_argnames=("cfg", "mst_root", "mst_edges", "depth_mode")
)
def sparse_scene_optimizer(
    imsizes: jax.Array,  # (N, 2) [W, H]
    pps0: jax.Array,  # (N, 2) pixels
    base_focals: jax.Array,  # (N,)
    core_depth0: jax.Array,  # (N, S) initial anchor depths
    anchor_xy: jax.Array,  # (N, S, 2) pixel of each anchor
    corres: Correspondences,
    *,
    mst_root: int,
    mst_edges: Tuple[Tuple[int, int], ...],
    cfg: SparseGAConfig = SparseGAConfig(),
    depth_mode: str = "add",
) -> SparseGAResult:
    """Two-phase sparse global alignment (reference sparse_ga.py:158-472).

    Cameras are a kinematic chain over the MST: each image holds a relative
    (quat, trans) to its tree parent; focals/pps/log_sizes/core depths are
    per-image. Phase 1 minimizes the confidence-weighted 3D distance between
    matched anchors (gamma 1.1); phase 2 the 2D reprojection error of the
    partner anchor (gamma 0.4)."""
    N, S = core_depth0.shape
    dtypef = jnp.float32

    median_depths = jnp.median(core_depth0, axis=1)
    core0 = core_depth0 / jnp.maximum(median_depths[:, None], 1e-9)
    diags = jnp.linalg.norm(imsizes.astype(dtypef), axis=1)
    min_f, max_f = 0.25 * diags, 10.0 * diags

    params0 = {
        "quats": jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0], dtypef), (N, 1)),
        "trans": jnp.zeros((N, 3), dtypef),
        "log_focals": jnp.log(base_focals.astype(dtypef)),
        "pps": pps0.astype(dtypef) / imsizes.astype(dtypef),  # normalized
        "log_sizes": jnp.zeros((N,), dtypef),
        "core_depth": core0.astype(dtypef),
    }

    def make_cams(p):
        focals = jnp.clip(jnp.exp(p["log_focals"]), min_f, max_f)  # (N,)
        pps_pix = p["pps"] * imsizes  # (N, 2)
        K = (
            jnp.zeros((N, 3, 3), dtypef)
            .at[:, 0, 0].set(focals)
            .at[:, 1, 1].set(focals)
            .at[:, :2, 2].set(pps_pix)
            .at[:, 2, 2].set(1.0)
        )
        sizes = jnp.exp(p["log_sizes"])
        global_scaling = 1.0 / sizes.min()
        z_cameras = sizes * median_depths * focals / base_focals

        R_rel = _quat_to_rotmat(p["quats"])  # (N, 3, 3)
        t_rel = p["trans"]
        # kinematic chain along the MST (host-static unroll,
        # reference sparse_ga.py:252-258)
        Rw: List = [None] * N
        tw: List = [None] * N
        Rw[mst_root] = R_rel[mst_root]
        tw[mst_root] = t_rel[mst_root]
        for pi, ci in mst_edges:
            Rw[ci] = Rw[pi] @ R_rel[ci]
            tw[ci] = Rw[pi] @ t_rel[ci] + tw[pi]
        Rw = jnp.stack(Rw)
        tw = jnp.stack(tw)

        # recenter so the camera sits z_cameras in front of its focal plane
        # (reference :260-263)
        trans_offset = z_cameras[:, None] * jnp.concatenate(
            [imsizes / focals[:, None] * (0.5 - p["pps"]), jnp.ones((N, 1), dtypef)],
            axis=-1,
        )
        t_new = global_scaling * (tw - jnp.einsum("nij,nj->ni", Rw, trans_offset))

        if depth_mode == "add":
            depths = z_cameras[:, None] + (p["core_depth"] - 1.0) * (
                median_depths * sizes
            )[:, None]
        else:  # 'mul'
            depths = z_cameras[:, None] * p["core_depth"]
        depths = global_scaling * jnp.maximum(depths, 1e-6)
        return K, Rw, t_new, depths, focals, pps_pix

    def anchors_world(K, Rw, t, depths):
        f = jnp.stack([K[:, 0, 0], K[:, 1, 1]], -1)  # (N, 2)
        pp = K[:, :2, 2]
        rays = jnp.concatenate(
            [(anchor_xy - pp[:, None, :]) / f[:, None, :], jnp.ones((N, S, 1), dtypef)],
            axis=-1,
        )
        pc = rays * depths[..., None]
        return jnp.einsum("nij,nsj->nsi", Rw, pc) + t[:, None, :]

    def match_points(Rw, t, depths, focals, pps_pix, idx, a, xy, rel):
        """3D world point of each match: EXACT pixel ray, depth borrowed
        from the pixel's anchor (reference make_pts3d, sparse_ga.py:475-500
        — anchors tie full-res pixels to core-depth entries)."""
        d = depths[idx, a] * rel  # (M,)
        f = focals[idx][:, None]
        pp = pps_pix[idx]
        rays = jnp.concatenate(
            [(xy - pp) / f, jnp.ones((xy.shape[0], 1), dtypef)], axis=-1
        )
        pc = rays * d[:, None]
        return jnp.einsum("mij,mj->mi", Rw[idx], pc) + t[idx]

    conf_sum = jnp.maximum(corres.conf.sum(), 1e-9)

    def loss_3d(p):
        K, Rw, t, depths, focals, pps_pix = make_cams(p)
        p1 = match_points(Rw, t, depths, focals, pps_pix,
                          corres.i, corres.a1, corres.xy1, corres.rel1)
        p2 = match_points(Rw, t, depths, focals, pps_pix,
                          corres.j, corres.a2, corres.xy2, corres.rel2)
        d = jnp.linalg.norm(p1 - p2, axis=-1)
        return (corres.conf * gamma_loss(d, cfg.gamma1)).sum() / conf_sum

    def loss_2d(p):
        K, Rw, t, depths, focals, pps_pix = make_cams(p)
        cam2w = jnp.concatenate(
            [jnp.concatenate([Rw, t[..., None]], -1),
             jnp.tile(jnp.asarray([[0, 0, 0, 1.0]], dtypef)[None], (N, 1, 1))],
            axis=1,
        )
        p1 = match_points(Rw, t, depths, focals, pps_pix,
                          corres.i, corres.a1, corres.xy1, corres.rel1)
        p2 = match_points(Rw, t, depths, focals, pps_pix,
                          corres.j, corres.a2, corres.xy2, corres.rel2)

        # reproject partner match points into each image (both directions)
        def reproj(idx_img, pts, xy_target):
            xy, _z = _project(pts, cam2w, focals, pps_pix)  # (N, M, 2)
            xy_i = xy[idx_img, jnp.arange(pts.shape[0])]  # each match's own view
            return jnp.linalg.norm(xy_i - xy_target, axis=-1)

        d1 = reproj(corres.i, p2, corres.xy1)
        d2 = reproj(corres.j, p1, corres.xy2)
        # normalize pixel errors by image diagonal (scale invariance)
        norm1 = diags[corres.i]
        norm2 = diags[corres.j]
        l = gamma_loss(d1 / norm1 * 512.0, cfg.gamma2) + gamma_loss(
            d2 / norm2 * 512.0, cfg.gamma2
        )
        return (corres.conf * l).sum() / (2 * conf_sum)

    # phase 1 optimizes poses+sizes only; phase 2 additionally unfreezes
    # intrinsics and depth (reference sparse_ga.py:434-456)
    frozen1 = {"quats": False, "trans": False, "log_focals": True,
               "pps": True, "log_sizes": False, "core_depth": True}
    frozen2 = {"quats": False, "trans": False, "log_focals": False,
               "pps": not cfg.opt_pp, "log_sizes": False,
               "core_depth": not cfg.opt_depth}

    def run_phase(params, loss_fn, lr_base, niter, frozen):
        m0 = jax.tree_util.tree_map(jnp.zeros_like, params)
        v0 = jax.tree_util.tree_map(jnp.zeros_like, params)

        def body(it, carry):
            params, m, v = carry
            alpha = it.astype(dtypef) / max(niter, 1)
            lr = cosine_schedule(alpha, lr_base, lr_base * cfg.lr_end_factor)
            loss, g = jax.value_and_grad(loss_fn)(params)
            itf = it.astype(dtypef) + 1.0
            new_params, new_m, new_v = {}, {}, {}
            for k in params:
                gk = jnp.where(jnp.isfinite(g[k]), g[k], 0.0)
                mk = cfg.b1 * m[k] + (1 - cfg.b1) * gk
                vk = cfg.b2 * v[k] + (1 - cfg.b2) * gk * gk
                mh = mk / (1 - cfg.b1**itf)
                vh = vk / (1 - cfg.b2**itf)
                upd = lr * mh / (jnp.sqrt(vh) + cfg.eps)
                if frozen[k]:
                    upd = jnp.zeros_like(upd)
                # pin the root camera (gauge freedom)
                if k in ("quats", "trans"):
                    upd = upd.at[mst_root].set(0.0)
                new_params[k] = params[k] - upd
                new_m[k] = mk
                new_v[k] = vk
            # keep quaternion params unit-norm so Adam stays well-scaled
            # (reference sparse_ga.py:421-422)
            new_params["quats"] = new_params["quats"] / (
                jnp.linalg.norm(new_params["quats"], axis=-1, keepdims=True) + 1e-12
            )
            return (new_params, new_m, new_v)

        params, _, _ = jax.lax.fori_loop(0, niter, body, (params, m0, v0))
        return params, loss_fn(params)

    params, l1 = run_phase(params0, loss_3d, cfg.lr1, cfg.niter1, frozen1)
    params, l2 = run_phase(params, loss_2d, cfg.lr2, cfg.niter2, frozen2)

    K, Rw, t, depths, _, _ = make_cams(params)
    cam2w = jnp.concatenate(
        [jnp.concatenate([Rw, t[..., None]], -1),
         jnp.tile(jnp.asarray([[0, 0, 0, 1.0]], jnp.float32)[None], (N, 1, 1))],
        axis=1,
    )
    pts3d = anchors_world(K, Rw, t, depths)
    return SparseGAResult(
        cam2w=cam2w, intrinsics=K, anchor_depths=depths, pts3d=pts3d,
        loss1=l1, loss2=l2,
    )


def compute_min_spanning_tree(scores: np.ndarray) -> Tuple[int, Tuple[Tuple[int, int], ...]]:
    """Maximum-score spanning tree + farthest-from-leaves root (reference
    sparse_ga.py:991-1009). Host-side (scipy), static output."""
    from scipy import sparse as sp

    n = scores.shape[0]
    graph = sp.dok_array((n, n))
    for i, j in zip(*np.nonzero(scores)):
        graph[i, j] = -float(scores[i, j])
    msp = sp.csgraph.minimum_spanning_tree(graph)

    def bfs_dist(start):
        d, _ = sp.csgraph.breadth_first_order(msp, start, directed=False,
                                              return_predecessors=True)
        ranks = np.zeros(n, dtype=np.int64)
        ranks[d] = np.arange(len(d))
        return ranks

    r1 = bfs_dist(0)
    r2 = bfs_dist(int(r1.argmax()))
    r1 = bfs_dist(int(r2.argmax()))
    root = int(np.minimum(r1, r2).argmax())
    order, preds = sp.csgraph.breadth_first_order(msp, root, directed=False)
    edges = tuple((int(preds[i]), int(i)) for i in order[1:])
    return root, edges


def sparse_global_alignment(
    imsizes: np.ndarray,  # (N, 2) [W, H]
    base_focals: np.ndarray,  # (N,)
    pps: np.ndarray,  # (N, 2)
    canonical_depths: Sequence[np.ndarray],  # N x (hs, ws) subsampled depths
    pair_matches: Sequence[Tuple[int, int, np.ndarray, np.ndarray, np.ndarray]],
    # (i, j, xy_i (M,2), xy_j (M,2), conf (M,)) per pair, pixel coords
    subsample: int = 8,
    cfg: SparseGAConfig = SparseGAConfig(),
) -> SparseGAResult:
    """End-to-end sparse alignment from per-image canonical depths and
    pairwise pixel matches (reference sparse_ga.py:118-155 minus the model
    forward, which the caller runs via models.mast3r.inference +
    fast_reciprocal_nns). Matches snap to the subsample anchor grid
    (reference anchor_depth_offsets, sparse_ga.py:858-886)."""
    N = len(canonical_depths)
    hs, ws = canonical_depths[0].shape
    S = hs * ws

    # anchor pixel coordinates (cell centers of the subsample grid)
    ys, xs = np.meshgrid(np.arange(hs), np.arange(ws), indexing="ij")
    anchor_xy_one = np.stack(
        [xs * subsample + subsample / 2, ys * subsample + subsample / 2], -1
    ).reshape(S, 2)
    anchor_xy = np.tile(anchor_xy_one[None], (N, 1, 1)).astype(np.float32)

    core_depth0 = np.stack([d.reshape(S) for d in canonical_depths]).astype(np.float32)

    # flatten matches to anchors
    scores = np.zeros((N, N), np.float64)
    ii, jj, a1, a2, xy1, xy2, cf = [], [], [], [], [], [], []
    for (i, j, mxy1, mxy2, conf) in pair_matches:
        g1x = np.clip((mxy1[:, 0] // subsample).astype(np.int64), 0, ws - 1)
        g1y = np.clip((mxy1[:, 1] // subsample).astype(np.int64), 0, hs - 1)
        g2x = np.clip((mxy2[:, 0] // subsample).astype(np.int64), 0, ws - 1)
        g2y = np.clip((mxy2[:, 1] // subsample).astype(np.int64), 0, hs - 1)
        ii.append(np.full(len(conf), i))
        jj.append(np.full(len(conf), j))
        a1.append(g1y * ws + g1x)
        a2.append(g2y * ws + g2x)
        xy1.append(mxy1)
        xy2.append(mxy2)
        cf.append(conf)
        scores[i, j] = scores[j, i] = float(np.median(conf)) if len(conf) else 0.0

    corres = Correspondences(
        i=jnp.asarray(np.concatenate(ii), jnp.int32),
        j=jnp.asarray(np.concatenate(jj), jnp.int32),
        a1=jnp.asarray(np.concatenate(a1), jnp.int32),
        a2=jnp.asarray(np.concatenate(a2), jnp.int32),
        xy1=jnp.asarray(np.concatenate(xy1), jnp.float32),
        xy2=jnp.asarray(np.concatenate(xy2), jnp.float32),
        conf=jnp.asarray(np.concatenate(cf), jnp.float32),
        rel1=jnp.ones((sum(len(c) for c in cf),), jnp.float32),
        rel2=jnp.ones((sum(len(c) for c in cf),), jnp.float32),
    )
    root, edges = compute_min_spanning_tree(scores)
    return sparse_scene_optimizer(
        jnp.asarray(imsizes, jnp.float32),
        jnp.asarray(pps, jnp.float32),
        jnp.asarray(base_focals, jnp.float32),
        jnp.asarray(core_depth0),
        jnp.asarray(anchor_xy),
        corres,
        mst_root=root,
        mst_edges=edges,
        cfg=cfg,
    )
