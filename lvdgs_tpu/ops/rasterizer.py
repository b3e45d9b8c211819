"""Differentiable tile-based 3D Gaussian rasterizer (TPU-native).

This replaces the reference's CUDA `diff-gaussian-rasterization` submodule
(MonoGS fork with camera-pose gradients; API reconstructed from call sites at
reference utils/slam_backend.py:98-117 and utils/init_pose.py:145). Instead of
translating the CUDA kernel, the pipeline is re-staged for XLA:

1. **Project** (EWA splatting): world -> camera -> pixel means, 2D covariance
   via the local affine Jacobian, conic + radius. Dense, fuses into a few
   XLA ops.
2. **Bin**: Gaussians are depth-sorted once globally (XLA sort), then each
   16x16 tile selects its front-most `max_per_tile` intersecting Gaussians
   with a masked `top_k` over the depth-sorted order — a static-shape
   replacement for the CUDA (gaussian, tile) pair sort. Chunked over tiles to
   bound memory.
3. **Blend**: for all tiles simultaneously, scan over per-tile Gaussian
   chunks front-to-back carrying per-pixel transmittance; contributions are
   cut once transmittance < 1e-4 (parity with the CUDA early-stop). The scan
   body is `jax.checkpoint`ed so backward rematerialises alphas instead of
   storing the full (tiles, K, pixels) tensor.

Because the whole pipeline is jnp, `jax.grad` provides the backward pass —
including **camera-pose gradients** when the caller parameterises (R, t) by a
se(3) delta (see core.lie.apply_delta), which is what the reference's custom
CUDA backward existed for. Gradients w.r.t. the *screen-space* means (needed
for densification, reference utils/slam_backend.py:128) are exposed through
the `vs_offset` zero-parameter in NDC units.

Outputs match the reference render dict: render (3,H,W), depth (1,H,W),
opacity (1,H,W), radii (C), visibility_filter (C), n_touched (C).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera, Intrinsics
from ..core import lie

INF = jnp.float32(3.0e38)
NEAR_PLANE = 0.2  # CUDA 3DGS near-cull
T_EPS = 1.0e-4  # transmittance early-stop
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
COV_DILATION = 0.3  # low-pass dilation added to 2D covariance


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rasterizer configuration (hashable; jit static arg)."""

    tile_size: int = 16
    max_per_tile: int = 256
    gaussian_chunk: int = 32  # K-chunk for the blending scan
    tile_chunk: int = 128  # tiles per binning map step
    white_background: bool = False
    # hierarchical binning: coarse tiles of (coarse_factor x coarse_factor)
    # fine tiles pre-select max_per_coarse front-most candidates so the
    # per-fine-tile top_k runs over ~2k candidates instead of the full map
    coarse_factor: int = 8
    max_per_coarse: int = 2048
    # blending backend: Pallas TPU kernel (VMEM-resident, per-tile early
    # exit) vs the pure-XLA scan. Pallas runs in interpreter mode on CPU.
    use_pallas: bool = True
    # 16 tiles per kernel grid step: halves the per-chunk/group overhead of
    # the blend kernels (packed f+b 13.8 -> 11.7 ms at steady-state density)
    tile_group: int = 16
    # approx_max_k (TPU PartialReduce) for the binning top-k selections —
    # ~0.95 recall of the front-most candidates, large speedup over sort
    use_approx_topk: bool = True
    approx_recall: float = 0.95
    # packed (group-CSR) slot lists: chunks of KC slots allocated per tile
    # group, sized by the group's deepest tile under a static budget of
    # `slot_budget_per_tile` slots/tile (waterfill cap when it binds). Cuts
    # the row-serialized gather/scatter plumbing ~2x at typical density
    # (avg tile holds ~K/4 Gaussians) with bitwise-identical blending
    # whenever the budget does not bind. Requires use_pallas. Off by
    # default: at steady-state SLAM density the 128/tile budget binds and
    # costs ~2 dB of render PSNR (tools/perf_steady.py) — opt in per path
    # after validating quality (tracking tolerates it, see
    # tools/perf_track_quality.py).
    use_packed: bool = False
    slot_budget_per_tile: int = 128
    # saturation feedback (prepare_bins): after the normal pack, run one
    # gradient-free probe blend, cap each SATURATED tile at its measured
    # useful depth (+ slack), and repack — the waterfill hands the released
    # chunk budget to deep unsaturated tiles, so a small static budget
    # keeps near-exact quality (the uniform-budget quality cliff measured
    # in round 1 came from truncating unsaturated tiles)
    saturation_feedback: bool = False
    # per-pixel error tolerance of feedback truncation: a tile is capped
    # where the suffix sum of its slots' max blend weights falls below this
    # (default: one 8-bit LSB)
    feedback_tol: float = 1.0 / 255.0
    # bfloat16 weight math in the packed blend kernels (fwd + bwd): the
    # per-slot quadratic/exp/alpha chain runs at the VPU's native (16, 128)
    # bf16 tiling (2x elements per vreg), with coordinates recentred per
    # tile and alpha widened to f32 for the transmittance chain and the
    # accumulations. ~0.4% relative alpha error — validate per path
    # (tracking/mapping tolerate optimizer-grade gradients; eval and prune
    # renders should stay exact f32)
    blend_bf16: bool = False
    # active-prefix binning bucket (0 = full capacity): statically slice the
    # depth-sorted candidate arrays to this many entries before the tile
    # top_k selections. Exact while the active count stays <= bucket (see
    # bin_gaussians); the SLAM host re-buckets with hysteresis as the map
    # grows/prunes, so binning cost tracks ACTIVE count instead of the
    # capacity high-water mark. Pure scheduling when it does not bind.
    bin_bucket: int = 0

    def grid(self, intr: Intrinsics):
        ts = self.tile_size
        ntx = -(-intr.width // ts)
        nty = -(-intr.height // ts)
        return ntx, nty


class RenderOutput(NamedTuple):
    image: jax.Array  # (3, H, W)
    depth: jax.Array  # (1, H, W) alpha-accumulated z
    opacity: jax.Array  # (1, H, W) final alpha
    radii: jax.Array  # (C,) float, 0 for culled
    visibility_filter: jax.Array  # (C,) bool
    n_touched: jax.Array  # (C,) int32


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(N, 4) wxyz quaternions -> (N, 3, 3) rotation matrices."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def project_gaussians(
    means: jax.Array,
    quats: jax.Array,
    log_scales: jax.Array,
    active: jax.Array,
    R: jax.Array,
    t: jax.Array,
    intr: Intrinsics,
) -> Dict[str, jax.Array]:
    """EWA projection of all Gaussians. Everything differentiable."""
    p_cam = means @ R.T + t  # (C, 3)
    z = p_cam[:, 2]
    in_front = z > NEAR_PLANE
    zs = jnp.where(in_front, z, 1.0)  # guarded division

    mean2d = jnp.stack(
        [
            intr.fx * p_cam[:, 0] / zs + intr.cx,
            intr.fy * p_cam[:, 1] / zs + intr.cy,
        ],
        axis=-1,
    )

    # 3D covariance
    Rm = quat_to_rotmat(quats)  # (C, 3, 3)
    S = jnp.exp(log_scales)  # (C, 3)
    M = Rm * S[:, None, :]
    cov3d = M @ M.transpose(0, 2, 1)

    # camera-space covariance and local affine Jacobian
    covc = jnp.einsum("ij,njk,lk->nil", R, cov3d, R)
    tanfovx = math.tan(intr.fovx * 0.5)
    tanfovy = math.tan(intr.fovy * 0.5)
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    txz = jnp.clip(p_cam[:, 0] / zs, -limx, limx)
    tyz = jnp.clip(p_cam[:, 1] / zs, -limy, limy)
    j00 = intr.fx / zs
    j02 = -intr.fx * txz / zs
    j11 = intr.fy / zs
    j12 = -intr.fy * tyz / zs
    # cov2d = J covc J^T for J = [[j00, 0, j02], [0, j11, j12]]
    a = (
        j00 * j00 * covc[:, 0, 0]
        + 2.0 * j00 * j02 * covc[:, 0, 2]
        + j02 * j02 * covc[:, 2, 2]
        + COV_DILATION
    )
    b = (
        j00 * j11 * covc[:, 0, 1]
        + j00 * j12 * covc[:, 0, 2]
        + j02 * j11 * covc[:, 1, 2]
        + j02 * j12 * covc[:, 2, 2]
    )
    c = (
        j11 * j11 * covc[:, 1, 1]
        + 2.0 * j11 * j12 * covc[:, 1, 2]
        + j12 * j12 * covc[:, 2, 2]
        + COV_DILATION
    )

    det = a * c - b * b
    # det floor (not just >0): a denormal det passes the cull but its
    # conic=adj/det and the backward's 1/det^2 chain overflow to inf, and
    # one such edge-on degenerate gaussian NaN-poisons the whole map
    # through a single Adam step (r4: color refinement died this way after
    # ~1700 iters on the street bench). Floored dets are sliver gaussians
    # the CUDA reference mis-renders anyway; culling them is quality-free.
    valid = in_front & active & (det > 1e-6)
    det_s = jnp.where(valid, det, 1.0)
    conic = jnp.stack([c / det_s, -b / det_s, a / det_s], axis=-1)  # (A, B, C) of inverse

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))
    radius = jnp.where(valid, radius, 0.0)

    return {
        "mean2d": mean2d,
        "conic": conic,
        "depth": z,
        "radius": radius,
        "valid": valid & (radius > 0.0),
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "ntx",
        "nty",
        "tile_size",
        "max_per_tile",
        "tile_chunk",
        "coarse_factor",
        "max_per_coarse",
        "use_approx_topk",
        "approx_recall",
        "bin_bucket",
    ),
)
def bin_gaussians(
    mean2d: jax.Array,
    radius: jax.Array,
    depth: jax.Array,
    valid: jax.Array,
    margin: jax.Array | float = 0.0,
    *,
    ntx: int,
    nty: int,
    tile_size: int,
    max_per_tile: int,
    tile_chunk: int,
    coarse_factor: int = 8,
    max_per_coarse: int = 4096,
    use_approx_topk: bool = False,
    approx_recall: float = 0.95,
    bin_bucket: int = 0,
):
    """Per-tile front-most-K selection over the global depth sort.

    Two-level: coarse tiles (coarse_factor^2 fine tiles) first select their
    `max_per_coarse` front-most intersecting Gaussians with one masked top_k
    over the depth-sorted order; each fine tile then top_k's only within its
    parent's candidate list. This replaces the CUDA (gaussian, tile) pair
    sort at static shape while keeping the per-fine-tile work ~C/30.

    `margin` (pixels) additionally admits Gaussians whose radius+margin
    reaches the tile, so the assignment stays valid while the pose/means
    drift between rebins. Margin-only candidates are *two-priority*: they can
    never evict a true intersector from a saturated tile (they rank strictly
    below all real intersectors in the selection score) and the final slot
    list is re-sorted by depth so blending order stays exact.

    Returns (tile_idx (T, K) int32 into original gaussian ids with C for
    empty slots, slot_valid (T, K) bool). Non-differentiable (indices).
    """
    C = mean2d.shape[0]
    T = ntx * nty
    K = max_per_tile
    margin = jnp.asarray(margin, jnp.float32)

    def topk(score, k):
        if use_approx_topk and score.shape[-1] > 4 * k:
            return jax.lax.approx_max_k(score, k, recall_target=approx_recall)
        return jax.lax.top_k(score, k)

    order = jnp.argsort(jnp.where(valid, depth, INF))
    sm = mean2d[order]
    sr = radius[order]
    sv = valid[order]

    if C < K:  # tiny maps: pad sorted arrays so top_k(K) is well-formed
        pad_n = K - C
        sm = jnp.concatenate([sm, jnp.zeros((pad_n, 2), sm.dtype)], 0)
        sr = jnp.concatenate([sr, jnp.zeros((pad_n,), sr.dtype)], 0)
        sv = jnp.concatenate([sv, jnp.zeros((pad_n,), bool)], 0)
        order = jnp.concatenate([order, jnp.full((pad_n,), C, order.dtype)], 0)
    Cs = sv.shape[0]

    # active-prefix bucket: the depth sort puts all valid Gaussians in the
    # first n_valid slots, so when the map's CAPACITY far exceeds its ACTIVE
    # count (hysteresis keeps capacity at up to ~2.6x actives, slam/system.py
    # _maybe_shrink) the candidate arrays can be statically sliced to a
    # host-chosen bucket >= n_valid and every downstream masked-score
    # materialisation + top_k shrinks proportionally. EXACT whenever
    # n_valid <= bin_bucket (the host picks the bucket with >=1.3x headroom
    # over the fetched active count); if densification outruns the headroom
    # mid-dispatch, only the FARTHEST (n_valid - bucket) Gaussians drop out
    # of binning — graceful, but the host re-buckets at the next keyframe.
    if 0 < bin_bucket < Cs:
        Cb = max(bin_bucket, K)
        sm, sr, sv, order = sm[:Cb], sr[:Cb], sv[:Cb], order[:Cb]
        Cs = Cb

    # fine-tile AABB of each (sorted) gaussian: real radius (priority class)
    # and margin-expanded radius (inclusion)
    srm = sr + margin
    x0 = jnp.floor((sm[:, 0] - sr) / tile_size).astype(jnp.int32)
    x1 = jnp.floor((sm[:, 0] + sr) / tile_size).astype(jnp.int32)
    y0 = jnp.floor((sm[:, 1] - sr) / tile_size).astype(jnp.int32)
    y1 = jnp.floor((sm[:, 1] + sr) / tile_size).astype(jnp.int32)
    mx0 = jnp.floor((sm[:, 0] - srm) / tile_size).astype(jnp.int32)
    mx1 = jnp.floor((sm[:, 0] + srm) / tile_size).astype(jnp.int32)
    my0 = jnp.floor((sm[:, 1] - srm) / tile_size).astype(jnp.int32)
    my1 = jnp.floor((sm[:, 1] + srm) / tile_size).astype(jnp.int32)
    on_screen = (mx1 >= 0) & (mx0 <= ntx - 1) & (my1 >= 0) & (my0 <= nty - 1)
    sv = sv & on_screen

    ranks = jnp.arange(Cs, dtype=jnp.float32)

    def resort_by_rank(sel, vals, rank_of_sel, sentinel):
        """Re-sort selected slots by depth rank (ascending), invalid (-INF
        score) entries to the back. Returns (sel_sorted, valid_count_prefix
        stays correct because invalid ranks get the sentinel)."""
        rank_key = jnp.where(vals > -INF * 0.5, rank_of_sel, sentinel)
        sort_idx = jnp.argsort(rank_key, axis=1)
        return jnp.take_along_axis(sel, sort_idx, axis=1)

    use_hierarchy = Cs > max_per_coarse and T > coarse_factor**2
    if use_hierarchy:
        cf = coarse_factor
        ncx = -(-ntx // cf)
        ncy = -(-nty // cf)
        Tc = ncx * ncy
        Kc = max_per_coarse
        ctx = jnp.arange(Tc, dtype=jnp.int32) % ncx
        cty = jnp.arange(Tc, dtype=jnp.int32) // ncx
        # coarse tile c spans fine tiles [c*cf, c*cf+cf) — margin-expanded
        # AABB so margin candidates survive to the fine stage; real
        # intersectors rank first so a saturated coarse list never drops
        # them for margin-only candidates, and a depth re-sort keeps the
        # candidate list depth-ascending (the fine stage relies on it)
        inter_cr = (
            (x0[None, :] <= (ctx[:, None] + 1) * cf - 1)
            & (x1[None, :] >= ctx[:, None] * cf)
            & (y0[None, :] <= (cty[:, None] + 1) * cf - 1)
            & (y1[None, :] >= cty[:, None] * cf)
            & sv[None, :]
        )
        inter_c = (
            (mx0[None, :] <= (ctx[:, None] + 1) * cf - 1)
            & (mx1[None, :] >= ctx[:, None] * cf)
            & (my0[None, :] <= (cty[:, None] + 1) * cf - 1)
            & (my1[None, :] >= cty[:, None] * cf)
            & sv[None, :]
        )
        score_c = jnp.where(
            inter_cr, -ranks[None, :], jnp.where(inter_c, -ranks[None, :] - Cs, -INF)
        )
        vals_c, sel_c = topk(score_c, Kc)
        sel_c = resort_by_rank(
            sel_c, vals_c, sel_c.astype(jnp.float32), jnp.float32(2 * Cs)
        )
        sel_c = jnp.minimum(sel_c, Cs - 1)  # (Tc, Kc), depth-ascending
        cand_valid = jnp.take_along_axis(inter_c, sel_c, axis=1)
        # candidate attributes per coarse tile (real + margin AABBs)
        cx0 = jnp.where(cand_valid, x0[sel_c], ntx + 1)
        cx1 = jnp.where(cand_valid, x1[sel_c], -1)
        cy0 = jnp.where(cand_valid, y0[sel_c], nty + 1)
        cy1 = jnp.where(cand_valid, y1[sel_c], -1)
        cmx0 = jnp.where(cand_valid, mx0[sel_c], ntx + 1)
        cmx1 = jnp.where(cand_valid, mx1[sel_c], -1)
        cmy0 = jnp.where(cand_valid, my0[sel_c], nty + 1)
        cmy1 = jnp.where(cand_valid, my1[sel_c], -1)

        # fine stage in one unchunked shot — the (T, Kc) intermediates are
        # ~30 MB each and XLA fuses the comparisons into the top_k input
        tids = jnp.arange(T, dtype=jnp.int32)
        tx = tids % ntx
        ty = tids // ntx
        parent = (ty // cf) * ncx + (tx // cf)
        inter_r = (
            (cx0[parent] <= tx[:, None])
            & (cx1[parent] >= tx[:, None])
            & (cy0[parent] <= ty[:, None])
            & (cy1[parent] >= ty[:, None])
        )
        inter_m = (
            (cmx0[parent] <= tx[:, None])
            & (cmx1[parent] >= tx[:, None])
            & (cmy0[parent] <= ty[:, None])
            & (cmy1[parent] >= ty[:, None])
        )
        local_ranks = jax.lax.broadcasted_iota(jnp.float32, (T, Kc), 1)
        # two-priority: real intersectors first (by depth), margin-only after
        score = jnp.where(
            inter_r, -local_ranks, jnp.where(inter_m, -local_ranks - Kc, -INF)
        )
        vals, sel_f = topk(score, min(K, Kc))
        rank_of_sel = sel_f.astype(jnp.float32)  # local index IS depth rank
        sel_f = resort_by_rank(sel_f, vals, rank_of_sel, jnp.float32(2 * Kc))
        sel = jnp.take_along_axis(
            sel_c[parent], jnp.minimum(sel_f, Kc - 1), axis=1
        )
        if K > Kc:  # degenerate config
            sel = jnp.pad(sel, ((0, 0), (0, K - Kc)))
        counts = jnp.minimum(inter_m.sum(axis=1), K)
    else:
        n_chunks = -(-T // tile_chunk)
        T_pad = n_chunks * tile_chunk
        tids = jnp.arange(T_pad, dtype=jnp.int32)
        txs = (tids % ntx).reshape(n_chunks, tile_chunk)
        tys = jnp.minimum(tids // ntx, nty - 1).reshape(n_chunks, tile_chunk)

        def chunk_fn(args):
            tx, ty = args  # (tile_chunk,)
            inter_r = (
                (x0[None, :] <= tx[:, None])
                & (x1[None, :] >= tx[:, None])
                & (y0[None, :] <= ty[:, None])
                & (y1[None, :] >= ty[:, None])
                & sv[None, :]
            )
            inter_m = (
                (mx0[None, :] <= tx[:, None])
                & (mx1[None, :] >= tx[:, None])
                & (my0[None, :] <= ty[:, None])
                & (my1[None, :] >= ty[:, None])
                & sv[None, :]
            )
            score = jnp.where(
                inter_r, -ranks[None, :], jnp.where(inter_m, -ranks[None, :] - Cs, -INF)
            )
            vals, sel = topk(score, K)
            rank_of_sel = sel.astype(jnp.float32)  # global depth rank
            sel = resort_by_rank(sel, vals, rank_of_sel, jnp.float32(2 * Cs))
            counts = jnp.minimum(inter_m.sum(axis=1), K)
            return sel, counts

        sel, counts = jax.lax.map(chunk_fn, (txs, tys))
        sel = sel.reshape(T_pad, K)[:T]
        counts = counts.reshape(T_pad)[:T]

    slot_valid = jax.lax.broadcasted_iota(jnp.int32, (T, K), 1) < counts[:, None]
    tile_idx = jnp.where(slot_valid, order[jnp.minimum(sel, Cs - 1)], C)
    return tile_idx, slot_valid


class PackedBins(NamedTuple):
    """Group-CSR tile assignment (see RenderConfig.use_packed).

    gid: (NB, KC, TG) int32 gaussian ids per (chunk, slot, tile-in-group),
         C = empty (renders at alpha 0 through the sentinel field row).
    cg:  (NB,) int32 tile-group of each chunk (n_groups = padding sentinel).
    k0:  (NB,) int32 slot offset of the chunk within its group's lists.
    kalloc: (T_pad,) int32 slots actually allocated per TILE (tile order;
         after the waterfill cap and any tile_cap) — saturation feedback.
    tids: (NB, TG) int32 tile id per (chunk, lane) — groups may hold
         arbitrary tile sets when packed with sort_by_depth.
    inv: (T_pad,) int32 position of tile t in the group-major layout
         (inverse of the sort permutation; identity when unsorted).
    """

    gid: jax.Array
    cg: jax.Array
    k0: jax.Array
    kalloc: jax.Array
    tids: jax.Array
    inv: jax.Array


def pack_bins(
    tile_idx: jax.Array,  # (T, K) int32, C = empty
    slot_valid: jax.Array,  # (T, K) bool
    C: int,
    *,
    tile_group: int,
    slot_budget_per_tile: int,
    tile_cap: jax.Array | None = None,  # (T,) int32 per-tile depth cap
    sort_by_depth: bool = False,
) -> PackedBins:
    """Pack dense (T, K) slot lists into ragged per-group chunk lists.

    Each tile group (TG consecutive tiles) gets ceil(kmax_g / KC) chunks
    where kmax_g is its deepest tile's count, capped by a waterfill
    threshold chosen so the total chunk count fits the static budget
    NB = T_pad * slot_budget_per_tile / (KC * TG). When the budget does not
    bind (the typical case: budget 128/tile vs ~70 average occupancy,
    tools/perf_saturation.py) the packed lists hold exactly the same slots
    in the same depth order as the dense layout.

    `tile_cap` is the saturation-feedback hook: a per-tile upper bound on
    useful blend depth (e.g. the last slot that contributed before the
    transmittance floor, measured by a probe render — see
    saturation_caps()). Saturated tiles then stop hogging chunk budget and
    the waterfill redistributes it to deep unsaturated tiles, so a small
    static budget keeps near-exact quality."""
    from .rasterizer_pallas import KC

    T, K = tile_idx.shape
    TG = tile_group
    G = -(-T // TG)
    T_pad = G * TG
    assert slot_budget_per_tile >= KC, "budget must cover one chunk per group"
    NB = (T_pad * slot_budget_per_tile) // (KC * TG)

    counts = slot_valid.sum(axis=1).astype(jnp.int32)
    if tile_cap is not None:
        counts = jnp.minimum(counts, jnp.maximum(tile_cap.astype(jnp.int32), 0))
    if T_pad != T:
        counts = jnp.pad(counts, (0, T_pad - T))
        tile_idx = jnp.pad(tile_idx, ((0, T_pad - T), (0, 0)), constant_values=C)

    # group assignment: contiguous tiles, or tiles of SIMILAR depth
    # (descending-count order). Chunk allocation is per group at the
    # group-max depth, so one deep tile inflates its whole group's
    # allocation — depth-sorted grouping makes group-max ~= group-mean and
    # lets per-tile caps actually release budget.
    if sort_by_depth:
        perm = jnp.argsort(-counts, stable=True).astype(jnp.int32)
    else:
        perm = jnp.arange(T_pad, dtype=jnp.int32)
    counts_s = counts[perm]
    gmax = counts_s.reshape(G, TG).max(axis=1)

    def nchunks(theta):
        return jnp.maximum(-(-jnp.minimum(gmax, theta) // KC), 1)

    # waterfill: largest per-tile depth cap theta whose chunk total fits NB
    lo, hi = jnp.int32(KC), jnp.int32(K)

    def wf_body(_, lh):
        lo, hi = lh
        mid = (lo + hi + 1) // 2
        ok = nchunks(mid).sum() <= NB
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    n_iter = max(int(math.ceil(math.log2(max(K - KC, 1) + 1))), 1)
    lo, hi = jax.lax.fori_loop(0, n_iter, wf_body, (lo, hi))
    theta = lo

    kalloc_s = jnp.minimum(counts_s, theta)  # (T_pad,) sorted order
    nch = nchunks(theta)  # (G,)
    cum = jnp.cumsum(nch)
    start_g = cum - nch
    bids = jnp.arange(NB, dtype=jnp.int32)
    cg = jnp.searchsorted(cum, bids, side="right").astype(jnp.int32)  # G = pad
    safe_g = jnp.minimum(cg, G - 1)
    k0 = jnp.where(cg < G, (bids - start_g[safe_g]) * KC, KC)

    pos_of = safe_g[:, None] * TG + jnp.arange(TG, dtype=jnp.int32)[None, :]  # (NB, TG)
    tids = perm[pos_of]  # (NB, TG) actual tile ids
    k_of = k0[:, None] + jnp.arange(KC, dtype=jnp.int32)[None, :]  # (NB, KC)
    valid = (cg < G)[:, None, None] & (
        k_of[:, :, None] < kalloc_s[pos_of][:, None, :]
    )  # (NB, KC, TG)
    gid = jnp.where(
        valid,
        tile_idx[tids[:, None, :], jnp.minimum(k_of, K - 1)[:, :, None]],
        C,
    )
    # inverse permutation via argsort (two same-index scatters would fuse
    # into a variadic scatter that crashes the TPU scatter emitter)
    inv = jnp.argsort(perm).astype(jnp.int32)
    kalloc = kalloc_s[inv]
    return PackedBins(gid=gid, cg=cg, k0=k0, kalloc=kalloc, tids=tids, inv=inv)


def saturation_caps(
    pbins: PackedBins,
    wmax: jax.Array,  # (NB, KC, TG) per-slot max blend weight x65536 (probe)
    T: int,
    *,
    tile_group: int,
    max_per_tile: int,
    tol: float = 1.0 / 255.0,
) -> jax.Array:
    """Per-tile useful blend depth from a probe render (saturation feedback).

    For each tile, suffix-sum the per-slot max blend weights back-to-front
    at chunk (KC-slot) granularity — the same granularity the packer
    allocates at — and cap the tile at the last chunk whose remaining total
    exceeds `tol`. Dropping everything past the cap then changes any pixel
    by at most ~tol (one 8-bit LSB by default). Tiles whose measured tail
    still carries weight (possibly waterfill-truncated in the probe) stay
    uncapped; the waterfill in pack_bins hands them the chunk budget the
    capped tiles released."""
    from .rasterizer_pallas import KC

    TG = tile_group
    NB = wmax.shape[0]
    T_pad = pbins.kalloc.shape[0]
    n_groups = T_pad // TG
    MC = max(max_per_tile // KC, 1)  # chunk ordinals per tile
    chunk_w = wmax.astype(jnp.float32).sum(axis=1) * (1.0 / 65536.0)  # (NB, TG)
    ord_of = jnp.minimum(pbins.k0 // KC, MC - 1)  # (NB,)
    t_of = jnp.where(pbins.cg[:, None] < n_groups, pbins.tids, T_pad)
    # flat 1D scatter (2D-indexed scatter trips the TPU scatter emitter)
    flat_idx = t_of * MC + ord_of[:, None]  # (NB, TG)
    dense = (
        jnp.zeros(((T_pad + 1) * MC,), jnp.float32)
        .at[flat_idx.reshape(-1)]
        .add(chunk_w.reshape(-1), mode="drop")
    ).reshape(T_pad + 1, MC)[:T]  # (T, MC)
    suffix = jnp.cumsum(dense[:, ::-1], axis=1)[:, ::-1]  # (T, MC)
    keep = suffix > tol
    cap = KC * (
        MC - jnp.argmax(keep[:, ::-1].astype(jnp.int32), axis=1)
    ) * keep.any(axis=1)
    return jnp.where(cap < pbins.kalloc[:T], cap, max_per_tile)


def _blend_pallas_packed(
    pbins: PackedBins,
    mean2d: jax.Array,
    conic: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    depth: jax.Array,
    bg: jax.Array,
    *,
    ntx: int,
    nty: int,
    tile_size: int,
    tile_group: int,
    need_n_touched: jax.Array | bool = True,
    bf16: bool = False,
):
    """Packed-kernel blending path: gathers only the budgeted slots
    (differentiable — its transpose is the per-Gaussian scatter-add) and
    feeds chunked (KC, TG, NF) blocks to the scalar-prefetch-mapped kernel."""
    from .rasterizer_pallas import pallas_blend_packed

    C = mean2d.shape[0]
    T = ntx * nty
    TG = tile_group
    n_groups = -(-T // TG)
    P = tile_size * tile_size
    pad = lambda arr: jnp.concatenate(
        [arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)], 0
    )
    fields = jnp.concatenate(
        [
            pad(mean2d),
            pad(conic),
            pad(colors),
            pad(depth[:, None]),
            pad(opacities[:, None]),
        ],
        axis=1,
    )  # (C+1, 10); sentinel row renders at alpha 0
    tp = fields[pbins.gid]  # (NB, KC, TG, 10)

    interpret = jax.default_backend() == "cpu"
    # a STATIC False also compiles the per-slot touched reductions out of
    # the forward kernel (a traced flag can only gate the scatter below)
    with_nt = need_n_touched if isinstance(need_n_touched, bool) else True
    acc, trans, nt = pallas_blend_packed(
        tp, pbins.cg, pbins.k0, jnp.zeros((1,), jnp.int32), pbins.tids,
        ntx, nty, tile_size, TG, n_groups, interpret, with_nt, bf16,
    )
    # kernel rows are in group-major (possibly depth-sorted) order; map back
    # to tile order through the pack's inverse permutation
    take = pbins.inv[:T]
    acc_t = acc[:n_groups].transpose(0, 2, 1, 3).reshape(n_groups * TG, 4, P)[take]
    trans_t = trans[:n_groups].reshape(n_groups * TG, P)[take]
    img = acc_t[:, :3, :].transpose(0, 2, 1) + trans_t[..., None] * bg[None, None, :]
    depth_t = acc_t[:, 3, :]
    alpha_t = 1.0 - trans_t
    # the (pairs,)-row int scatter is pure bookkeeping (per-Gaussian touch
    # counts for visibility/reset logic) consumed only at loop boundaries —
    # gate it on a traced flag so hot optimisation iterations skip it
    def _nt(_):
        return jnp.zeros((C,), jnp.int32).at[pbins.gid.reshape(-1)].add(
            nt.reshape(-1), mode="drop"
        )

    if isinstance(need_n_touched, bool):
        n_touched = _nt(None) if need_n_touched else jnp.zeros((C,), jnp.int32)
    else:
        n_touched = jax.lax.cond(
            need_n_touched, _nt, lambda _: jnp.zeros((C,), jnp.int32), None
        )
    return img, depth_t, alpha_t, n_touched


def pose_lin_gather(
    params: Dict[str, jax.Array],
    active: jax.Array,
    R: jax.Array,
    t: jax.Array,
    intr: Intrinsics,
    cfg: RenderConfig,
    bins: PackedBins,
):
    """Gather per-row (field value, d field/d tau) at the linearization pose.

    Returns (tpj (NB, KC, TG, 10, 7), proj) where tpj[..., 0] is the field
    value at (R, t) and tpj[..., 1:] the se(3) Jacobian columns. One widened
    gather (the row-serialized gather is width-insensitive, PERFORMANCE.md);
    the Jacobian costs 6 fused projection JVPs — per CALL, so hoisting this
    to the rebin boundary amortises it over the whole period
    (period-linearized tracking, slam/tracking.py)."""
    from ..gaussian.model import SH_C0

    params = jax.lax.stop_gradient(params)
    colors = jnp.clip(0.5 + SH_C0 * params["features_dc"], 0.0, 1.0)
    opac = jnp.where(active, jax.nn.sigmoid(params["logit_opacities"]), 0.0)
    padf = lambda a: jnp.concatenate(
        [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0
    )

    def fields_of(tau_):
        Rn, Tn = lie.apply_delta(R, t, tau_)
        proj = project_gaussians(
            params["means"], params["quats"], params["log_scales"], active,
            Rn, Tn, intr,
        )
        fields = jnp.concatenate(
            [
                padf(proj["mean2d"]),
                padf(proj["conic"]),
                padf(colors),
                padf(proj["depth"][:, None]),
                padf(opac[:, None]),
            ],
            axis=1,
        )  # (C+1, 10)
        return fields, proj

    zeros6 = jnp.zeros((6,), jnp.float32)
    fields0, proj0 = fields_of(zeros6)
    J = jax.jacfwd(lambda d: fields_of(d)[0])(zeros6)  # (C+1, 10, 6)
    FJ = jnp.concatenate(
        [jax.lax.stop_gradient(fields0)[:, :, None], jax.lax.stop_gradient(J)],
        axis=2,
    )  # (C+1, 10, 7)
    return FJ[bins.gid], proj0


def rasterize_lin(
    tpj: jax.Array,  # (NB, KC, TG, 10, 7) from pose_lin_gather
    dtau: jax.Array,  # (6,) delta from the linearization pose (differentiable)
    intr: Intrinsics,
    cfg: RenderConfig,
    bins: PackedBins,
) -> RenderOutput:
    """Blend the pose-linearized per-row fields at tau = dtau.

    Per-iteration cost is kernel-only: the field build and the tau backward
    are row-local einsums against the pre-gathered Jacobian — no projection,
    no gather, no scatter in the loop. Values/gradients are exact at
    dtau = 0 and first-order accurate in ||dtau|| away from it."""
    ntx, nty = cfg.grid(intr)
    T = ntx * nty
    TG = cfg.tile_group
    n_groups = -(-T // TG)
    P = cfg.tile_size * cfg.tile_size

    tp = tpj[..., 0] + jnp.einsum("...fd,d->...f", tpj[..., 1:], dtau)

    interpret = jax.default_backend() == "cpu"
    from .rasterizer_pallas import pallas_blend_packed

    acc, trans, _nt = pallas_blend_packed(
        tp, bins.cg, bins.k0, jnp.zeros((1,), jnp.int32), bins.tids,
        ntx, nty, cfg.tile_size, TG, n_groups, interpret, False,
        cfg.blend_bf16,
    )
    take = bins.inv[:T]
    acc_t = acc[:n_groups].transpose(0, 2, 1, 3).reshape(n_groups * TG, 4, P)[take]
    trans_t = trans[:n_groups].reshape(n_groups * TG, P)[take]
    bg = (
        jnp.ones((3,), jnp.float32)
        if cfg.white_background
        else jnp.zeros((3,), jnp.float32)
    )
    img_t = acc_t[:, :3, :].transpose(0, 2, 1) + trans_t[..., None] * bg[None, None, :]
    depth_t = acc_t[:, 3, :]
    alpha_t = 1.0 - trans_t

    H, W = intr.height, intr.width
    ts = cfg.tile_size
    image = _tiles_to_image(img_t, ntx, nty, ts, H, W).transpose(2, 0, 1)
    depth = _tiles_to_image(depth_t, ntx, nty, ts, H, W)[None]
    opacity = _tiles_to_image(alpha_t, ntx, nty, ts, H, W)[None]
    return RenderOutput(
        image=image,
        depth=depth,
        opacity=opacity,
        radii=None,
        visibility_filter=None,
        n_touched=None,
    )


def rasterize_pose_lin(
    params: Dict[str, jax.Array],
    active: jax.Array,
    R: jax.Array,
    t: jax.Array,
    tau: jax.Array,  # (6,) se(3) delta — the ONLY differentiable input
    intr: Intrinsics,
    cfg: RenderConfig,
    bins: PackedBins,
    need_n_touched: jax.Array | bool = False,
) -> RenderOutput:
    """Pose-delta-linearized packed rasterization for tracking.

    Equivalent to `rasterize(params, active, *apply_delta(R, t, tau), ...)`
    in VALUE at tau=0 (bitwise: the linearized gathered fields reduce to the
    plain gather there) and in tau-GRADIENT at tau=0 (chain rule through the
    linearization point) — but the backward contracts the kernel's
    per-row field gradients against pre-gathered per-row pose Jacobians
    instead of scatter-adding them back to the (C,10) field table and
    transposing the projection. That removes tracking's dominant backward
    cost: the row-serialized scatter (~21 ns/row, PERFORMANCE.md) and the
    projection transpose, for the price of widening the (row-serialized,
    width-insensitive) gather from 10 to 70 floats.

    Map params are treated as constants (tracking's contract; the reference
    optimises only the camera in tracking, utils/slam_frontend.py:1468).
    Requires packed bins."""
    from ..gaussian.model import SH_C0

    ntx, nty = cfg.grid(intr)
    T = ntx * nty
    TG = cfg.tile_group
    n_groups = -(-T // TG)
    P = cfg.tile_size * cfg.tile_size
    C = params["means"].shape[0]
    params = jax.lax.stop_gradient(params)

    colors = jnp.clip(0.5 + SH_C0 * params["features_dc"], 0.0, 1.0)
    opac = jnp.where(active, jax.nn.sigmoid(params["logit_opacities"]), 0.0)
    padf = lambda a: jnp.concatenate(
        [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0
    )

    def fields_of(tau_):
        Rn, Tn = lie.apply_delta(R, t, tau_)
        proj = project_gaussians(
            params["means"], params["quats"], params["log_scales"], active,
            Rn, Tn, intr,
        )
        fields = jnp.concatenate(
            [
                padf(proj["mean2d"]),
                padf(proj["conic"]),
                padf(colors),
                padf(proj["depth"][:, None]),
                padf(opac[:, None]),
            ],
            axis=1,
        )  # (C+1, 10)
        return fields, proj

    zeros6 = jnp.zeros((6,), jnp.float32)
    fields0, proj0 = fields_of(jax.lax.stop_gradient(tau))
    # (C+1, 10, 6) Jacobian of the fields w.r.t. tau via 6 forward JVPs
    J = jax.jacfwd(lambda d: fields_of(jax.lax.stop_gradient(tau) + d)[0])(
        zeros6
    )
    # one widened gather: value + Jacobian rows together
    FJ = jnp.concatenate(
        [jax.lax.stop_gradient(fields0)[:, :, None], jax.lax.stop_gradient(J)],
        axis=2,
    )  # (C+1, 10, 7)
    tpj = FJ[bins.gid]  # (NB, KC, TG, 10, 7)
    dtau = tau - jax.lax.stop_gradient(tau)
    tp = tpj[..., 0] + jnp.einsum("...fd,d->...f", tpj[..., 1:], dtau)

    interpret = jax.default_backend() == "cpu"
    from .rasterizer_pallas import pallas_blend_packed

    acc, trans, nt = pallas_blend_packed(
        tp, bins.cg, bins.k0, jnp.zeros((1,), jnp.int32), bins.tids,
        ntx, nty, cfg.tile_size, TG, n_groups, interpret,
        need_n_touched if isinstance(need_n_touched, bool) else True,
        cfg.blend_bf16,
    )
    take = bins.inv[:T]
    acc_t = acc[:n_groups].transpose(0, 2, 1, 3).reshape(n_groups * TG, 4, P)[take]
    trans_t = trans[:n_groups].reshape(n_groups * TG, P)[take]
    bg = (
        jnp.ones((3,), jnp.float32)
        if cfg.white_background
        else jnp.zeros((3,), jnp.float32)
    )
    img_t = acc_t[:, :3, :].transpose(0, 2, 1) + trans_t[..., None] * bg[None, None, :]
    depth_t = acc_t[:, 3, :]
    alpha_t = 1.0 - trans_t

    def _nt(_):
        return jnp.zeros((C,), jnp.int32).at[bins.gid.reshape(-1)].add(
            nt.reshape(-1), mode="drop"
        )

    if isinstance(need_n_touched, bool):
        n_touched = _nt(None) if need_n_touched else jnp.zeros((C,), jnp.int32)
    else:
        n_touched = jax.lax.cond(
            need_n_touched, _nt, lambda _: jnp.zeros((C,), jnp.int32), None
        )

    H, W = intr.height, intr.width
    ts = cfg.tile_size
    image = _tiles_to_image(img_t, ntx, nty, ts, H, W).transpose(2, 0, 1)
    depth = _tiles_to_image(depth_t, ntx, nty, ts, H, W)[None]
    opacity = _tiles_to_image(alpha_t, ntx, nty, ts, H, W)[None]
    return RenderOutput(
        image=image,
        depth=depth,
        opacity=opacity,
        radii=jax.lax.stop_gradient(proj0["radius"]),
        visibility_filter=jax.lax.stop_gradient(proj0["valid"]),
        n_touched=n_touched,
    )


def _blend(
    tile_idx: jax.Array,  # (T, K) int32, C = empty
    slot_valid: jax.Array,  # (T, K)
    mean2d: jax.Array,  # (C, 2)
    conic: jax.Array,  # (C, 3)
    colors: jax.Array,  # (C, 3)
    opacities: jax.Array,  # (C,)
    depth: jax.Array,  # (C,)
    bg: jax.Array,  # (3,)
    *,
    ntx: int,
    nty: int,
    tile_size: int,
    gaussian_chunk: int,
):
    """Front-to-back alpha blending for every tile at once.

    Scans over K in chunks carrying per-pixel transmittance. Returns tile
    images plus per-slot touched-pixel counts.
    """
    T, K = tile_idx.shape
    ts = tile_size
    P = ts * ts
    C = mean2d.shape[0]
    Kc = gaussian_chunk
    n_chunks = K // Kc
    assert n_chunks * Kc == K, "max_per_tile must be divisible by gaussian_chunk"

    # pad params with a sentinel row (index C)
    pad = lambda arr, v: jnp.concatenate([arr, jnp.full((1,) + arr.shape[1:], v, arr.dtype)], 0)
    mean2d_p = pad(mean2d, 0.0)
    conic_p = pad(conic, 0.0)
    colors_p = pad(colors, 0.0)
    opac_p = pad(opacities, 0.0)
    depth_p = pad(depth, 0.0)

    # per-tile pixel coordinates (pixel centers at integer coords + 0.5 would
    # be the classic convention; CUDA 3DGS uses pixf = pixel index, so match it)
    tids = jnp.arange(T, dtype=jnp.int32)
    ox = (tids % ntx) * ts
    oy = (tids // ntx) * ts
    pxo = jnp.tile(jnp.arange(ts, dtype=jnp.float32), ts)  # (P,) x-fast
    pyo = jnp.repeat(jnp.arange(ts, dtype=jnp.float32), ts)
    px = ox[:, None].astype(jnp.float32) + pxo[None, :]  # (T, P)
    py = oy[:, None].astype(jnp.float32) + pyo[None, :]

    idx_chunks = tile_idx.reshape(T, n_chunks, Kc).transpose(1, 0, 2)  # (n, T, Kc)
    valid_chunks = slot_valid.reshape(T, n_chunks, Kc).transpose(1, 0, 2)

    def body(carry, inp):
        trans, acc_c, acc_d = carry  # (T,P), (T,P,3), (T,P)
        idx, sval = inp  # (T, Kc)
        m = mean2d_p[idx]  # (T, Kc, 2)
        co = conic_p[idx]  # (T, Kc, 3)
        col = colors_p[idx]  # (T, Kc, 3)
        op = opac_p[idx]  # (T, Kc)
        dep = depth_p[idx]  # (T, Kc)

        dx = px[:, None, :] - m[..., 0:1]  # (T, Kc, P)
        dy = py[:, None, :] - m[..., 1:2]
        power = (
            -0.5 * (co[..., 0:1] * dx * dx + co[..., 2:3] * dy * dy)
            - co[..., 1:2] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, op[..., None] * jnp.exp(power))
        alpha = jnp.where(
            (power <= 0.0) & (alpha >= ALPHA_MIN) & sval[..., None], alpha, 0.0
        )

        # exclusive cumulative transmittance within the chunk, seeded by carry
        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=1)
        t_excl = trans[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1
        )
        contributes = t_excl > T_EPS  # CUDA early-stop parity
        w = jnp.where(contributes, alpha * t_excl, 0.0)  # (T, Kc, P)

        acc_c = acc_c + jnp.einsum("tkp,tkc->tpc", w, col)
        acc_d = acc_d + (w * dep[..., None]).sum(axis=1)
        touched = (w > 0.0).sum(axis=2).astype(jnp.int32)  # (T, Kc)
        trans = trans * cum[:, -1, :]
        return (trans, acc_c, acc_d), touched

    init = (
        jnp.ones((T, P), jnp.float32),
        jnp.zeros((T, P, 3), jnp.float32),
        jnp.zeros((T, P), jnp.float32),
    )
    (trans, acc_c, acc_d), touched = jax.lax.scan(
        jax.checkpoint(body), init, (idx_chunks, valid_chunks)
    )

    alpha_img = 1.0 - trans  # (T, P)
    img = acc_c + trans[..., None] * bg[None, None, :]

    # accumulate touched counts per gaussian
    touched_flat = touched.transpose(1, 0, 2).reshape(T, K)
    n_touched = jnp.zeros((C,), jnp.int32).at[tile_idx.reshape(-1)].add(
        touched_flat.reshape(-1), mode="drop"
    )
    return img, acc_d, alpha_img, n_touched


def _blend_pallas(
    tile_idx: jax.Array,  # (T, K)
    slot_valid: jax.Array,  # (T, K)
    mean2d: jax.Array,
    conic: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    depth: jax.Array,
    bg: jax.Array,
    *,
    ntx: int,
    nty: int,
    tile_size: int,
    tile_group: int,
):
    """Pallas-kernel blending path. Gathers per-tile parameters in XLA
    (differentiable — its transpose is the per-Gaussian scatter-add) and
    hands a (K, T, 10) block to the VMEM kernel."""
    from .rasterizer_pallas import pallas_blend

    T, K = tile_idx.shape
    C = mean2d.shape[0]
    pad = lambda arr: jnp.concatenate(
        [arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)], 0
    )
    idx = jnp.minimum(tile_idx, C)  # sentinel row
    fields = jnp.concatenate(
        [
            pad(mean2d),
            pad(conic),
            pad(colors),
            pad(depth[:, None]),
            pad(opacities[:, None]),
        ],
        axis=1,
    )  # (C+1, 10)
    tp = fields[idx.T]  # gather directly in (K, T, 10) layout
    counts = slot_valid.sum(axis=1).astype(jnp.int32)

    interpret = jax.default_backend() == "cpu"
    acc, trans, nt = pallas_blend(
        tp, counts, ntx, nty, tile_size, tile_group, interpret
    )
    P = tile_size * tile_size
    img = acc[:, :3, :].transpose(0, 2, 1) + trans[..., None] * bg[None, None, :]
    depth_t = acc[:, 3, :]
    alpha_t = 1.0 - trans
    n_touched = jnp.zeros((C,), jnp.int32).at[tile_idx.reshape(-1)].add(
        nt.reshape(-1), mode="drop"
    )
    return img, depth_t, alpha_t, n_touched


def _tiles_to_image(tiles: jax.Array, ntx: int, nty: int, ts: int, H: int, W: int):
    """(T, P, ...) tile buffers -> (H, W, ...) image crop."""
    extra = tiles.shape[2:]
    img = tiles.reshape(nty, ntx, ts, ts, *extra)
    img = jnp.moveaxis(img, 2, 1).reshape(nty * ts, ntx * ts, *extra)
    return img[:H, :W]


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def prepare_bins(
    params: Dict[str, jax.Array],
    active: jax.Array,
    R: jax.Array,
    t: jax.Array,
    intr: Intrinsics,
    cfg: RenderConfig,
    margin: float = 0.0,
):
    """Project + bin only (no blending). Returns (tile_idx, slot_valid).

    `margin` admits Gaussians whose radius+margin reaches a tile so the
    binning stays valid under small pose perturbations — used to amortise
    binning across several optimisation steps in the tracking/mapping loops
    (the reference CUDA rasterizer re-bins every iteration). Margin
    candidates are two-priority: they never evict true intersectors and the
    slot lists stay depth-sorted (see bin_gaussians)."""
    ntx, nty = cfg.grid(intr)
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"], active, R, t, intr
    )
    bins = bin_gaussians(
        jax.lax.stop_gradient(proj["mean2d"]),
        jax.lax.stop_gradient(proj["radius"]),
        jax.lax.stop_gradient(proj["depth"]),
        proj["valid"],
        margin,
        ntx=ntx,
        nty=nty,
        tile_size=cfg.tile_size,
        max_per_tile=cfg.max_per_tile,
        tile_chunk=cfg.tile_chunk,
        coarse_factor=cfg.coarse_factor,
        max_per_coarse=cfg.max_per_coarse,
        use_approx_topk=cfg.use_approx_topk,
        approx_recall=cfg.approx_recall,
        bin_bucket=cfg.bin_bucket,
    )
    if cfg.use_pallas and cfg.use_packed:
        return _pack_for_cfg(bins[0], bins[1], proj, params, active, cfg, ntx, nty)
    return bins


def probe_saturation_caps(tile_idx, slot_valid, proj, params, active, cfg,
                          ntx, nty, want_touched=False):
    """FULL-depth gradient-free probe blend -> per-tile useful-depth caps
    (true caps, no truncation bias). See saturation_caps.

    With `want_touched`, also returns a (C,) bool of per-Gaussian
    visibility (any pixel blend weight > 0 in the FULL-depth blend) —
    the exact `n_touched > 0` semantics that a budget-capped render
    cannot provide (sub-LSB contributors render as untouched there,
    which over-prunes; PERFORMANCE.md round 2)."""
    from ..gaussian.model import SH_C0
    from .rasterizer_pallas import _packed_fwd_call

    C = params["means"].shape[0]
    T = ntx * nty
    n_groups = -(-T // cfg.tile_group)
    pb = pack_bins(
        tile_idx,
        slot_valid,
        C,
        tile_group=cfg.tile_group,
        slot_budget_per_tile=cfg.max_per_tile,
    )
    colors = jnp.clip(0.5 + SH_C0 * params["features_dc"], 0.0, 1.0)
    opac = jnp.where(active, jax.nn.sigmoid(params["logit_opacities"]), 0.0)
    padf = lambda a: jnp.concatenate(
        [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0
    )
    fields = jax.lax.stop_gradient(
        jnp.concatenate(
            [
                padf(proj["mean2d"]),
                padf(proj["conic"]),
                padf(colors),
                padf(proj["depth"][:, None]),
                padf(opac[:, None]),
            ],
            axis=1,
        )
    )
    interpret = jax.default_backend() == "cpu"
    _acc, _trans, wmax = _packed_fwd_call(
        fields[pb.gid], pb.cg, pb.k0, jnp.zeros((1,), jnp.int32), pb.tids,
        ntx=ntx, nty=nty, tile_size=cfg.tile_size,
        tile_group=cfg.tile_group, n_groups=n_groups, interpret=interpret,
        probe_wmax=True,
    )
    caps = saturation_caps(
        pb, jax.lax.stop_gradient(wmax), T,
        tile_group=cfg.tile_group, max_per_tile=cfg.max_per_tile,
        tol=cfg.feedback_tol,
    )
    if not want_touched:
        return caps
    touched = (
        jnp.zeros((C + 1,), bool)
        .at[pb.gid.reshape(-1)]
        .max((wmax > 0).reshape(-1), mode="drop")[:C]
    )
    return caps, touched


def _pack_for_cfg(tile_idx, slot_valid, proj, params, active, cfg, ntx, nty,
                  tile_cap=None):
    """Pack dense slot lists per the RenderConfig: plain budgeted pack, or —
    with saturation_feedback — a probe-capped depth-sorted repack at the
    configured budget. `tile_cap` supplies precomputed caps (e.g. the
    tracking loop probes once and reuses them across rebins — the map is
    frozen there, so caps stay valid while only the pose drifts)."""
    C = params["means"].shape[0]
    if not cfg.saturation_feedback:
        return pack_bins(
            tile_idx,
            slot_valid,
            C,
            tile_group=cfg.tile_group,
            slot_budget_per_tile=cfg.slot_budget_per_tile,
        )
    if tile_cap is None:
        tile_cap = probe_saturation_caps(
            tile_idx, slot_valid, proj, params, active, cfg, ntx, nty
        )
    return pack_bins(
        tile_idx,
        slot_valid,
        C,
        tile_group=cfg.tile_group,
        slot_budget_per_tile=cfg.slot_budget_per_tile,
        tile_cap=tile_cap,
        sort_by_depth=True,
    )


def prepare_bins_with_touched(
    params: Dict[str, jax.Array],
    active: jax.Array,
    R: jax.Array,
    t: jax.Array,
    intr: Intrinsics,
    cfg: RenderConfig,
    margin: float = 0.0,
):
    """prepare_bins for the MAPPING loop under saturation feedback.

    Returns (packed bins, touched) where `touched` is the full-depth
    probe's (C,) per-Gaussian visibility. The mapping loop's
    `n_touched > 0` consumers (covisibility occ_vis, opacity-reset
    visible_any — reference utils/slam_backend.py:311-315,372-376) must
    see FULL-depth visibility: with budget-capped renders, sub-LSB
    contributors report untouched and get over-pruned (~2x, keyframe
    storm — PERFORMANCE.md round 2). The probe (which feedback packing
    needs anyway) provides exact visibility for free, so capped renders
    become a pure speed knob. Requires cfg.use_packed + saturation_feedback.
    """
    assert cfg.use_pallas and cfg.use_packed and cfg.saturation_feedback
    ntx, nty = cfg.grid(intr)
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"], active, R, t, intr
    )
    bins = bin_gaussians(
        jax.lax.stop_gradient(proj["mean2d"]),
        jax.lax.stop_gradient(proj["radius"]),
        jax.lax.stop_gradient(proj["depth"]),
        proj["valid"],
        margin,
        ntx=ntx,
        nty=nty,
        tile_size=cfg.tile_size,
        max_per_tile=cfg.max_per_tile,
        tile_chunk=cfg.tile_chunk,
        coarse_factor=cfg.coarse_factor,
        max_per_coarse=cfg.max_per_coarse,
        use_approx_topk=cfg.use_approx_topk,
        approx_recall=cfg.approx_recall,
        bin_bucket=cfg.bin_bucket,
    )
    caps, touched = probe_saturation_caps(
        bins[0], bins[1], proj, params, active, cfg, ntx, nty,
        want_touched=True,
    )
    pb = _pack_for_cfg(
        bins[0], bins[1], proj, params, active, cfg, ntx, nty, tile_cap=caps
    )
    return pb, touched


def prepare_bins_with_caps(
    params: Dict[str, jax.Array],
    active: jax.Array,
    R: jax.Array,
    t: jax.Array,
    intr: Intrinsics,
    cfg: RenderConfig,
    margin: float,
    caps: jax.Array,  # (T,) int32; caps[0] < 0 -> run the probe
):
    """prepare_bins variant with carried saturation caps (tracking loop).

    The probe is expensive (full-depth gather + blend); during tracking the
    map is frozen and the pose drifts sub-pixel per step, so caps measured
    at the first rebin remain valid for the whole run. Returns
    (bins, caps') where caps' is the (possibly freshly probed) cap vector
    to carry forward. Must be called inside a jit (traced)."""
    ntx, nty = cfg.grid(intr)
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"], active, R, t, intr
    )
    bins = bin_gaussians(
        jax.lax.stop_gradient(proj["mean2d"]),
        jax.lax.stop_gradient(proj["radius"]),
        jax.lax.stop_gradient(proj["depth"]),
        proj["valid"],
        margin,
        ntx=ntx,
        nty=nty,
        tile_size=cfg.tile_size,
        max_per_tile=cfg.max_per_tile,
        tile_chunk=cfg.tile_chunk,
        coarse_factor=cfg.coarse_factor,
        max_per_coarse=cfg.max_per_coarse,
        use_approx_topk=cfg.use_approx_topk,
        approx_recall=cfg.approx_recall,
        bin_bucket=cfg.bin_bucket,
    )
    if not (cfg.use_pallas and cfg.use_packed):
        return bins, caps
    if not cfg.saturation_feedback:
        return (
            _pack_for_cfg(bins[0], bins[1], proj, params, active, cfg, ntx, nty),
            caps,
        )
    caps = jax.lax.cond(
        caps[0] < 0,
        lambda _: probe_saturation_caps(
            bins[0], bins[1], proj, params, active, cfg, ntx, nty
        ),
        lambda _: caps,
        None,
    )
    pb = _pack_for_cfg(
        bins[0], bins[1], proj, params, active, cfg, ntx, nty, tile_cap=caps
    )
    return pb, caps


def rasterize(
    params: Dict[str, jax.Array],
    active: jax.Array,
    R: jax.Array,
    t: jax.Array,
    intr: Intrinsics,
    cfg: RenderConfig,
    vs_offset: Optional[jax.Array] = None,
    bins=None,
    need_n_touched: jax.Array | bool = True,
) -> RenderOutput:
    """Low-level differentiable rasterization.

    `params` holds means/features_dc/log_scales/quats/logit_opacities
    (GaussianMap.params()). Differentiable w.r.t. params, R, t and
    vs_offset. `vs_offset` is a (C, 2) zero tensor in NDC units whose
    gradient equals the screen-space mean gradient used for densification.
    `bins` (from prepare_bins) reuses a precomputed tile assignment.
    """
    ntx, nty = cfg.grid(intr)
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"], active, R, t, intr
    )
    mean2d = proj["mean2d"]
    if vs_offset is not None:
        ndc_scale = jnp.array([intr.width * 0.5, intr.height * 0.5], jnp.float32)
        mean2d = mean2d + vs_offset * ndc_scale[None, :]

    from ..gaussian.model import SH_C0  # local import to avoid cycle

    colors = jnp.clip(0.5 + SH_C0 * params["features_dc"], 0.0, 1.0)
    # active-gated so stale `bins` (computed before a prune/densify) can
    # never resurrect an inactive slot
    opac = jnp.where(active, jax.nn.sigmoid(params["logit_opacities"]), 0.0)

    packed = None
    if bins is None:
        tile_idx, slot_valid = bin_gaussians(
            jax.lax.stop_gradient(mean2d),
            jax.lax.stop_gradient(proj["radius"]),
            jax.lax.stop_gradient(proj["depth"]),
            proj["valid"],
            ntx=ntx,
            nty=nty,
            tile_size=cfg.tile_size,
            max_per_tile=cfg.max_per_tile,
            tile_chunk=cfg.tile_chunk,
            coarse_factor=cfg.coarse_factor,
            max_per_coarse=cfg.max_per_coarse,
            use_approx_topk=cfg.use_approx_topk,
            approx_recall=cfg.approx_recall,
            bin_bucket=cfg.bin_bucket,
        )
        if cfg.use_pallas and cfg.use_packed:
            packed = _pack_for_cfg(
                tile_idx, slot_valid, proj, params, active, cfg, ntx, nty
            )
    elif isinstance(bins, PackedBins):
        packed = bins
    else:
        tile_idx, slot_valid = bins

    bg = (
        jnp.ones((3,), jnp.float32)
        if cfg.white_background
        else jnp.zeros((3,), jnp.float32)
    )
    if packed is not None:
        img_t, depth_t, alpha_t, n_touched = _blend_pallas_packed(
            packed,
            mean2d,
            proj["conic"],
            colors,
            opac,
            proj["depth"],
            bg,
            ntx=ntx,
            nty=nty,
            tile_size=cfg.tile_size,
            tile_group=cfg.tile_group,
            need_n_touched=need_n_touched,
            bf16=cfg.blend_bf16,
        )
    elif cfg.use_pallas:
        img_t, depth_t, alpha_t, n_touched = _blend_pallas(
            tile_idx,
            slot_valid,
            mean2d,
            proj["conic"],
            colors,
            opac,
            proj["depth"],
            bg,
            ntx=ntx,
            nty=nty,
            tile_size=cfg.tile_size,
            tile_group=cfg.tile_group,
        )
    else:
        img_t, depth_t, alpha_t, n_touched = _blend(
            tile_idx,
            slot_valid,
            mean2d,
            proj["conic"],
            colors,
            opac,
            proj["depth"],
            bg,
            ntx=ntx,
            nty=nty,
            tile_size=cfg.tile_size,
            gaussian_chunk=cfg.gaussian_chunk,
        )

    H, W = intr.height, intr.width
    ts = cfg.tile_size
    image = _tiles_to_image(img_t, ntx, nty, ts, H, W).transpose(2, 0, 1)
    depth = _tiles_to_image(depth_t, ntx, nty, ts, H, W)[None]
    opacity = _tiles_to_image(alpha_t, ntx, nty, ts, H, W)[None]

    return RenderOutput(
        image=image,
        depth=depth,
        opacity=opacity,
        radii=proj["radius"],
        visibility_filter=proj["valid"],
        n_touched=n_touched,
    )


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def rasterize_median_depth(
    params: Dict[str, jax.Array],
    active: jax.Array,
    R: jax.Array,
    t: jax.Array,
    intr: Intrinsics,
    cfg: RenderConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Transmittance-median (front-surface) depth: the z of the first splat
    at which accumulated opacity crosses 0.5. Returns ((1,H,W) depth,
    (1,H,W) opacity); pixels whose opacity never reaches 0.5 get depth 0.

    WHY: the alpha-blended depth output is an UNNORMALIZED transmittance-
    weighted sum (sum of blend weights = accumulated opacity < 1), so a
    surface with opacity o reads ~(1-o) SHALLOW. Harmless for losses, but
    the per-keyframe mono->render scale alignment
    (slam/depth_alignment.py) and the PnP unprojection
    (mast3r/inference.py:_pose_from_preds) treat rendered depth as a
    surface measurement, and the systematic shallow bias COMPOUNDS
    multiplicatively through the alignment feedback (measured, r4 street
    bench: map scale drifted 0.80 -> 0.445x GT over 34 keyframes — the
    same incident reads 1.91 as a Umeyama scale CORRECTION — ATE 1.9 m of
    a 42 m trajectory). Non-differentiable by design (stop-gradient
    semantics); dense blend only — keyframe-cadence cost."""
    ntx, nty = cfg.grid(intr)
    params = jax.tree_util.tree_map(jax.lax.stop_gradient, params)
    R = jax.lax.stop_gradient(R)
    t = jax.lax.stop_gradient(t)
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"], active, R, t, intr
    )
    opac = jnp.where(active, jax.nn.sigmoid(params["logit_opacities"]), 0.0)
    tile_idx, slot_valid = bin_gaussians(
        proj["mean2d"], proj["radius"], proj["depth"], proj["valid"],
        ntx=ntx, nty=nty, tile_size=cfg.tile_size,
        max_per_tile=cfg.max_per_tile, tile_chunk=cfg.tile_chunk,
        coarse_factor=cfg.coarse_factor, max_per_coarse=cfg.max_per_coarse,
        use_approx_topk=cfg.use_approx_topk, approx_recall=cfg.approx_recall,
        bin_bucket=cfg.bin_bucket,
    )

    T, K = tile_idx.shape
    ts = cfg.tile_size
    P = ts * ts

    if cfg.use_pallas and jax.default_backend() != "cpu":
        # Pallas kernel path: marches each pixel only until opacity crosses
        # 0.5 (cheaper than a full blend); the XLA scan below materializes
        # (T, Kc, P) intermediates and costs ~1.3 s/keyframe at bench
        # shapes (r4 bench kf_fusion timer) where the kernel is ~10 ms
        from .rasterizer_pallas import pallas_median_depth

        C = proj["mean2d"].shape[0]
        padr = lambda arr: jnp.concatenate(  # noqa: E731
            [arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)], 0
        )
        idx = jnp.minimum(tile_idx, C)
        fields = jnp.concatenate(
            [
                padr(proj["mean2d"]),
                padr(proj["conic"]),
                jnp.zeros((C + 1, 3), jnp.float32),  # color slots (unused)
                padr(proj["depth"][:, None]),
                padr(opac[:, None]),
            ],
            axis=1,
        )
        tp = fields[idx.T]  # (K, T, 10)
        counts = slot_valid.sum(axis=1).astype(jnp.int32)
        dmed_t, opac_t = pallas_median_depth(
            tp, counts, ntx=ntx, nty=nty, tile_size=ts,
            tile_group=cfg.tile_group, interpret=False,
        )
        H, W = intr.height, intr.width
        return (
            _tiles_to_image(dmed_t, ntx, nty, ts, H, W)[None],
            _tiles_to_image(opac_t, ntx, nty, ts, H, W)[None],
        )

    Kc = cfg.gaussian_chunk
    n_chunks = K // Kc
    assert n_chunks * Kc == K, "max_per_tile must be divisible by gaussian_chunk"
    pad = lambda arr, v: jnp.concatenate(  # noqa: E731
        [arr, jnp.full((1,) + arr.shape[1:], v, arr.dtype)], 0
    )
    mean2d_p = pad(proj["mean2d"], 0.0)
    conic_p = pad(proj["conic"], 0.0)
    opac_p = pad(opac, 0.0)
    depth_p = pad(proj["depth"], 0.0)

    tids = jnp.arange(T, dtype=jnp.int32)
    px = ((tids % ntx) * ts)[:, None].astype(jnp.float32) + jnp.tile(
        jnp.arange(ts, dtype=jnp.float32), ts
    )[None, :]
    py = ((tids // ntx) * ts)[:, None].astype(jnp.float32) + jnp.repeat(
        jnp.arange(ts, dtype=jnp.float32), ts
    )[None, :]

    idx_chunks = tile_idx.reshape(T, n_chunks, Kc).transpose(1, 0, 2)
    valid_chunks = slot_valid.reshape(T, n_chunks, Kc).transpose(1, 0, 2)

    def body(carry, inp):
        trans, dmed = carry
        idx, sval = inp
        m = mean2d_p[idx]
        co = conic_p[idx]
        op = opac_p[idx]
        dep = depth_p[idx]
        dx = px[:, None, :] - m[..., 0:1]
        dy = py[:, None, :] - m[..., 1:2]
        power = (
            -0.5 * (co[..., 0:1] * dx * dx + co[..., 2:3] * dy * dy)
            - co[..., 1:2] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, op[..., None] * jnp.exp(power))
        alpha = jnp.where(
            (power <= 0.0) & (alpha >= ALPHA_MIN) & sval[..., None], alpha, 0.0
        )
        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=1)
        t_excl = trans[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1
        )
        # exactly one slot per pixel takes accumulated opacity past 0.5
        crossed = (t_excl > 0.5) & (t_excl * one_m <= 0.5)
        dmed = dmed + jnp.where(crossed, dep[..., None], 0.0).sum(axis=1)
        return (trans * cum[:, -1, :], dmed), None

    init = (jnp.ones((T, P), jnp.float32), jnp.zeros((T, P), jnp.float32))
    (trans, dmed), _ = jax.lax.scan(body, init, (idx_chunks, valid_chunks))
    H, W = intr.height, intr.width
    depth = _tiles_to_image(dmed, ntx, nty, ts, H, W)[None]
    opacity = _tiles_to_image(1.0 - trans, ntx, nty, ts, H, W)[None]
    return depth, opacity


def render(
    gmap,
    cam: Camera,
    intr: Intrinsics,
    cfg: RenderConfig,
    tau: Optional[jax.Array] = None,
    vs_offset: Optional[jax.Array] = None,
) -> RenderOutput:
    """Reference-`render` parity wrapper (utils/slam_backend.py:98-117).

    When `tau` is given, the camera pose is exp(tau) @ [R|T] so gradients
    w.r.t. tau are the pose gradients the reference obtained from its CUDA
    backward.
    """
    if tau is None:
        R, t = cam.R, cam.T
    else:
        R, t = lie.apply_delta(cam.R, cam.T, tau)
    return rasterize(gmap.params(), gmap.active, R, t, intr, cfg, vs_offset=vs_offset)


def render_with_custom_resolution(
    gmap,
    cam: Camera,
    intr: Intrinsics,
    cfg: RenderConfig,
    target_width: int,
    target_height: int,
) -> RenderOutput:
    """Render at a different resolution with rescaled intrinsics
    (reference utils/init_pose.py:145 / gaussian_renderer parity)."""
    sub_intr = intr.scaled(target_width, target_height)
    return rasterize(gmap.params(), gmap.active, cam.R, cam.T, sub_intr, cfg)
