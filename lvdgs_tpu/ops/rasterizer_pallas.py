"""Pallas TPU kernels for the tile blending stage of the rasterizer.

The XLA `_blend` scan (rasterizer.py) computes every (tile, gaussian, pixel)
product at full K with masked math and materialises (T, Kc, P) alpha tensors
in HBM each scan step — bandwidth-bound and wasteful for tiles holding far
fewer than K Gaussians. These kernels keep the entire front-to-back
accumulation in VMEM:

- grid over groups of TILE_GROUP tiles (one TensorCore, pipelined);
- per group, a `while_loop` over the depth-sorted per-tile Gaussian list
  with TWO exits: k reaches the group's max count, or every pixel in the
  group is saturated (transmittance < 1e-4 — the CUDA early-stop);
- per step, one (TILE_GROUP, 256) vector alpha/accumulate evaluation.

The backward kernel replays front-to-back using the prefix/suffix identity
  dL/d alpha_k = <g_acc, T_k c_k - S_k/(1-alpha_k)> - g_trans * T_N/(1-alpha_k)
(S_k = total - prefix_k), producing per-(tile, slot) parameter gradients
that XLA scatter-adds back to Gaussians through the autodiff of the gather.
This replaces the hand-written CUDA backward of the reference's
diff-gaussian-rasterization (SURVEY.md §2.8 item 1).

Layouts: tile params are (K, T, F) so the dynamic k-slice hits the leading
dimension; pixels are the 256 lanes of a 16x16 tile.

F fields: [mean_x, mean_y, conic_a, conic_b, conic_c, r, g, b, depth, opacity]
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NF = 10
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1.0e-4
UNROLL = 4  # slots per while-loop step: alpha math for the 4 slots is
# independent (ILP for the VPU); only the transmittance chain is serial


def _pixel_coords(g, tile_group, ntx, ts):
    """Pixel coordinates for the tiles of group g -> (TG, ts*ts) each."""
    tid = g * tile_group + jax.lax.broadcasted_iota(
        jnp.int32, (tile_group, 1), 0
    )  # (TG, 1)
    ox = ((tid % ntx) * ts).astype(jnp.float32)
    oy = ((tid // ntx) * ts).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, ts * ts), 1)
    pxo = (lin % ts).astype(jnp.float32)
    pyo = (lin // ts).astype(jnp.float32)
    return ox + pxo, oy + pyo  # (TG, P)


def _slot_params(tp_ref, k, tile_group):
    p = tp_ref[pl.ds(k, 1)].reshape(tile_group, NF)
    return [p[:, i : i + 1] for i in range(NF)]  # list of (TG, 1)


def _slot_params_block(tp_ref, k, tile_group):
    """Params for slots k..k+UNROLL-1 -> UNROLL lists of (TG, 1)."""
    pb = tp_ref[pl.ds(k, UNROLL)]  # (U, TG, NF)
    return [
        [pb[u, :, i : i + 1] for i in range(NF)] for u in range(UNROLL)
    ]


def _alpha_at(p, px, py, k, counts):
    """Alpha test for slot k on the (TG, P) pixel grid. Returns
    (alpha, G, dx, dy, valid_mask)."""
    mx, my, ca, cb, cc, _r, _g, _b, _d, op = p
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(power)
    raw = op * G
    slot_ok = (k < counts)  # (TG, 1)
    ok = (power <= 0.0) & (raw >= ALPHA_MIN) & slot_ok
    alpha = jnp.where(ok, jnp.minimum(ALPHA_MAX, raw), 0.0)
    return alpha, G, dx, dy, raw


def _make_fwd_kernel(tile_group: int, ntx: int, ts: int, K: int):
    P = ts * ts

    def kernel(counts_ref, tp_ref, acc_ref, trans_ref, nt_ref):
        g = pl.program_id(0)
        px, py = _pixel_coords(g, tile_group, ntx, ts)
        counts = counts_ref[:].astype(jnp.int32)  # (TG, 1)
        kmax = jnp.max(counts)
        # lane index over K for the one-hot n_touched accumulate (Mosaic
        # forbids dynamic lane-dim stores)
        k_lane = jax.lax.broadcasted_iota(jnp.int32, (tile_group, K), 1)

        def cond(state):
            k, trans, *_ = state
            return (k < kmax) & (jnp.max(trans) > T_EPS)

        def body(state):
            k, trans, ar, ag, ab, ad, nt = state
            ps = _slot_params_block(tp_ref, k, tile_group)
            for u in range(UNROLL):
                p = ps[u]
                alpha, _G, _dx, _dy, _raw = _alpha_at(p, px, py, k + u, counts)
                contributes = trans > T_EPS
                w = jnp.where(contributes, alpha * trans, 0.0)
                ar += w * p[5]
                ag += w * p[6]
                ab += w * p[7]
                ad += w * p[8]
                cnt = (w > 0.0).sum(axis=1).astype(jnp.int32)[:, None]  # (TG, 1)
                nt = nt + jnp.where(k_lane == k + u, cnt, 0)
                trans = trans * (1.0 - alpha)
            return k + UNROLL, trans, ar, ag, ab, ad, nt

        zeros = jnp.zeros((tile_group, P), jnp.float32)
        k, trans, ar, ag, ab, ad, nt = jax.lax.while_loop(
            cond,
            body,
            (jnp.zeros((), jnp.int32), jnp.ones((tile_group, P), jnp.float32),
             zeros, zeros, zeros, zeros, jnp.zeros((tile_group, K), jnp.int32)),
        )
        acc_ref[:, 0, :] = ar
        acc_ref[:, 1, :] = ag
        acc_ref[:, 2, :] = ab
        acc_ref[:, 3, :] = ad
        trans_ref[:] = trans
        nt_ref[:] = nt

    return kernel


def _make_bwd_kernel(tile_group: int, ntx: int, ts: int, K: int):
    P = ts * ts

    def kernel(counts_ref, tp_ref, acc_ref, trans_ref, dacc_ref, dtrans_ref, dtp_ref):
        g = pl.program_id(0)
        px, py = _pixel_coords(g, tile_group, ntx, ts)
        counts = counts_ref[:].astype(jnp.int32)
        kmax = jnp.max(counts)

        dtp_ref[:] = jnp.zeros((K, tile_group, NF), jnp.float32)

        tot_r = acc_ref[:, 0, :]
        tot_g = acc_ref[:, 1, :]
        tot_b = acc_ref[:, 2, :]
        tot_d = acc_ref[:, 3, :]
        trans_final = trans_ref[:]
        g_r = dacc_ref[:, 0, :]
        g_g = dacc_ref[:, 1, :]
        g_b = dacc_ref[:, 2, :]
        g_d = dacc_ref[:, 3, :]
        g_t = dtrans_ref[:]

        def cond(state):
            k, trans, *_ = state
            return (k < kmax) & (jnp.max(trans) > T_EPS)

        def body(state):
            k, trans, pr, pg, pb, pd = state
            ps = _slot_params_block(tp_ref, k, tile_group)
            grads_u = []
            for u in range(UNROLL):
                p = ps[u]
                mx, my, ca, cb, cc, cr, cg, cbl, cd, op = p
                alpha, G, dx, dy, raw = _alpha_at(p, px, py, k + u, counts)
                contributes = trans > T_EPS
                w = jnp.where(contributes, alpha * trans, 0.0)
                pr += w * cr
                pg += w * cg
                pb += w * cbl
                pd += w * cd
                one_m = 1.0 - alpha

                # suffix sums AFTER this slot
                sr = tot_r - pr
                sg = tot_g - pg
                sb = tot_b - pb
                sd = tot_d - pd
                # dL/d alpha at each pixel
                galpha = (
                    g_r * jnp.where(contributes, trans * cr - sr / one_m, 0.0)
                    + g_g * jnp.where(contributes, trans * cg - sg / one_m, 0.0)
                    + g_b * jnp.where(contributes, trans * cbl - sb / one_m, 0.0)
                    + g_d * jnp.where(contributes, trans * cd - sd / one_m, 0.0)
                    - g_t * trans_final / one_m
                )
                galpha = jnp.where(alpha > 0.0, galpha, 0.0)

                unclamped = raw < ALPHA_MAX
                d_op_px = jnp.where(unclamped, galpha * G, 0.0)
                d_pow = jnp.where(unclamped, galpha * alpha, 0.0)

                d_mx = (d_pow * (ca * dx + cb * dy)).sum(axis=1)
                d_my = (d_pow * (cc * dy + cb * dx)).sum(axis=1)
                d_ca = (d_pow * (-0.5 * dx * dx)).sum(axis=1)
                d_cb = (d_pow * (-dx * dy)).sum(axis=1)
                d_cc = (d_pow * (-0.5 * dy * dy)).sum(axis=1)
                d_cr = (g_r * w).sum(axis=1)
                d_cg = (g_g * w).sum(axis=1)
                d_cb2 = (g_b * w).sum(axis=1)
                d_cd = (g_d * w).sum(axis=1)
                d_op = d_op_px.sum(axis=1)

                grads_u.append(
                    jnp.stack(
                        [d_mx, d_my, d_ca, d_cb, d_cc, d_cr, d_cg, d_cb2, d_cd, d_op],
                        axis=-1,
                    )  # (TG, NF)
                )
                trans = trans * one_m
            dtp_ref[pl.ds(k, UNROLL)] = jnp.stack(grads_u, axis=0)
            return k + UNROLL, trans, pr, pg, pb, pd

        zeros = jnp.zeros((tile_group, P), jnp.float32)
        jax.lax.while_loop(
            cond,
            body,
            (jnp.zeros((), jnp.int32), jnp.ones((tile_group, P), jnp.float32),
             zeros, zeros, zeros, zeros),
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("ntx", "nty", "tile_size", "tile_group", "interpret")
)
def _blend_fwd_call(tp, counts, *, ntx, nty, tile_size, tile_group, interpret):
    K0, T, _ = tp.shape
    K = -(-K0 // UNROLL) * UNROLL
    if K != K0:
        tp = jnp.pad(tp, ((0, K - K0), (0, 0), (0, 0)))
    ts = tile_size
    P = ts * ts
    TG = tile_group
    n_groups = -(-T // TG)
    T_pad = n_groups * TG
    if T_pad != T:
        tp = jnp.pad(tp, ((0, 0), (0, T_pad - T), (0, 0)))
        counts = jnp.pad(counts, (0, T_pad - T))

    kernel = _make_fwd_kernel(TG, ntx, ts, K)
    acc, trans, nt = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((TG, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TG, NF), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TG, 4, P), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TG, P), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TG, K), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, 4, P), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, P), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, K), jnp.int32),
        ],
        interpret=interpret,
    )(counts[:, None].astype(jnp.int32), tp)
    return acc[:T], trans[:T], nt[:T, :K0]


@functools.partial(
    jax.jit, static_argnames=("ntx", "nty", "tile_size", "tile_group", "interpret")
)
def _blend_bwd_call(tp, counts, acc, trans, dacc, dtrans, *, ntx, nty, tile_size,
                    tile_group, interpret):
    K0, T, _ = tp.shape
    K = -(-K0 // UNROLL) * UNROLL
    if K != K0:
        tp = jnp.pad(tp, ((0, K - K0), (0, 0), (0, 0)))
    ts = tile_size
    P = ts * ts
    TG = tile_group
    n_groups = -(-T // TG)
    T_pad = n_groups * TG
    if T_pad != T:
        tp = jnp.pad(tp, ((0, 0), (0, T_pad - T), (0, 0)))
        counts = jnp.pad(counts, (0, T_pad - T))
        acc = jnp.pad(acc, ((0, T_pad - T), (0, 0), (0, 0)))
        trans = jnp.pad(trans, ((0, T_pad - T), (0, 0)))
        dacc = jnp.pad(dacc, ((0, T_pad - T), (0, 0), (0, 0)))
        dtrans = jnp.pad(dtrans, ((0, T_pad - T), (0, 0)))

    kernel = _make_bwd_kernel(TG, ntx, ts, K)
    dtp = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((TG, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TG, NF), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TG, 4, P), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TG, P), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TG, 4, P), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TG, P), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, TG, NF), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, T_pad, NF), jnp.float32),
        interpret=interpret,
    )(counts[:, None].astype(jnp.int32), tp, acc, trans, dacc, dtrans)
    return dtp[:K0, :T]


def _make_median_kernel(tile_group: int, ntx: int, ts: int, K: int):
    P = ts * ts

    def kernel(counts_ref, tp_ref, dmed_ref, opac_ref):
        g = pl.program_id(0)
        px, py = _pixel_coords(g, tile_group, ntx, ts)
        counts = counts_ref[:].astype(jnp.int32)
        kmax = jnp.max(counts)

        def cond(state):
            k, trans, _ = state
            # march only until every pixel's accumulated opacity crossed
            # 0.5 — the median is then recorded; cheaper than a full blend
            return (k < kmax) & (jnp.max(trans) > 0.5)

        def body(state):
            k, trans, dmed = state
            ps = _slot_params_block(tp_ref, k, tile_group)
            for u in range(UNROLL):
                p = ps[u]
                alpha, _G, _dx, _dy, _raw = _alpha_at(p, px, py, k + u, counts)
                t_new = trans * (1.0 - alpha)
                # exactly one slot per pixel takes opacity past 0.5
                crossed = (trans > 0.5) & (t_new <= 0.5)
                dmed = jnp.where(crossed, p[8], dmed)
                trans = t_new
            return k + UNROLL, trans, dmed

        _k, trans, dmed = jax.lax.while_loop(
            cond,
            body,
            (jnp.zeros((), jnp.int32),
             jnp.ones((tile_group, P), jnp.float32),
             jnp.zeros((tile_group, P), jnp.float32)),
        )
        dmed_ref[:] = dmed
        opac_ref[:] = 1.0 - trans

    return kernel


@functools.partial(
    jax.jit, static_argnames=("ntx", "nty", "tile_size", "tile_group", "interpret")
)
def pallas_median_depth(tp, counts, *, ntx, nty, tile_size, tile_group,
                        interpret):
    """Transmittance-median (front-surface) depth: the z of the first slot
    at which accumulated opacity crosses 0.5. Forward-only (no VJP; the
    consumer treats it as a measurement). Returns ((T, P) depth — 0 where
    the pixel never reaches opacity 0.5 — and (T, P) opacity at the march's
    stop point: exact where the pixel never crossed, >= 0.5 otherwise)."""
    K0, T, _ = tp.shape
    K = -(-K0 // UNROLL) * UNROLL
    if K != K0:
        tp = jnp.pad(tp, ((0, K - K0), (0, 0), (0, 0)))
    ts = tile_size
    P = ts * ts
    TG = tile_group
    n_groups = -(-T // TG)
    T_pad = n_groups * TG
    if T_pad != T:
        tp = jnp.pad(tp, ((0, 0), (0, T_pad - T), (0, 0)))
        counts = jnp.pad(counts, (0, T_pad - T))

    kernel = _make_median_kernel(TG, ntx, ts, K)
    dmed, opac = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((TG, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TG, NF), lambda g: (0, g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TG, P), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TG, P), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, P), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, P), jnp.float32),
        ],
        interpret=interpret,
    )(counts[:, None].astype(jnp.int32), tp)
    return dmed[:T], opac[:T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def pallas_blend(tp, counts, ntx, nty, tile_size, tile_group, interpret):
    """Front-to-back blend of pre-gathered tile params.

    tp: (K, T, NF) float32 (fields documented at module top, depth-sorted
    front first), counts: (T,) int32 valid slots per tile.
    Returns (acc (T, 4, P), trans (T, P), n_touched (T, K)).
    Differentiable w.r.t. tp.
    """
    return _blend_fwd_call(
        tp, counts, ntx=ntx, nty=nty, tile_size=tile_size, tile_group=tile_group,
        interpret=interpret,
    )


def _pb_fwd(tp, counts, ntx, nty, tile_size, tile_group, interpret):
    out = _blend_fwd_call(
        tp, counts, ntx=ntx, nty=nty, tile_size=tile_size, tile_group=tile_group,
        interpret=interpret,
    )
    acc, trans, nt = out
    return out, (tp, counts, acc, trans)


def _pb_bwd(ntx, nty, tile_size, tile_group, interpret, res, cot):
    tp, counts, acc, trans = res
    dacc, dtrans, _dnt = cot
    dtp = _blend_bwd_call(
        tp, counts, acc, trans, dacc, dtrans,
        ntx=ntx, nty=nty, tile_size=tile_size, tile_group=tile_group,
        interpret=interpret,
    )
    return dtp, None


pallas_blend.defvjp(_pb_fwd, _pb_bwd)


# ---------------------------------------------------------------------------
# Packed (group-CSR) blending: ragged per-tile-group chunk lists
# ---------------------------------------------------------------------------
#
# The dense layout above evaluates/gathers/scatters a full (T, K) slot grid
# even though the average tile holds ~K/4 Gaussians (tools/perf_saturation.py)
# and XLA's gather/scatter are row-serialized (~15-25 ns/row,
# tools/perf_resident.py). The packed layout allocates chunks of KC slots per
# TILE GROUP, sized by each group's deepest tile (waterfill-capped by a static
# slot budget, rasterizer.pack_bins), and drives the kernels over a flat chunk
# grid with scalar-prefetched (group, k-offset) maps. Plumbing rows shrink to
# the slot budget (~2x) while the blended slot set stays bitwise-identical
# whenever the budget does not bind.
#
# Chunk c of group g covers slots [k0, k0+KC) of the group's TG tiles.
# Invalid slots carry the sentinel row C whose opacity is 0 (alpha=0), so no
# per-slot count masking is needed. acc/trans output blocks are revisited
# across a group's consecutive chunks (init at k0==0); the backward carries
# its transmittance/prefix state in VMEM scratch the same way.

KC = 32  # slots per chunk (static unroll inside the kernel)


def _tid_pixel_coords(tid, ntx, ts):
    """Pixel coordinates from explicit tile ids. tid: (TG, 1) int32."""
    ox = ((tid % ntx) * ts).astype(jnp.float32)
    oy = ((tid // ntx) * ts).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, ts * ts), 1)
    pxo = (lin % ts).astype(jnp.float32)
    pyo = (lin // ts).astype(jnp.float32)
    return ox + pxo, oy + pyo  # (TG, P)


def _make_packed_fwd_kernel(tile_group: int, ntx: int, ts: int,
                            probe_wmax: bool = False, with_nt: bool = True,
                            bf16: bool = False):
    """With `probe_wmax` the nt output carries each slot's MAX blend weight
    over the tile's pixels, fixed-point x65536, instead of touched-pixel
    counts — the saturation-feedback probe suffix-sums these to find where
    a tile's remaining contribution becomes imperceptible. `with_nt=False`
    compiles the per-slot (TG, P) -> (TG,) touched reductions out entirely
    (the tracking loop and feedback-mapping never consume them; visibility
    comes from a final exact render / the probe). `bf16=True` runs the
    per-slot weight math (the bulk of the kernel's vector ops) in bfloat16
    — native (16, 128) bf16 tiling packs 2x elements per vreg on the VPU —
    with coordinates recentred on the tile origin so the bf16 ulp stays
    sub-0.1px; alpha is widened to f32 for the transmittance chain and
    the accumulations, bounding the error to ~0.4% of each slot's alpha."""
    P = ts * ts

    def kernel(cg_ref, k0_ref, goff_ref, tid_ref, tp_ref, acc_ref, trans_ref,
               nt_ref):
        b = pl.program_id(0)
        k0 = k0_ref[b]
        nt_ref[:] = jnp.zeros_like(nt_ref)

        @pl.when(k0 == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            trans_ref[:] = jnp.ones_like(trans_ref)

        trans0 = trans_ref[0]  # (TG, P)

        @pl.when(jnp.max(trans0) > T_EPS)
        def _():
            # explicit per-chunk tile ids (depth-sorted grouping); goff
            # shifts them in tile-sharded multi-chip rendering
            tid = tid_ref[0, 0][:, None] + goff_ref[0]  # (TG, 1)
            px, py = _tid_pixel_coords(tid, ntx, ts)
            if bf16:
                bt = jnp.bfloat16
                ox = ((tid % ntx) * ts).astype(jnp.float32)  # (TG, 1)
                oy = ((tid // ntx) * ts).astype(jnp.float32)
                lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
                pxl = (lin % ts).astype(bt)  # local coords < ts: bf16-exact
                pyl = (lin // ts).astype(bt)
            trans = trans0
            ar = acc_ref[0, 0]
            ag = acc_ref[0, 1]
            ab = acc_ref[0, 2]
            ad = acc_ref[0, 3]
            nts = []
            for kc in range(KC):
                p = tp_ref[0, kc]  # (TG, NF)
                fl = [p[:, i : i + 1] for i in range(NF)]
                mx, my, ca, cb, cc, cr, cgc, cbl, cd, op = fl
                if bf16:
                    dx = pxl - (mx - ox).astype(bt)
                    dy = pyl - (my - oy).astype(bt)
                    cab, cbb, ccb = ca.astype(bt), cb.astype(bt), cc.astype(bt)
                    power = (
                        bt(-0.5) * (cab * dx * dx + ccb * dy * dy)
                        - cbb * dx * dy
                    )
                    raw = (op.astype(bt) * jnp.exp(power)).astype(jnp.float32)
                    # compare in f32: Mosaic v5e has no vector bf16 cmpf,
                    # and alpha is widened to f32 here anyway
                    p32 = power.astype(jnp.float32)
                    ok = (p32 <= 0.0) & (raw >= ALPHA_MIN)
                    alpha = jnp.where(ok, jnp.minimum(ALPHA_MAX, raw), 0.0)
                else:
                    dx = px - mx
                    dy = py - my
                    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                    raw = op * jnp.exp(power)
                    ok = (power <= 0.0) & (raw >= ALPHA_MIN)
                    alpha = jnp.where(ok, jnp.minimum(ALPHA_MAX, raw), 0.0)
                w = jnp.where(trans > T_EPS, alpha * trans, 0.0)
                ar += w * cr
                ag += w * cgc
                ab += w * cbl
                ad += w * cd
                if probe_wmax:
                    # ceil, not round: any nonzero blend weight must fix to a
                    # nonzero int so the probe's `wmax > 0` touched test keeps
                    # exact n_touched>0 semantics (round would drop
                    # contributors below ~7.6e-6, under-reporting visibility
                    # in the over-pruning direction — ADVICE r2); caps get at
                    # most 1 LSB more conservative (deeper), the safe side
                    nts.append(
                        jnp.ceil(w.max(axis=1) * 65536.0).astype(jnp.int32)
                    )
                elif with_nt:
                    nts.append((w > 0.0).sum(axis=1).astype(jnp.int32))
                trans = trans * (1.0 - alpha)
            if nts:
                nt_ref[0] = jnp.stack(nts, axis=0)  # one (KC, TG) store
            acc_ref[0, 0] = ar
            acc_ref[0, 1] = ag
            acc_ref[0, 2] = ab
            acc_ref[0, 3] = ad
            trans_ref[0] = trans

    return kernel


def _make_packed_bwd_kernel(tile_group: int, ntx: int, ts: int,
                            bf16: bool = False):
    """`bf16=True` recomputes the per-slot weights in bfloat16 — mirroring
    the forward's bf16 math so the replayed alpha matches the forward pass
    bit-for-bit — then upcasts for the rest: the transmittance/prefix
    chain, galpha, and all parameter-gradient products run in f32 (the
    bf16 saving here is the weight replay, about half the kernel's ops)."""
    P = ts * ts

    def kernel(cg_ref, k0_ref, goff_ref, tid_ref, tp_ref, acc_ref, trans_ref,
               dacc_ref, dtrans_ref, dtp_ref, trans_s, pre_s):
        b = pl.program_id(0)
        k0 = k0_ref[b]
        dtp_ref[:] = jnp.zeros_like(dtp_ref)

        @pl.when(k0 == 0)
        def _():
            trans_s[:] = jnp.ones_like(trans_s)
            pre_s[:] = jnp.zeros_like(pre_s)

        trans0 = trans_s[:]  # (TG, P)

        @pl.when(jnp.max(trans0) > T_EPS)
        def _():
            tid = tid_ref[0, 0][:, None] + goff_ref[0]  # (TG, 1)
            px, py = _tid_pixel_coords(tid, ntx, ts)
            if bf16:
                bt = jnp.bfloat16
                ox = ((tid % ntx) * ts).astype(jnp.float32)
                oy = ((tid // ntx) * ts).astype(jnp.float32)
                lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
                pxl = (lin % ts).astype(bt)
                pyl = (lin // ts).astype(bt)
            tot_r = acc_ref[0, 0]
            tot_g = acc_ref[0, 1]
            tot_b = acc_ref[0, 2]
            tot_d = acc_ref[0, 3]
            trans_final = trans_ref[0]
            g_r = dacc_ref[0, 0]
            g_g = dacc_ref[0, 1]
            g_b = dacc_ref[0, 2]
            g_d = dacc_ref[0, 3]
            g_t = dtrans_ref[0]

            trans = trans0
            pr = pre_s[0]
            pg = pre_s[1]
            pb = pre_s[2]
            pd = pre_s[3]
            dtps = []
            for kc in range(KC):
                p = tp_ref[0, kc]
                fl = [p[:, i : i + 1] for i in range(NF)]
                mx, my, ca, cb, cc, cr, cgc, cbl, cd, op = fl
                if bf16:
                    dxb = pxl - (mx - ox).astype(bt)
                    dyb = pyl - (my - oy).astype(bt)
                    cab, cbb, ccb = ca.astype(bt), cb.astype(bt), cc.astype(bt)
                    powerb = (
                        bt(-0.5) * (cab * dxb * dxb + ccb * dyb * dyb)
                        - cbb * dxb * dyb
                    )
                    Gb = jnp.exp(powerb)
                    G = Gb.astype(jnp.float32)
                    raw = (op.astype(bt) * Gb).astype(jnp.float32)
                    # f32 compares: Mosaic v5e has no vector bf16 cmpf
                    p32 = powerb.astype(jnp.float32)
                    ok = (p32 <= 0.0) & (raw >= ALPHA_MIN)
                    alpha = jnp.where(ok, jnp.minimum(ALPHA_MAX, raw), 0.0)
                    dx = dxb.astype(jnp.float32)
                    dy = dyb.astype(jnp.float32)
                else:
                    dx = px - mx
                    dy = py - my
                    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                    G = jnp.exp(power)
                    raw = op * G
                    ok = (power <= 0.0) & (raw >= ALPHA_MIN)
                    alpha = jnp.where(ok, jnp.minimum(ALPHA_MAX, raw), 0.0)
                contributes = trans > T_EPS
                w = jnp.where(contributes, alpha * trans, 0.0)
                pr += w * cr
                pg += w * cgc
                pb += w * cbl
                pd += w * cd
                one_m = 1.0 - alpha

                sr = tot_r - pr
                sg = tot_g - pg
                sb = tot_b - pb
                sd = tot_d - pd
                galpha = (
                    g_r * jnp.where(contributes, trans * cr - sr / one_m, 0.0)
                    + g_g * jnp.where(contributes, trans * cgc - sg / one_m, 0.0)
                    + g_b * jnp.where(contributes, trans * cbl - sb / one_m, 0.0)
                    + g_d * jnp.where(contributes, trans * cd - sd / one_m, 0.0)
                    - g_t * trans_final / one_m
                )
                galpha = jnp.where(alpha > 0.0, galpha, 0.0)

                unclamped = raw < ALPHA_MAX
                d_op_px = jnp.where(unclamped, galpha * G, 0.0)
                d_pow = jnp.where(unclamped, galpha * alpha, 0.0)

                d_mx = (d_pow * (ca * dx + cb * dy)).sum(axis=1)
                d_my = (d_pow * (cc * dy + cb * dx)).sum(axis=1)
                d_ca = (d_pow * (-0.5 * dx * dx)).sum(axis=1)
                d_cb = (d_pow * (-dx * dy)).sum(axis=1)
                d_cc = (d_pow * (-0.5 * dy * dy)).sum(axis=1)
                d_cr = (g_r * w).sum(axis=1)
                d_cg = (g_g * w).sum(axis=1)
                d_cb2 = (g_b * w).sum(axis=1)
                d_cd = (g_d * w).sum(axis=1)
                d_op = d_op_px.sum(axis=1)

                dtps.append(jnp.stack(
                    [d_mx, d_my, d_ca, d_cb, d_cc, d_cr, d_cg, d_cb2, d_cd, d_op],
                    axis=-1,
                ))  # (TG, NF)
                trans = trans * one_m
            dtp_ref[0] = jnp.stack(dtps, axis=0)  # one (KC, TG, NF) store
            trans_s[:] = trans
            pre_s[0] = pr
            pre_s[1] = pg
            pre_s[2] = pb
            pre_s[3] = pd

    return kernel


@functools.partial(
    jax.jit, static_argnames=("ntx", "nty", "tile_size", "tile_group", "n_groups",
                              "interpret", "probe_wmax", "with_nt", "bf16")
)
def _packed_fwd_call(tp, cg, k0, goff, tids, *, ntx, nty, tile_size, tile_group,
                     n_groups, interpret, probe_wmax=False, with_nt=True,
                     bf16=False):
    NB = tp.shape[0]
    TG = tile_group
    ts = tile_size
    P = ts * ts
    kernel = _make_packed_fwd_kernel(TG, ntx, ts, probe_wmax, with_nt, bf16)
    tids = tids.reshape(NB, 1, TG)  # (1, 1, TG) blocks satisfy TPU tiling
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 1, TG), lambda b, cg, k0, goff: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KC, TG, NF), lambda b, cg, k0, goff: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, TG, P), lambda b, cg, k0, goff: (cg[b], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TG, P), lambda b, cg, k0, goff: (cg[b], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KC, TG), lambda b, cg, k0, goff: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    acc, trans, nt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_groups + 1, 4, TG, P), jnp.float32),
            jax.ShapeDtypeStruct((n_groups + 1, TG, P), jnp.float32),
            jax.ShapeDtypeStruct((NB, KC, TG), jnp.int32),
        ],
        interpret=interpret,
    )(cg, k0, goff, tids, tp)
    return acc, trans, nt


@functools.partial(
    jax.jit, static_argnames=("ntx", "nty", "tile_size", "tile_group", "n_groups",
                              "interpret", "bf16")
)
def _packed_bwd_call(tp, cg, k0, goff, tids, acc, trans, dacc, dtrans, *, ntx,
                     nty, tile_size, tile_group, n_groups, interpret,
                     bf16=False):
    NB = tp.shape[0]
    TG = tile_group
    ts = tile_size
    P = ts * ts
    kernel = _make_packed_bwd_kernel(TG, ntx, ts, bf16)
    tids = tids.reshape(NB, 1, TG)  # (1, 1, TG) blocks satisfy TPU tiling
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 1, TG), lambda b, cg, k0, goff: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KC, TG, NF), lambda b, cg, k0, goff: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, TG, P), lambda b, cg, k0, goff: (cg[b], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TG, P), lambda b, cg, k0, goff: (cg[b], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, TG, P), lambda b, cg, k0, goff: (cg[b], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TG, P), lambda b, cg, k0, goff: (cg[b], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KC, TG, NF), lambda b, cg, k0, goff: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TG, P), jnp.float32),
            pltpu.VMEM((4, TG, P), jnp.float32),
        ],
    )
    dtp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB, KC, TG, NF), jnp.float32),
        interpret=interpret,
    )(cg, k0, goff, tids, tp, acc, trans, dacc, dtrans)
    return dtp


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def pallas_blend_packed(tp, cg, k0, goff, tids, ntx, nty, tile_size,
                        tile_group, n_groups, interpret, with_nt=True,
                        bf16=False):
    """Front-to-back blend over packed chunk lists.

    tp: (NB, KC, TG, NF) float32 pre-gathered fields, depth-sorted within
    each tile, sentinel rows (opacity 0) for empty slots. cg: (NB,) int32
    tile-group id per chunk (n_groups = garbage row for padding chunks).
    k0: (NB,) int32 slot offset of the chunk within its group (0 = first).
    tids: (NB, TG) int32 explicit tile id per (chunk, lane) — groups may
    hold ARBITRARY tile sets (depth-sorted grouping), not just contiguous
    runs. Chunks of a group must be grid-consecutive and depth-ascending.
    `goff` is a (1,) int32 global TILE-ID offset: in tile-sharded
    multi-chip rendering each device blends a row-block whose local tile
    ids start at goff, making the kernel's pixel coordinates global.
    Returns (acc (G+1, 4, TG, P), trans (G+1, TG, P), nt (NB, KC, TG)) —
    acc/trans rows are in GROUP order; map back to tiles via tids.
    Differentiable w.r.t. tp. `with_nt=False` compiles the touched-count
    reductions out of the kernel (nt returns zeros). `bf16=True` runs the
    per-slot weight math in bfloat16 (see the kernel factories).
    """
    return _packed_fwd_call(
        tp, cg, k0, goff, tids, ntx=ntx, nty=nty, tile_size=tile_size,
        tile_group=tile_group, n_groups=n_groups, interpret=interpret,
        with_nt=with_nt, bf16=bf16,
    )


def _pbp_fwd(tp, cg, k0, goff, tids, ntx, nty, tile_size, tile_group, n_groups,
             interpret, with_nt=True, bf16=False):
    out = _packed_fwd_call(
        tp, cg, k0, goff, tids, ntx=ntx, nty=nty, tile_size=tile_size,
        tile_group=tile_group, n_groups=n_groups, interpret=interpret,
        with_nt=with_nt, bf16=bf16,
    )
    acc, trans, nt = out
    return out, (tp, cg, k0, goff, tids, acc, trans)


def _pbp_bwd(ntx, nty, tile_size, tile_group, n_groups, interpret, with_nt,
             bf16, res, cot):
    tp, cg, k0, goff, tids, acc, trans = res
    dacc, dtrans, _dnt = cot
    dtp = _packed_bwd_call(
        tp, cg, k0, goff, tids, acc, trans, dacc[: acc.shape[0]],
        dtrans[: trans.shape[0]],
        ntx=ntx, nty=nty, tile_size=tile_size, tile_group=tile_group,
        n_groups=n_groups, interpret=interpret, bf16=bf16,
    )
    return dtp, None, None, None, None


pallas_blend_packed.defvjp(_pbp_fwd, _pbp_bwd)
