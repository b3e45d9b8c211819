#!/usr/bin/env python
"""Per-stage rasterizer microbenchmark on the real TPU.

Times each stage of the rasterization pipeline separately (project, bin,
gather, Pallas blend fwd, blend fwd+bwd, full render fwd, full fwd+bwd)
at KITTI geometry and realistic map density, so optimization work targets
the actual bottleneck. Measurement rules per axon quirks: sync by fetching
a scalar (block_until_ready does not synchronize through the relay).

Usage: python tools/perf_raster.py [--capacity 131072] [--active 60000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp
import numpy as np

from lvdgs_tpu.core.camera import Intrinsics
from lvdgs_tpu.ops import rasterizer as R
from lvdgs_tpu.ops.rasterizer import RenderConfig, bin_gaussians, project_gaussians, rasterize


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


def bench(fn, *args, reps=10, **kw):
    out = fn(*args, **kw)  # compile
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1000.0  # ms (incl 1 RT ~27ms/reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=2**17)
    ap.add_argument("--active", type=int, default=60000)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    intr = Intrinsics(fx=707.0912, fy=707.0912, cx=601.8873, cy=183.1104,
                      width=1226, height=370)
    cfg = RenderConfig(tile_size=16, max_per_tile=256, gaussian_chunk=32,
                       tile_chunk=128)
    C, A = args.capacity, args.active
    rng = np.random.default_rng(0)
    means = np.concatenate(
        [rng.normal(size=(C, 2)) * 10.0, rng.uniform(4.0, 14.0, size=(C, 1))], axis=1
    )
    params = {
        "means": jnp.asarray(means, jnp.float32),
        "features_dc": jnp.asarray(rng.normal(size=(C, 3)), jnp.float32),
        "log_scales": jnp.asarray(rng.uniform(-2.0, -0.9, size=(C, 3)), jnp.float32),
        "quats": jnp.asarray(rng.normal(size=(C, 4)), jnp.float32),
        "logit_opacities": jnp.asarray(rng.uniform(1.5, 4.0, size=(C,)), jnp.float32),
    }
    active = jnp.arange(C) < A
    Rm = jnp.eye(3)
    t = jnp.zeros(3)
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform}); C={C} active={A}", file=sys.stderr)

    ntx, nty = cfg.grid(intr)
    T = ntx * nty
    K = cfg.max_per_tile

    # --- stage 1: project
    proj_fn = jax.jit(lambda p, a: project_gaussians(
        p["means"], p["quats"], p["log_scales"], a, Rm, t, intr))
    ms = bench(proj_fn, params, active, reps=args.reps)
    print(f"project:            {ms:7.2f} ms")
    proj = jax.jit(lambda p, a: project_gaussians(
        p["means"], p["quats"], p["log_scales"], a, Rm, t, intr))(params, active)

    # --- stage 2: bin
    def bin_fn(proj):
        return bin_gaussians(
            proj["mean2d"], proj["radius"], proj["depth"], proj["valid"],
            ntx=ntx, nty=nty, tile_size=cfg.tile_size, max_per_tile=K,
            tile_chunk=cfg.tile_chunk, coarse_factor=cfg.coarse_factor,
            max_per_coarse=cfg.max_per_coarse, use_approx_topk=cfg.use_approx_topk,
            approx_recall=cfg.approx_recall)
    ms = bench(bin_fn, proj, reps=args.reps)
    print(f"bin:                {ms:7.2f} ms")
    tile_idx, slot_valid = bin_fn(proj)
    density = float(slot_valid.sum()) / T
    print(f"  avg gaussians/tile: {density:.1f}  max: {int(slot_valid.sum(1).max())}",
          file=sys.stderr)

    # --- stage 3: gather into (K, T, NF)
    from lvdgs_tpu.gaussian.model import SH_C0
    colors = jnp.clip(0.5 + SH_C0 * params["features_dc"], 0.0, 1.0)
    opac = jax.nn.sigmoid(params["logit_opacities"])

    @jax.jit
    def gather_fn(tile_idx, mean2d, conic, colors, opac, depth):
        pad = lambda arr: jnp.concatenate(
            [arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)], 0)
        idx = jnp.minimum(tile_idx, C)
        fields = jnp.concatenate(
            [pad(mean2d), pad(conic), pad(colors), pad(depth[:, None]),
             pad(opac[:, None])], axis=1)
        return fields[idx.T]

    ms = bench(gather_fn, tile_idx, proj["mean2d"], proj["conic"], colors, opac,
               proj["depth"], reps=args.reps)
    print(f"gather (K,T,10):    {ms:7.2f} ms")
    tp = gather_fn(tile_idx, proj["mean2d"], proj["conic"], colors, opac, proj["depth"])
    counts = slot_valid.sum(axis=1).astype(jnp.int32)

    # --- stage 4: pallas blend fwd only
    from lvdgs_tpu.ops.rasterizer_pallas import pallas_blend
    interp = jax.default_backend() == "cpu"

    @jax.jit
    def blend_fwd(tp, counts):
        return pallas_blend(tp, counts, ntx, nty, cfg.tile_size, cfg.tile_group, interp)

    ms = bench(blend_fwd, tp, counts, reps=args.reps)
    print(f"pallas blend fwd:   {ms:7.2f} ms")

    # --- stage 5: pallas blend fwd+bwd (vjp wrt tp)
    @jax.jit
    def blend_fb(tp, counts):
        def f(tp):
            acc, trans, nt = pallas_blend(tp, counts, ntx, nty, cfg.tile_size,
                                          cfg.tile_group, interp)
            return acc.sum() + trans.sum()
        return jax.grad(f)(tp)

    ms = bench(blend_fb, tp, counts, reps=args.reps)
    print(f"pallas blend f+b:   {ms:7.2f} ms")

    # --- stage 6: scatter (transpose of gather)
    @jax.jit
    def scatter_fn(tile_idx, dtp):
        idx = jnp.minimum(tile_idx, C)
        return jnp.zeros((C + 1, 10), jnp.float32).at[idx.T].add(dtp)

    dtp = jnp.ones_like(tp)
    ms = bench(scatter_fn, tile_idx, dtp, reps=args.reps)
    print(f"scatter (bwd gather):{ms:6.2f} ms")

    # --- stage 7: full render fwd
    @jax.jit
    def render_fwd(params, active):
        return rasterize(params, active, Rm, t, intr, cfg).image

    ms = bench(render_fwd, params, active, reps=args.reps)
    print(f"full render fwd:    {ms:7.2f} ms")

    # --- stage 8: full fwd+bwd wrt params+pose
    @jax.jit
    def render_fb(params, active, tau):
        def f(params, tau):
            from lvdgs_tpu.core import lie
            Rn, Tn = lie.apply_delta(Rm, t, tau)
            out = rasterize(params, active, Rn, Tn, intr, cfg)
            return jnp.abs(out.image).mean() + jnp.abs(out.depth).mean()
        return jax.grad(f, argnums=(0, 1))(params, tau)

    ms = bench(render_fb, params, active, jnp.zeros(6), reps=args.reps)
    print(f"full render f+b:    {ms:7.2f} ms")

    # --- stage 9: fwd with precomputed bins
    @jax.jit
    def render_fwd_binned(params, active, bins):
        return rasterize(params, active, Rm, t, intr, cfg, bins=bins).image

    ms = bench(render_fwd_binned, params, active, (tile_idx, slot_valid), reps=args.reps)
    print(f"render fwd (bins):  {ms:7.2f} ms")

    @jax.jit
    def render_fb_binned(params, active, tau, bins):
        def f(params, tau):
            from lvdgs_tpu.core import lie
            Rn, Tn = lie.apply_delta(Rm, t, tau)
            out = rasterize(params, active, Rn, Tn, intr, cfg, bins=bins)
            return jnp.abs(out.image).mean() + jnp.abs(out.depth).mean()
        return jax.grad(f, argnums=(0, 1))(params, tau)

    ms = bench(render_fb_binned, params, active, jnp.zeros(6), (tile_idx, slot_valid),
               reps=args.reps)
    print(f"render f+b (bins):  {ms:7.2f} ms")


if __name__ == "__main__":
    if os.environ.get("PERF_PACKED"):
        bench_packed()
    else:
        main()


def bench_packed():
    """Packed (group-CSR) path stages — run after main() shapes."""
    import dataclasses
    from lvdgs_tpu.core.camera import Intrinsics
    from lvdgs_tpu.ops.rasterizer import (
        RenderConfig, bin_gaussians, pack_bins, prepare_bins, project_gaussians,
        rasterize,
    )
    from lvdgs_tpu.core import lie

    intr = Intrinsics(fx=707.0912, fy=707.0912, cx=601.8873, cy=183.1104,
                      width=1226, height=370)
    cfg = RenderConfig(tile_size=16, max_per_tile=256, gaussian_chunk=32,
                       tile_chunk=128, use_packed=True)
    C, A = 2**17, 60000
    rng = np.random.default_rng(0)
    means = np.concatenate(
        [rng.normal(size=(C, 2)) * 10.0, rng.uniform(4.0, 14.0, size=(C, 1))], axis=1
    )
    params = {
        "means": jnp.asarray(means, jnp.float32),
        "features_dc": jnp.asarray(rng.normal(size=(C, 3)), jnp.float32),
        "log_scales": jnp.asarray(rng.uniform(-2.0, -0.9, size=(C, 3)), jnp.float32),
        "quats": jnp.asarray(rng.normal(size=(C, 4)), jnp.float32),
        "logit_opacities": jnp.asarray(rng.uniform(1.5, 4.0, size=(C,)), jnp.float32),
    }
    active = jnp.arange(C) < A
    Rm = jnp.eye(3)
    t = jnp.zeros(3)
    ntx, nty = cfg.grid(intr)

    @jax.jit
    def bins_fn(params, active):
        return prepare_bins(params, active, Rm, t, intr, cfg)

    ms = bench(bins_fn, params, active)
    print(f"bin+pack:           {ms:7.2f} ms")
    pbins = bins_fn(params, active)
    used = float((np.asarray(pbins.cg) < np.asarray(pbins.cg).max()).mean())
    print(f"  chunks used: {used*100:.0f}% of {pbins.cg.shape[0]}", file=sys.stderr)

    @jax.jit
    def render_fwd_packed(params, active, bins):
        return rasterize(params, active, Rm, t, intr, cfg, bins=bins).image

    ms = bench(render_fwd_packed, params, active, pbins)
    print(f"packed fwd (bins):  {ms:7.2f} ms")

    @jax.jit
    def render_fb_packed(params, active, tau, bins):
        def f(params, tau):
            Rn, Tn = lie.apply_delta(Rm, t, tau)
            out = rasterize(params, active, Rn, Tn, intr, cfg, bins=bins)
            return jnp.abs(out.image).mean() + jnp.abs(out.depth).mean()
        return jax.grad(f, argnums=(0, 1))(params, tau)

    ms = bench(render_fb_packed, params, active, jnp.zeros(6), pbins)
    print(f"packed f+b (bins):  {ms:7.2f} ms")

    @jax.jit
    def render_fb_full(params, active, tau):
        def f(params, tau):
            Rn, Tn = lie.apply_delta(Rm, t, tau)
            out = rasterize(params, active, Rn, Tn, intr, cfg)
            return jnp.abs(out.image).mean() + jnp.abs(out.depth).mean()
        return jax.grad(f, argnums=(0, 1))(params, tau)

    ms = bench(render_fb_full, params, active, jnp.zeros(6))
    print(f"packed f+b (full):  {ms:7.2f} ms")


