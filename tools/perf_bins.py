#!/usr/bin/env python
"""Measure prepare_bins cost vs RenderConfig.bin_bucket on the real
steady-state bench map (active count ~40-60% of capacity). The bucket
statically slices the depth-sorted candidate arrays, shrinking the
coarse-stage masked-score materialisation + top_k (PERFORMANCE.md r5).

Usage: python tools/perf_bins.py  (needs results/bench_state/state.npz)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import numpy as np


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


def bench(fn, *args, reps=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    from bench import build_config, make_slam
    from lvdgs_tpu.ops.rasterizer import prepare_bins, prepare_bins_with_touched

    config = build_config()
    slam = make_slam(config)
    slam.load_state("/root/repo/results/bench_state/state.npz")
    intr = slam.intr
    p = slam.gmap.params()
    active = slam.gmap.active
    C = p["means"].shape[0]
    n_act = int(slam.gmap.num_active)
    kf = slam.current_window[0]
    slot = slam.kf_slots[kf]
    R = slam.kfbuf.R[slot]
    T = slam.kfbuf.T[slot]
    print(f"capacity {C}, active {n_act}", file=sys.stderr)

    base_map = slam.rcfg_map if slam.rcfg_map.use_packed else dataclasses.replace(
        slam.rcfg, use_packed=True, slot_budget_per_tile=128,
        saturation_feedback=True,
    )
    step = 16384
    buckets = [0] + [
        b for b in range(
            -(-int(n_act * 1.25) // step) * step, C, step * 2
        )
    ][:3]
    # sub-stage split: where does prepare_bins actually spend its time?
    from lvdgs_tpu.ops.rasterizer import (
        bin_gaussians, pack_bins, probe_saturation_caps, project_gaussians,
    )
    import jax.numpy as jnp

    cfg0 = base_map
    ntx, nty = cfg0.grid(intr)

    @jax.jit
    def _proj(p, a):
        return project_gaussians(
            p["means"], p["quats"], p["log_scales"], a, R, T, intr
        )

    print(f"sub: project              {bench(_proj, p, active):7.2f} ms")
    proj = _proj(p, active)

    for b in (0, 32768):
        @jax.jit
        def _bin(proj, _b=b):
            return bin_gaussians(
                proj["mean2d"], proj["radius"], proj["depth"], proj["valid"],
                8.0, ntx=ntx, nty=nty, tile_size=cfg0.tile_size,
                max_per_tile=cfg0.max_per_tile, tile_chunk=cfg0.tile_chunk,
                coarse_factor=cfg0.coarse_factor,
                max_per_coarse=cfg0.max_per_coarse,
                use_approx_topk=cfg0.use_approx_topk,
                approx_recall=cfg0.approx_recall, bin_bucket=_b,
            )

        print(f"sub: bin_gaussians b={_b if (_b:=b) else C:6d} "
              f"{bench(_bin, proj):7.2f} ms")
    bins = _bin(proj)

    @jax.jit
    def _pack(ti, sv):
        return pack_bins(
            ti, sv, C, tile_group=cfg0.tile_group,
            slot_budget_per_tile=cfg0.slot_budget_per_tile,
            sort_by_depth=True,
        )

    print(f"sub: pack_bins            {bench(_pack, *bins):7.2f} ms")

    @jax.jit
    def _probe(ti, sv, proj, p, a):
        return probe_saturation_caps(ti, sv, proj, p, a, cfg0, ntx, nty,
                                     want_touched=True)

    print(f"sub: probe(caps+touched)  "
          f"{bench(_probe, bins[0], bins[1], proj, p, active):7.2f} ms")

    for name, probed in (("prepare_bins", False), ("bins+touched_probe", True)):
        for b in buckets:
            cfg = dataclasses.replace(base_map, bin_bucket=b)
            if probed:
                fn = jax.jit(
                    lambda p, a, R, T, cfg=cfg: prepare_bins_with_touched(
                        p, a, R, T, intr, cfg, margin=8.0
                    ),
                    static_argnames=(),
                )
            else:
                fn = jax.jit(
                    lambda p, a, R, T, cfg=cfg: prepare_bins(
                        p, a, R, T, intr, cfg, margin=8.0
                    )
                )
            ms = bench(fn, p, active, R, T)
            print(f"{name:20s} bucket {b or C:7d}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
