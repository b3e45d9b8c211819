#!/usr/bin/env python
"""Stage breakdown of the packed render path on the real steady-state map."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


def bench(fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    from bench import build_config, make_slam
    from lvdgs_tpu.core import lie
    from lvdgs_tpu.gaussian.model import SH_C0
    from lvdgs_tpu.ops.rasterizer import prepare_bins, project_gaussians, rasterize
    from lvdgs_tpu.ops.rasterizer_pallas import pallas_blend_packed, KC

    config = build_config()
    slam = make_slam(config)
    slam.load_state("/root/repo/results/bench_state/state.npz")
    intr = slam.intr
    budget = int(os.environ.get("BUDGET", "160"))
    cfg = dataclasses.replace(slam.rcfg, use_packed=True,
                              slot_budget_per_tile=budget,
                              tile_group=int(os.environ.get("TG", "8")))
    p = slam.gmap.params()
    active = slam.gmap.active
    C = p["means"].shape[0]
    kf = slam.current_window[0]
    slot = slam.kf_slots[kf]
    R = slam.kfbuf.R[slot]
    T = slam.kfbuf.T[slot]
    ntx, nty = cfg.grid(intr)
    TG = cfg.tile_group
    n_groups = -(-(ntx * nty) // TG)
    print(f"active {int(slam.gmap.num_active)}, budget {budget}", file=sys.stderr)

    pbins = prepare_bins(p, active, R, T, intr, cfg)
    print(f"chunks: {pbins.cg.shape[0]}, pairs cap {pbins.gid.size}")

    @jax.jit
    def proj_fn(p, active):
        return project_gaussians(p["means"], p["quats"], p["log_scales"], active,
                                 R, T, intr)

    ms = bench(proj_fn, p, active)
    print(f"projection fwd:     {ms:7.2f} ms")
    proj = proj_fn(p, active)

    @jax.jit
    def gather_fn(p, active, gid):
        proj = project_gaussians(p["means"], p["quats"], p["log_scales"], active,
                                 R, T, intr)
        colors = jnp.clip(0.5 + SH_C0 * p["features_dc"], 0.0, 1.0)
        opac = jnp.where(active, jax.nn.sigmoid(p["logit_opacities"]), 0.0)
        pad = lambda a: jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)
        fields = jnp.concatenate(
            [pad(proj["mean2d"]), pad(proj["conic"]), pad(colors),
             pad(proj["depth"][:, None]), pad(opac[:, None])], axis=1)
        return fields[gid]

    ms = bench(gather_fn, p, active, pbins.gid)
    print(f"proj+gather fwd:    {ms:7.2f} ms")
    tp = gather_fn(p, active, pbins.gid)

    import functools

    # kernel variants: nt (touched counts), bf16 weight math
    for label, with_nt, bf16 in (("nt,f32 ", True, False),
                                 ("nont,f32", False, False),
                                 ("nont,bf16", False, True)):
        @functools.partial(jax.jit, static_argnames=())
        def kfwd(tp, cg, k0, tids, _wn=with_nt, _bf=bf16):
            return pallas_blend_packed(tp, cg, k0, jnp.zeros((1,), jnp.int32),
                                       tids, ntx, nty, cfg.tile_size, TG,
                                       n_groups, False, _wn, _bf)

        ms = bench(kfwd, tp, pbins.cg, pbins.k0, pbins.tids)
        print(f"packed kernel fwd [{label}]:  {ms:7.2f} ms")

        @functools.partial(jax.jit, static_argnames=())
        def kfb(tp, cg, k0, tids, _wn=with_nt, _bf=bf16):
            def f(tp):
                acc, trans, nt = pallas_blend_packed(
                    tp, cg, k0, jnp.zeros((1,), jnp.int32), tids, ntx, nty,
                    cfg.tile_size, TG, n_groups, False, _wn, _bf)
                return acc.sum() + trans.sum()
            return jax.grad(f)(tp)

        ms = bench(kfb, tp, pbins.cg, pbins.k0, pbins.tids)
        print(f"packed kernel f+b [{label}]:  {ms:7.2f} ms")

    @jax.jit
    def scatter_fn(gid, dtp):
        return jnp.zeros((C + 1, 10), jnp.float32).at[
            gid.reshape(-1)
        ].add(dtp.reshape(-1, 10), mode="drop")

    dtp = jnp.ones_like(tp)
    ms = bench(scatter_fn, pbins.gid, dtp)
    print(f"packed scatter:     {ms:7.2f} ms")

    @jax.jit
    def fb_full(p, active, tau, bins):
        def f(p, tau):
            Rn, Tn = lie.apply_delta(R, T, tau)
            out = rasterize(p, active, Rn, Tn, intr, cfg, bins=bins)
            return jnp.abs(out.image).mean() + jnp.abs(out.depth).mean()
        return jax.grad(f, argnums=(0, 1))(p, tau)

    ms = bench(fb_full, p, active, jnp.zeros(6), pbins)
    print(f"render f+b (bins):  {ms:7.2f} ms")

    @jax.jit
    def bins_fn(p, active):
        return prepare_bins(p, active, R, T, intr, cfg, margin=8.0)

    ms = bench(bins_fn, p, active)
    print(f"prepare_bins+pack:  {ms:7.2f} ms")


if __name__ == "__main__":
    main()
