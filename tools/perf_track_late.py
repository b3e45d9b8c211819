#!/usr/bin/env python
"""Account for steady-state tracking cost at late-trajectory density.

Loads the cached warm state, advances several frames so the map reaches its
late-trajectory size, then times: the full _track step (what the bench
timer sees), track_camera alone, its per-iteration render f+b, the rebin
cost, and the dataset frame fetch — to locate any parasitic per-frame cost.
"""
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


def main():
    from bench import build_config, make_slam, WARM_FRAMES
    from lvdgs_tpu.core import lie
    from lvdgs_tpu.ops.rasterizer import prepare_bins, rasterize
    from lvdgs_tpu.slam.tracking import track_camera

    config = build_config()
    slam = make_slam(config)
    slam.load_state("/root/repo/results/bench_state/state.npz")
    t0 = time.perf_counter()
    n_adv = int(os.environ.get("ADV_FRAMES", "8"))
    for idx in range(WARM_FRAMES, WARM_FRAMES + n_adv):
        slam.process_frame(idx)
    print(f"advanced {n_adv} frames in {time.perf_counter()-t0:.1f}s; "
          f"active {int(slam.gmap.num_active)} / cap {slam.gmap.capacity}",
          file=sys.stderr)

    idx = WARM_FRAMES + n_adv
    # frame fetch + camera build
    t0 = time.perf_counter()
    cam = slam._build_camera(idx)
    jax.block_until_ready(cam.image)
    sync(cam.image)
    print(f"camera build:       {(time.perf_counter()-t0)*1000:7.0f} ms")

    t0 = time.perf_counter()
    cam2 = slam._pose_seed(idx, cam)
    sync(cam2.R)
    print(f"pose seed:          {(time.perf_counter()-t0)*1000:7.0f} ms")

    p = slam.gmap.params()
    active = slam.gmap.active
    intr = slam.intr

    for trial in range(2):
        t0 = time.perf_counter()
        res = track_camera(p, active, cam2, intr, slam.rcfg_track, slam.tcfg)
        sync(res.loss)
        print(f"track_camera run {trial}: {(time.perf_counter()-t0)*1000:7.0f} ms "
              f"({int(res.iterations)} iters)")

    # per-iteration parts at this density
    cfg = slam.rcfg_track
    R, T = cam2.R, cam2.T

    @jax.jit
    def bins_fn(p, active):
        return prepare_bins(p, active, R, T, intr, cfg, margin=8.0)

    pbins = bins_fn(p, active)
    sync(pbins.gid)
    t0 = time.perf_counter()
    for _ in range(5):
        pbins = bins_fn(p, active)
    sync(pbins.gid)
    print(f"prepare_bins+pack:  {(time.perf_counter()-t0)/5*1000:7.1f} ms")

    @jax.jit
    def fb(p, active, tau, bins):
        def f(p, tau):
            Rn, Tn = lie.apply_delta(R, T, tau)
            out = rasterize(p, active, Rn, Tn, intr, cfg, bins=bins)
            image_ab = jnp.exp(tau[0] * 0 + 0.0) * out.image
            l1 = out.opacity * jnp.abs(image_ab - cam2.image)
            return l1.mean()
        return jax.grad(f, argnums=1)(p, tau)

    g = fb(p, active, jnp.zeros(6), pbins)
    sync(g)
    t0 = time.perf_counter()
    for _ in range(10):
        g = fb(p, active, jnp.zeros(6), pbins)
    sync(g)
    print(f"tracking-iter f+b:  {(time.perf_counter()-t0)/10*1000:7.1f} ms")

    # full _track as the bench sees it
    t0 = time.perf_counter()
    cam3, res = slam._track(idx, cam)
    sync(res.loss)
    print(f"full _track step:   {(time.perf_counter()-t0)*1000:7.0f} ms")


if __name__ == "__main__":
    main()
