#!/usr/bin/env python
"""Profile the REAL steady-state bench map (loaded from results/bench_state).

Reports, on the cached post-initialization SLAM state:
- per-tile bin count distribution (how hard the packed slot budget binds),
- dense vs packed render agreement + PSNR on a window keyframe,
- per-iteration render f+b latency, dense vs packed (tracking's unit cost),
- tracking-run cost for one frame.
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


def bench(fn, *args, reps=5):
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
    from lvdgs_tpu.ops.rasterizer import prepare_bins, rasterize

    config = build_config()
    slam = make_slam(config)
    ck = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "..", "repo")  # noqa
    ck = os.path.join("/root/repo", "results", "bench_state", "state.npz")
    slam.load_state(ck)
    print(f"state: {int(slam.gmap.num_active)} active / {slam.gmap.capacity} cap, "
          f"window {slam.current_window}", file=sys.stderr)

    intr = slam.intr
    cfg_dense = dataclasses.replace(slam.rcfg, use_packed=False)
    cfg_packed = dataclasses.replace(slam.rcfg, use_packed=True)
    p = slam.gmap.params()
    active = slam.gmap.active

    kf = slam.current_window[0]
    slot = slam.kf_slots[kf]
    R = slam.kfbuf.R[slot]
    T = slam.kfbuf.T[slot]

    dense_bins = prepare_bins(p, active, R, T, intr, cfg_dense)
    counts = np.asarray(dense_bins[1].sum(axis=1))
    print(f"bin counts: mean {counts.mean():.0f} p50 {np.percentile(counts, 50):.0f} "
          f"p90 {np.percentile(counts, 90):.0f} p99 {np.percentile(counts, 99):.0f} "
          f"max {counts.max()}")

    out_d = rasterize(p, active, R, T, intr, cfg_dense)
    out_p = rasterize(p, active, R, T, intr, cfg_packed)
    gt = np.asarray(slam._cams[kf].image) if kf in slam._cams else None
    img_d = np.asarray(out_d.image)
    img_p = np.asarray(out_p.image)
    print(f"dense vs packed img maxdiff: {np.abs(img_d - img_p).max():.2e}")
    gt = np.asarray(slam.kfbuf.images_u8[slot]).astype(np.float32) / 255.0
    for name, img in (("dense", img_d), ("packed", img_p)):
        mse = float(np.mean((img - gt) ** 2))
        print(f"{name} psnr vs gt: {-10.0*np.log10(max(mse,1e-12)):.2f} dB")

    for name, cfg in (("dense", cfg_dense), ("packed", cfg_packed)):
        bins = prepare_bins(p, active, R, T, intr, cfg)

        @jax.jit
        def fb(p, active, tau, bins):
            def f(p, tau):
                Rn, Tn = lie.apply_delta(R, T, tau)
                out = rasterize(p, active, Rn, Tn, intr, cfg, bins=bins)
                return jnp.abs(out.image).mean() + jnp.abs(out.depth).mean()
            return jax.grad(f, argnums=(0, 1))(p, tau)

        ms = bench(fb, p, active, jnp.zeros(6), bins)
        print(f"{name} render f+b (bins): {ms:7.2f} ms")

        @jax.jit
        def bins_fn(p, active):
            return prepare_bins(p, active, R, T, intr, cfg, margin=8.0)

        ms = bench(bins_fn, p, active)
        print(f"{name} prepare_bins:      {ms:7.2f} ms")

    # one full tracking run at each config
    from lvdgs_tpu.slam.tracking import track_camera
    cam = None
    for c in (slam._cams or {}).values():
        cam = c
        break
    if cam is None:
        from lvdgs_tpu.slam.state import camera_from_slot
        cam = camera_from_slot(slam.kfbuf, slot)
    for name, cfg in (("dense", cfg_dense), ("packed", cfg_packed)):
        @jax.jit
        def track(p, active):
            return track_camera(p, active, cam, intr, cfg, slam.tcfg)

        res = track(p, active)
        sync(res.loss)
        t0 = time.perf_counter()
        res = track(p, active)
        sync(res.loss)
        ms = (time.perf_counter() - t0) * 1000.0
        print(f"{name} tracking run: {ms:7.0f} ms ({int(res.iterations)} iters)")


if __name__ == "__main__":
    main()
