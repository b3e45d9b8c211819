#!/usr/bin/env python
"""Does the packed slot budget change tracking's converged pose?

Loads the cached steady-state bench map, perturbs a keyframe's pose by a
known se(3) delta, runs track_camera with the dense and packed renderers,
and compares the recovered poses against the unperturbed original. Decides
whether the packed budget (which truncates deep saturated tiles, costing
~2 dB of render PSNR at steady-state density) is safe for the tracking path.
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


def main():
    from bench import build_config, make_slam
    from lvdgs_tpu.core import lie
    from lvdgs_tpu.slam.state import camera_from_slot
    from lvdgs_tpu.slam.tracking import track_camera, track_camera_pyramid

    config = build_config()
    slam = make_slam(config)
    slam.load_state(os.path.join("/root/repo", "results", "bench_state", "state.npz"))
    print(f"state: {int(slam.gmap.num_active)} active", file=sys.stderr)

    intr = slam.intr
    p = slam.gmap.params()
    active = slam.gmap.active

    fb = dict(use_packed=True, saturation_feedback=True)
    variants = (
        ("dense", dataclasses.replace(slam.rcfg, use_packed=False), False),
        ("packed128", dataclasses.replace(slam.rcfg, use_packed=True,
                                          slot_budget_per_tile=128), False),
        ("packed192", dataclasses.replace(slam.rcfg, use_packed=True,
                                          slot_budget_per_tile=192), False),
        ("fb128", dataclasses.replace(slam.rcfg, slot_budget_per_tile=128,
                                      **fb), False),
        ("fb96", dataclasses.replace(slam.rcfg, slot_budget_per_tile=96,
                                     **fb), False),
        ("fb96_bf16", dataclasses.replace(slam.rcfg, slot_budget_per_tile=96,
                                          blend_bf16=True, **fb), False),
        ("fb96_pyr", dataclasses.replace(slam.rcfg, slot_budget_per_tile=96,
                                         **fb), True),
        ("fb96_pyr_bf16", dataclasses.replace(
            slam.rcfg, slot_budget_per_tile=96, blend_bf16=True, **fb), True),
        # r5 candidates: active-prefix binning bucket (scheduling-only) and
        # earlier plateau exits (VERDICT r4 #1: min_iters ~21)
        ("fb96_pyr_bucket", dataclasses.replace(
            slam.rcfg, slot_budget_per_tile=96,
            bin_bucket=-(-int(1.25 * int(slam.gmap.num_active)) // 16384)
            * 16384, **fb), True),
        ("fb96_pyr_early", dataclasses.replace(
            slam.rcfg, slot_budget_per_tile=96, **fb), True,
         dict(plateau_min_iters=24, plateau_tol=0.015,
              coarse_min_iters=12, fine_min_iters=12)),
        ("fb96_pyr_early2", dataclasses.replace(
            slam.rcfg, slot_budget_per_tile=96, **fb), True,
         dict(plateau_min_iters=21, plateau_tol=0.02,
              coarse_min_iters=11, fine_min_iters=11)),
        ("fb96_early", dataclasses.replace(
            slam.rcfg, slot_budget_per_tile=96, **fb), False,
         dict(plateau_min_iters=21, plateau_tol=0.02)),
    )
    only = set(sys.argv[1:])

    results = {}
    for name, cfg, pyramid, *tover in variants:
        if only and name not in only:
            continue
        fn = track_camera_pyramid if pyramid else track_camera
        tcfg = dataclasses.replace(slam.tcfg, pyramid=pyramid,
                                   **(tover[0] if tover else {}))
        errs_r, errs_t, iters, walls = [], [], [], []
        for trial, kf in enumerate(slam.current_window[:3]):
            slot = slam.kf_slots[kf]
            cam = camera_from_slot(slam.kfbuf, slot)
            R0, T0 = cam.R, cam.T
            rng = np.random.default_rng(trial)
            tau = jnp.asarray(
                np.concatenate([rng.normal(size=3) * 0.05, rng.normal(size=3) * 0.01]),
                jnp.float32,
            )  # 5 cm / ~0.6 deg perturbation
            Rp, Tp = lie.apply_delta(R0, T0, tau)
            cam_p = cam.update_RT(Rp, Tp)
            res = fn(p, active, cam_p, intr, cfg, tcfg)
            dR = np.asarray(res.R) @ np.asarray(R0).T  # fetch = device sync
            # timed re-run from the same seed (first run paid the compile);
            # block_until_ready does NOT sync through the relay tunnel, so
            # time-to-fetched-scalar is the honest wall
            t0 = time.perf_counter()
            res2 = fn(p, active, cam_p, intr, cfg, tcfg)
            n_it = int(res2.iterations)
            walls.append(time.perf_counter() - t0)
            ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
            dt = np.linalg.norm(np.asarray(res.T) - np.asarray(dR @ T0))
            errs_r.append(ang)
            errs_t.append(dt)
            iters.append(n_it)
        results[name] = (np.mean(errs_r), np.mean(errs_t), iters, walls)
        print(
            f"{name}: rot err {np.degrees(np.mean(errs_r)):.4f} deg, "
            f"trans err {np.mean(errs_t)*100:.3f} cm, iters {iters}, "
            f"wall {[f'{w*1e3:.0f}' for w in walls]} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
