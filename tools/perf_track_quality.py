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
    from lvdgs_tpu.slam.tracking import track_camera

    config = build_config()
    slam = make_slam(config)
    slam.load_state(os.path.join("/root/repo", "results", "bench_state", "state.npz"))
    print(f"state: {int(slam.gmap.num_active)} active", file=sys.stderr)

    intr = slam.intr
    p = slam.gmap.params()
    active = slam.gmap.active

    results = {}
    for name, cfg in (
        ("dense", dataclasses.replace(slam.rcfg, use_packed=False)),
        ("packed128", dataclasses.replace(slam.rcfg, use_packed=True,
                                          slot_budget_per_tile=128)),
        ("packed192", dataclasses.replace(slam.rcfg, use_packed=True,
                                          slot_budget_per_tile=192)),
        ("fb128", dataclasses.replace(slam.rcfg, use_packed=True,
                                      slot_budget_per_tile=128,
                                      saturation_feedback=True)),
        ("fb96", dataclasses.replace(slam.rcfg, use_packed=True,
                                     slot_budget_per_tile=96,
                                     saturation_feedback=True)),
        ("fb96_bf16", dataclasses.replace(slam.rcfg, use_packed=True,
                                          slot_budget_per_tile=96,
                                          saturation_feedback=True,
                                          blend_bf16=True)),
    ):
        errs_r, errs_t, iters = [], [], []
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
            res = track_camera(p, active, cam_p, intr, cfg, slam.tcfg)
            dR = np.asarray(res.R) @ np.asarray(R0).T
            ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
            dt = np.linalg.norm(np.asarray(res.T) - np.asarray(dR @ T0))
            errs_r.append(ang)
            errs_t.append(dt)
            iters.append(int(res.iterations))
        results[name] = (np.mean(errs_r), np.mean(errs_t), iters)
        print(
            f"{name}: rot err {np.degrees(np.mean(errs_r)):.4f} deg, "
            f"trans err {np.mean(errs_t)*100:.3f} cm, iters {iters}"
        )


if __name__ == "__main__":
    main()
