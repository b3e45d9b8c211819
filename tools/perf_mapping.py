#!/usr/bin/env python
"""Mapping-loop cost decomposition on the real TPU.

Drives the exact bench scenario (same shapes -> compile-cache hits) until
windowed mapping is live, then times mapping_run at n_iters = 1/10/30 and
solves t(n) = a*n + b*ceil(n/rebin_every) + c for:
  a = per-iteration cost, b = per-rebin-period cost, c = per-dispatch cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_config
from lvdgs_tpu.slam.system import SLAM
from lvdgs_tpu.slam.mapping import mapping_run


def main():
    config = build_config()
    slam = SLAM(config, save_dir=None)
    slam.save_results = False
    slam.do_eval_rendering = False
    slam.do_color_refinement = False

    t0 = time.perf_counter()
    idx = 0
    while idx <= 16 and len(slam.kf_indices) < 2:
        slam.process_frame(idx)
        idx += 1
    print(f"setup: {time.perf_counter() - t0:.1f}s, window={slam.current_window}",
          file=sys.stderr)

    window_slots = jnp.asarray(
        [slam.kf_slots[i] for i in slam.current_window]
        + [-1] * (slam.mcfg.window_size - len(slam.current_window)),
        jnp.int32,
    )
    mcfg = slam.mcfg

    def run(n):
        key = jax.random.PRNGKey(n)
        res = mapping_run(
            slam.gmap, slam.opt_state, slam.kfbuf, window_slots, key,
            slam.iteration_count, jnp.asarray(n, jnp.int32), 0,
            intr=slam.intr, rcfg=slam.rcfg, opt=slam.opt, mcfg=mcfg,
        )
        # NOTE: mapping_run donates gmap/opt_state -> reinstall results so
        # the next call has live buffers
        slam.gmap, slam.opt_state = res.gmap, res.opt_state
        return float(np.asarray(res.last_loss))

    def timed(n, reps=3):
        run(n)  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            run(n)
        return (time.perf_counter() - t0) / reps

    t1 = timed(1)
    t10 = timed(10)
    t30 = timed(30)
    print(f"t(1)={t1*1e3:.0f}ms  t(10)={t10*1e3:.0f}ms  t(30)={t30*1e3:.0f}ms")
    # t1 = a + b + c; t10 = 10a + b + c; t30 = 30a + 3b + c
    a = (t10 - t1) / 9.0
    b_plus_c = t1 - a
    b = (t30 - 30 * a - b_plus_c) / 2.0
    c = b_plus_c - b
    print(f"per-iteration a = {a*1e3:.1f} ms")
    print(f"per-rebin-period b = {b*1e3:.1f} ms")
    print(f"per-dispatch c = {c*1e3:.1f} ms")
    print(f"150-iter keyframe estimate: {(150*a + 15*b + 5*c):.1f} s")


if __name__ == "__main__":
    main()
