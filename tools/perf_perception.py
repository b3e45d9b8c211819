#!/usr/bin/env python
"""Production-scale perception forwards on the TPU (VERDICT r2 #3).

The reference's dominant per-frame frontend cost is perception: 2 MASt3R
ViT-L stereo forwards per tracked frame (utils/slam_frontend.py:1448,1455)
plus GroundingDINO Swin-T + SAM ViT-B per keyframe. The JAX ports have only
ever run at TINY test configs; this probe runs each at PRODUCTION size with
random weights and reports compile + steady-state latency:

- MASt3R ViT-L: 512x384 stereo pair through MASt3RInference.infer_pair
  (the exact per-frame call of get_pose/get_depth)
- GroundingDINO Swin-T + BERT: 800x1216 frame + scene prompt through
  GroundingDINOInference (the per-keyframe detect call)
- SAM ViT-B: 1024x1024 encode + box-prompted mask decode through
  SAMInference (the per-keyframe segment call)

Random weights change nothing about cost: every op is static-shape dense
linear algebra. Run: python tools/perf_perception.py [--models mast3r,gdino,sam]
Writes results/perf_perception.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import numpy as np


def _sync(x):
    """Relay-safe device sync: fetch one scalar (block_until_ready is a
    no-op through the axon tunnel, PERFORMANCE.md)."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


def _time_call(fn, n=3, sync=True):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        if sync:
            _sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe_mast3r(report):
    import jax

    from lvdgs_tpu.models.mast3r.inference import MASt3RInference
    from lvdgs_tpu.models.mast3r.model import MASt3RConfig, init_params

    cfg = MASt3RConfig()
    t0 = time.perf_counter()
    params = init_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"mast3r ViT-L: {n_params/1e6:.0f}M params, "
          f"init {time.perf_counter()-t0:.1f}s", flush=True)
    model = MASt3RInference(params, cfg, size=512)
    rng = np.random.default_rng(0)
    img1 = rng.uniform(size=(3, 370, 1226)).astype(np.float32)
    img2 = rng.uniform(size=(3, 370, 1226)).astype(np.float32)

    t0 = time.perf_counter()
    pred1, _pred2, _shape = model.infer_pair(img1, img2)  # compile + first run
    _sync(pred1["pts3d"])
    compile_s = time.perf_counter() - t0
    best = _time_call(lambda: model.infer_pair(img1, img2)[0]["pts3d"])
    report["mast3r_vitl_pair_ms"] = round(best * 1000, 1)
    report["mast3r_params_m"] = round(n_params / 1e6)
    report["mast3r_compile_s"] = round(compile_s, 1)
    print(f"mast3r ViT-L 512px stereo pair: {best*1000:.1f} ms "
          f"(compile+first {compile_s:.1f}s)", flush=True)

    # fused per-frame prior: one shared-encoder batch-2 program instead of
    # the reference's two sequential stereo forwards (make_fused_priors)
    t0 = time.perf_counter()
    pose1, _p2, _d1, _shape = model.infer_fused(img1, img2)
    _sync(pose1["pts3d"])
    fused_compile_s = time.perf_counter() - t0
    best_f = _time_call(lambda: model.infer_fused(img1, img2)[0]["pts3d"])
    report["mast3r_vitl_fused_frame_ms"] = round(best_f * 1000, 1)
    report["mast3r_fused_compile_s"] = round(fused_compile_s, 1)
    print(f"mast3r ViT-L 512px FUSED pose+depth frame: {best_f*1000:.1f} ms "
          f"vs 2x pair {2*best*1000:.1f} ms "
          f"(compile+first {fused_compile_s:.1f}s)", flush=True)


def probe_gdino(report):
    import jax

    from lvdgs_tpu.models.groundingdino.inference import GroundingDINODetector
    from lvdgs_tpu.models.groundingdino.model import (
        GroundingDINOConfig, init_params)

    cfg = GroundingDINOConfig()
    t0 = time.perf_counter()
    params = init_params(jax.random.PRNGKey(1), cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"gdino Swin-T+BERT: {n_params/1e6:.0f}M params, "
          f"init {time.perf_counter()-t0:.1f}s", flush=True)
    det = GroundingDINODetector(params, cfg)
    rng = np.random.default_rng(1)
    # KITTI frame; detector resizes to its 800-px internal size
    img = (rng.uniform(size=(370, 1226, 3)) * 255).astype(np.uint8)
    prompt = "car. truck. bus. person. bicycle. motorcycle."

    t0 = time.perf_counter()
    boxes, scores = det(img, prompt)
    compile_s = time.perf_counter() - t0

    def run():
        det(img, prompt)
        return 0.0

    best = _time_call(run, sync=False)
    report["gdino_800px_ms"] = round(best * 1000, 1)
    report["gdino_params_m"] = round(n_params / 1e6)
    report["gdino_compile_s"] = round(compile_s, 1)
    print(f"gdino 800x1216 detect: {best*1000:.1f} ms "
          f"(compile+first {compile_s:.1f}s, {len(boxes)} boxes)", flush=True)


def probe_sam(report):
    import jax

    from lvdgs_tpu.models.sam.inference import SAMSegmenter
    from lvdgs_tpu.models.sam.model import SAMConfig, init_params

    cfg = SAMConfig()
    t0 = time.perf_counter()
    params = init_params(jax.random.PRNGKey(2), cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"sam ViT-B: {n_params/1e6:.0f}M params, "
          f"init {time.perf_counter()-t0:.1f}s", flush=True)
    seg = SAMSegmenter(params, cfg)
    rng = np.random.default_rng(2)
    img = (rng.uniform(size=(370, 1226, 3)) * 255).astype(np.uint8)
    boxes = np.array([[100.0, 80.0, 400.0, 300.0],
                      [500.0, 120.0, 900.0, 350.0],
                      [50.0, 40.0, 200.0, 180.0],
                      [700.0, 60.0, 1100.0, 320.0]], np.float32)

    t0 = time.perf_counter()
    masks = seg(img, boxes)
    compile_s = time.perf_counter() - t0

    def run():
        seg(img, boxes)
        return 0.0

    best = _time_call(run, sync=False)
    report["sam_1024px_4box_ms"] = round(best * 1000, 1)
    report["sam_params_m"] = round(n_params / 1e6)
    report["sam_compile_s"] = round(compile_s, 1)
    print(f"sam 1024px encode + 4-box decode: {best*1000:.1f} ms "
          f"(compile+first {compile_s:.1f}s, masks {masks.shape})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="mast3r,gdino,sam")
    args = ap.parse_args()

    import jax

    report = {"device": str(jax.devices()[0])}
    for name in args.models.split(","):
        {"mast3r": probe_mast3r, "gdino": probe_gdino, "sam": probe_sam}[name](
            report
        )

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "perf_perception.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if os.path.exists(out):  # merge partial runs (--models subsets)
        try:
            with open(out) as f:
                prev = json.load(f)
            prev.update(report)
            report = prev
        except Exception:
            pass
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
