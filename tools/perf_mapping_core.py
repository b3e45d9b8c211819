#!/usr/bin/env python
"""Decompose one windowed-mapping iteration into its device-cost pieces.

Synthetic state at exact bench shapes (C=2^17, kf_capacity=128, Ws=8, Nr=2,
KITTI 1226x370). Times, with precomputed bins:
  A. vmapped 10-camera loss fwd only
  B. vmapped 10-camera value_and_grad (params, taus, ab, vs)
  C. B + stats accumulation + Adam steps (full iteration minus densify)
  D. per-camera singles for reference
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

from lvdgs_tpu.core import lie
from lvdgs_tpu.core.camera import Intrinsics
from lvdgs_tpu.gaussian import model as gm
from lvdgs_tpu.ops.rasterizer import RenderConfig, prepare_bins, rasterize


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
    intr = Intrinsics(fx=707.0912, fy=707.0912, cx=601.8873, cy=183.1104,
                      width=1226, height=370)
    rcfg = RenderConfig(tile_size=16, max_per_tile=256, gaussian_chunk=32,
                        tile_chunk=128)
    C = 2**17
    A = 30000
    Ncam = 10
    rng = np.random.default_rng(0)
    means = np.concatenate(
        [rng.normal(size=(C, 2)) * 10.0, rng.uniform(4.0, 14.0, size=(C, 1))], axis=1)
    params = {
        "means": jnp.asarray(means, jnp.float32),
        "features_dc": jnp.asarray(rng.normal(size=(C, 3)), jnp.float32),
        "log_scales": jnp.asarray(rng.uniform(-2.0, -0.9, size=(C, 3)), jnp.float32),
        "quats": jnp.asarray(rng.normal(size=(C, 4)), jnp.float32),
        "logit_opacities": jnp.asarray(rng.uniform(1.5, 4.0, size=(C,)), jnp.float32),
    }
    active = jnp.arange(C) < A
    gmap = gm.create_map(C)
    gmap = gmap.replace(active=active, **params)
    opt = gm.MapOptimizer(spatial_scale=10.0)
    opt_state = opt.init(gmap)

    Rs = jnp.tile(jnp.eye(3)[None], (Ncam, 1, 1))
    Ts = jnp.asarray(rng.normal(size=(Ncam, 3)) * 0.2, jnp.float32)
    gts = jnp.asarray(rng.uniform(0, 1, size=(Ncam, 3, intr.height, intr.width)), jnp.float32)
    monos = jnp.asarray(rng.uniform(1, 10, size=(Ncam, intr.height, intr.width)), jnp.float32)

    bins = jax.jit(
        lambda p, a, Rs, Ts: jax.vmap(
            lambda R_, t_: prepare_bins(p, a, R_, t_, intr, rcfg, margin=8.0)
        )(Rs, Ts)
    )(params, active, Rs, Ts)
    print(f"bins ready; per-cam slot counts max={int(bins[1].sum(-1).max())}",
          file=sys.stderr)

    def losses(p, act, taus, abs_, vs, Rs, Ts, bins):
        def per_cam(xs):
            R_i, T_i, tau_i, ab_i, vs_i, gt, mono, bins_i = xs
            Rn, Tn = lie.apply_delta(R_i, T_i, tau_i)
            out = rasterize(p, act, Rn, Tn, intr, rcfg, vs_offset=vs_i, bins=bins_i)
            image_ab = jnp.exp(ab_i[0]) * out.image + ab_i[1]
            mr = (gt.sum(0) > 0.01)[None].astype(jnp.float32)
            md = (mono > 0.01)[None].astype(jnp.float32)
            loss = 0.95 * jnp.abs(image_ab * mr - gt * mr).mean() + 0.05 * jnp.abs(
                out.depth * md - mono[None] * md
            ).mean()
            return loss, (out.visibility_filter, out.radii, out.n_touched)

        l, aux = jax.vmap(per_cam)((Rs, Ts, jnp.zeros((Ncam, 6)), abs_, vs, gts, monos, bins))
        total = l.sum() + 10.0 * jnp.abs(
            jnp.exp(p["log_scales"]) - jnp.exp(p["log_scales"]).mean(1, keepdims=True)
        ).mean() * 0  # placeholder isotropic cost excluded
        return total, aux

    abs0 = jnp.zeros((Ncam, 2))
    vs0 = jnp.zeros((Ncam, C, 2))

    # A: forward only
    fwd = jax.jit(lambda p, act: losses(p, act, None, abs0, vs0, Rs, Ts, bins)[0])
    ms = bench(fwd, params, active)
    print(f"A. 10-cam loss fwd:        {ms:7.1f} ms")

    # B: full grads
    @jax.jit
    def grads_fn(p, act):
        (l, aux), g = jax.value_and_grad(
            lambda p, ab, vs: losses(p, act, None, ab, vs, Rs, Ts, bins),
            argnums=(0, 1, 2), has_aux=True,
        )(p, abs0, vs0)
        return l, g

    ms = bench(grads_fn, params, active)
    print(f"B. 10-cam value_and_grad:  {ms:7.1f} ms")

    # C: + stats + Adam
    @jax.jit
    def full_iter(gmap, opt_state):
        p = gmap.params()
        (l, aux), (g_params, g_ab, g_vs) = jax.value_and_grad(
            lambda p, ab, vs: losses(p, gmap.active, None, ab, vs, Rs, Ts, bins),
            argnums=(0, 1, 2), has_aux=True,
        )(p, abs0, vs0)
        vis_all, radii_all, nt_all = aux
        vis_b = vis_all & gmap.active[None, :]
        gmap = gmap.replace(
            max_radii2d=jnp.maximum(gmap.max_radii2d,
                                    jnp.where(vis_b, radii_all, 0.0).max(axis=0)),
            grad_accum=gmap.grad_accum + (jnp.linalg.norm(g_vs, axis=-1) * vis_b).sum(0),
            grad_denom=gmap.grad_denom + vis_b.sum(0).astype(jnp.float32),
        )
        gmap, opt_state = opt.step(gmap, g_params, opt_state, jnp.asarray(10, jnp.int32))
        return gmap, opt_state, l

    ms = bench(full_iter, gmap, opt_state)
    print(f"C. + stats + Adam:         {ms:7.1f} ms")

    # D: single-camera f+b at same shapes for scaling reference
    @jax.jit
    def one_cam(p, act):
        def f(p):
            out = rasterize(p, act, Rs[0], Ts[0], intr, rcfg,
                            bins=jax.tree_util.tree_map(lambda b: b[0], bins))
            return jnp.abs(out.image - gts[0]).mean() + jnp.abs(out.depth).mean()
        return jax.grad(f)(p)

    ms = bench(one_cam, params, active)
    print(f"D. 1-cam f+b (binned):     {ms:7.1f} ms")


if __name__ == "__main__":
    main()
