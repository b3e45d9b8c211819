#!/usr/bin/env python
"""Feasibility probe: VMEM-resident field table + in-kernel dynamic row ops.

The render pipeline's cost is dominated by XLA's row-serialized gather
(fields[idx] -> 4.5 ms) and scatter-add (dfields 10.6 ms) around the Pallas
blend kernel (PERFORMANCE.md). If a kernel can keep the whole (C+1, 16)
field table resident in VMEM and perform per-slot dynamic row loads /
read-modify-write accumulates at a few cycles each, both XLA index ops
disappear. This probe measures:

1. whether a (C+1, 16) f32 block fits residently (VMEM capacity),
2. dynamic-row *load* throughput (rows/cycle) at the blend kernel's access
   pattern (UNROLL x TILE_GROUP rows per step),
3. dynamic-row *accumulate* throughput (the scatter replacement).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 2**17
NF = 16
T, K = 1848, 256
TG = 8


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


def gather_kernel(idx_ref, fields_ref, out_ref):
    """Grid over (T/TG) groups; step loads (K, TG) rows dynamically and
    reduces them, mimicking the blend kernel's access pattern."""
    acc = jnp.zeros((TG, NF), jnp.float32)

    def body(k, acc):
        rows = []
        for tg in range(TG):
            r = fields_ref[pl.ds(idx_ref[0, k, tg], 1), :]  # (1, NF)
            rows.append(r)
        return acc + jnp.concatenate(rows, axis=0)

    acc = jax.lax.fori_loop(0, K, body, acc)
    out_ref[:] = acc


@jax.jit
def run_gather(idx, fields):
    n_groups = T // TG
    return pl.pallas_call(
        gather_kernel,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, K, TG), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C + 1, NF), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TG, NF), lambda g: (g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_groups * TG, NF), jnp.float32),
    )(idx.reshape(n_groups, K, TG), fields)


def scatter_kernel(idx_ref, upd_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(k, _):
        for tg in range(TG):
            r = idx_ref[0, k, tg]
            out_ref[pl.ds(r, 1), :] += upd_ref[0, k, tg, :][None]
        return 0

    jax.lax.fori_loop(0, K, body, 0)


@jax.jit
def run_scatter(idx, upd):
    n_groups = T // TG
    return pl.pallas_call(
        scatter_kernel,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, K, TG), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, TG, NF), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C + 1, NF), lambda g: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C + 1, NF), jnp.float32),
    )(idx.reshape(n_groups, K, TG), upd.reshape(n_groups, K, TG, NF))


def main():
    rng = np.random.default_rng(0)
    Tpad = (T // TG) * TG
    idx = jnp.asarray(rng.integers(0, C, size=(K, Tpad)), jnp.int32)
    fields = jnp.asarray(rng.normal(size=(C + 1, NF)), jnp.float32)
    upd = jnp.asarray(rng.normal(size=(K, Tpad, NF)), jnp.float32)
    dev = jax.devices()[0]
    print(f"device: {dev}; C={C} NF={NF} rows/call={K*Tpad}", file=sys.stderr)

    ms = bench(run_gather, idx, fields)
    rows = K * Tpad
    print(f"pallas resident gather: {ms:7.2f} ms  ({ms*1e6/rows:.1f} ns/row)")

    ms = bench(run_scatter, idx, upd)
    print(f"pallas resident scatter:{ms:7.2f} ms  ({ms*1e6/rows:.1f} ns/row)")

    # XLA baselines at the same shapes
    @jax.jit
    def xla_gather(idx, fields):
        return fields[idx]

    ms = bench(xla_gather, idx, fields)
    print(f"xla gather:             {ms:7.2f} ms")

    @jax.jit
    def xla_scatter(idx, upd):
        return jnp.zeros((C + 1, NF), jnp.float32).at[idx].add(upd)

    ms = bench(xla_scatter, idx, upd)
    print(f"xla scatter:            {ms:7.2f} ms")


if __name__ == "__main__":
    main()
