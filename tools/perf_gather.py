#!/usr/bin/env python
"""Microbenchmark gather/scatter strategies for the tile-param plumbing.

The render f+b pays ~5.6 ms gathering (C+1,10) rows into (K,T,10) and
~10.6 ms scatter-adding the gradient back. This probes alternatives:
row-width padding, presorted segment_sum (sort amortised at bin time),
and one-hot matmul, to pick the fastest TPU formulation.
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
    C = 2**17
    T, K = 1848, 256
    N = T * K
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, C, size=(T, K)), jnp.int32)
    print(f"C={C} T={T} K={K} pairs={N}", file=sys.stderr)

    for NF in (10, 16, 32):
        fields = jnp.asarray(rng.normal(size=(C + 1, NF)), jnp.float32)

        @jax.jit
        def gather(idx, fields):
            return fields[idx.T]

        ms = bench(gather, idx, fields)
        print(f"gather rows NF={NF}:       {ms:7.2f} ms")

    fields = jnp.asarray(rng.normal(size=(C + 1, 10)), jnp.float32)
    dtp = jnp.asarray(rng.normal(size=(K, T, 10)), jnp.float32)

    @jax.jit
    def scatter_add(idx, dtp):
        return jnp.zeros((C + 1, 10), jnp.float32).at[idx.T].add(dtp)

    ms = bench(scatter_add, idx, dtp)
    print(f"scatter .at.add:           {ms:7.2f} ms")

    # presorted segment_sum: perm computed once (amortised at bin time)
    flat_ids = np.asarray(idx.T).reshape(-1)
    perm_np = np.argsort(flat_ids, kind="stable")
    perm = jnp.asarray(perm_np, jnp.int32)
    sorted_ids = jnp.asarray(flat_ids[perm_np], jnp.int32)

    @jax.jit
    def scatter_sorted(perm, sorted_ids, dtp):
        flat = dtp.reshape(N, 10)[perm]
        return jax.ops.segment_sum(
            flat, sorted_ids, num_segments=C + 1, indices_are_sorted=True
        )

    ms = bench(scatter_sorted, perm, sorted_ids, dtp)
    print(f"scatter presort+segsum:    {ms:7.2f} ms")

    # how much does the amortised sort itself cost at bin time?
    @jax.jit
    def make_perm(idx):
        flat = idx.T.reshape(-1)
        perm = jnp.argsort(flat)
        return perm, flat[perm]

    ms = bench(make_perm, idx)
    print(f"  (bin-time argsort cost): {ms:7.2f} ms")

    # scatter via sorted ids but unsorted data + take: gather(perm) timing
    @jax.jit
    def permute_only(perm, dtp):
        return dtp.reshape(N, 10)[perm]

    ms = bench(permute_only, perm, dtp)
    print(f"  (permute part alone):    {ms:7.2f} ms")

    @jax.jit
    def segsum_only(sorted_ids, flat):
        return jax.ops.segment_sum(
            flat, sorted_ids, num_segments=C + 1, indices_are_sorted=True
        )

    flat_sorted = permute_only(perm, dtp)
    ms = bench(segsum_only, sorted_ids, flat_sorted)
    print(f"  (segment_sum alone):     {ms:7.2f} ms")


if __name__ == "__main__":
    main()
