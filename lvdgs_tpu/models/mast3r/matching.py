"""Fast reciprocal nearest-neighbour descriptor matching.

JAX port of the matcher used every tracked frame (reference
mast3r.zip:mast3r/fast_nn.py:109-188, called at utils/init_pose.py:137):
starting from a subsampled pixel grid in image 1, iterate
NN(1->2) then NN(2->1) until the cycle converges; converged fixed points
are reciprocal matches. Distances are descriptor dot products computed as
blocked matmuls — MXU-friendly (the reference blocks at 2^13 on GPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _nn_blocked(queries: jax.Array, db: jax.Array, block: int = 2**13) -> jax.Array:
    """argmax_j queries @ db[j] over the db rows, blocked. (Q,D),(N,D)->(Q,)"""
    Q, D = queries.shape
    N = db.shape[0]
    nb = -(-N // block)
    Np = nb * block
    dbp = jnp.pad(db, ((0, Np - N), (0, 0)))

    def body(i, state):
        best_val, best_idx = state
        chunk = jax.lax.dynamic_slice_in_dim(dbp, i * block, block, 0)
        scores = jnp.dot(queries, chunk.T, preferred_element_type=jnp.float32)
        # mask padded rows
        col = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1) + i * block
        scores = jnp.where(col < N, scores, -jnp.inf)
        val = scores.max(axis=1)
        idx = scores.argmax(axis=1).astype(jnp.int32) + i * block
        better = val > best_val
        return jnp.where(better, val, best_val), jnp.where(better, idx, best_idx)

    best_val = jnp.full((Q,), -jnp.inf)
    best_idx = jnp.zeros((Q,), jnp.int32)
    best_val, best_idx = jax.lax.fori_loop(0, nb, body, (best_val, best_idx))
    return best_idx


@functools.partial(jax.jit, static_argnames=("subsample", "max_iters", "block"))
def _fast_nn_device(desc1: jax.Array, desc2: jax.Array, subsample: int,
                    max_iters: int, block: int):
    H1, W1, D = desc1.shape
    H2, W2, _ = desc2.shape
    P1 = desc1.reshape(-1, D)
    P2 = desc2.reshape(-1, D)

    ys = jnp.arange(subsample // 2, H1, subsample)
    xs = jnp.arange(subsample // 2, W1, subsample)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    idx1 = (yy * W1 + xx).reshape(-1).astype(jnp.int32)
    S = idx1.shape[0]

    def body(_, state):
        idx1, idx2, converged = state
        new_idx2 = _nn_blocked(P1[idx1], P2, block)
        new_idx1 = _nn_blocked(P2[new_idx2], P1, block)
        now_conv = (new_idx1 == idx1) & ~converged
        # freeze converged entries
        idx2 = jnp.where(converged, idx2, new_idx2)
        idx1_next = jnp.where(converged | now_conv, idx1, new_idx1)
        return idx1_next, idx2, converged | now_conv

    idx2_0 = jnp.zeros((S,), jnp.int32)
    conv0 = jnp.zeros((S,), bool)
    idx1f, idx2f, conv = jax.lax.fori_loop(0, max_iters, body, (idx1, idx2_0, conv0))
    return idx1f, idx2f, conv


def fast_reciprocal_nns(
    desc1,
    desc2,
    subsample: int = 8,
    max_iters: int = 10,
    block: int = 2**13,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (matches_im1 (M, 2), matches_im2 (M, 2)) as (x, y) int arrays
    — reference fast_reciprocal_NNs return convention."""
    desc1 = jnp.asarray(desc1)
    desc2 = jnp.asarray(desc2)
    H1, W1, _ = desc1.shape
    H2, W2, _ = desc2.shape
    idx1, idx2, conv = _fast_nn_device(desc1, desc2, subsample, max_iters, block)
    idx1 = np.asarray(idx1)[np.asarray(conv)]
    idx2 = np.asarray(idx2)[np.asarray(conv)]
    pairs = np.unique(np.stack([idx1, idx2], axis=1), axis=0)
    m1 = np.stack([pairs[:, 0] % W1, pairs[:, 0] // W1], axis=1)
    m2 = np.stack([pairs[:, 1] % W2, pairs[:, 1] // W2], axis=1)
    return m1, m2
