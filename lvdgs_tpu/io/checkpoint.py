"""Checkpoint / resume (new capability over the reference).

The reference has output-only artifacts and no resume (SURVEY.md §5.4).
Here the full SLAM state — Gaussian map, Adam state, keyframe buffer, frame
records, window, RNG — round-trips through an orbax checkpoint so a run can
be resumed mid-sequence.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """Persist a pytree-of-state dict. Uses orbax when importable, else a
    plain numpy pickle (same content)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), _to_numpy_tree(state), force=True)
    except Exception:
        with open(path + ".pkl", "wb") as f:
            pickle.dump(_to_numpy_tree(state), f)


def load_checkpoint(path: str) -> Dict[str, Any]:
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    except Exception:
        with open(path + ".pkl", "rb") as f:
            return pickle.load(f)
