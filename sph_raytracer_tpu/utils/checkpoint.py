"""Checkpoint / resume for retrieval state.

The reference has no checkpointing (SURVEY §5.4 — ``gd`` keeps
``best_coeffs`` in memory only, reference retrieval.py:111-113).  Here any
JAX pytree (coeffs + optimizer state) round-trips through a single ``.npz``
written atomically, so an interrupted retrieval resumes exactly.
"""
from __future__ import annotations

import os
import tempfile
from typing import Any, Optional, Tuple

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, state: Any, iteration: int) -> None:
    """Atomically save a pytree ``state`` and iteration counter to ``path``."""
    leaves = jax.tree.leaves(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__iteration__"] = np.asarray(iteration)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, like: Any) -> Optional[Tuple[Any, int]]:
    """Load a pytree saved by :func:`save_checkpoint`.

    Args:
        path: checkpoint file.
        like: a pytree with the same structure (used as the unflatten spec).

    Returns:
        (state, iteration), or None if ``path`` does not exist.
    """
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        leaves_like, treedef = jax.tree.flatten(like)
        leaves = [
            np.asarray(data[f"leaf_{i}"], dtype=np.asarray(l).dtype)
            for i, l in enumerate(leaves_like)
        ]
        iteration = int(data["__iteration__"])
    return jax.tree.unflatten(treedef, leaves), iteration
