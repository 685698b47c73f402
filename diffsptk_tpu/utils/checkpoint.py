"""Checkpointing of learnable state (SURVEY.md §5.4).

The reference piggybacks on ``state_dict()`` with non-persistent buffers
so only learned state is saved (diffsptk/modules/base.py:67, gmm.py:168).
The equivalent here: an op's learned state IS a pytree
(``op.trainable_params`` / a learner's parameter dict), so checkpointing
is pytree serialization.  Design constants are never saved — they are
recomputed at construction, exactly like the reference's buffers.

Two interchangeable backends, selected by ``backend=``:

- ``"orbax"`` — the production path (async + sharded-array aware);
  saves a checkpoint *directory*.
- ``"npz"`` — dependency-free flat-dict format; saves a single file
  that round-trips any pytree of arrays.
- ``"auto"`` (default) — orbax when importable, else npz.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _have_orbax() -> bool:
    import importlib.util
    return importlib.util.find_spec("orbax") is not None


def save(path: str, pytree, backend: str = "auto") -> None:
    """Save a pytree of arrays to ``path`` (directory for orbax, file
    for npz)."""
    if backend not in ("auto", "orbax", "npz"):
        raise ValueError(f"backend {backend} is not supported.")
    if backend == "orbax" or (backend == "auto" and _have_orbax()):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), pytree, force=True)
        ckptr.wait_until_finished()
        return
    flat, treedef = jax.tree.flatten(pytree)
    np.savez(path if path.endswith(".npz") else path + ".npz",
             __treedef__=np.frombuffer(
                 repr(treedef).encode(), dtype=np.uint8),
             **{str(i): np.asarray(a) for i, a in enumerate(flat)})


def load(path: str, like, backend: str = "auto"):
    """Load a checkpoint saved by :func:`save`.  ``like`` is a pytree
    with the target structure (e.g. ``op.trainable_params``)."""
    if backend not in ("auto", "orbax", "npz"):
        raise ValueError(f"backend {backend} is not supported.")
    if backend != "npz" and os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), like)
    p = path if path.endswith(".npz") else path + ".npz"
    data = np.load(p)
    flat, treedef = jax.tree.flatten(like)
    restored = [data[str(i)] for i in range(len(flat))]
    return jax.tree.unflatten(treedef, restored)
