"""Overlap-save halo exchange over a sharded time axis.

The single distribution primitive framed ops need (SURVEY.md §5.7): each
time-block shard receives the trailing samples of its left neighbor and the
leading samples of its right neighbor via ``lax.ppermute`` (compiled to ICI
neighbor sends on TPU), so unfold-style ops run block-locally afterwards.
Boundary shards are padded according to the op's padding mode.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def exchange_halo(x: jnp.ndarray, left: int, right: int, axis_name: str,
                  axis: int = -1,
                  pad_mode: str | tuple[str, str] = "constant") -> jnp.ndarray:
    """Extend the local time block with neighbor halos.

    x: the local shard, time on ``axis``.  ``left``/``right`` are halo
    widths in samples.  Must be called inside shard_map over ``axis_name``.
    The global-edge shards are padded with ``pad_mode`` (zeros for
    'constant'), matching what the unsharded op would do at signal edges;
    a (left_mode, right_mode) pair sets the two global edges separately
    (e.g. PQMF's zero-left / replicate-right delay padding).
    """
    mode_l, mode_r = ((pad_mode, pad_mode) if isinstance(pad_mode, str)
                      else pad_mode)
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    axis = axis % x.ndim
    if max(left, right) > x.shape[axis]:
        raise ValueError(
            f"halo ({left}, {right}) exceeds the local block length "
            f"{x.shape[axis]}: ppermute reaches only the immediate "
            f"neighbor — enlarge the per-shard block or reduce the halo.")

    def take(a, sl):
        ix = [slice(None)] * a.ndim
        ix[axis] = sl
        return a[tuple(ix)]

    def edge_fill(recv, side):
        pad_mode = mode_l if side == "left" else mode_r
        if pad_mode == "constant":
            return jnp.zeros_like(recv)
        if pad_mode == "edge":
            # replicate the outermost local element at the global edge
            sl = (slice(0, 1) if side == "left"
                  else slice(x.shape[axis] - 1, None))
            rep = [1] * x.ndim
            rep[axis] = recv.shape[axis]
            return jnp.tile(take(x, sl), rep)
        if pad_mode == "reflect":
            # mirror about the global edge, excluding the edge sample
            # (matches jnp.pad mode="reflect")
            w = recv.shape[axis]
            sl = (slice(1, w + 1) if side == "left"
                  else slice(x.shape[axis] - w - 1, x.shape[axis] - 1))
            return jnp.flip(take(x, sl), axis)
        raise ValueError(f"pad_mode {pad_mode} is not supported.")

    parts = []
    if left > 0:
        # receive the last `left` samples of the left neighbor
        tail = take(x, slice(x.shape[axis] - left, None))
        recv = lax.ppermute(tail, axis_name,
                            [(i, (i + 1) % n) for i in range(n)])
        # shard 0 has no left neighbor: global-edge padding
        recv = jnp.where(idx == 0, edge_fill(recv, "left"), recv)
        parts.append(recv)
    parts.append(x)
    if right > 0:
        head = take(x, slice(0, right))
        recv = lax.ppermute(head, axis_name,
                            [(i, (i - 1) % n) for i in range(n)])
        recv = jnp.where(idx == n - 1, edge_fill(recv, "right"), recv)
        parts.append(recv)
    return jnp.concatenate(parts, axis=axis)
