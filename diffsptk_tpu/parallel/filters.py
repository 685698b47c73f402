"""Sequence-parallel recurrent filters.

The time-varying all-pole recurrence (ops/poledf.py, the reference's
torchlpc kernel) is causal with an order-M state, so a time-sharded
input cannot be filtered block-locally.  The blocked decomposition in
kernels/recurrence.py already summarizes each block as an affine state
map s_out = c + C s_in; across devices the same summaries are
all-gathered (M + M^2 floats per shard over ICI) and folded, giving
every shard its exact entering state — no warmup approximation, output
bitwise-equal to the single-device blocked form up to float reduction
order.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.recurrence import sample_wise_lpc
from .halo import exchange_halo


class ShardedAllPoleDigitalFilter:
    """(excitation (B, T), LPC (B, T/P, M+1)) -> waveform (B, T), with
    batch over ``dp`` and time over ``tp``."""

    def __init__(self, mesh: Mesh, filter_order: int, frame_period: int, *,
                 ignore_gain: bool = False, block: int = 256,
                 time_axis_name: str = "tp",
                 batch_axis_name: str | None = "dp") -> None:
        if filter_order < 0:
            raise ValueError("filter_order must be non-negative.")
        if frame_period <= 0:
            raise ValueError("frame_period must be positive.")
        self.mesh = mesh
        self.tp = time_axis_name
        self.dp = batch_axis_name if batch_axis_name in mesh.shape else None
        self.frame_period = frame_period
        self.ignore_gain = ignore_gain
        self.block = block

    def _local(self, x_blk: jnp.ndarray, a_blk: jnp.ndarray) -> jnp.ndarray:
        Pd = self.frame_period
        N_l = a_blk.shape[-2]
        # frame -> sample upsampling; the right bracket of the last local
        # frame is the neighbor's first (edge fill replicates the final
        # frame at the global end, as the unsharded op does)
        a_ext = exchange_halo(a_blk, 0, 1, self.tp, axis=-2,
                              pad_mode="edge")
        n = np.arange(N_l * Pd)
        i0 = n // Pd
        w = jnp.asarray(((n % Pd) / Pd).astype(np.float64), a_blk.dtype)
        a_s = (a_ext[..., i0, :] * (1 - w[:, None])
               + a_ext[..., i0 + 1, :] * w[:, None])
        K, a1 = a_s[..., 0], a_s[..., 1:]
        if not self.ignore_gain:
            x_blk = K * x_blk
        # the cross-shard summary requires block | local T: shrink the
        # block to the largest divisor of T_l not exceeding the request
        T_l = x_blk.shape[-1]
        block = self.block
        while T_l % block:
            block -= 1
        return sample_wise_lpc(x_blk, a1, block=block,
                               axis_name=self.tp)

    def __call__(self, x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
        ntp = self.mesh.shape[self.tp]
        if x.shape[-1] % (self.frame_period * ntp):
            raise ValueError(
                "T must be divisible by frame_period * n_time_shards.")
        batch = (self.dp,) if self.dp else ()
        xs = P(*batch, self.tp)
        as_ = P(*batch, self.tp, None)
        return jax.shard_map(self._local, mesh=self.mesh,
                             in_specs=(xs, as_), out_specs=xs,
                             check_vma=False)(x, a)
