"""Time-block-sharded framed transforms.

``sharded_frame`` reproduces Frame's centered framing bit-for-bit with the
waveform sharded over a mesh time axis: halo-exchange then block-local
gather.  ``ShardedSTFT`` composes it with the (embarrassingly frame-parallel)
window+spectrum stages, keeping the FFT on dense block-local buffers — which
also sidesteps GSPMD resharding in front of the FFT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.frame import Frame
from ..ops.stft import ShortTimeFourierTransform
from .halo import exchange_halo


def _block_frame(x_ext: jnp.ndarray, n_frames: int, frame_length: int,
                 frame_period: int) -> jnp.ndarray:
    idx = (np.arange(n_frames)[:, None] * frame_period
           + np.arange(frame_length)[None, :])
    return x_ext[..., idx]


def sharded_frame(x: jnp.ndarray, frame_length: int, frame_period: int,
                  mesh: Mesh, time_axis_name: str = "tp",
                  batch_axis_name: str | None = "dp",
                  center: bool = True, zmean: bool = False) -> jnp.ndarray:
    """Frame a time-sharded waveform (..., T) -> (..., T/P, L).

    The local block length must be a multiple of frame_period.  Output
    frames are sharded over the same time axis; batch over the batch axis
    when given.
    """
    L, Pd = frame_length, frame_period
    ntp = mesh.shape[time_axis_name]
    T = x.shape[-1]
    if T % (Pd * ntp):
        raise ValueError("T must be divisible by frame_period * n_time_shards")
    halo_l = L // 2 if center else 0
    halo_r = max(L - 1 - halo_l - (Pd - 1), 0)
    n_frames_local = T // Pd // ntp

    def local(x_blk):
        x_ext = exchange_halo(x_blk, halo_l, halo_r, time_axis_name)
        y = _block_frame(x_ext, n_frames_local, L, Pd)
        if zmean:
            y = y - jnp.mean(y, axis=-1, keepdims=True)
        return y

    batch_spec = (batch_axis_name,) if batch_axis_name else ()
    in_spec = P(*batch_spec, *([None] * (x.ndim - 2)), time_axis_name)
    out_spec = P(*batch_spec, *([None] * (x.ndim - 2)), time_axis_name, None)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(in_spec,),
                       out_specs=out_spec, check_vma=False)
    return fn(x)


class ShardedSTFT:
    """STFT over a (dp, tp) mesh: batch over dp, frames over tp.

    Numerically identical to the single-device ShortTimeFourierTransform
    (tested in tests/test_parallel.py); the window/FFT stages run inside
    the same shard_map, so all buffers stay block-local and dense.
    """

    def __init__(self, mesh: Mesh, frame_length: int, frame_period: int,
                 fft_length: int, *, time_axis_name: str = "tp",
                 batch_axis_name: str | None = "dp", **stft_kwargs):
        self.mesh = mesh
        self.time_axis_name = time_axis_name
        self.batch_axis_name = (batch_axis_name
                                if batch_axis_name in mesh.shape else None)
        self.frame_length = frame_length
        self.frame_period = frame_period
        self.op = ShortTimeFourierTransform(
            frame_length, frame_period, fft_length, **stft_kwargs)
        if getattr(self.op.frame, "mode", "constant") != "constant":
            raise ValueError("sharded STFT supports constant padding only")

    def __call__(self, x: jnp.ndarray,
                 window_params: dict | None = None) -> jnp.ndarray:
        """Apply; ``window_params`` optionally overrides the window op's
        params pytree (pure path for training a learnable window)."""
        L, Pd = self.frame_length, self.frame_period
        ntp = self.mesh.shape[self.time_axis_name]
        T = x.shape[-1]
        if T % (Pd * ntp):
            raise ValueError(
                "T must be divisible by frame_period * n_time_shards")
        center = self.op.frame.center
        halo_l = L // 2 if center else 0
        halo_r = max(L - 1 - halo_l - (Pd - 1), 0)
        n_frames_local = T // Pd // ntp
        zmean = self.op.frame.zmean

        wp = ({**self.op.window.params, **window_params}
              if window_params is not None else self.op.window.params)

        def local(x_blk):
            x_ext = exchange_halo(x_blk, halo_l, halo_r, self.time_axis_name)
            y = _block_frame(x_ext, n_frames_local, L, Pd)
            if zmean:
                y = y - jnp.mean(y, axis=-1, keepdims=True)
            y = self.op.window.apply(wp, y)
            return self.op.spec(y)

        batch_spec = (self.batch_axis_name,) if self.batch_axis_name else ()
        pad = [None] * (x.ndim - 1 - len(batch_spec))
        in_spec = P(*batch_spec, *pad, self.time_axis_name)
        out_spec = P(*batch_spec, *pad, self.time_axis_name, None)
        fn = jax.shard_map(local, mesh=self.mesh, in_specs=(in_spec,),
                           out_specs=out_spec, check_vma=False)
        return fn(x)
