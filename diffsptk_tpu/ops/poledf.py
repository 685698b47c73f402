"""All-pole digital filter with frame-rate coefficients
(reference: diffsptk/modules/poledf.py:117-140).

Coefficients are linearly interpolated to sample rate, the gain multiplies
the excitation, and the time-varying recurrence runs in the native kernel
(kernels/recurrence.py) — the TPU replacement for torchlpc.sample_wise_lpc.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import BaseOp, Design, check_size, filter_values
from ..kernels.recurrence import chunked_sample_wise_lpc, sample_wise_lpc
from .linear_intpl import linear_interpolate


class AllPoleDigitalFilter(BaseOp):
    """(excitation (..., T), LPC (..., T/P, M+1)) -> waveform (..., T).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> a = jnp.tile(jnp.asarray([1.0, 0.5]), (4, 1))     # K=1, a1=0.5
    >>> y = diffsptk_tpu.AllPoleDigitalFilter(1, 1)(
    ...     diffsptk_tpu.impulse(3), a)
    >>> np.round(np.asarray(y), 3)                        # (1+0.5 z^-1)^-1
    array([ 1.   , -0.5  ,  0.25 , -0.125])
    """

    _input_names = ("x", "a")

    def __init__(self, filter_order: int, frame_period: int, *,
                 ignore_gain: bool = False,
                 chunk_length: int | None = None,
                 warmup_length: int | None = None) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(filter_order: int, frame_period: int) -> None:
        if filter_order < 0:
            raise ValueError("filter_order must be non-negative.")
        if frame_period <= 0:
            raise ValueError("frame_period must be positive.")

    @staticmethod
    def _design(filter_order: int, frame_period: int,
                ignore_gain: bool = False, chunk_length: int | None = None,
                warmup_length: int | None = None) -> Design:
        AllPoleDigitalFilter._check(filter_order, frame_period)
        if chunk_length is not None and warmup_length is None:
            warmup_length = 8 * (filter_order + 1)
        return Design(values={
            "frame_period": frame_period, "ignore_gain": ignore_gain,
            "chunk_length": chunk_length, "warmup_length": warmup_length})

    @staticmethod
    def _forward(x: jnp.ndarray, a: jnp.ndarray, *, frame_period: int,
                 ignore_gain: bool, chunk_length: int | None,
                 warmup_length: int | None) -> jnp.ndarray:
        check_size(x.shape[-1], a.shape[-2] * frame_period, "sequence length")
        a = linear_interpolate(a, frame_period)       # (..., T, M+1)
        K, a1 = a[..., :1], a[..., 1:]
        if not ignore_gain:
            x = K[..., 0] * x
        if chunk_length is not None:
            return chunked_sample_wise_lpc(x, a1, chunk_length, warmup_length)
        return sample_wise_lpc(x, a1)

    def __call__(self, x, a):
        return self.apply(self.params, x, a)
